"""Quantify the sandbox host's per-core speed as a function of how many
cores are busy — the 'documented host ceiling' behind the scaling
efficiency measurements in BENCH/BASELINE.md.

Method: load K cores with register-bound busy loops (pinned to cores
1..K), then measure on core 0 (a) a register-bound xorshift loop
(sensitive to CPU frequency / hypervisor throttling, cache-resident) and
(b) a 512 MB numpy stream (sensitive to shared memory bandwidth). With
hypervisor steal at ~0% (sampled from /proc/stat around each step), any
drop in (a) as K grows is frequency/power throttling of the physical
package, and any drop in (b) is memory-bandwidth contention — both
effects a real N-vs-4N-EXECUTOR cluster does not couple between cluster
sizes (separate machines), but which this single-box stand-in cannot
avoid. The expected whole-job 2→8-core efficiency ceiling is
speed(8 busy)/speed(2 busy) per core.

Usage: python scripts/host_ceiling_probe.py  (takes ~2 min, needs an
otherwise-idle machine)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np


def _busy(core: int, stop_t: float) -> None:
    os.sched_setaffinity(0, {core})
    x = 0x9E3779B97F4A7C15
    while time.time() < stop_t:
        for _ in range(100_000):
            x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 7
            x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF


def cpu_bound(seconds: float = 2.0) -> float:
    x = 0x9E3779B97F4A7C15
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        for _ in range(100_000):
            x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 7
            x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        n += 100_000
    return n / (time.perf_counter() - t0)


def mem_bound(seconds: float = 2.0) -> float:
    a = np.ones(64_000_000, dtype=np.float64)  # 512 MB stream
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < seconds:
        a.sum()
        n += 1
    return n * a.nbytes / (time.perf_counter() - t0) / 1e9


def steal_pct(seconds: float = 1.0) -> float:
    def snap():
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:]]
    a = snap()
    time.sleep(seconds)
    b = snap()
    d = [y - x for x, y in zip(a, b)]
    return 100.0 * d[7] / max(sum(d), 1)


def main() -> None:
    os.sched_setaffinity(0, {0})
    out = []
    for k in (0, 1, 3, 7, 15, 31):
        procs = []
        if k:
            stop_t = time.time() + 8.0
            for c in range(1, k + 1):
                p = mp.Process(target=_busy, args=(c, stop_t), daemon=True)
                p.start()
                procs.append(p)
            time.sleep(0.5)  # let the load settle
        row = {
            "busy_other_cores": k,
            "cpu_iters_per_sec": round(cpu_bound(), 0),
            "mem_gb_per_sec": round(mem_bound(), 2),
            "steal_pct": round(steal_pct(), 3),
        }
        out.append(row)
        print(json.dumps(row), flush=True)
        for p in procs:
            p.join()
    base = out[1] if len(out) > 1 else out[0]  # 1+1 busy ≈ the 2-core leg
    for row in out:
        row["cpu_rel"] = round(row["cpu_iters_per_sec"] / base["cpu_iters_per_sec"], 3)
        row["mem_rel"] = round(row["mem_gb_per_sec"] / base["mem_gb_per_sec"], 3)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
