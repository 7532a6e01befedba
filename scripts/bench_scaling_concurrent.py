"""Same-window two-cluster-size scaling measurement (BASELINE.md (b)).

Why a second method: the sequential interleaved runs (bench_scaling.py)
sample DIFFERENT host-noise windows for the two legs. On this shared VM
that noise dominates: the round-3 sequential run measured the IDENTICAL
2-core leg at 413 s and 614 s within one run (1.49x spread), and the two
interleaved pairs scored 0.45 and 0.91 — the measurement floor is wider
than the entire distance to the 0.8 target.

This script runs the low leg and the high leg AT THE SAME TIME on
disjoint pinned core sets (taskset 0..low-1 vs low..low+high-1). Both
legs then see the identical instantaneous host conditions, and because
the hypervisor/CFS schedule runnable vCPU threads with equal weight, a
capacity shortfall C < (low+high) effective cores throttles both legs by
the SAME per-vCPU factor s = C/(low+high):

    t_low  = S + P/(low*s)      t_high = S + P/(high*s)

so the throughput ratio — and the scaling efficiency — is UNBIASED by
the time-varying overcommit that corrupts sequential pairs. What remains
in the ratio is exactly what the target is about: the engine's serial
orchestration, stragglers, and shuffle behavior. (Residual interference:
shared memory bandwidth between the two JVMs; reported, not corrected.)

Because t_low ≈ (high/low)·t_high, several high-leg runs fit inside one
low-leg window: the high leg is launched in a loop and only runs FULLY
CONTAINED in the low leg's window count; their MEDIAN (not min — no
within-window cherry-picking) is the high-leg time for that repeat.

Usage: python scripts/bench_scaling_concurrent.py [n_docs] [low] [high] [repeats]
       (defaults: 3000000 2 8 2)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import threading
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cmd(cpu_lo: int, cpu_hi: int) -> list[str]:
    return ["taskset", "-c", f"{cpu_lo}-{cpu_hi}",
            sys.executable, os.path.join(REPO, "bench.py")]


def _env(cpus: int, n_docs: int) -> dict:
    return dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SYNTH_DOCS=str(n_docs),
        SPARK_DRIVER_MEM="40g",
    )


def run_pair(low: int, high: int, n_docs: int) -> dict:
    """One same-window repeat: low leg once, high legs looped beside it."""
    t0 = time.time()
    low_proc = subprocess.Popen(
        _cmd(0, low - 1), env=_env(low, n_docs),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
    )
    high_runs: list[dict] = []  # {"start","end","res"}
    high_failures: list[str] = []  # stderr tails of failed high legs
    stop = threading.Event()

    def high_loop() -> None:
        while not stop.is_set():
            s = time.time()
            out = subprocess.run(
                _cmd(low, low + high - 1), env=_env(high, n_docs),
                capture_output=True, text=True, cwd=REPO,
            )
            e = time.time()
            if out.returncode == 0:
                res = json.loads(out.stdout.strip().splitlines()[-1])
                high_runs.append({"start": s, "end": e, "res": res})
            else:
                high_failures.append((out.stderr or "")[-2000:])

    th = threading.Thread(target=high_loop, daemon=True)
    th.start()
    low_out, low_err = low_proc.communicate()
    low_end = time.time()
    stop.set()
    th.join()  # let the in-flight high run finish (it will be discarded)

    if low_proc.returncode != 0 or not low_out.strip():
        # fail fast WITH the cause (campaign 8 died with an opaque
        # IndexError here because low stderr went to DEVNULL)
        raise RuntimeError(
            f"low leg failed (rc={low_proc.returncode}); stderr tail:\n"
            + (low_err or "<empty>")[-3000:]
        )
    low_res = json.loads(low_out.strip().splitlines()[-1])
    if not high_runs:
        # fail fast with the cause instead of a StatisticsError after the
        # whole low leg has been paid for
        raise RuntimeError(
            "every high-leg run failed; last stderr tail:\n"
            + (high_failures[-1] if high_failures else "<none captured>")
        )
    contained = [h for h in high_runs if h["end"] <= low_end]
    if not contained:  # degenerate (low leg unexpectedly fast): keep first
        contained = high_runs[:1]
    med = statistics.median(h["res"]["index_build_sec"] for h in contained)
    eff = low_res["index_build_sec"] / ((high / low) * med)
    return {
        "low_build_sec": low_res["index_build_sec"],
        "low_docs_per_sec": low_res["docs_per_sec"],
        "low_query_p50_sec": low_res["query_p50_sec"],
        "high_build_secs": [h["res"]["index_build_sec"] for h in high_runs],
        "high_contained": len(contained),
        "high_build_sec_med": med,
        "high_docs_per_sec": round(n_docs / med, 2),
        "efficiency": round(eff, 4),
        "wall_sec": round(low_end - t0, 1),
        # per-stage build metrics for serial-vs-parallel attribution
        "low_metrics": low_res.get("build_metrics", {}),
        "high_metrics": [h["res"].get("build_metrics", {}) for h in contained],
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    pairs = []
    for i in range(repeats):
        p = run_pair(low, high, n_docs)
        pairs.append(p)
        print(json.dumps({"repeat": i, **p}), file=sys.stderr)
    effs = [p["efficiency"] for p in pairs]
    summary = {
        "metric": "scaling_efficiency_same_window",
        "value": round(statistics.median(effs), 4),
        "unit": "ratio",
        "n_docs": n_docs,
        "low_cpus": low,
        "high_cpus": high,
        "repeats": repeats,
        "per_repeat_efficiency": effs,
        "pairs": pairs,
        "pass": statistics.median(effs) >= 0.8,
    }
    print(json.dumps(summary))

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    rows = "\n".join(
        f"| {i} | {p['low_build_sec']} | {p['high_build_sec_med']}"
        f" (median of {p['high_contained']}) | {p['efficiency']:.3f} |"
        for i, p in enumerate(pairs)
    )
    md = f"""
## (c') Same-window concurrent scaling run — {stamp}

Both legs run SIMULTANEOUSLY on disjoint pinned cores (low: 0-{low - 1},
high: {low}-{low + high - 1}), so they sample the identical host-noise
window; equal-weight vCPU scheduling cancels the time-varying overcommit
factor from the ratio (see scripts/bench_scaling_concurrent.py header
for the model). {n_docs:,} docs, seed 42; high leg looped, median of the
runs fully contained in the low leg's window.

| repeat | low build (s) | high build (s) | efficiency |
|---|---|---|---|
{rows}

**Same-window scaling efficiency (median over repeats)** =
**{statistics.median(effs):.3f}** (target ≥ 0.8:
{"PASS" if statistics.median(effs) >= 0.8 else "FAIL"})
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
