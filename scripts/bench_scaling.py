"""Two-cluster-size scaling evidence (BASELINE.md (b), north_rule).

Runs the identical segment-index build + query job at local[N] and
local[4N] (the sandbox stand-in for N vs 4N executors) on the same
deterministic synthetic corpus, in separate JVMs, and reports indexing
throughput at both plus scaling efficiency
    eff = throughput(4N) / (4 × throughput(N)).

Noise handling: this sandbox VM shows hypervisor CPU steal (%st in top),
so each leg runs REPEATS times and the FASTEST run is kept (the classic
min-estimator for noisy shared hosts — the minimum is the least-contended
observation of the same deterministic work). Default parallelism pair is
2 vs 8: the VM advertises 32 vCPUs but scaling saturates past ~8-16
(overcommitted host cores), so 8→32 measures the hypervisor, not the
engine; the 8→32 curve is still reported in BENCH/BASELINE.md with that
analysis.

Usage: python scripts/bench_scaling.py [n_docs] [low] [high] [repeats]
       (defaults: 300000 2 8 2)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(cpus: int, n_docs: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SYNTH_DOCS=str(n_docs),
        SPARK_DRIVER_MEM="48g",
    )
    # taskset pins the WHOLE process tree (JVM + python UDF workers) to
    # exactly `cpus` host cores — local[N] alone caps only JVM task slots,
    # letting python workers spill onto extra host cores and distorting
    # the N-vs-4N comparison.
    #
    # SPARK_GRAFT_NO_PIN=1 skips the pinning. This is REQUIRED for the
    # local-cluster (separate executor JVM) legs: pinning crams the
    # driver JVM + standalone master/worker threads + N 1-core executor
    # JVMs + python workers onto N host cores, so RPC/heartbeat threads
    # wait behind minute-long encode tasks and the master removes the app
    # mid-build ("Could not find AppClient" — campaigns 8-10, even with
    # 600 s timeouts). On a real cluster each executor's infra threads
    # run on its own node beside that node's task cores; unpinned legs
    # reproduce that (compute parallelism is still bounded by executor
    # task slots, which is what the N-vs-4N ratio is about). The residual
    # over-credit — GC/netty/python-serialization running on spare host
    # cores — helps the low leg relatively more, so it makes the measured
    # efficiency CONSERVATIVE (biases toward FAIL, not PASS).
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if not os.environ.get("SPARK_GRAFT_NO_PIN"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, cwd=REPO, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    ratio = high // low
    # INTERLEAVE the legs (low, high, low, high, ...) so a noisy window on
    # this steal-prone host hits both parallelism levels instead of biasing
    # one; keep the fastest run per leg (min-estimator)
    lows, highs = [], []
    for _ in range(repeats):
        lows.append(run_one(low, n_docs))
        highs.append(run_one(high, n_docs))
        print(json.dumps({"leg_low": lows[-1]["index_build_sec"],
                          "leg_high": highs[-1]["index_build_sec"],
                          "low_metrics": lows[-1].get("build_metrics", {}),
                          "high_metrics": highs[-1].get("build_metrics", {})}),
              file=sys.stderr)
    r_low = max(lows, key=lambda r: r["docs_per_sec"])
    r_high = max(highs, key=lambda r: r["docs_per_sec"])
    eff = r_high["docs_per_sec"] / (ratio * r_low["docs_per_sec"])
    summary = {
        "metric": "scaling_efficiency",
        "value": round(eff, 4),
        "unit": "ratio",
        "n_docs": n_docs,
        "repeats": repeats,
        "low": {"cpus": low, "docs_per_sec": r_low["docs_per_sec"],
                "build_sec": r_low["index_build_sec"],
                "query_p50_sec": r_low["query_p50_sec"]},
        "high": {"cpus": high, "docs_per_sec": r_high["docs_per_sec"],
                 "build_sec": r_high["index_build_sec"],
                 "query_p50_sec": r_high["query_p50_sec"]},
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    if os.environ.get("SPARK_GRAFT_LOCAL_CLUSTER"):
        leg_label = "local-cluster[{n},1,m] — {n} separate 1-core executor JVMs"
        mode_note = ("local-cluster mode: a standalone master + worker + N "
                     "SEPARATE 1-core executor JVMs per leg (per-JVM heap, "
                     "GC, and python-worker pools scale with executor count "
                     "exactly as on a real cluster); legs run UNPINNED so "
                     "executor task slots bound compute parallelism while "
                     "infra threads live beside them as on real nodes")
    else:
        leg_label = "local[{n}]"
        mode_note = ("only the master string differs (sandbox stand-in for "
                     "N vs 4N executors)")
    md = f"""
## (c) Measured scaling run — {stamp}

Identical segment-index build + reference-query job, deterministic
synthetic corpus ({n_docs:,} docs, seed 42), separate JVMs, best of
{repeats} runs per leg (min-estimator against hypervisor steal noise);
{mode_note}.

| parallelism | index build (s) | indexing throughput (docs/s) | query p50 (s) |
|---|---|---|---|
| {leg_label.format(n=low)}  | {r_low['index_build_sec']} | {r_low['docs_per_sec']} | {r_low['query_p50_sec']} |
| {leg_label.format(n=high)} | {r_high['index_build_sec']} | {r_high['docs_per_sec']} | {r_high['query_p50_sec']} |

**Scaling efficiency** = {r_high['docs_per_sec']} / ({ratio} × {r_low['docs_per_sec']})
= **{eff:.3f}** (target ≥ 0.8: {"PASS" if eff >= 0.8 else "FAIL"})
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)


if __name__ == "__main__":
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    base = os.path.join(REPO, "BENCH", "BASELINE.md")
    if not os.path.exists(base):
        with open(base, "w") as f:
            f.write("# BENCH/BASELINE — measured numbers for this repo\n\n"
                    "See /root/repo/BASELINE.md for targets. Sections below are\n"
                    "appended by scripts/bench_scaling.py runs.\n")
    main()
