"""Attribute scaling loss from Spark event logs: per-task CPU vs wall.

Reads every application event log in a directory (one per scaling leg),
groups tasks by stage, and reports per-leg totals of:

  run      sum of executorRunTime           (task wall on an executor)
  cpu      sum of executorCpuTime           (actual CPU burned)
  gc       sum of jvmGCTime
  fetch    sum of shuffle fetch wait
  write    sum of shuffle write time
  deser/ser  task (de)serialization
  sched    launch->finish minus runTime (scheduler+delivery delay)

The smoking gun for in-box concurrency inflation: cpu(8-core leg) >>
cpu(2-core leg) for the SAME work means each task burns more CPU at
higher concurrency (cache/TLB pressure, python-worker contention);
run >> cpu growth means tasks WAIT (I/O, locks, python IPC).

Usage: python scripts/analyze_eventlog.py /tmp/evlog
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def analyze(path: str) -> dict:
    agg: dict[str, float] = defaultdict(float)
    n_tasks = 0
    cores = None
    app_end = app_start = None
    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev.get("Timestamp")
            elif e == "SparkListenerApplicationEnd":
                app_end = ev.get("Timestamp")
            elif e == "SparkListenerEnvironmentUpdate":
                cores = ev.get("Spark Properties", {}).get("spark.master")
            elif e == "SparkListenerTaskEnd":
                m = ev.get("Task Metrics") or {}
                info = ev.get("Task Info") or {}
                if not m:
                    continue
                n_tasks += 1
                agg["run_ms"] += m.get("Executor Run Time", 0)
                agg["cpu_ms"] += m.get("Executor CPU Time", 0) / 1e6
                agg["gc_ms"] += m.get("JVM GC Time", 0)
                agg["deser_ms"] += m.get("Executor Deserialize Time", 0)
                agg["ser_ms"] += m.get("Result Serialization Time", 0)
                srm = m.get("Shuffle Read Metrics") or {}
                agg["fetch_ms"] += srm.get("Fetch Wait Time", 0)
                swm = m.get("Shuffle Write Metrics") or {}
                agg["write_ms"] += swm.get("Shuffle Write Time", 0) / 1e6
                task_wall = (info.get("Finish Time", 0) or 0) - (info.get("Launch Time", 0) or 0)
                agg["wall_ms"] += max(task_wall, 0)
    # the raw metrics are milliseconds; report seconds with *_s keys
    out = {k.replace("_ms", "_s"): round(v / 1000.0, 1) for k, v in agg.items()}
    out["n_tasks"] = n_tasks
    out["master"] = cores
    if app_start and app_end:
        out["app_wall_s"] = round((app_end - app_start) / 1000.0, 1)
    out["sched_s"] = round(out.get("wall_s", 0) - out.get("run_s", 0)
                           - out.get("deser_s", 0) - out.get("ser_s", 0), 1)
    out["wait_s"] = round(out.get("run_s", 0) - out.get("cpu_s", 0)
                          - out.get("gc_s", 0), 1)
    return out


def per_stage(path: str) -> dict[int, dict]:
    """Per-stage task sums: run/cpu seconds, span, task count, name."""
    st: dict[int, dict] = defaultdict(
        lambda: {"run": 0.0, "cpu": 0.0, "n": 0,
                 "launch": None, "finish": None, "name": ""}
    )
    for line in open(path, errors="replace"):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerStageSubmitted":
            si = ev["Stage Info"]
            st[si["Stage ID"]]["name"] = (si.get("Stage Name") or "")[:45]
        elif e == "SparkListenerTaskEnd":
            s = st[ev["Stage ID"]]
            m = ev.get("Task Metrics") or {}
            info = ev.get("Task Info") or {}
            s["run"] += (m.get("Executor Run Time") or 0) / 1000.0
            s["cpu"] += (m.get("Executor CPU Time") or 0) / 1e9
            s["n"] += 1
            lt, ft = info.get("Launch Time"), info.get("Finish Time")
            if lt:
                s["launch"] = lt if s["launch"] is None else min(s["launch"], lt)
            if ft:
                s["finish"] = ft if s["finish"] is None else max(s["finish"], ft)
    return st


def compare_stages(path_a: str, path_b: str) -> None:
    """CPU-inflation table between two legs of the same program (stage
    ids line up because the job sequence is identical)."""
    a, b = per_stage(path_a), per_stage(path_b)
    print("sid  n    cpu_a    cpu_b  infl   span_a  span_b  name")
    for sid in sorted(set(a) & set(b)):
        sa, sb = a[sid], b[sid]
        if sa["cpu"] < 3 or not sa["launch"] or not sb["launch"]:
            continue
        span_a = (sa["finish"] - sa["launch"]) / 1000.0
        span_b = (sb["finish"] - sb["launch"]) / 1000.0
        print(f"{sid:3d} {sa['n']:4d} {sa['cpu']:8.1f} {sb['cpu']:8.1f} "
              f"{sb['cpu'] / sa['cpu']:5.2f} {span_a:8.1f} {span_b:7.1f}  "
              f"{sa['name']}")


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--stages"]
    if "--stages" in sys.argv and len(args) == 2:
        compare_stages(args[0], args[1])
        return
    d = args[0] if args else "/tmp/evlog"
    for name in sorted(os.listdir(d)):
        p = os.path.join(d, name)
        if not os.path.isfile(p):
            continue
        r = analyze(p)
        keys = ("master", "app_wall_s", "n_tasks", "run_s", "cpu_s",
                "gc_s", "wait_s", "fetch_s", "write_s", "sched_s")
        print(name[:40], json.dumps({k: r.get(k) for k in keys}))


if __name__ == "__main__":
    main()
