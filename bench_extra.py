"""Phase-isolating micro-bench for the optimization round (guide §1.4).

NOT the driver's bench — bench.py stays frozen. This harness builds the
same segment index once, then times each reference query repeatedly with
its phases split out (metadata scan / exhaustive decode+score / forced-
pruned two-phase plan), labelling jobs so the timings attribute cleanly.

Usage:  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [reps]
Prints one JSON line with per-query {exhaustive, pruned, meta} min/median.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from content_rw_elasticsearch_spark.operators.segments import build_segments  # noqa: E402
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex  # noqa: E402
from content_rw_elasticsearch_spark.queries import REFERENCE_QUERIES  # noqa: E402
from content_rw_elasticsearch_spark.session import get_spark  # noqa: E402


def mm(xs):
    return {"min": round(min(xs), 4), "med": round(statistics.median(xs), 4),
            "n": len(xs)}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import duckdb
    n_hint = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'").fetchone()[0]
    shuffle_parts = max(cpus * 4, n_hint // 25_000)
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=shuffle_parts)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out_dir = "/tmp/bx_idx"

    build_secs = []
    n_builds = int(os.environ.get("BX_BUILDS", "2"))
    for _ in range(n_builds):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        manifest = build_segments(corpus, out_dir, text_col="text",
                                  doc_col="doc_id", n_buckets=8,
                                  snapshot_id=sf_dir)
        build_secs.append(round(time.time() - t0, 3))

    idx = SegmentIndex.load(spark, out_dir)
    hot = (
        spark.read.parquet(f"{out_dir}/stats.parquet")
        .orderBy("df", ascending=False).limit(1).collect()[0]["term"]
    )
    idx.search(hot, k=10).collect()  # warm

    res: dict = {"sf": sf_dir, "build_secs": build_secs,
                 "build_metrics": manifest.get("build_metrics"),
                 "prune_min_postings": idx.prune_min_postings}
    qres: dict = {}
    for name, spec in REFERENCE_QUERIES.items():
        sc = spark.sparkContext
        ex, pr, meta_t = [], [], []
        terms = sorted(set(spec["query"].lower().split()))
        sum_df = None
        for _ in range(reps):
            sc.setJobDescription(f"{name}: meta")
            t = time.time()
            m = idx._meta(terms)
            meta_t.append(time.time() - t)
            if sum_df is None and not m.empty:
                sum_df = int(m["count"].sum())
            sc.setJobDescription(f"{name}: exhaustive")
            t = time.time()
            idx.search(spec["query"], k=spec["k"], mode=spec["mode"],
                       prune=False).collect()
            ex.append(time.time() - t)
            sc.setJobDescription(f"{name}: pruned")
            saved = idx.prune_min_postings
            idx.prune_min_postings = 0
            t = time.time()
            idx.search(spec["query"], k=spec["k"], mode=spec["mode"],
                       prune=True).collect()
            pr.append(time.time() - t)
            idx.prune_min_postings = saved
            sc.setJobDescription(None)
        qres[name] = {"meta": mm(meta_t), "exhaustive": mm(ex),
                      "pruned": mm(pr), "sum_df": sum_df}
    res["queries"] = qres
    spark.stop()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
