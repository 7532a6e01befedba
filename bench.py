"""Benchmark harness — index build + reference-query latencies.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "index_build_sec": ..., "docs_per_sec": ..., "n_docs": ...}

Scaling-efficiency evidence (BASELINE.md (b)): scripts/bench_scaling.py
runs this same workload at two parallelism levels.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from content_rw_elasticsearch_spark.engine import InMemoryIndex  # noqa: E402
from content_rw_elasticsearch_spark.queries import REFERENCE_QUERIES  # noqa: E402
from content_rw_elasticsearch_spark.session import get_spark  # noqa: E402


def run(sf_dir: str, cpus: int) -> dict:
    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    t0 = time.time()
    idx = InMemoryIndex.build(docs, text_col="text", doc_col="doc_id")
    idx.postings.count()  # materialize the cached index
    idx.stats.count()
    build_sec = time.time() - t0

    # warm the query path once (JVM/codegen warmup excluded from timings)
    idx.search("hash join", k=10).collect()

    qtimes: dict[str, float] = {}
    for name, spec in REFERENCE_QUERIES.items():
        t = time.time()
        idx.search(spec["query"], k=spec["k"], mode=spec["mode"]).collect()
        qtimes[name] = round(time.time() - t, 4)

    total = round(build_sec + sum(qtimes.values()), 4)
    result = {
        "metric": "index_build_plus_reference_queries",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_dir,
        "index_build_sec": round(build_sec, 4),
        "docs_per_sec": round(n_docs / build_sec, 2),
        "n_docs": n_docs,
        "cpus": cpus,
        "query_p50_sec": round(sorted(qtimes.values())[len(qtimes) // 2], 4),
    }
    idx.unpersist()
    spark.stop()
    return result


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    print(json.dumps(run(sf_dir, cpus)))
