"""One-off timing of the round-5 query-surface additions at sf0.1 —
the companion numbers for BENCH/BASELINE.md section (o). Reuses the
same cached segment indexes bench.py builds (or builds them), runs each
feature min-of-2 (the repo's noisy-host discipline), prints ONE JSON
line. Run with nothing else on the machine.

    python scripts/bench_r5_features.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from content_rw_elasticsearch_spark.operators.percolate import (  # noqa: E402
    percolate,
)
from content_rw_elasticsearch_spark.operators.wand import (  # noqa: E402
    search_sharded,
)
from content_rw_elasticsearch_spark.session import get_spark  # noqa: E402


def _timed(fn, n=2):
    best = float("inf")
    rows = 0
    for _ in range(n):
        t = time.time()
        rows = len(fn().collect())
        best = min(best, time.time() - t)
    return round(best, 4), rows


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    ndocs = docs.withColumn("n_chars", F.coalesce("n_chars",
                                                  F.length("text")))
    seg = entry._segment_index_for(spark, sf)
    segp = entry._segment_index_for(spark, sf, with_positions=True)
    shards = entry._shard_indexes_for(spark, sf)
    qtable = spark.createDataFrame(
        [(i, q, m) for i, (q, m) in enumerate(
            [("hash join", "AND"), ("vector batch scan", "OR"),
             ("merge sort window", "AND"), ("customer data", "AND")] * 25)],
        "query_id long, query string, mode string")

    out: dict[str, object] = {"sf": sf, "estimator": "min_of_2"}
    feats = {
        "filtered_search": lambda: seg.search(
            "hash join", k=10, filter_ids=docs.filter(
                F.col("lang") == "en").select("doc_id")),
        "rescore": lambda: segp.rescore("join", "hash join", k=10,
                                        window_size=50),
        "function_score": lambda: seg.function_score(
            "hash join", ndocs, "n_chars", k=10),
        "synonyms": lambda: seg.search_synonyms(
            "fast join", {"fast": ["quick", "rapid", "hash"]}, k=10,
            mode="OR"),
        "sharded_search": lambda: search_sharded(shards, "hash join", k=10),
        "phrase_prefix": lambda: segp.phrase_prefix_search("customer da"),
        "percolate_100q": lambda: percolate(docs, qtable, text_col="text"),
        "significant_terms": lambda: seg.significant_terms(
            "hash join", docs, k=10, min_doc_count=2),
        "histogram": lambda: seg.search_histogram(
            "join", ndocs, "n_chars", 50.0),
        "cardinality_hll": lambda: seg.search_cardinality(
            "join", docs, "lang"),
        "boosting": lambda: seg.boosting("hash join", "vector batch",
                                         negative_boost=0.2, k=10),
        "dis_max": lambda: seg.dis_max(["hash join", "merge sort"],
                                       tie_breaker=0.3, k=10),
        "constant_score": lambda: seg.constant_score("hash join", 1.5,
                                                     k=10),
        "has_child": lambda: seg.has_child(
            "hash join",
            docs.select("doc_id",
                        (F.col("doc_id") % 1000).alias("parent_id")),
            k=10, score_mode="max"),
        "describe": lambda: seg.describe(),
    }
    for name, fn in feats.items():
        sec, rows = _timed(fn)
        out[name] = {"sec": sec, "rows": rows}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
