"""spark-submit entrypoint: query a segment index.

    spark-submit --master <cluster> --py-files crwes.zip \
        scripts/submit_query.py --index /path/index \
        --query "hash join" --mode AND --k 10 [--phrase]
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--mode", default="AND", choices=["AND", "OR"])
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--phrase", action="store_true")
    ap.add_argument("--no-prune", action="store_true")
    args = ap.parse_args()

    from content_rw_elasticsearch_spark.operators.wand import SegmentIndex

    spark = SparkSession.builder.getOrCreate()
    idx = SegmentIndex.load(spark, args.index)
    if args.phrase:
        df = idx.phrase_search(args.query)
    else:
        df = idx.search(args.query, k=args.k, mode=args.mode,
                        prune=not args.no_prune)
    for row in df.collect():
        print(tuple(row))
    spark.stop()


if __name__ == "__main__":
    main()
