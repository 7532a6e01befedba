"""spark-submit entrypoint: build (or resume) a segment index.

    zip -r crwes.zip content_rw_elasticsearch_spark
    spark-submit --master <cluster> --py-files crwes.zip \
        scripts/submit_build.py --corpus /path/corpus.parquet \
        --out /path/index --analyzer code --positions

The corpus must have the BASELINE.json input_hint shape
(repo, path, commit, lang, content); doc ids are derived from the
natural key (xxhash64 — partition-layout independent).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None, help="parquet/iceberg path")
    ap.add_argument("--out", required=True, help="index output dir")
    ap.add_argument("--snapshot-to", dest="snapshot_to", default=None,
                    metavar="DEST",
                    help="instead of building: snapshot the index at "
                         "--out to DEST (ES _snapshot analog; DEST may "
                         "be a different store)")
    ap.add_argument("--restore-from", dest="restore_from", default=None,
                    metavar="SNAP",
                    help="instead of building: restore snapshot SNAP "
                         "into --out (must be empty)")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--analyzer", default="simple", choices=["simple", "code"])
    ap.add_argument("--n-buckets", type=int, default=8)
    ap.add_argument("--target-block", type=int, default=4096)
    ap.add_argument("--nb-max", type=int, default=256)
    ap.add_argument("--positions", action="store_true")
    ap.add_argument("--snapshot-id", default="")
    args = ap.parse_args()

    from content_rw_elasticsearch_spark.operators.segments import (
        build_segments,
        validate_index,
    )
    from content_rw_elasticsearch_spark.sources.corpus import with_doc_id

    spark = SparkSession.builder.getOrCreate()
    if args.snapshot_to is not None or args.restore_from is not None:
        from content_rw_elasticsearch_spark.maintenance import (
            restore_index,
            snapshot_index,
        )
        if args.snapshot_to is not None:
            rec = snapshot_index(args.out, args.snapshot_to, spark)
        else:
            rec = restore_index(args.restore_from, args.out, spark)
        print(rec)
        spark.stop()
        return
    if not args.corpus:
        raise SystemExit("--corpus is required to build")
    corpus = spark.read.parquet(args.corpus)
    if "doc_id" not in corpus.columns:
        corpus = with_doc_id(corpus)
    manifest = build_segments(
        corpus, args.out, text_col=args.text_col, doc_col="doc_id",
        analyzer=args.analyzer, n_buckets=args.n_buckets,
        target_block=args.target_block, nb_max=args.nb_max,
        snapshot_id=args.snapshot_id or args.corpus,
        with_positions=args.positions,
    )
    validate_index(spark, args.out)
    print({"built": args.out, "n_docs": manifest["n_docs"],
           "posting_count": manifest["posting_count"]})
    spark.stop()


if __name__ == "__main__":
    main()
