"""Incremental + streaming ingest: delta generations, tombstones, fold.

Reference semantics being reproduced (SURVEY.md §2.H): one upsert per
document keyed by uuid — idempotent, last-writer-wins, deletes keyed the
same way (/root/reference/pkg/es/service.go:119-138,
pkg/message/message_handler.go:112-120). No watermarks needed: idempotency
replaces them, exactly as in the reference.

Batch form: ``apply_upserts`` writes one delta GENERATION:
    delta/gen=N/segments/bucket=j/   encoded postings of the new versions
    delta/gen=N/tombstones/          doc_ids whose older versions die
    docs/                            exact (doc_id, doc_len, gen) bookkeeping
    delta_manifest_N.json            committed LAST (atomic restart point)
A killed batch re-applies idempotently: the generation number is derived
from committed manifests, uncommitted dirs are rebuilt.

Streaming form: ``stream_ingest`` wraps the same function in Structured
Streaming's foreachBatch — micro-batch upserts with checkpointed offsets,
the direct analog of the reference's Kafka consumer loop
(message_handler.go:38-61) with consumer-group offsets.

``fold_deltas`` is the compaction: decode base+deltas, drop superseded
versions, re-encode into a fresh base with EXACT recomputed statistics
(df approximation ends here — same lifecycle as a Lucene segment merge).

Scale notes: the docs-table rewrite per batch is the sandbox stand-in for
an Iceberg ``MERGE INTO`` (same dataflow, engine-managed file swap); delta
segments are small and term-bucketed like the base, so query-side file
pruning still applies; fold is a full shuffle by design — it is the
amortized merge, run off-peak.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import postings as P
from ..operators.segments import (
    SEGMENT_SCHEMA,
    _write_json_atomic,
    encode_segments,
    plan_block_counts,
)


def _committed_gens(index_dir: str) -> list[int]:
    gens = []
    for mp in sorted(glob.glob(os.path.join(index_dir, "delta_manifest_*.json"))):
        with open(mp) as f:
            dm = json.load(f)
        if dm.get("committed"):
            gens.append(int(dm["gen"]))
    return sorted(gens)


def _swap_dir(tmp: str, dst: str) -> None:
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.replace(tmp, dst)


def apply_upserts(
    spark: SparkSession,
    index_dir: str,
    updates: DataFrame,
    text_col: str = "content",
    doc_col: str = "doc_id",
    deleted_col: str | None = None,
) -> dict | None:
    """Apply one batch of upserts/deletes as a new delta generation.
    Returns the committed delta manifest (None for an empty batch)."""
    with open(os.path.join(index_dir, "index.json")) as f:
        m = json.load(f)
    if updates.isEmpty():
        return None
    gen = (_committed_gens(index_dir) or [0])[-1] + 1
    t0 = time.time()
    delta_dir = os.path.join(index_dir, "delta", f"gen={gen}")
    if os.path.exists(delta_dir):
        shutil.rmtree(delta_dir)  # uncommitted partial batch: rebuild

    updates = updates.withColumnRenamed(doc_col, "doc_id")
    is_deleted = F.col(deleted_col) if deleted_col else F.lit(False)
    live = updates.filter(~is_deleted)
    n_deletes = updates.filter(is_deleted).count()

    # postings of the new versions → encoded delta segments
    with_pos = bool(m.get("positions", False))
    tok = P.tokenized(live, text_col, "doc_id", m.get("analyzer", "simple"))
    post = (
        P.build_positional_postings(tok) if with_pos else P.build_postings(tok)
    ).withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(m["n_buckets"])).cast("int")
    )
    nbs = spark.read.parquet(os.path.join(index_dir, "stats.parquet")).select("term", "nb")
    salted = post.join(F.broadcast(nbs), "term", "left").withColumn(
        "nb", F.coalesce(F.col("nb"), F.lit(1))  # unseen term → one block
    ).withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.col("nb").cast("long")).cast("int")
    )
    segs = encode_segments(salted, with_pos, partitions=2)
    segs.withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(m["n_buckets"])).cast("int")) \
        .coalesce(2).sortWithinPartitions("bucket", "term", "salt") \
        .write.partitionBy("bucket").parquet(os.path.join(delta_dir, "segments"))

    # tombstones: EVERY updated doc kills its older generations
    updates.select("doc_id").distinct().write.parquet(
        os.path.join(delta_dir, "tombstones")
    )

    # docs table: exact N/avgdl (last-writer-wins swap; Iceberg MERGE analog)
    docs_path = os.path.join(index_dir, "docs")
    old = spark.read.parquet(docs_path)
    upd_ids = updates.select("doc_id").distinct()
    new_rows = tok.select("doc_id", "doc_len").withColumn("gen", F.lit(gen)) \
        .withColumn("deleted", F.lit(False))
    merged = old.join(upd_ids, "doc_id", "left_anti").unionByName(new_rows)
    tmp = docs_path + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    _swap_dir(tmp, docs_path)

    row = spark.read.parquet(docs_path).agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    from ..operators.segments import SEGMENT_READ_SCHEMA

    posting_count = int(
        spark.read.schema(SEGMENT_READ_SCHEMA)
        .parquet(os.path.join(delta_dir, "segments"))
        .agg(F.sum("count")).collect()[0][0] or 0
    )
    manifest = {
        "gen": gen,
        "snapshot_id": m.get("snapshot_id", ""),
        "n_docs": int(row["n"]),
        "avgdl": float(row["avgdl"] or 0.0),
        "n_upserts": int(live.count()),
        "n_deletes": int(n_deletes),
        "posting_count": posting_count,
        "build_metrics": {"secs": round(time.time() - t0, 3)},
        "committed": True,
    }
    _write_json_atomic(
        os.path.join(index_dir, f"delta_manifest_{gen:06d}.json"), manifest
    )
    return manifest


def fold_deltas(spark: SparkSession, index_dir: str) -> dict:
    """Compact all delta generations into a fresh exact base (the Lucene
    segment-merge analog): decode, drop superseded versions, re-plan block
    counts from exact df, re-encode, swap, drop deltas."""
    from ..operators.wand import _DECODED_SCHEMA, SegmentIndex, _decode_blocks

    with open(os.path.join(index_dir, "index.json")) as f:
        m = json.load(f)
    idx = SegmentIndex.load(spark, index_dir)
    with_pos = bool(m.get("positions", False))
    tomb = idx._tombstones()

    def drop_superseded(df):
        if tomb is None:
            return df
        return (
            df.join(F.broadcast(tomb), "doc_id", "left")
            .filter(F.col("tgen").isNull() | (F.col("tgen") <= F.col("gen")))
            .drop("tgen")
        )

    if with_pos:
        from ..operators.wand import _POS_SCHEMA, _decode_blocks_positions

        pos_rows = drop_superseded(
            idx._segments(None)
            .select("term", "gen", "docs_vb", "tfs_vb", "pos_vb")
            .mapInPandas(_decode_blocks_positions, _POS_SCHEMA)
        )
        # re-aggregate per-(term, doc) positions; exact doc_len from the
        # live docs table
        doc_lens = spark.read.parquet(os.path.join(index_dir, "docs"))             .select("doc_id", "doc_len")
        post = (
            pos_rows.groupBy("term", "doc_id")
            .agg(F.count(F.lit(1)).alias("tf"),
                 F.sort_array(F.collect_list("pos")).alias("positions"))
            .join(doc_lens, "doc_id")
        )
    else:
        decoded = drop_superseded(
            idx._segments(None)
            .select("term", "gen", "docs_vb", "tfs_vb", "dlens_vb")
            .mapInPandas(_decode_blocks, _DECODED_SCHEMA)
        )
        post = decoded.select("term", "doc_id", "tf", "doc_len")
    stats = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    planned = plan_block_counts(stats, m["target_block"], m["nb_max"])
    tmp_stats = os.path.join(index_dir, "stats.parquet.tmp")
    planned.write.mode("overwrite").parquet(tmp_stats)

    salted = post.join(
        F.broadcast(spark.read.parquet(tmp_stats).select("term", "nb")), "term"
    ).withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.col("nb").cast("long")).cast("int")
    )
    new_segs = encode_segments(salted, with_pos).withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(m["n_buckets"])).cast("int"))
    tmp_seg = os.path.join(index_dir, "segments.tmp")
    new_segs.coalesce(4).sortWithinPartitions("bucket", "term", "salt") \
        .write.partitionBy("bucket").mode("overwrite").parquet(tmp_seg)

    row = spark.read.parquet(os.path.join(index_dir, "docs")).agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    pc = int(spark.read.parquet(tmp_seg).agg(F.sum("count")).collect()[0][0] or 0)

    _swap_dir(tmp_seg, os.path.join(index_dir, "segments"))
    _swap_dir(tmp_stats, os.path.join(index_dir, "stats.parquet"))
    shutil.rmtree(os.path.join(index_dir, "delta"), ignore_errors=True)
    for mp in glob.glob(os.path.join(index_dir, "delta_manifest_*.json")):
        os.remove(mp)
    m.update(
        n_docs=int(row["n"]), avgdl=float(row["avgdl"] or 0.0),
        posting_count=pc, folded=True,
    )
    _write_json_atomic(os.path.join(index_dir, "index.json"), m)
    return m


def stream_ingest(
    spark: SparkSession,
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "content",
    doc_col: str = "doc_id",
    deleted_col: str | None = None,
):
    """Structured Streaming wrapper: micro-batch upserts via foreachBatch
    (the Kafka-consumer analog). Use .trigger(availableNow) semantics for
    drain-and-stop; checkpointing makes restarts resume from offsets the
    way the reference resumes from consumer-group offsets."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        apply_upserts(spark, index_dir, batch_df, text_col, doc_col, deleted_col)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
