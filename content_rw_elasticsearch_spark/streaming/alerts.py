"""Streaming percolation — saved-search alerting on an ingest stream.

The percolator's natural habitat: every incoming micro-batch of
documents is matched against the stored-query table (the ES
percolate-on-ingest pattern the reference's ES cluster could run on the
same index the reference writes), and (batch_id, doc_id, query_id) hit
rows land in a parquet sink the alert consumer tails.

Crash semantics match the rest of the streaming layer: Structured
Streaming's foreachBatch is at-least-once, so each batch writes its
hits to its OWN directory keyed by batch_id with mode=overwrite — a
replayed batch overwrites its previous (possibly partial) output
instead of appending duplicates. Combined with the checkpointed source
offsets this gives exactly-once alert files without a transactional
sink.

Per-batch cost is the percolate plan: one broadcast join of the
(small) exploded stored-query relation into the batch + one
partial-aggregable (doc, query) count — the document stream is never
shuffled to meet the queries (see operators/percolate.py and the
SCALE.md percolator entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.percolate import percolate
from ..storage import join as pjoin


def stream_percolate(
    spark: SparkSession,
    stream_df: DataFrame,
    queries: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "content",
    doc_col: str = "doc_id",
    analyzer: str = "simple",
):
    """Drain ``stream_df`` with availableNow semantics, percolating each
    micro-batch against ``queries`` (query_id, query[, mode]) and
    writing hits to ``out_dir`` (one overwrite-by-batch_id subdir per
    batch — idempotent under replay). Returns the StreamingQuery; read
    results with read_alerts()."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # deterministic=False: the per-batch sink needs no output order
        # (read_alerts orders at read time), so the percolate plan skips
        # its corpus-sized global sort exchange
        hits = percolate(batch_df, queries, analyzer=analyzer,
                         text_col=text_col, doc_col=doc_col,
                         deterministic=False)
        (hits.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .parquet(pjoin(out_dir, f"batch_{int(batch_id)}")))

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_alerts(spark: SparkSession, out_dir: str) -> DataFrame:
    """All alert rows written so far: (batch_id, doc_id, query_id),
    deterministic order. A drained stream with ZERO batches (empty
    source) yields an explicit empty frame instead of the
    AnalysisException a bare glob read throws (ADVICE r5). The probe
    goes through the storage abstraction so URI stores (hdfs://,
    s3a://) are checked on the RIGHT filesystem, not the driver's
    local disk."""
    from .. import storage

    fs = storage.fs_for(out_dir, spark)
    if not fs.exists(out_dir) or not any(
            n.startswith("batch_") for n in fs.listdir(out_dir)):
        return spark.createDataFrame(
            [], "batch_id long, doc_id long, query_id long")
    return (
        spark.read.parquet(pjoin(out_dir, "batch_*"))
        .select("batch_id", "doc_id", "query_id")
        .orderBy("batch_id", "doc_id", "query_id")
    )
