"""Percolator — reverse search: match a batch of DOCUMENTS against a
table of STORED QUERIES (the ES percolate query; the reference's ES
serving cluster exposes it on the same index the reference writes —
configs/referenceSchema.json is the document side of that contract).

The classic use: alerting/routing on an ingest stream — "which saved
searches does this new document satisfy?" — which composes directly
with streaming/ingest.stream_ingest's foreachBatch.

Spark-first design (NO driver-side query loop, unlike a naive port of
ES's per-doc in-memory percolation):
  * stored queries tokenize ONCE into an exploded (query_id, term)
    relation with per-query term counts — queries are the SMALL side and
    broadcast; documents are the streamed side (ES percolator likewise
    pre-indexes queries, not documents);
  * documents tokenize with the same vectorized analyzer the index build
    uses, keeping DISTINCT terms per doc (matching is set-membership,
    frequencies don't matter);
  * one broadcast equi-join on term + one partial-aggregable
    (doc, query) count: AND queries match when the count equals the
    query's term count, OR queries when >= 1. No shuffle is
    document-count-sized except the final (doc, query) aggregation,
    which is bounded by actual term overlaps.

At 100 TB of incoming docs this is a map-side join per micro-batch —
the stored-query relation is tiny next to any batch — and hot terms
skew only the aggregation's (doc_id, query_id) keys, which are already
maximally granular.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analyzer import analyzer_column


def percolate(docs: DataFrame, queries: DataFrame,
              analyzer: str = "simple", text_col: str = "text",
              doc_col: str = "doc_id", query_id_col: str = "query_id",
              query_col: str = "query",
              mode_col: str | None = "mode",
              deterministic: bool = True) -> DataFrame:
    """→ (doc_id, query_id) pairs where the document matches the stored
    query. ``queries`` columns: query_id, query text, and (optionally)
    a mode column with 'AND'/'OR' per query — absent means all AND.
    Matching is term-set containment (AND) / intersection (OR) under the
    shared analyzer, the percolator's match semantics for term queries.
    ``deterministic=True`` (default) totally orders the result by
    (doc_id, query_id) for gate/oracle stability; pass False on bulk
    paths — the global sort is a full extra exchange that exists only
    for reproducible output order (VERDICT r5 #7: a corpus-sized hit
    set pays a range-partition sort for nothing when the consumer
    re-orders or doesn't care)."""
    mode_expr = (F.upper(F.col(mode_col)) if mode_col is not None
                 and mode_col in queries.columns else F.lit("AND"))
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            mode_expr.alias("mode"),
            F.explode(
                F.array_distinct(analyzer_column(F.col(query_col), analyzer))
            ).alias("term"),
        )
    )
    qsizes = qterms.groupBy("query_id", "mode").agg(
        F.count(F.lit(1)).alias("n_terms"))
    dterms = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.explode(
            F.array_distinct(analyzer_column(F.col(text_col), analyzer))
        ).alias("term"),
    )
    hits = (
        dterms.join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .join(F.broadcast(qsizes), "query_id")
        .filter((F.col("mode") == "OR") | (F.col("n_hit") == F.col("n_terms")))
    )
    out = hits.select("doc_id", "query_id")
    return out.orderBy("doc_id", "query_id") if deterministic else out
