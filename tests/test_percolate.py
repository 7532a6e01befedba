"""Percolator (operators/percolate.py): reverse search — documents
matched against a table of stored queries. Pinned against the DuckDB
oracle builder on both a hand corpus and the driver's sf0.001
documents, plus semantic cases (AND containment vs OR intersection,
per-query mode column, empty query never matches, duplicate query
terms deduped).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from content_rw_elasticsearch_spark.operators.percolate import percolate
from content_rw_elasticsearch_spark.oracle import percolate_sql

DOCS = [
    (1, "hash join build probe"),
    (2, "merge sort runs"),
    (3, "hash table scan"),
    (4, "unrelated lorem ipsum"),
]
QUERIES = [
    (10, "hash join", "AND"),
    (11, "hash join", "OR"),
    (12, "merge merge sort", "AND"),   # dup term dedupes to {merge, sort}
    (13, "zzznope", "AND"),
    (14, "", "AND"),                   # empty query matches nothing
]


def _pairs(df):
    return [(r["doc_id"], r["query_id"]) for r in df.collect()]


@pytest.fixture(scope="module")
def qdf(spark):
    return spark.createDataFrame(
        QUERIES, "query_id long, query string, mode string")


def test_percolate_matches_duckdb_oracle(spark, qdf):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = _pairs(percolate(docs, qdf))
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    exp = con.sql(percolate_sql(QUERIES)).fetchall()
    assert got == [(d, q) for d, q in exp] and got


def test_percolate_semantics(spark, qdf):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = set(_pairs(percolate(docs, qdf)))
    # AND 'hash join': only doc 1 has both
    assert {(d, q) for d, q in got if q == 10} == {(1, 10)}
    # OR 'hash join': docs with either term (1 has both, 3 has hash)
    assert {d for d, q in got if q == 11} == {1, 3}
    # dedup: doc 2 has merge+sort once each, matches the dup-term AND
    assert (2, 12) in got
    # absent-term and empty queries match nothing
    assert not any(q in (13, 14) for _, q in got)


def test_percolate_default_mode_is_and(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(
        [(1, "hash join")], "query_id long, query string")
    got = _pairs(percolate(docs, qs, mode_col=None))
    assert got == [(1, 1)]


def test_percolate_on_driver_corpus(spark, sf_smoke):
    """sf0.001 documents against a small stored-query table, vs the
    oracle on the same parquet."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    queries = [(1, "hash join", "AND"), (2, "vector batch scan", "OR"),
               (3, "merge sort window", "AND")]
    qdf = spark.createDataFrame(
        queries, "query_id long, query string, mode string")
    got = _pairs(percolate(docs, qdf))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_smoke}/documents.parquet'")
    exp = con.sql(percolate_sql(queries)).fetchall()
    assert got == [(d, q) for d, q in exp] and len(got) > 10


def test_percolate_queries_side_is_broadcast(spark, qdf):
    """The stored-query relation joins as a broadcast — the document
    stream is never shuffled to meet it (SCALE.md percolate entry)."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = percolate(docs, qdf)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_stream_percolate_microbatches(spark, tmp_path, qdf):
    """Streaming alerting: two micro-batches percolated via foreachBatch
    must equal one batch percolation of all docs (percolate is per-doc),
    and a per-batch output dir exists for each batch (the
    overwrite-by-batch_id idempotency contract)."""
    from content_rw_elasticsearch_spark.streaming.alerts import (
        read_alerts,
        stream_percolate,
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(DOCS[:2], "doc_id long, text string") \
        .write.parquet(src + "/b1")
    spark.createDataFrame(DOCS[2:], "doc_id long, text string") \
        .write.parquet(src + "/b2")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(src + "/*")
    )
    out = str(tmp_path / "alerts")
    q = stream_percolate(spark, stream, qdf, out,
                         str(tmp_path / "ckpt"), text_col="text")
    q.awaitTermination(120)
    got = [(r["doc_id"], r["query_id"]) for r in
           read_alerts(spark, out).collect()]
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    exp = [(r["doc_id"], r["query_id"]) for r in
           percolate(docs, qdf).collect()]
    assert sorted(got) == sorted(exp) and got
    import glob
    assert len(glob.glob(out + "/batch_*")) >= 2
