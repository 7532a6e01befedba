"""Round-6 fix pins: rollover keeps a rolling batch's deletes,
percolate's global sort is optional (same hit set either way), and
read_alerts tolerates a zero-batch stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from content_rw_elasticsearch_spark.maintenance import (
    load_alias,
    rollover_ingest,
)
from content_rw_elasticsearch_spark.operators.percolate import percolate
from content_rw_elasticsearch_spark.operators.wand import search_sharded
from content_rw_elasticsearch_spark.streaming.alerts import read_alerts


def test_rollover_applies_deletes_on_rollover_boundary(spark, tmp_path):
    """A mixed upsert+delete batch that triggers a rollover must
    tombstone its deletes in the previous active shard (ADVICE r5: they
    were silently dropped on that path)."""
    alias = str(tmp_path / "alias")
    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "alpha gamma")],
        "doc_id long, content string")
    rollover_ingest(spark, alias, b1, max_docs=3, n_buckets=2,
                    target_block=64, nb_max=4)
    # batch 2: rolls over (active holds 3 >= max_docs) AND deletes doc 2
    b2 = spark.createDataFrame(
        [(10, "delta alpha", False), (2, "", True)],
        "doc_id long, content string, deleted boolean")
    shards = rollover_ingest(spark, alias, b2, max_docs=3,
                             deleted_col="deleted", n_buckets=2,
                             target_block=64, nb_max=4)
    assert len(shards) == 2
    hits = {r["doc_id"] for r in search_sharded(
        load_alias(spark, alias), "beta", k=10, mode="OR").collect()}
    assert 2 not in hits          # the delete survived the rollover
    assert 1 in hits


def test_rollover_upsert_replaces_across_boundary(spark, tmp_path):
    """An upsert of a doc living in the previous active shard must not
    leave a stale duplicate there when the batch rolls over — the
    rolling batch has the same effect the non-rollover path would
    (code-review finding on the ADVICE r5 delete fix)."""
    alias = str(tmp_path / "alias2")
    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "alpha gamma")],
        "doc_id long, content string")
    rollover_ingest(spark, alias, b1, max_docs=3, n_buckets=2,
                    target_block=64, nb_max=4)
    # batch 2 rolls over AND overwrites doc 2 (drops 'beta' from it)
    b2 = spark.createDataFrame(
        [(2, "delta omega"), (10, "alpha delta")],
        "doc_id long, content string")
    shards = rollover_ingest(spark, alias, b2, max_docs=3, n_buckets=2,
                             target_block=64, nb_max=4)
    assert len(shards) == 2
    idxs = load_alias(spark, alias)
    beta = [(r["doc_id"], r["score"]) for r in search_sharded(
        idxs, "beta", k=10, mode="OR").collect()]
    # the old copy of doc 2 (which contained 'beta') is tombstoned
    assert 2 not in {d for d, _ in beta}
    omega = [r["doc_id"] for r in search_sharded(
        idxs, "omega", k=10, mode="OR").collect()]
    assert omega.count(2) == 1    # exactly one live copy, the new one


def test_percolate_deterministic_flag_same_hits(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma"), (3, "alpha gamma")],
        "doc_id long, text string")
    queries = spark.createDataFrame(
        [(100, "alpha", "AND"), (200, "alpha gamma", "OR")],
        "query_id long, query string, mode string")
    a = {(r["doc_id"], r["query_id"])
         for r in percolate(docs, queries).collect()}
    b = {(r["doc_id"], r["query_id"])
         for r in percolate(docs, queries, deterministic=False).collect()}
    assert a == b and a
    # the flag's point: no global Sort in the non-deterministic plan
    plan = percolate(docs, queries, deterministic=False) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Sort " not in plan


def test_read_alerts_empty_stream_dir(spark, tmp_path):
    out = str(tmp_path / "alerts_out")
    df = read_alerts(spark, out)
    assert df.collect() == []
    assert [f.name for f in df.schema.fields] == [
        "batch_id", "doc_id", "query_id"]
