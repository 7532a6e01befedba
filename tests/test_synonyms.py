"""Synonym queries (SegmentIndex.search_synonyms): Lucene SynonymQuery
semantics — each query term's synonym set scores as ONE pseudo-term
(per-doc tf summed across members, df = max member df, one idf per
set); AND requires every SET matched by any member. Pinned against the
DuckDB oracle builder (the driver-gate SQL) and by hand-derived
semantic cases the oracle can't express (group-level AND, absent-set
behavior, overlap with plain search when no synonyms fire).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from content_rw_elasticsearch_spark.operators.segments import build_segments
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex
from content_rw_elasticsearch_spark.oracle import synonym_topk_sql

DOCS = [
    (1, "fast hash join"),
    (2, "quick merge join"),
    (3, "rapid scan join"),
    (4, "slow table scan"),
    (5, "fast quick rapid join"),
    (6, "join join join"),
]
SYN = {"fast": ["quick", "rapid"]}


def _con():
    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    return con


@pytest.fixture(scope="module")
def seg(spark, tmp_path_factory):
    corpus = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("synidx") / "idx")
    build_segments(corpus, out, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=8, nb_max=4)
    ix = SegmentIndex.load(spark, out)
    ix.prune_min_postings = 0
    return ix


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.mark.parametrize("query,mode", [
    ("fast join", "AND"),
    ("fast join", "OR"),
    ("fast", "AND"),
    ("fast slow", "OR"),
])
def test_synonyms_match_duckdb_oracle(seg, query, mode):
    got = _rows(seg.search_synonyms(query, SYN, k=10, mode=mode))
    con = _con()
    exp = con.sql(synonym_topk_sql(query, SYN, k=10, mode=mode)).fetchall()
    assert got == [(d, s) for d, s in exp] and got


def test_synonym_set_matches_as_group(seg):
    """AND 'fast join': docs 2 and 3 contain no 'fast' but match via
    quick/rapid — the set counts as matched."""
    got = {d for d, _ in _rows(
        seg.search_synonyms("fast join", SYN, k=10, mode="AND"))}
    assert got == {1, 2, 3, 5}


def test_absent_set_semantics(seg):
    # AND: a synonym set with no member in the corpus empties the query
    assert seg.search_synonyms(
        "zzz join", {"zzz": ["yyy"]}, k=10, mode="AND").count() == 0
    # OR: the absent set is skipped, the rest still scores
    got = {d for d, _ in _rows(seg.search_synonyms(
        "zzz join", {"zzz": ["yyy"]}, k=10, mode="OR"))}
    assert got == {1, 2, 3, 5, 6}
    # and an absent term that EXPANDS to a present synonym matches
    got2 = {d for d, _ in _rows(seg.search_synonyms(
        "zzz join", {"zzz": ["scan"]}, k=10, mode="AND"))}
    assert got2 == {3}
    con = _con()
    exp = con.sql(synonym_topk_sql(
        "zzz join", {"zzz": ["scan"]}, k=10, mode="AND")).fetchall()
    assert sorted(got2) == sorted(d for d, _ in exp)


def test_no_synonyms_equals_plain_search(seg):
    """With an empty synonym map the SynonymQuery degenerates to the
    plain per-term BM25 — same docs, same scores."""
    got = _rows(seg.search_synonyms("hash join", {}, k=10, mode="AND"))
    exp = _rows(seg.search("hash join", k=10, mode="AND"))
    assert got == exp and got


def test_tf_sums_across_members(seg):
    """Doc 5 has fast+quick+rapid (set tf=3); with df shared (max), it
    must outscore doc 1 (tf=1) on the single-set query."""
    got = _rows(seg.search_synonyms("fast", SYN, k=10, mode="AND"))
    scores = dict(got)
    assert scores[5] > scores[1]
