"""match_phrase_prefix (SegmentIndex.phrase_prefix_search): exact chain
+ last-term prefix expansion (lexicographic, capped) matched as a
MultiPhraseQuery. Pinned against the DuckDB oracle and by semantic
cases: expansion cap changes matches, bare-prefix degenerates to
any-expansion occurrence counts, absent exact terms empty the result.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from content_rw_elasticsearch_spark.operators.segments import build_segments
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex
from content_rw_elasticsearch_spark.oracle import phrase_prefix_sql

DOCS = [
    (1, "hash join build"),
    (2, "hash joiner build"),
    (3, "hash joint venture"),
    (4, "hash table join"),
    (5, "merge join hash"),
    (6, "hash jab"),
]


def _con():
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    return con


@pytest.fixture(scope="module")
def seg(spark, tmp_path_factory):
    corpus = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("ppidx") / "idx")
    build_segments(corpus, out, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=8, nb_max=4,
                   with_positions=True)
    return SegmentIndex.load(spark, out)


def _rows(df):
    return [(r["doc_id"], r["phrase_tf"]) for r in df.collect()]


@pytest.mark.parametrize("phrase,maxe", [
    ("hash j", 50),      # joins docs 1,2,3,6 (join/joiner/joint/jab)
    ("hash jo", 50),     # 1,2,3
    ("hash join", 50),   # exact term is also a prefix of joiner/joint
    ("merge j", 50),
    ("j", 50),           # bare prefix: occurrence counts
])
def test_phrase_prefix_matches_oracle(seg, phrase, maxe):
    got = _rows(seg.phrase_prefix_search(phrase, max_expansions=maxe))
    con = _con()
    exp = con.sql(phrase_prefix_sql(phrase, max_expansions=maxe)).fetchall()
    assert got == [(d, t) for d, t in exp] and got


def test_phrase_prefix_expansion_cap(seg):
    """max_expansions truncates the LEXICOGRAPHIC dictionary order: with
    cap 1 only 'jab' (first j-term) survives — doc 6 only."""
    got = _rows(seg.phrase_prefix_search("hash j", max_expansions=1))
    assert {d for d, _ in got} == {6}
    con = _con()
    exp = con.sql(phrase_prefix_sql("hash j", max_expansions=1)).fetchall()
    assert got == [(d, t) for d, t in exp]


def test_phrase_prefix_edges(seg):
    # absent exact term => empty
    assert seg.phrase_prefix_search("zzz j").count() == 0
    # prefix with no expansion => empty
    assert seg.phrase_prefix_search("hash zzz").count() == 0
    # non-positional index refuses
    assert "phrase_tf" in seg.phrase_prefix_search("hash j").columns
