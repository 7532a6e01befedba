"""Round-5 query-surface additions: ES bool.filter context
(SegmentIndex.search filter_ids), rescore (top-window phrase re-rank),
and function_score/field_value_factor — each pinned against its DuckDB
oracle builder (the same SQL the driver gate runs) plus semantic edge
cases the oracle can't express (filter never changes scores, window
containment, pruned ≡ unpruned under a filter).
"""

from __future__ import annotations

import re

import duckdb
import pandas as pd
import pytest

from content_rw_elasticsearch_spark.operators.segments import build_segments
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex
from content_rw_elasticsearch_spark.oracle import (
    bm25_topk_sql,
    function_score_sql,
    rescore_sql,
)

DOCS = [
    (1, "hash join build probe", "go"),
    (2, "hash join hash join", "go"),
    (3, "merge join sort runs", "py"),
    (4, "hash table probe scan join", "py"),
    (5, "unrelated lorem ipsum", "rs"),
    (6, "hash join build probe extra", "rs"),
]


def _con():
    con = duckdb.connect()
    pdf = pd.DataFrame(DOCS, columns=["doc_id", "text", "lang"])
    pdf["n_chars"] = pdf["text"].str.len()
    con.register("documents", pdf)
    return con


@pytest.fixture(scope="module")
def seg(spark, tmp_path_factory):
    corpus = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string")
    out = str(tmp_path_factory.mktemp("fltidx") / "idx")
    build_segments(corpus, out, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=8, nb_max=4,
                   with_positions=True)
    ix = SegmentIndex.load(spark, out)
    ix.prune_min_postings = 0  # force the pruned plan on the tiny corpus
    return ix


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


# ---- filter context ------------------------------------------------------

def test_filter_restricts_without_rescoring(spark, seg, corpus):
    base = dict(_rows(seg.search("hash join", k=10, mode="AND")))
    ids = corpus.filter(corpus.lang == "go").select("doc_id")
    got = _rows(seg.search("hash join", k=10, mode="AND", filter_ids=ids))
    assert {d for d, _ in got} == {1, 2}
    # ES filter context: scores are EXACTLY the unfiltered scores
    for d, s in got:
        assert s == base[d]


def test_filter_pruned_equals_unpruned(seg, corpus):
    ids = corpus.filter(corpus.lang != "rs").select("doc_id")
    a = _rows(seg.search("hash join", k=3, mode="AND",
                         prune=True, filter_ids=ids))
    b = _rows(seg.search("hash join", k=3, mode="AND",
                         prune=False, filter_ids=ids))
    assert a == b and a


def test_filter_matches_duckdb_oracle(seg, corpus):
    got = _rows(seg.search("hash join", k=10, mode="AND",
                           filter_ids=corpus.filter(corpus.lang == "go")
                           .select("doc_id")))
    con = _con()
    exp = con.sql(
        bm25_topk_sql("hash join", k=10, mode="AND",
                      filter_where="lang = 'go'")).fetchall()
    assert got == [(d, s) for d, s in exp]


def test_filter_empty_set(seg, corpus):
    ids = corpus.filter(corpus.lang == "zz").select("doc_id")
    assert seg.search("hash join", k=10, filter_ids=ids).count() == 0


# ---- rescore -------------------------------------------------------------

def test_rescore_matches_duckdb_oracle(seg):
    got = _rows(seg.rescore("join", "hash join", k=5, window_size=6))
    con = _con()
    exp = con.sql(
        rescore_sql("join", "hash join", k=5, window_size=6)).fetchall()
    assert got == [(d, s) for d, s in exp] and got


def test_rescore_weights_and_window(seg):
    # window_size=2 → only the BM25 top-2 of "join" can appear, even
    # though other docs contain the phrase (ES window semantics)
    win = {d for d, _ in _rows(seg.search("join", k=2, mode="AND"))}
    got = {d for d, _ in _rows(
        seg.rescore("join", "hash join", k=5, window_size=2))}
    assert got == win
    con = _con()
    exp = con.sql(
        rescore_sql("join", "hash join", k=5, window_size=2)).fetchall()
    assert sorted(got) == sorted(d for d, _ in exp)
    # rescore_weight=0 → pure qw-scaled window ranking
    flat = _rows(seg.rescore("join", "hash join", k=3, window_size=6,
                             query_weight=2.0, rescore_weight=0.0))
    base = _rows(seg.search("join", k=3, mode="AND"))
    assert [d for d, _ in flat] == [d for d, _ in base]
    assert all(abs(fs - 2.0 * bs) < 1e-9
               for (_, fs), (_, bs) in zip(flat, base))


def test_rescore_absent_phrase_term_is_passthrough(seg):
    got = _rows(seg.rescore("join", "zzznope join", k=4, window_size=6))
    base = _rows(seg.search("join", k=4, mode="AND"))
    assert got == base
    con = _con()
    exp = con.sql(
        rescore_sql("join", "zzznope join", k=4, window_size=6)).fetchall()
    assert got == [(d, s) for d, s in exp]


def test_rescore_promotes_phrase_docs(seg):
    """Doc 4 matches 'hash join' (AND) but not the phrase; with a heavy
    rescore weight every phrase doc must outrank it."""
    got = _rows(seg.rescore("hash join", "hash join", k=4, window_size=6,
                            rescore_weight=10.0))
    ranks = {d: i for i, (d, _) in enumerate(got)}
    assert ranks[4] == max(ranks.values())  # the only phrase-less doc last


# ---- function_score ------------------------------------------------------

def test_function_score_matches_duckdb_oracle(spark, seg, corpus):
    from pyspark.sql import functions as F
    docs = corpus.withColumn("n_chars", F.length("text"))
    for modifier, boost_mode in (("log1p", "multiply"), ("sqrt", "sum"),
                                 ("none", "multiply")):
        got = _rows(seg.function_score("hash join", docs, "n_chars", k=10,
                                       mode="AND", modifier=modifier,
                                       boost_mode=boost_mode))
        con = _con()
        exp = con.sql(function_score_sql(
            "hash join", k=10, mode="AND", modifier=modifier,
            boost_mode=boost_mode)).fetchall()
        assert got == [(d, s) for d, s in exp] and got, (modifier, boost_mode)


def test_function_score_reranks(spark, seg, corpus):
    """A huge linear boost on n_chars must rank the longest matching doc
    first regardless of BM25 order."""
    from pyspark.sql import functions as F
    docs = corpus.withColumn("n_chars", F.length("text"))
    got = _rows(seg.function_score("hash join", docs, "n_chars", k=10,
                                   mode="AND", modifier="none",
                                   boost_mode="sum", factor=1000.0))
    lens = {d: len(t) for d, t, _ in DOCS}
    assert lens[got[0][0]] == max(
        lens[d] for d, _ in got)


def test_function_score_validation(seg, corpus):
    with pytest.raises(ValueError):
        seg.function_score("x", corpus, "n_chars", modifier="bogus")
    with pytest.raises(ValueError):
        seg.function_score("x", corpus, "n_chars", boost_mode="bogus")


def test_analyzer_parity_of_test_corpus():
    """The hand corpus must tokenize identically under the oracle's regex
    (guards the test itself against analyzer drift)."""
    for _, text, _ in DOCS:
        assert [x for x in re.split(r"[^a-z0-9]+", text.lower()) if x]


def test_filter_composes_with_pagination(seg, corpus):
    """filter_ids + search_after: two filtered cursor pages must equal
    the filtered one-shot top-4 (the same page-fidelity contract the
    unfiltered cursor is gated on)."""
    ids = corpus.filter(corpus.lang != "rs").select("doc_id")
    one_shot = _rows(seg.search("join", k=4, mode="AND", filter_ids=ids))
    p1 = _rows(seg.search("join", k=2, mode="AND", filter_ids=ids))
    last = p1[-1]
    p2 = _rows(seg.search("join", k=2, mode="AND", filter_ids=ids,
                          after=(last[1], last[0])))
    assert p1 + p2 == one_shot and len(one_shot) == 4


def test_rescore_with_slop(seg):
    """slop>0 rescoring uses the proximity form: doc 4 has 'hash
    [table] probe' (one interleaved token) — exact rescore gives it no
    boost, slop=1 does; both legs match the oracle."""
    exact = _rows(seg.rescore("hash join", "hash probe", k=6,
                              window_size=6, rescore_weight=5.0))
    sloppy = _rows(seg.rescore("hash join", "hash probe", k=6,
                               window_size=6, rescore_weight=5.0, slop=1))
    con = _con()
    assert exact == [(d, s) for d, s in con.sql(
        rescore_sql("hash join", "hash probe", k=6, window_size=6,
                    rescore_weight=5.0)).fetchall()]
    assert sloppy == [(d, s) for d, s in con.sql(
        rescore_sql("hash join", "hash probe", k=6, window_size=6,
                    rescore_weight=5.0, slop=1)).fetchall()]
    assert dict(sloppy)[4] > dict(exact)[4]  # slop boost fired for doc 4


def test_phrase_search_within_classes_is_exact(seg):
    """within_classes is an exact class cut: restricting to one class
    returns precisely the full result's docs whose salt class equals it
    (blocks of a class hold only that class's docs)."""
    from pyspark.sql import functions as F
    full = {r["doc_id"]: r["phrase_tf"]
            for r in seg.phrase_search("hash join").collect()}
    cls_of = {r["doc_id"]: r["c"] for r in seg.spark.createDataFrame(
        [(d,) for d in full], "doc_id long").select(
        "doc_id", F.pmod(F.xxhash64(F.col("doc_id")),
                         F.lit(seg.nb_max)).cast("int").alias("c")
    ).collect()}
    for c in sorted(set(cls_of.values())):
        got = {r["doc_id"]: r["phrase_tf"] for r in
               seg.phrase_search("hash join", within_classes=[c]).collect()}
        assert got == {d: t for d, t in full.items() if cls_of[d] == c}


def test_rescore_materialized_window_path(seg):
    """window_size <= nb_max/4 AND a big-enough corpus takes the
    materialized+class-cut path (forced here via the overridable
    threshold, like prune_min_postings); results must match the oracle
    exactly like the lazy path does."""
    saved = seg.pos_classes_min_docs
    seg.pos_classes_min_docs = 0
    try:
        got = _rows(seg.rescore("join", "hash join", k=1, window_size=1))
    finally:
        seg.pos_classes_min_docs = saved
    con = _con()
    exp = con.sql(
        rescore_sql("join", "hash join", k=1, window_size=1)).fetchall()
    assert got == [(d, s) for d, s in exp] and got
