"""more_like_this + field collapsing (operators/search_ext.py).

Pinned two ways: a pure-Python replay on a hand corpus (term-selection
heuristics, exclusion, per-group argmax tie-breaks) and the DuckDB
oracle builders on driver data (sf0.001) — the same double gate every
other query operator carries.
"""

from __future__ import annotations

import math
import re

import duckdb
import pytest

from content_rw_elasticsearch_spark import BM25_B, BM25_K1
from content_rw_elasticsearch_spark.engine import InMemoryIndex
from content_rw_elasticsearch_spark.operators.search_ext import (
    collapse_topk,
    mlt_select_terms,
    more_like_this,
)
from content_rw_elasticsearch_spark.oracle import (
    collapse_topk_sql,
    more_like_this_sql,
)

DOCS = [
    (1, "hash join build probe", "go"),
    (2, "hash join hash join", "go"),
    (3, "merge join sort runs", "py"),
    (4, "hash table probe scan", "py"),
    (5, "unrelated lorem ipsum", "rs"),
    (6, "hash join build probe extra", "rs"),
]


def _toks(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def _py_postings():
    post = {}
    for d, text, _ in DOCS:
        toks = _toks(text)
        for t in set(toks):
            post[(t, d)] = (toks.count(t), len(toks))
    return post


def _py_bm25_or(terms, exclude=None):
    post = _py_postings()
    n = len(DOCS)
    avgdl = sum(len(_toks(t)) for _, t, _ in DOCS) / n
    df = {}
    for (t, _d) in post:
        df[t] = df.get(t, 0) + 1
    scores = {}
    for (t, d), (tf, dl) in post.items():
        if t not in terms:
            continue
        idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
        w = idf * tf * (BM25_K1 + 1) / (tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl))
        scores[d] = scores.get(d, 0.0) + w
    if exclude is not None:
        scores.pop(exclude, None)
    return sorted(
        ((d, round(s, 4)) for d, s in scores.items()),
        key=lambda x: (-x[1], x[0]),
    )


@pytest.fixture(scope="module")
def idx(spark):
    corpus = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    ix = InMemoryIndex.build(corpus, text_col="text", doc_col="doc_id")
    yield ix
    ix.unpersist()


def test_mlt_select_terms_ranked_and_filtered(idx):
    # source doc 1 = "hash join build probe": all tf=1, so ranking is by
    # idf alone — rarer terms first (build/probe df=2|3… compute exactly)
    rows = mlt_select_terms(idx.postings, idx.n_docs, 1).collect()
    got = [r["term"] for r in rows]
    post = _py_postings()
    df = {}
    for (t, _d) in post:
        df[t] = df.get(t, 0) + 1
    n = len(DOCS)
    exp = sorted(
        ((t, round(1 * math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5)), 6)) for t in _toks(DOCS[0][1])),
        key=lambda x: (-x[1], x[0]),
    )
    assert got == [t for t, _ in exp]
    # min_doc_freq prunes singletons ("build"/"probe" have df 2; raise to 3)
    rows3 = mlt_select_terms(idx.postings, idx.n_docs, 1, min_doc_freq=3).collect()
    assert {r["term"] for r in rows3} == {t for t in _toks(DOCS[0][1]) if df[t] >= 3}
    # max_query_terms cuts after ranking
    rows2 = mlt_select_terms(idx.postings, idx.n_docs, 1, max_query_terms=2).collect()
    assert [r["term"] for r in rows2] == [t for t, _ in exp[:2]]


def test_more_like_this_vs_python_replay(idx):
    got = [(r["doc_id"], r["score"]) for r in
           more_like_this(idx.postings, idx.stats, idx.n_docs, idx.avgdl,
                          doc_id=1, k=10).collect()]
    terms = set(_toks(DOCS[0][1]))  # all 4 survive default filters
    exp = _py_bm25_or(terms, exclude=1)[:10]
    assert got == exp
    assert 1 not in [d for d, _ in got]  # source excluded


def test_more_like_this_empty_for_unknown_doc(idx):
    out = more_like_this(idx.postings, idx.stats, idx.n_docs, idx.avgdl,
                         doc_id=999, k=5)
    assert out.count() == 0
    assert out.columns == ["doc_id", "score"]


def test_collapse_best_per_group_and_tiebreak(spark, idx):
    corpus = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    got = [(r["group_key"], r["doc_id"], r["score"]) for r in
           collapse_topk(idx.postings, idx.stats, idx.n_docs, idx.avgdl,
                         "hash join", corpus, "lang", k=10).collect()]
    # python replay: per-lang argmax of (score, -doc_id), groups by score
    all_hits = dict(_py_bm25_or({"hash", "join"}))
    lang = {d: lg for d, _, lg in DOCS}
    best = {}
    for d, s in all_hits.items():
        lg = lang[d]
        cur = best.get(lg)
        if cur is None or (s, -d) > (cur[1], -cur[0]):
            best[lg] = (d, s)
    exp = sorted(((lg, d, s) for lg, (d, s) in best.items()),
                 key=lambda x: (-x[2], x[1]))
    assert got == exp
    # exactly one row per matched group
    assert len({g for g, _, _ in got}) == len(got)


def test_segment_mlt_matches_inmemory(spark, idx, tmp_path):
    from content_rw_elasticsearch_spark.operators.segments import build_segments
    from content_rw_elasticsearch_spark.operators.wand import SegmentIndex

    corpus = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    out = str(tmp_path / "mltidx")
    build_segments(corpus, out, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=8, nb_max=4)
    seg = SegmentIndex.load(spark, out)
    seg.prune_min_postings = 0  # force the pruned plan on the tiny corpus

    # segment-store collapse == logical collapse (same kernel, same data)
    got_c = [(r["group_key"], r["doc_id"], r["score"]) for r in
             seg.collapse("hash join", corpus, "lang", k=10).collect()]
    exp_c = [(r["group_key"], r["doc_id"], r["score"]) for r in
             collapse_topk(idx.postings, idx.stats, idx.n_docs, idx.avgdl,
                           "hash join", corpus, "lang", k=10).collect()]
    assert got_c == exp_c and got_c
    # AND mode: absent term → empty
    assert seg.collapse("hash zzznope", corpus, "lang", mode="AND").count() == 0

    for prune in (True, False):
        got = [(r["doc_id"], r["score"]) for r in
               seg.more_like_this(1, corpus, text_col="text", k=10,
                                  prune=prune).collect()]
        exp = [(r["doc_id"], r["score"]) for r in
               more_like_this(idx.postings, idx.stats, idx.n_docs,
                              idx.avgdl, doc_id=1, k=10).collect()]
        assert got == exp
    # missing source doc / selection yielding nothing → empty, same schema
    assert seg.more_like_this(999, corpus, text_col="text").count() == 0


def test_mlt_and_collapse_vs_duckdb_oracle(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    ix = InMemoryIndex.build(docs, text_col="text", doc_col="doc_id")
    try:
        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_smoke}/documents.parquet'"
        )
        got = [(r["doc_id"], r["score"]) for r in
               more_like_this(ix.postings, ix.stats, ix.n_docs, ix.avgdl,
                              doc_id=7, k=10, min_term_freq=2,
                              min_doc_freq=2).collect()]
        exp = con.sql(more_like_this_sql(7, k=10, min_term_freq=2,
                                         min_doc_freq=2)).fetchall()
        assert got == [(d, s) for d, s in exp]

        gotc = [(r["group_key"], r["doc_id"], r["score"]) for r in
                collapse_topk(ix.postings, ix.stats, ix.n_docs, ix.avgdl,
                              "hash join row", docs, "lang", k=10).collect()]
        expc = con.sql(collapse_topk_sql("hash join row", "lang", k=10)).fetchall()
        assert gotc == [(g, d, s) for g, d, s in expc]
    finally:
        ix.unpersist()


def test_explain_vs_duckdb_and_search_consistency(spark, idx, sf_smoke):
    from content_rw_elasticsearch_spark.operators.search_ext import (
        explain_score,
        explain_score_sql,
    )
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    from content_rw_elasticsearch_spark.engine import InMemoryIndex
    ix = InMemoryIndex.build(docs, text_col="text", doc_col="doc_id")
    try:
        got = [tuple(r) for r in
               explain_score(ix.postings, ix.stats, ix.n_docs, ix.avgdl,
                             "hash join row", 7).collect()]
        con = duckdb.connect()
        con.sql("CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_smoke}/documents.parquet'")
        exp = con.sql(explain_score_sql("hash join row", 7)).fetchall()
        assert got == exp and len(got) >= 1
        # the breakdown sums to the doc's OR-search score (both rounded
        # per-partial here, so compare within rounding slack)
        s = ix.search("hash join row", k=10_000, mode="OR")
        doc_score = [r["score"] for r in s.collect() if r["doc_id"] == 7]
        assert doc_score, "doc 7 must match the query"
        assert abs(sum(p for *_, p in got) - doc_score[0]) < 5e-4 * len(got)
    finally:
        ix.unpersist()


def test_segment_explain_matches_inmemory(spark, idx, tmp_path):
    from content_rw_elasticsearch_spark.operators.search_ext import (
        explain_score,
    )
    from content_rw_elasticsearch_spark.operators.segments import (
        build_segments,
    )
    from content_rw_elasticsearch_spark.operators.wand import SegmentIndex

    corpus = spark.createDataFrame(DOCS,
                                   "doc_id long, text string, lang string")
    out = str(tmp_path / "explidx")
    build_segments(corpus, out, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=8, nb_max=4)
    seg = SegmentIndex.load(spark, out)
    got = [tuple(r) for r in seg.explain("hash join", 1).collect()]
    exp = [tuple(r) for r in
           explain_score(idx.postings, idx.stats, idx.n_docs, idx.avgdl,
                         "hash join", 1).collect()]
    assert got == exp and len(got) == 2
    assert seg.explain("zzznope", 1).count() == 0
