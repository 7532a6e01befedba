"""ES bool-query composition (operators/boolquery): must / should /
must_not / minimum_should_match in one scored plan, logical and
segment-store variants, pinned against a pure-Python replay and the
engine's own primitive corners (AND / OR / NOT / msm).
"""

from __future__ import annotations

import math
import re

import pytest

from content_rw_elasticsearch_spark.engine import InMemoryIndex
from content_rw_elasticsearch_spark.operators.bm25 import bm25_topk
from content_rw_elasticsearch_spark.operators.boolquery import (
    bool_topk,
    segment_bool_topk,
)
from content_rw_elasticsearch_spark.operators.segments import build_segments
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex

BM25_K1, BM25_B = 1.2, 0.75

DOCS = [
    (1, "alpha beta gamma"),
    (2, "alpha beta dup"),          # killed by must_not=dup
    (3, "alpha gamma gamma"),
    (4, "alpha"),                   # must only, zero should terms
    (5, "beta gamma delta"),        # no must term
    (6, "alpha beta gamma delta"),
    (7, "dup dup"),
]


def _toks(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def _brute(must, should, must_not, msm=None, k=10):
    m, s, n = set(must.split()) if must else set(), \
        set(should.split()) if should else set(), \
        set(must_not.split()) if must_not else set()
    s -= m
    n -= m | s
    eff_msm = (0 if m else 1) if msm is None else msm
    n_docs = len(DOCS)
    dls = {d: len(_toks(t)) for d, t in DOCS}
    avgdl = sum(dls.values()) / n_docs
    toks = {d: _toks(t) for d, t in DOCS}
    allq = m | s | n
    df = {w: sum(1 for d in toks if w in toks[d]) for w in allq}
    out = []
    for d, _ in DOCS:
        pm = [w for w in m if w in toks[d]]
        ps = [w for w in s if w in toks[d]]
        pn = [w for w in n if w in toks[d]]
        if len(pm) != len(m) or pn or len(ps) < eff_msm:
            continue
        sc = 0.0
        for w in pm + ps:
            tf = float(toks[d].count(w))
            idf = math.log(1 + (n_docs - df[w] + 0.5) / (df[w] + 0.5))
            sc += idf * tf * (BM25_K1 + 1) / (
                tf + BM25_K1 * (1 - BM25_B + BM25_B * dls[d] / avgdl))
        out.append((d, round(sc, 4)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.fixture(scope="module")
def idx(spark):
    corpus = spark.createDataFrame(DOCS, "doc_id long, text string")
    i = InMemoryIndex.build(corpus, text_col="text", doc_col="doc_id")
    yield i
    i.unpersist()


@pytest.fixture(scope="module")
def seg(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bool") / "idx")
    corpus = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_segments(corpus, out, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=8, nb_max=4)
    return SegmentIndex.load(spark, out)


CASES = [
    dict(must="alpha", should="beta gamma", must_not="dup"),
    dict(must="alpha beta", should="", must_not=""),
    dict(must="", should="alpha beta gamma", must_not="", msm=2),
    dict(must="alpha", should="beta gamma delta", must_not="", msm=2),
    dict(must="", should="beta", must_not="dup"),
    dict(must="zzabsent", should="beta", must_not=""),   # empty
    dict(must="", should="beta", must_not="", msm=5),    # msm > |should|
]


@pytest.mark.parametrize("case", CASES)
def test_bool_logical_and_segment_vs_brute(idx, seg, case):
    msm = case.get("msm")
    want = _brute(case["must"], case["should"], case["must_not"], msm)
    got_l = [(r["doc_id"], r["score"]) for r in
             bool_topk(idx.postings, idx.stats, idx.n_docs, idx.avgdl,
                       must=case["must"], should=case["should"],
                       must_not=case["must_not"],
                       min_should_match=msm).collect()]
    got_s = [(r["doc_id"], r["score"]) for r in
             segment_bool_topk(seg, must=case["must"],
                               should=case["should"],
                               must_not=case["must_not"],
                               min_should_match=msm).collect()]
    assert got_l == want, f"logical {case}"
    assert got_s == want, f"segment {case}"


def test_bool_corners_match_primitives(idx):
    """must-only ≡ AND; should-only ≡ OR; must+must_not ≡ not_terms."""
    and_q = [(r["doc_id"], r["score"]) for r in
             idx.search("alpha beta", mode="AND").collect()]
    got = [(r["doc_id"], r["score"]) for r in
           bool_topk(idx.postings, idx.stats, idx.n_docs, idx.avgdl,
                     must="alpha beta").collect()]
    assert got == and_q and got

    or_q = [(r["doc_id"], r["score"]) for r in
            idx.search("alpha beta", mode="OR").collect()]
    got = [(r["doc_id"], r["score"]) for r in
           bool_topk(idx.postings, idx.stats, idx.n_docs, idx.avgdl,
                     should="alpha beta").collect()]
    assert got == or_q and got

    not_q = [(r["doc_id"], r["score"]) for r in
             bm25_topk(idx.postings, idx.stats, idx.n_docs, idx.avgdl,
                       "alpha beta", mode="AND",
                       not_terms=["dup"]).collect()]
    got = [(r["doc_id"], r["score"]) for r in
           bool_topk(idx.postings, idx.stats, idx.n_docs, idx.avgdl,
                     must="alpha beta", must_not="dup").collect()]
    assert got == not_q and got


def test_bool_should_boosts_within_must_matches(idx):
    """With must deciding the match, a doc also matching should terms
    outranks an otherwise-identical doc that doesn't."""
    rows = {r["doc_id"]: r["score"] for r in
            bool_topk(idx.postings, idx.stats, idx.n_docs, idx.avgdl,
                      must="alpha", should="delta").collect()}
    assert 4 in rows and 6 in rows
    assert rows[6] > rows[4]  # doc 6 has the should term 'delta'


def test_bool_fielded_scoping(spark, tmp_path):
    """On a fielded store, bool clauses scope to the queried field's
    composite keys and norms: the must-only corner is rank- AND
    score-identical to search(field=...), and must_not kills a doc only
    when the term is in THAT field."""
    from pyspark.sql import functions as F

    fields = {
        "title": F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 2)),
        "body": F.col("text"),
    }
    corpus = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = str(tmp_path / "bool_fielded")
    build_segments(corpus, out, text_col=None, doc_col="doc_id",
                   n_buckets=2, target_block=8, nb_max=4, fields=fields)
    idx = SegmentIndex.load(spark, out)
    for f in ("title", "body"):
        want = [(r["doc_id"], r["score"]) for r in
                idx.search("alpha beta", field=f, mode="AND").collect()]
        got = [(r["doc_id"], r["score"]) for r in
               segment_bool_topk(idx, must="alpha beta", field=f).collect()]
        assert got == want, f
        assert got or f == "title"  # body corner must be non-vacuous
    # doc 2 = "alpha beta dup": title is "alpha beta" (first 2 tokens),
    # so must_not="dup" kills it in the BODY scope but NOT in title
    title_hits = {r["doc_id"] for r in segment_bool_topk(
        idx, must="alpha beta", must_not="dup", field="title").collect()}
    body_hits = {r["doc_id"] for r in segment_bool_topk(
        idx, must="alpha beta", must_not="dup", field="body").collect()}
    assert 2 in title_hits and 2 not in body_hits
