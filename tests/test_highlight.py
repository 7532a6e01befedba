"""Snippet highlighting (operators/highlight.py + SegmentIndex.highlight):
best window = the window-token span anchored at a query-term position
covering the most DISTINCT query terms, leftmost on ties; snippet is the
analyzed-token span. Pinned against a pure-Python replay and hand docs.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from content_rw_elasticsearch_spark.operators import postings as P
from content_rw_elasticsearch_spark.operators.highlight import highlight_topk
from content_rw_elasticsearch_spark.operators.segments import build_segments
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex

DOCS = [
    # doc 1: both terms adjacent late; early lone 'alpha' (leftmost lone
    # window must LOSE to the 2-distinct window)
    (1, "alpha filler filler filler filler filler alpha beta tail"),
    (2, "beta filler alpha"),                       # both within window=4
    (3, "alpha filler filler filler filler beta"),  # apart > window=4
    (4, "gamma beta gamma"),
    (5, "alpha"),                                   # short doc, window > len
]
W = 4


def _toks(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def _brute(doc_text, terms, window):
    toks = _toks(doc_text)
    anchors = [i for i, t in enumerate(toks) if t in terms]
    best = None
    for a in anchors:
        nt = len({toks[j] for j in range(a, min(a + window, len(toks)))}
                 & set(terms))
        if best is None or nt > best[1]:
            best = (a, nt)
    start, nt = best
    return " ".join(toks[start:start + window]), nt


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").persist()


def test_highlight_topk_logical(spark, corpus):
    """Generic operator over logical positional postings."""
    tok = P.tokenized(corpus, "text", "doc_id", "simple")
    pos_post = P.build_positional_postings(tok).select(
        "term", "doc_id", F.explode("positions").alias("pos"))
    topk = spark.createDataFrame(
        [(1, 2.0), (2, 1.5), (3, 1.0), (5, 0.5)], "doc_id long, score double")
    got = {
        r["doc_id"]: (r["snippet"], r["n_window_terms"])
        for r in highlight_topk(topk, pos_post.select("term", "doc_id", "pos"),
                                corpus, ["alpha", "beta"], "text", "doc_id",
                                window=W).collect()
    }
    for d, text in DOCS:
        if d in got:
            assert got[d] == _brute(text, {"alpha", "beta"}, W), f"doc {d}"
    # doc 1: the 2-term window beats the leftmost lone-alpha window
    assert got[1] == ("alpha beta tail", 2)
    # doc 5: window longer than the doc
    assert got[5] == ("alpha", 1)
    # every top-k doc got exactly one snippet row
    assert set(got) == {1, 2, 3, 5}


def test_segment_highlight_end_to_end(spark, corpus, tmp_path):
    out = str(tmp_path / "hl")
    build_segments(corpus, out, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=8, nb_max=4,
                   with_positions=True)
    idx = SegmentIndex.load(spark, out)
    rows = idx.highlight("alpha beta", corpus, text_col="text",
                         doc_col="doc_id", k=5, mode="OR", window=W).collect()
    got = {r["doc_id"]: (r["snippet"], r["n_window_terms"]) for r in rows}
    assert set(got) == {1, 2, 3, 4, 5}
    for d, text in DOCS:
        assert got[d] == _brute(text, {"alpha", "beta"}, W), f"doc {d}"
    # scores match plain search (highlight never changes ranking)
    want = [(r["doc_id"], r["score"]) for r in
            idx.search("alpha beta", k=5, mode="OR").collect()]
    assert [(r["doc_id"], r["score"]) for r in rows] == want
    # ties resolve leftmost: doc 4 has beta once -> window starts at beta
    assert got[4] == ("beta gamma", 1)
    # non-positional index refuses
    out2 = str(tmp_path / "hl_nopos")
    build_segments(corpus, out2, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=8, nb_max=4)
    with pytest.raises(ValueError, match="positional"):
        SegmentIndex.load(spark, out2).highlight("alpha", corpus, "text")


def test_highlight_after_upsert(spark, corpus, tmp_path):
    """Snippets reflect delta generations: an updated doc highlights its
    NEW text (tombstones drop the stale positions)."""
    from content_rw_elasticsearch_spark.streaming.ingest import apply_upserts

    out = str(tmp_path / "hl_delta")
    build_segments(corpus, out, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=8, nb_max=4,
                   with_positions=True)
    new_text = "rewritten beta alpha close"
    apply_upserts(spark, out, spark.createDataFrame(
        [(3, new_text, False)], "doc_id long, content string, deleted boolean"),
        "content", "doc_id", "deleted")
    updated = corpus.withColumn(
        "text", F.when(F.col("doc_id") == 3, F.lit(new_text))
        .otherwise(F.col("text")))
    idx = SegmentIndex.load(spark, out)
    got = {r["doc_id"]: (r["snippet"], r["n_window_terms"]) for r in
           idx.highlight("alpha beta", updated, text_col="text",
                         doc_col="doc_id", k=5, mode="OR", window=W).collect()}
    assert got[3] == ("beta alpha close", 2)


def test_highlight_class_cut_path_is_identical(spark, tmp_path):
    """The class-cut decode path (forced via pos_classes_min_docs=0)
    must produce exactly the lazy path's snippets — exactness comes from
    highlight_topk's join to the k hit ids."""
    from content_rw_elasticsearch_spark.operators.segments import (
        build_segments,
    )
    from content_rw_elasticsearch_spark.operators.wand import SegmentIndex
    docs = [(i, f"alpha beta gamma doc{i} hash join probe") for i in
            range(1, 9)]
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    out = str(tmp_path / "hlidx")
    build_segments(corpus, out, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=8, nb_max=16,
                   with_positions=True)
    ix = SegmentIndex.load(spark, out)
    ix.prune_min_postings = 0
    kw = dict(text_col="text", doc_col="doc_id", k=3, mode="AND")
    lazy = [tuple(r) for r in
            ix.highlight("hash join", corpus, **kw).collect()]
    ix.pos_classes_min_docs = 0  # force the class-cut path (k=3 <= 16/4)
    cut = [tuple(r) for r in
           ix.highlight("hash join", corpus, **kw).collect()]
    assert cut == lazy and cut
