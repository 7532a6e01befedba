"""Regexp term queries, search_after keyset pagination, and facet
(terms-aggregation) counts over the segment store.

Pinned against pure-Python replays on a hand corpus plus the DuckDB
oracle builders on driver data (sf0.001).
"""

from __future__ import annotations

import re

import duckdb
import pytest

from content_rw_elasticsearch_spark.oracle import search_facets_sql
from content_rw_elasticsearch_spark.operators.segments import build_segments
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex

DOCS = [
    (1, "alpha beta gamma"),
    (2, "alpha stuff beta"),
    (3, "alphabet soup"),
    (4, "beta gamma gamma"),
    (5, "alpha alpha"),
    # score ties for the pagination tie-break walk: 6/7/8 are identical
    (6, "tie tie marker"),
    (7, "tie tie marker"),
    (8, "tie tie marker"),
]


def _toks(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


@pytest.fixture(scope="module")
def seg(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pf") / "idx")
    corpus = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_segments(corpus, out, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=8, nb_max=4)
    idx = SegmentIndex.load(spark, out)
    # force the TWO-PHASE pruned plan for the prune=True legs — the tiny
    # corpus would otherwise duck under the crossover threshold
    idx.prune_min_postings = 0
    return idx


def test_regexp_postings_vs_brute(seg):
    for pattern in ["alpha|beta", "alp.*", "gam+a", "zz.*"]:
        rx = re.compile(f"^(?:{pattern})$")
        want = sorted(
            (t, d, toks.count(t))
            for d, text in DOCS
            for toks in [_toks(text)]
            for t in set(toks)
            if rx.match(t)
        )
        got = [(r["term"], r["doc_id"], r["tf"]) for r in
               seg.regexp_postings(pattern).collect()]
        assert got == want, pattern


def test_regexp_prefix_consistency(seg):
    """A prefix query is the regexp 'p.*' — both expansions must agree."""
    a = [(r["term"], r["doc_id"], r["tf"]) for r in
         seg.prefix_postings("alp").collect()]
    b = [(r["term"], r["doc_id"], r["tf"]) for r in
         seg.regexp_postings("alp.*").collect()]
    assert a == b and a


def test_regexp_max_expansions_cap(seg):
    """Cap keeps the term-ascending FIRST expansions, like ES."""
    capped = {r["term"] for r in
              seg.regexp_postings(".*a.*", max_expansions=2).collect()}
    full = sorted({r["term"] for r in
                   seg.regexp_postings(".*a.*", max_expansions=50).collect()})
    assert capped == set(full[:2]) and len(full) > 2


@pytest.mark.parametrize("prune", [False, True])
def test_search_after_full_walk(seg, prune):
    """Paging 3-at-a-time reassembles the one-shot top-k exactly — no
    overlap, no skip — including across the 6/7/8 score ties (cursor
    includes doc_id, so identical scores page correctly)."""
    q, mode = "alpha beta tie", "OR"
    want = [(r["doc_id"], r["score"]) for r in
            seg.search(q, k=20, mode=mode, prune=prune).collect()]
    assert len(want) >= 7  # docs 1,2,4,5,6,7,8 match
    got, after = [], None
    while True:
        page = [(r["doc_id"], r["score"]) for r in
                seg.search(q, k=3, mode=mode, prune=prune,
                           after=after).collect()]
        if not page:
            break
        got.extend(page)
        after = (page[-1][1], page[-1][0])  # cursor is (score, doc_id)
    assert got == want


def test_search_after_pruned_equals_exhaustive(seg):
    cursor = None
    for _ in range(2):
        a = seg.search("alpha beta", k=2, mode="OR", prune=True,
                       after=cursor).collect()
        b = seg.search("alpha beta", k=2, mode="OR", prune=False,
                       after=cursor).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == \
            [(r["doc_id"], r["score"]) for r in b] and a
        cursor = (a[-1]["score"], a[-1]["doc_id"])


def test_facets_vs_brute(spark, seg):
    meta = spark.createDataFrame(
        [(d, "even" if d % 2 == 0 else "odd", f"g{d % 3}")
         for d, _ in DOCS],
        "doc_id long, parity string, grp string")
    got = [(r["facet"], r["value"], r["n"]) for r in
           seg.search_facets("alpha beta", meta, ["parity", "grp"],
                             mode="OR").collect()]
    # "alphabet" (doc 3) is a different term — not a match
    matched = [d for d, t in DOCS if {"alpha", "beta"} & set(_toks(t))]
    want = []
    for facet, fn in [("grp", lambda d: f"g{d % 3}"),
                      ("parity", lambda d: "even" if d % 2 == 0 else "odd")]:
        cnt: dict[str, int] = {}
        for d in matched:
            cnt[fn(d)] = cnt.get(fn(d), 0) + 1
        want.extend((facet, v, n) for v, n in cnt.items())
    want.sort(key=lambda x: (x[0], -x[2], x[1]))
    assert got == want and got


def test_facets_vs_duckdb_oracle(spark):
    """Engine facets over driver data == the DuckDB oracle builder."""
    sf = "/root/testdata/sf0.001"
    out = "/tmp/spark_graft_test_facets_idx"
    import shutil
    shutil.rmtree(out, ignore_errors=True)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    build_segments(docs, out, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=64, nb_max=4)
    idx = SegmentIndex.load(spark, out)
    got = [(r["facet"], str(r["value"]), r["n"]) for r in
           idx.search_facets("hash join", docs, ["lang", "source"],
                             mode="AND").collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = [(f, str(v), n) for f, v, n in
            con.execute(search_facets_sql(
                "hash join", ["lang", "source"], mode="AND")).fetchall()]
    assert got == want and len(got) > 2
    shutil.rmtree(out, ignore_errors=True)


def test_suggest_ranked_by_df(seg):
    """Completion suggester: prefix terms by df desc, term asc; k cuts."""
    # df per term from the hand corpus
    from collections import Counter
    df = Counter(t for _, text in DOCS for t in set(_toks(text)))
    want = sorted(((t, n) for t, n in df.items() if t.startswith("al")),
                  key=lambda x: (-x[1], x[0]))
    got = [(r["term"], r["df"]) for r in seg.suggest("al", k=10).collect()]
    assert got == want and got
    assert [(r["term"], r["df"]) for r in seg.suggest("al", k=1).collect()] \
        == want[:1]
    assert seg.suggest("zz").count() == 0


def test_suggest_vs_duckdb_oracle(spark):
    from content_rw_elasticsearch_spark.oracle import suggest_sql
    sf = "/root/testdata/sf0.001"
    out = "/tmp/spark_graft_test_suggest_idx"
    import shutil
    shutil.rmtree(out, ignore_errors=True)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    build_segments(docs, out, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=64, nb_max=4)
    idx = SegmentIndex.load(spark, out)
    got = [(r["term"], r["df"]) for r in idx.suggest("s", k=8).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.execute(suggest_sql("s", k=8)).fetchall()
    assert got == [(t, n) for t, n in want] and len(got) >= 6
    shutil.rmtree(out, ignore_errors=True)
