"""ES compound-query family completion (constant_score, boosting,
dis_max — bool and function_score already exist): each pinned against
its DuckDB oracle on a hand corpus plus semantic cases (demotion flips
rank order, tie_breaker=1 degenerates to sum-of-scores, constant_score
never computes BM25).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from content_rw_elasticsearch_spark.operators.segments import build_segments
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex
from content_rw_elasticsearch_spark.oracle import (
    boosting_sql,
    constant_score_sql,
    dis_max_sql,
)

DOCS = [
    (1, "hash join build probe"),
    (2, "hash join deprecated legacy"),
    (3, "merge join sort runs"),
    (4, "hash table probe scan join"),
    (5, "unrelated lorem ipsum"),
    (6, "hash join build probe extra"),
]


def _con():
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    return con


@pytest.fixture(scope="module")
def seg(spark, tmp_path_factory):
    corpus = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("compidx") / "idx")
    build_segments(corpus, out, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=8, nb_max=4)
    ix = SegmentIndex.load(spark, out)
    ix.prune_min_postings = 0
    return ix


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_constant_score_matches_oracle(seg):
    got = _rows(seg.constant_score("hash join", boost=2.5, k=3))
    con = _con()
    exp = con.sql(constant_score_sql("hash join", boost=2.5, k=3)).fetchall()
    assert got == [(d, s) for d, s in exp] and got
    assert all(s == 2.5 for _, s in got)


def test_boosting_matches_oracle_and_demotes(seg):
    got = _rows(seg.boosting("hash join", "deprecated legacy",
                             negative_boost=0.1, k=10))
    con = _con()
    exp = con.sql(boosting_sql("hash join", "deprecated legacy",
                               negative_boost=0.1, k=10)).fetchall()
    assert got == [(d, s) for d, s in exp] and got
    # doc 2 matches the negative query — it must rank LAST among matches
    ranks = {d: i for i, (d, _) in enumerate(got)}
    assert ranks[2] == max(ranks.values())
    # negative_boost=1.0 degenerates to the plain positive ranking
    flat = _rows(seg.boosting("hash join", "deprecated", 1.0, k=10))
    base = _rows(seg.search("hash join", k=10, mode="AND", prune=False))
    assert flat == base


@pytest.mark.parametrize("tb", [0.0, 0.3, 1.0])
def test_dis_max_matches_oracle(seg, tb):
    qs = ["hash probe", "merge sort"]
    got = _rows(seg.dis_max(qs, tie_breaker=tb, k=10))
    con = _con()
    exp = con.sql(dis_max_sql(qs, tie_breaker=tb, k=10)).fetchall()
    assert got == [(d, s) for d, s in exp] and got


def test_dis_max_semantics(seg):
    """tie_breaker=0: docs matching both subqueries score only the best;
    raising it strictly increases their combined score while
    single-subquery docs stay put."""
    lo = dict(_rows(seg.dis_max(["hash probe", "table scan"], 0.0, k=10)))
    hi = dict(_rows(seg.dis_max(["hash probe", "table scan"], 0.5, k=10)))
    # doc 4 matches both subqueries
    assert hi[4] > lo[4]
    # doc 1 matches only the first — identical either way
    assert hi[1] == lo[1]


# ---- joining queries (has_child / has_parent) ---------------------------

RELATIONS = [(1, 100), (2, 100), (3, 200), (4, 200), (6, 300)]
# children 1,2 → parent 100; 3,4 → 200; 6 → 300; doc 5 is an orphan


@pytest.fixture(scope="module")
def rel(spark):
    return spark.createDataFrame(RELATIONS, "doc_id long, parent_id long")


@pytest.mark.parametrize("score_mode", ["max", "sum", "avg", "none"])
def test_has_child_matches_oracle(seg, rel, score_mode):
    from content_rw_elasticsearch_spark.oracle import has_child_sql
    got = [(r["parent_id"], r["score"]) for r in
           seg.has_child("hash join", rel, k=10,
                         score_mode=score_mode).collect()]
    con = _con()
    exp = con.sql(has_child_sql("hash join", RELATIONS, k=10,
                                score_mode=score_mode)).fetchall()
    assert got == [(p, s) for p, s in exp] and got


def test_has_child_semantics(seg, rel):
    """Parent 100 has TWO matching children (1, 2); sum > max for it,
    while single-child parents are unchanged between the modes."""
    mx = dict((r["parent_id"], r["score"]) for r in
              seg.has_child("hash join", rel, score_mode="max").collect())
    sm = dict((r["parent_id"], r["score"]) for r in
              seg.has_child("hash join", rel, score_mode="sum").collect())
    assert sm[100] > mx[100]
    assert sm[300] == mx[300]
    # orphan doc 5 never produces a parent; parent 200's child 3 lacks
    # 'hash' in AND mode but child 4 matches
    assert set(mx) == {100, 200, 300}
    with pytest.raises(ValueError, match="score_mode"):
        seg.has_child("x", rel, score_mode="bogus")


@pytest.mark.parametrize("score", [False, True])
def test_has_parent_matches_oracle(seg, spark, score):
    from content_rw_elasticsearch_spark.oracle import has_parent_sql
    # parents are docs 1/3 (by id); children carry parent_id pointing
    # at them — reuse DOCS ids as a two-level family
    fam = [(2, 1), (4, 1), (6, 3)]
    rel2 = spark.createDataFrame(fam, "doc_id long, parent_id long")
    got = [(r["doc_id"], r["score"]) for r in
           seg.has_parent("hash join", rel2, k=10, score=score).collect()]
    con = _con()
    exp = con.sql(has_parent_sql("hash join", fam, k=10,
                                 score=score)).fetchall()
    assert got == [(d, s) for d, s in exp] and got
    # parent 3 ('merge join sort runs') fails AND 'hash join' → child 6 out
    assert {d for d, _ in got} == {2, 4}


def test_describe_reports_index_health(spark, seg, tmp_path):
    """describe(): metadata-only stats row — doc counts match ground
    truth, postings equal total tokens, no binary column in any scan's
    ReadSchema, and a delete shows up in docs_deleted."""
    row = seg.describe().collect()[0]
    n_tokens = sum(len(t.split()) for _, t in [(d, x) for d, x in
                   [(r[0], r[1]) for r in DOCS]])
    assert row["n_docs"] == len(DOCS) == row["docs_live"]
    assert row["docs_deleted"] == 0
    assert row["n_postings"] > 0 and row["n_terms"] > 0
    assert row["delta_generations"] == 0 and row["fields"] == []
    # token conservation: postings count == distinct (doc, term) pairs
    import re
    pairs = {(d, w) for d, t in DOCS
             for w in re.split(r"[^a-z0-9]+", t.lower()) if w}
    assert row["n_postings"] == len(pairs)
    assert n_tokens >= len(pairs)
    plan = seg.describe()._jdf.queryExecution().executedPlan().toString()
    for col in ("docs_vb", "tfs_vb", "dlens_vb", "pos_vb"):
        read_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert all(col not in ln for ln in read_lines), plan
    # a delete is visible in the health row
    from content_rw_elasticsearch_spark.streaming.ingest import apply_upserts
    import shutil
    out2 = str(tmp_path / "didx")
    shutil.copytree(seg.path, out2)
    dead = spark.createDataFrame(
        [(1, None, True)], "doc_id long, text string, deleted boolean")
    apply_upserts(spark, out2, dead, text_col="text", deleted_col="deleted")
    ix2 = SegmentIndex.load(spark, out2)
    r2 = ix2.describe().collect()[0]
    assert r2["docs_deleted"] == 1 and r2["docs_live"] == len(DOCS) - 1
    assert r2["delta_generations"] == 1


def test_count_matches_match_set(seg):
    """_count == the match-set size, for AND/OR/msm shapes, and equals
    the DuckDB oracle's count over the same predicate."""
    con = _con()
    for mode, msm in (("AND", None), ("OR", None), ("OR", 2)):
        got = seg.count("hash join probe", mode=mode,
                        min_should_match=msm).collect()[0]["count"]
        need = {"AND": 3, "OR": 1}[mode] if msm is None else msm
        exp = con.sql(f"""
            WITH docs AS (SELECT doc_id,
              list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                          x -> x <> '') AS toks FROM documents),
            post AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM docs)
            SELECT count(*) FROM (
              SELECT doc_id FROM post
              WHERE term IN ('hash', 'join', 'probe')
              GROUP BY doc_id HAVING count(*) >= {need})
        """).fetchall()[0][0]
        assert got == exp, (mode, msm)
        assert got > 0
