"""Sharded / alias search (operators/wand.search_sharded): querying N
shard indexes must return EXACTLY what a single index over the union
corpus returns — the distributed-search property ES gets from
df-merged (dfs_query_then_fetch) scoring, and the property a
partitioned 10^12-file build depends on.

Pinned three ways: sharded ≡ single-index (same engine, same data),
sharded ≡ DuckDB oracle (independent replay), and the delta path
(a tombstone in one shard ≡ the same tombstone in the union index).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from content_rw_elasticsearch_spark.operators.segments import build_segments
from content_rw_elasticsearch_spark.operators.wand import (
    SegmentIndex,
    search_sharded,
)
from content_rw_elasticsearch_spark.oracle import bm25_topk_sql

DOCS = [
    (1, "hash join build probe"),
    (2, "hash join hash join"),
    (3, "merge join sort runs"),
    (4, "hash table probe scan join"),
    (5, "unrelated lorem ipsum"),
    (6, "hash join build probe extra"),
    (7, "scan filter project join"),
    (8, "extra shardonly term hash"),
    (9, "join hash merge extra"),
]
N_SHARDS = 3


def _build(spark, docs, out, **kw):
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    build_segments(corpus, out, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=8, nb_max=4, **kw)
    ix = SegmentIndex.load(spark, out)
    ix.prune_min_postings = 0
    return ix


@pytest.fixture(scope="module")
def single(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shard_single") / "idx")
    return _build(spark, DOCS, out)


@pytest.fixture(scope="module")
def shards(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("shards")
    out = []
    for s in range(N_SHARDS):
        part = [d for d in DOCS if d[0] % N_SHARDS == s]
        out.append(_build(spark, part, str(base / f"s{s}")))
    return out


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.mark.parametrize("query,mode", [
    ("hash join", "AND"),
    ("hash join", "OR"),
    ("join", "AND"),
    ("merge sort lorem", "OR"),
    ("hash extra", "AND"),      # 'extra' absent from some shards
    ("shardonly", "AND"),       # term exclusive to one shard
    ("zzznope join", "AND"),    # absent term => empty
])
def test_sharded_equals_single_index(single, shards, query, mode):
    got = _rows(search_sharded(shards, query, k=10, mode=mode))
    exp = _rows(single.search(query, k=10, mode=mode))
    assert got == exp


def test_sharded_matches_duckdb_oracle(shards):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    got = _rows(search_sharded(shards, "hash join", k=10, mode="OR"))
    exp = con.sql(bm25_topk_sql("hash join", k=10, mode="OR")).fetchall()
    assert got == [(d, s) for d, s in exp] and got


def test_sharded_tombstone_parity(spark, tmp_path):
    """Deleting a doc in ONE shard must equal deleting it in the union
    index — stats (n_docs/avgdl) and postings both follow the delta."""
    from content_rw_elasticsearch_spark.streaming.ingest import apply_upserts

    sh = []
    for s in range(2):
        part = [d for d in DOCS if d[0] % 2 == s]
        sh.append(str(tmp_path / f"t{s}"))
        _build(spark, part, sh[s])
    uni = str(tmp_path / "uni")
    _build(spark, DOCS, uni)

    # delete doc 2 (lives in shard 0: 2 % 2 == 0)
    dead = spark.createDataFrame(
        [(2, None, True)], "doc_id long, text string, deleted boolean")
    apply_upserts(spark, sh[0], dead, text_col="text", deleted_col="deleted")
    apply_upserts(spark, uni, dead, text_col="text", deleted_col="deleted")

    shards = [SegmentIndex.load(spark, p) for p in sh]
    single = SegmentIndex.load(spark, uni)
    for ix in shards + [single]:
        ix.prune_min_postings = 0
    for mode in ("AND", "OR"):
        got = _rows(search_sharded(shards, "hash join", k=10, mode=mode))
        exp = _rows(single.search("hash join", k=10, mode=mode))
        assert got == exp
        assert 2 not in {d for d, _ in got}


def test_sharded_validation(spark, shards, tmp_path):
    with pytest.raises(ValueError, match="at least one"):
        search_sharded([], "x")
    # analyzer mismatch
    other = _build(spark, DOCS[:3], str(tmp_path / "code"), analyzer="code")
    with pytest.raises(ValueError, match="analyzer"):
        search_sharded([shards[0], other], "x")


def test_sharded_single_shard_degenerate(single, shards):
    """One shard == that shard alone; the global-stats merge must reduce
    to the shard's own stats."""
    got = _rows(search_sharded([single], "hash join", k=10, mode="AND"))
    exp = _rows(single.search("hash join", k=10, mode="AND"))
    assert got == exp


@pytest.mark.parametrize("msm", [1, 2, 3])
def test_sharded_min_should_match(single, shards, msm):
    """msm parity across shards: a doc's terms all live in its own shard,
    so sharded msm must equal the single union index's msm exactly
    (including the shard-skip for shards with < msm present terms)."""
    q = "hash merge extra"
    got = _rows(search_sharded(shards, q, k=10, mode="OR",
                               min_should_match=msm))
    exp = _rows(single.search(q, k=10, mode="OR", min_should_match=msm))
    assert got == exp and got


def test_sharded_random_split_property(spark, tmp_path):
    """Property: for a randomized corpus and an arbitrary 3-way shard
    assignment, sharded search ≡ the single union index on every query —
    seeded cases chosen to cover empty shards, dup-heavy docs, and
    single-term docs (a fixed-seed property sweep; full hypothesis
    machinery would rebuild indexes per example and is too slow here)."""
    import random
    rng = random.Random(42)
    vocab = ["hash", "join", "scan", "merge", "sort", "probe", "row",
             "tree", "leaf", "node"]
    docs = [(i, " ".join(rng.choices(vocab, k=rng.randint(1, 12))))
            for i in range(1, 31)]
    assign = {d: rng.randint(0, 2) for d, _ in docs}
    single = _build(spark, docs, str(tmp_path / "uni"))
    shards = []
    for s in range(3):
        part = [x for x in docs if assign[x[0]] == s]
        if part:
            shards.append(_build(spark, part, str(tmp_path / f"s{s}")))
    for q, mode in [("hash join", "AND"), ("hash join", "OR"),
                    ("merge sort probe", "OR"), ("tree leaf", "AND"),
                    ("node", "AND")]:
        got = _rows(search_sharded(shards, q, k=15, mode=mode))
        exp = _rows(single.search(q, k=15, mode=mode))
        assert got == exp, (q, mode)


def test_sharded_filter_context(spark, single, shards):
    """filter_ids across the alias ≡ the single index's filter context
    (scores untouched, only even doc_ids kept)."""
    ids = spark.createDataFrame(
        [(d,) for d, _ in DOCS if d % 2 == 0], "doc_id long")
    got = _rows(search_sharded(shards, "hash join", k=10, mode="OR",
                               filter_ids=ids))
    exp = _rows(single.search("hash join", k=10, mode="OR",
                              filter_ids=ids))
    assert got == exp and got
    assert all(d % 2 == 0 for d, _ in got)
