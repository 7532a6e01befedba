"""Driver fast-path parity (round 6): the bounded pyarrow read + numpy
scoring path must return EXACTLY what the distributed plan returns, for
every branch of search() — exhaustive, forced-prune (θ-seed + keep
decode), AND/OR/msm, search_after cursors, and the empty corner. The
distributed twin is forced with driver_max_postings = 0."""

from __future__ import annotations

import shutil

import numpy as np
import pytest

from content_rw_elasticsearch_spark.functions.hashing import (
    xxh64_long,
    xxh64_long_np,
)
from content_rw_elasticsearch_spark.operators.segments import build_segments
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex

SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def seg_idx(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    out = "/tmp/test_fast_path_idx"
    shutil.rmtree(out, ignore_errors=True)
    build_segments(docs, out, text_col="text", doc_col="doc_id",
                   n_buckets=4, target_block=512, nb_max=64,
                   snapshot_id="fast-path-test")
    yield SegmentIndex.load(spark, out)
    shutil.rmtree(out, ignore_errors=True)


def _run(idx, q, mode, k, msm=None, after=None, prune=False, forced=False):
    saved = idx.prune_min_postings
    if forced:
        idx.prune_min_postings = 0
    try:
        return [
            (r["doc_id"], r["score"])
            for r in idx.search(q, k=k, mode=mode, prune=prune or forced,
                                min_should_match=msm, after=after).collect()
        ]
    finally:
        idx.prune_min_postings = saved


CASES = [
    ("hash join", "AND", 10, None),
    ("dup", "AND", 10, None),
    ("dup join", "AND", 10, None),
    ("vector batch scan", "OR", 10, None),
    ("merge sort window", "OR", 50, 2),
    ("join hash row scan small", "AND", 10, None),
    ("zzzabsent hash join", "AND", 10, None),
]


@pytest.mark.parametrize("q,mode,k,msm", CASES)
@pytest.mark.parametrize("forced", [False, True])
def test_fast_path_matches_distributed(seg_idx, q, mode, k, msm, forced):
    fast = _run(seg_idx, q, mode, k, msm=msm, forced=forced)
    seg_idx.driver_max_postings = 0
    try:
        slow = _run(seg_idx, q, mode, k, msm=msm, forced=forced)
    finally:
        seg_idx.driver_max_postings = 2_000_000
    assert fast == slow


def test_fast_path_search_after_parity(seg_idx):
    p1 = _run(seg_idx, "vector batch scan", "OR", 5)
    after = (p1[-1][1], p1[-1][0])
    fast = _run(seg_idx, "vector batch scan", "OR", 5, after=after,
                forced=True)
    seg_idx.driver_max_postings = 0
    try:
        slow = _run(seg_idx, "vector batch scan", "OR", 5, after=after,
                    forced=True)
    finally:
        seg_idx.driver_max_postings = 2_000_000
    assert fast == slow
    # pages must tile the one-shot top-10 exactly
    assert p1 + fast == _run(seg_idx, "vector batch scan", "OR", 10)


def test_meta_local_matches_spark(seg_idx):
    terms = ["hash", "join", "scan"]
    local = seg_idx._meta(terms)
    # force the Spark metadata path by hiding the local dir
    saved = seg_idx.path
    try:
        spark_meta = (
            seg_idx._segments(terms)
            .select("term", "gen", "salt", "nb", "count", "max_tf",
                    "min_dl")
            .toPandas()
        )
    finally:
        seg_idx.path = saved
    key = ["term", "gen", "salt"]
    a = local.sort_values(key).reset_index(drop=True)
    b = spark_meta.sort_values(key).reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_xxh64_long_np_parity():
    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.integers(-2**63, 2**63 - 1, 500, dtype=np.int64),
        np.array([0, 1, -1, 2**63 - 1, -(2**63), 42], dtype=np.int64),
    ])
    vec = xxh64_long_np(vals)
    for i in range(len(vals)):
        assert int(vec[i]) == xxh64_long(int(vals[i]))


def test_rows_df_roundtrips_doubles(seg_idx):
    rows = [(1, 0.1), (2, 1e-07), (3, 12.3456), (4, 0.15)]
    got = [(r["doc_id"], r["score"])
           for r in seg_idx._rows_df(rows).collect()]
    assert got == rows
    schema = seg_idx._rows_df(rows).schema.simpleString()
    assert schema == "struct<doc_id:bigint,score:double>"


def test_empty_df_schema(seg_idx):
    e = seg_idx._empty_df("doc_id long, score double")
    assert e.collect() == []
    assert e.schema.simpleString() == "struct<doc_id:bigint,score:double>"


@pytest.fixture(scope="module")
def pos_idx(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    out = "/tmp/test_fast_path_pos_idx"
    shutil.rmtree(out, ignore_errors=True)
    build_segments(docs, out, text_col="text", doc_col="doc_id",
                   n_buckets=4, target_block=512, nb_max=64,
                   snapshot_id="fast-path-pos", with_positions=True)
    yield SegmentIndex.load(spark, out)
    shutil.rmtree(out, ignore_errors=True)


@pytest.mark.parametrize("phrase", [
    "hash join", "customer data group", "customer", "zzzabsent join",
])
def test_phrase_fast_path_matches_distributed(pos_idx, phrase):
    def run():
        return [(r["doc_id"], r["phrase_tf"])
                for r in pos_idx.phrase_search(phrase).collect()]
    fast = run()
    pos_idx.driver_max_postings = 0
    try:
        slow = run()
    finally:
        pos_idx.driver_max_postings = 2_000_000
    assert fast == slow


def test_phrase_fast_path_within_classes(pos_idx):
    wc = [1, 5, 9, 33]

    def run():
        return [(r["doc_id"], r["phrase_tf"])
                for r in pos_idx.phrase_search("hash join",
                                               within_classes=wc).collect()]
    fast = run()
    pos_idx.driver_max_postings = 0
    try:
        slow = run()
    finally:
        pos_idx.driver_max_postings = 2_000_000
    assert fast == slow
