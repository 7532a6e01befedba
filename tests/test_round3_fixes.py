"""Round-3 hardening pins: SimHash tokenizer parity + empty-doc safety,
ANN dim parameter (no probe job), multi-table LSH recall, HadoopFS
manifest-rewrite commits."""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from content_rw_elasticsearch_spark import storage
from content_rw_elasticsearch_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.001"


# --- SimHash ---------------------------------------------------------------

def test_simhash_unicode_whitespace_parity(spark):
    """The plan splits with Java \\s (ASCII whitespace only); the replay
    must tokenize identically for text containing Unicode whitespace
    (\\u00a0, \\u2028, \\x85 are NOT separators on either side now)."""
    texts = [
        "foo\u00a0bar baz",      # nbsp glues foo+bar into ONE token
        "a\u2028b c",            # line separator glues a+b
        "x\x85y\tz",             # NEL glues x+y; tab splits
        "plain ascii words",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["fp"]
        for r in dedup.simhash_fingerprints(df, "text", "doc_id").collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == dedup.simhash64_py(t), repr(t)


def test_simhash_pairs_exclude_empty_docs(spark):
    """Two empty/whitespace-only docs must NOT pair (they'd both
    fingerprint to 0); identical non-empty docs still pair at Hamming 0."""
    df = spark.createDataFrame(
        [(0, ""), (1, "  \t "), (2, "same tokens here"),
         (3, "same tokens here")],
        "doc_id long, text string",
    )
    pairs = [(r["d1"], r["d2"], r["hamming"])
             for r in dedup.simhash_pairs(df, "text", "doc_id").collect()]
    assert pairs == [(2, 3, 0)]


# --- ANN -------------------------------------------------------------------

def _no_first(monkeypatch):
    def boom(self, *a, **k):
        raise AssertionError("ANN plan ran a .first() probe job despite dim=")
    monkeypatch.setattr(DataFrame, "first", boom)


def test_ann_dim_param_skips_probe_job(spark, monkeypatch):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    _no_first(monkeypatch)
    for fn in (similarity.ann_lsh_topk, similarity.ann_multiprobe_topk,
               similarity.ann_multitable_topk):
        df = fn(spark, emb, [0, 7], k=3, dim=64)
        assert df.count() >= 0  # plan builds and runs without the probe


def test_multitable_recall_beats_single_table(spark):
    """L independent tables must recover at least as many true neighbors
    as one table, and strictly more on this pinned dataset."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qids = [0, 7, 42, 99, 123]
    exact = {(r["query_id"], r["neighbor_id"])
             for r in similarity.cosine_topk(spark, emb, qids, k=5).collect()}
    single = {(r["query_id"], r["neighbor_id"])
              for r in similarity.ann_lsh_topk(
                  spark, emb, qids, k=5, dim=64).collect()}
    multi = {(r["query_id"], r["neighbor_id"])
             for r in similarity.ann_multitable_topk(
                 spark, emb, qids, k=5, n_tables=3, dim=64).collect()}
    r_single = len(single & exact) / len(exact)
    r_multi = len(multi & exact) / len(exact)
    assert r_multi >= r_single
    assert r_multi > r_single  # pinned: 3 tables recover extra neighbors


# --- storage ---------------------------------------------------------------

def test_hadoopfs_manifest_rewrite(spark, tmp_path):
    """Manifest UPDATE commits (fold/merge re-point index.json) must
    OVERWRITE through the Hadoop filesystem path — FileSystem.rename
    returns false on an existing destination on HDFS/S3A, so the commit
    goes through FileContext rename(OVERWRITE)."""
    base = f"file://{tmp_path}"
    fs = storage.HadoopFS(spark, base)
    path = f"{base}/index.json"
    storage.write_json_atomic(fs, path, {"v": 1})
    storage.write_json_atomic(fs, path, {"v": 2})  # the UPDATE commit
    assert storage.read_json(fs, path) == {"v": 2}
    assert not fs.exists(path + ".tmp")


def test_hadoopfs_rename_fallback_overwrites(spark, tmp_path):
    """The no-FileContext fallback (delete-then-rename) must also land the
    update."""
    base = f"file://{tmp_path}"
    fs = storage.HadoopFS(spark, base)
    fs._fc = None  # force the fallback branch
    path = f"{base}/index.json"
    storage.write_json_atomic(fs, path, {"v": 1})
    storage.write_json_atomic(fs, path, {"v": 2})
    assert storage.read_json(fs, path) == {"v": 2}


# --- WAND crossover auto-tune ---------------------------------------------

def test_prune_crossover_derived_from_manifest(spark):
    from content_rw_elasticsearch_spark.operators.wand import SegmentIndex
    m = {"posting_count": 280_000_000, "build_metrics": {"stage2_secs": 100.0}}
    c = SegmentIndex._derive_crossover(spark, m)
    assert 100_000 <= c <= 10_000_000
    # no metrics -> keep the static default
    assert SegmentIndex._derive_crossover(spark, {}) is None
    # tiny index -> clamps to the floor, so small corpora stay exhaustive
    tiny = {"posting_count": 12_000, "build_metrics": {"stage2_secs": 2.0}}
    assert SegmentIndex._derive_crossover(spark, tiny) == 100_000
