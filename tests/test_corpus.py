"""Corpus determinism + ingest invariant (BASELINE.json input_hint)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from content_rw_elasticsearch_spark.engine import InMemoryIndex
from content_rw_elasticsearch_spark.sources.corpus import (
    synthesize_corpus,
    with_content_sha,
    with_doc_id,
)


def test_synthesis_partition_independent(spark):
    """Same corpus regardless of parallelism — docID/content are pure
    functions of the row id (SURVEY.md §7 hard part 1)."""
    a = sorted(synthesize_corpus(spark, 50, parts=2).collect())
    b = sorted(synthesize_corpus(spark, 50, parts=16).collect())
    assert a == b


def test_corpus_shape_and_edges(spark):
    df = with_doc_id(synthesize_corpus(spark, 32))
    assert df.columns == ["repo", "path", "commit", "lang", "content", "doc_id"]
    rows = df.collect()
    assert next(r for r in rows if r["path"] == "src/pkg0/mod_0.py")["content"] == ""
    dups = [r for r in rows if r["path"] == "src/dup/mod.py"]
    assert len(dups) == 2 and dups[0]["doc_id"] != dups[1]["doc_id"]
    assert df.select("doc_id").distinct().count() == 32


def test_content_sha256_invariant(spark):
    """Per-row sha256(content) equality through the full index build —
    the pipeline must never mutate source content (reference analog:
    byte-identical uuid-keyed upserts, pkg/es/service.go:119-128)."""
    corpus = with_content_sha(with_doc_id(synthesize_corpus(spark, 40)))
    before = {r["doc_id"]: r["content_sha256"] for r in corpus.collect()}
    idx = InMemoryIndex.build(corpus, "content", "doc_id")
    idx.search("return", k=5).collect()  # exercise the pipeline
    after = {
        r["doc_id"]: hashlib.sha256(r["content"].encode()).hexdigest()
        for r in corpus.collect()
    }
    assert before == after
    idx.unpersist()
