"""Positional index + phrase queries: naive relational path vs DuckDB
oracle vs positional segment store (incl. positions codec, upsert into a
positional index, and positional fold)."""

from __future__ import annotations

import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

from content_rw_elasticsearch_spark import oracle
from content_rw_elasticsearch_spark.operators import postings as P
from content_rw_elasticsearch_spark.operators import segments
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex
from content_rw_elasticsearch_spark.sources.corpus import synthesize_corpus, with_doc_id
from content_rw_elasticsearch_spark.streaming import ingest

OUT = "/tmp/spark_graft_test_posidx"

PHRASES = ["return import", "longdoc filler tokenizer", "tokenizer posting",
           "saturate saturate", "absent phrase"]


def _rows(df):
    return [(r["doc_id"], r["phrase_tf"]) for r in df.collect()]


@pytest.fixture(scope="module")
def built(spark):
    corpus = with_doc_id(synthesize_corpus(spark, 200, seed=5)).persist()
    shutil.rmtree(OUT, ignore_errors=True)
    segments.build_segments(
        corpus.select("doc_id", "content"), OUT, "content", "doc_id",
        n_buckets=4, target_block=32, nb_max=16, snapshot_id="pos-test",
        with_positions=True,
    )
    tok = P.tokenized(corpus, "content", "doc_id", "simple")
    pos_post = P.build_positional_postings(tok).persist()
    seg = SegmentIndex.load(spark, OUT)
    yield corpus, pos_post, seg
    pos_post.unpersist()
    corpus.unpersist()


@pytest.mark.parametrize("phrase", PHRASES)
def test_naive_phrase_vs_python(built, phrase):
    corpus, pos_post, _ = built
    terms = phrase.split()
    got = _rows(P.phrase_match(pos_post, terms))
    expect = []
    for r in sorted(corpus.collect(), key=lambda r: r["doc_id"]):
        toks = [t for t in __import__("re").split(r"[^a-z0-9]+", r["content"].lower()) if t]
        n = sum(
            1 for i in range(len(toks) - len(terms) + 1)
            if toks[i:i + len(terms)] == terms
        )
        if n:
            expect.append((r["doc_id"], n))
    assert got == expect


@pytest.mark.parametrize("phrase", PHRASES)
def test_segment_phrase_matches_naive(built, phrase):
    _, pos_post, seg = built
    naive = _rows(P.phrase_match(pos_post, phrase.split()))
    got = _rows(seg.phrase_search(phrase))
    assert got == naive


def test_phrase_oracle_duckdb(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    tok = P.tokenized(docs, "text", "doc_id", "simple")
    pos_post = P.build_positional_postings(tok)
    got = _rows(P.phrase_match(pos_post, ["hash", "join"]))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_smoke}/documents.parquet'")
    expect = [(r[0], r[1]) for r in con.sql(oracle.phrase_match_sql("hash join")).fetchall()]
    assert got == expect and len(got) > 0


def test_positional_upsert_and_fold(spark, built):
    """Upsert into a positional index: new phrases visible; fold keeps
    phrase results identical."""
    corpus, _, _ = built
    dst = "/tmp/spark_graft_test_posidx_upsert"
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(OUT, dst)
    up = spark.createDataFrame(
        [(4_242_001, "alpha beta gamma alpha beta", False)],
        "doc_id long, content string, deleted boolean",
    )
    ingest.apply_upserts(spark, dst, up, "content", "doc_id", "deleted")
    seg = SegmentIndex.load(spark, dst)
    assert _rows(seg.phrase_search("alpha beta")) == [(4_242_001, 2)]
    before = _rows(seg.phrase_search("return import"))
    ingest.fold_deltas(spark, dst)
    seg2 = SegmentIndex.load(spark, dst)
    assert seg2.generations == []
    assert _rows(seg2.phrase_search("alpha beta")) == [(4_242_001, 2)]
    assert _rows(seg2.phrase_search("return import")) == before
    shutil.rmtree(dst)
