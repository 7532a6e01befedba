"""Rank-identical BM25 checks vs an independent pure-Python oracle
(SURVEY.md §5: the reference's golden-equality style, applied to top-k)."""

from __future__ import annotations

import math
import re

import pytest

from content_rw_elasticsearch_spark.engine import InMemoryIndex
from content_rw_elasticsearch_spark.sources.corpus import (
    synthesize_corpus,
    with_doc_id,
)

K1, B = 1.2, 0.75


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def py_bm25_topk(docs: dict[int, str], query: str, k: int, mode: str):
    """Independent oracle: dict-based postings + exact BM25, no Spark."""
    toks = {d: _tok(t) for d, t in docs.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    terms = sorted(set(_tok(query)))
    scores: dict[int, tuple[float, int]] = {}
    for t in terms:
        df = sum(1 for v in toks.values() if t in v)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, v in toks.items():
            tf = v.count(t)
            if tf:
                s = idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(v) / avgdl))
                prev = scores.get(d, (0.0, 0))
                scores[d] = (prev[0] + s, prev[1] + 1)
    items = [
        (d, round(s, 4))
        for d, (s, nt) in scores.items()
        if mode != "AND" or nt == len(terms)
    ]
    items.sort(key=lambda x: (-x[1], x[0]))
    return items[:k]


@pytest.fixture(scope="module")
def corpus_and_index(spark):
    corpus = with_doc_id(synthesize_corpus(spark, 64, seed=42, parts=4))
    docs = {r["doc_id"]: r["content"] for r in corpus.collect()}
    idx = InMemoryIndex.build(corpus, "content", "doc_id", analyzer="simple")
    yield docs, idx
    idx.unpersist()


QUERIES = [
    ("return import", "AND", 10),
    ("varbyte", "AND", 10),
    ("saturate", "AND", 5),          # the hot/saturation doc
    ("longdoc filler", "AND", 10),   # length normalization
    ("quartz zephyr", "OR", 10),     # rare terms
    ("absentterm return", "AND", 10),  # empty
    ("return import self the", "AND", 20),  # all hot
]


@pytest.mark.parametrize("query,mode,k", QUERIES)
def test_rank_identical_vs_python_oracle(corpus_and_index, query, mode, k):
    docs, idx = corpus_and_index
    got = [(r["doc_id"], r["score"]) for r in idx.search(query, k=k, mode=mode).collect()]
    assert got == py_bm25_topk(docs, query, k, mode)


def test_bm25_saturation(corpus_and_index):
    """tf saturation: the hot doc (tf=500) must not score 500× a tf=1 doc."""
    docs, idx = corpus_and_index
    rows = idx.search("saturate", k=5).collect()
    assert rows, "hot doc must match"
    # upper bound of the saturating tf term: idf * (k1+1)
    n = len(docs)
    idf_max = math.log(1 + (n - 1 + 0.5) / 1.5)
    assert rows[0]["score"] <= idf_max * (K1 + 1) + 1e-6
