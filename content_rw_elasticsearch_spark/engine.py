"""Engine facade: build an index over a corpus DataFrame, run queries.

`InMemoryIndex` is the naive/logical path (postings + stats as cached
DataFrames; every query is a declarative plan). The segment store
(operators/segments.py) is the physical at-rest path — same query results,
delta+varbyte-compressed, resumable. The naive path doubles as the
correctness oracle for the segment/WAND path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import bm25, postings as P


@dataclass
class InMemoryIndex:
    postings: DataFrame  # (term, doc_id, tf, doc_len)
    stats: DataFrame     # (term, df)
    n_docs: int
    avgdl: float
    analyzer: str = "simple"

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        text_col: str = "content",
        doc_col: str = "doc_id",
        analyzer: str = "simple",
        cache: bool = True,
    ) -> "InMemoryIndex":
        tok = P.tokenized(corpus, text_col, doc_col, analyzer)
        post = P.build_postings(tok)
        if cache:
            post = post.persist()
        stats = P.term_stats(post)
        if cache:
            stats = stats.persist()
        cs = P.corpus_stats(tok)
        return cls(postings=post, stats=stats, n_docs=cs.n_docs,
                   avgdl=cs.avgdl, analyzer=analyzer)

    def search(self, query: str, k: int = 10, mode: str = "AND",
               min_should_match: int | None = None) -> DataFrame:
        return bm25.bm25_topk(
            self.postings, self.stats, self.n_docs, self.avgdl,
            query, k=k, mode=mode, analyzer=self.analyzer,
            min_should_match=min_should_match,
        )

    def term_lookup(self, term: str) -> DataFrame:
        """Single-term postings fetch (the ES term-query analog), ordered."""
        return (
            self.postings.filter(F.col("term") == term)
            .select("doc_id", "tf")
            .orderBy("doc_id")
        )

    def unpersist(self) -> None:
        for df in (self.postings, self.stats):
            try:
                df.unpersist()
            except Exception:
                pass
