"""Block-max pruned top-k query execution over the segment store.

Distributed block-max WAND (SURVEY.md §2.F/§2.J): because the segment
salting is doc-aligned across terms (segments.py — salt classes are nested
powers of two of the SAME hash of doc_id), a global salt class g is a
"block" in the WAND sense: for every query term t its contribution to any
doc in g is bounded by idf_t · max_partial(t, g % nb_t). So:

  phase 0  metadata-only scan: (term, salt, nb, count, max_partial) for
           the query terms — parquet reads NONE of the binary posting
           columns (column pruning) and prunes files/row-groups by term
           (bucket directory + min/max sort). Collected to the driver:
           ≤ |q|·NB_MAX tiny rows.
  phase 1  seed the threshold θ: exactly score the most-promising global
           classes (highest upper bound) until ≥ k docs are fully scored;
           θ = k-th best true score. A doc's score in a kept class is
           always its FULL score (every term's compatible block is
           decoded), so θ is a valid lower bound on the true k-th score.
  phase 2  prune: keep classes with ub(g) ≥ θ; decode only those blocks,
           score exactly (same columnar BM25 expressions as the naive
           path — no UDF in scoring), take top-k.

Correctness argument: a dropped class g has ub(g) < θ ≤ true k-th score,
and every doc's true score is ≤ ub(its class), so dropped docs cannot be
in the true top-k. Stray docs decoded via a coarse block that belong to a
dropped class are filtered out by re-deriving their class from doc_id —
they would otherwise carry underestimated scores. AND mode additionally
drops classes where any term has no compatible block.

The expensive work (decode + score) stays fully distributed; the driver
only handles block METADATA (bounded by |q|·NB_MAX), never postings.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.analyzer import analyze_query_py
from . import codec
from .bm25 import ROUND_DECIMALS, bm25_partial_col, idf_col

_DECODED_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("doc_id", LongType()),
        StructField("tf", LongType()),
        StructField("doc_len", LongType()),
    ]
)


def _decode_blocks(iterator):
    """mapInPandas decoder: segment rows → exploded postings. Arrow-batched,
    numpy-vectorized; one Python call per batch of blocks."""
    for pdf in iterator:
        outs = []
        for docs_vb, tfs_vb, dlens_vb, term in zip(
            pdf["docs_vb"], pdf["tfs_vb"], pdf["dlens_vb"], pdf["term"]
        ):
            docs = codec.delta_decode(docs_vb).astype(np.int64)
            outs.append(
                pd.DataFrame(
                    {
                        "term": term,
                        "doc_id": docs,
                        "tf": codec.varbyte_decode(tfs_vb).astype(np.int64),
                        "doc_len": codec.varbyte_decode(dlens_vb).astype(np.int64),
                    }
                )
            )
        yield pd.concat(outs) if outs else pd.DataFrame(
            {"term": pd.Series(dtype="str"), "doc_id": pd.Series(dtype="int64"),
             "tf": pd.Series(dtype="int64"), "doc_len": pd.Series(dtype="int64")}
        )


@dataclass
class SegmentIndex:
    spark: SparkSession
    path: str
    n_docs: int
    avgdl: float
    nb_max: int
    n_buckets: int
    analyzer: str
    # below this many candidate postings the two-phase pruned plan costs
    # more (an extra job round-trip) than it saves — go straight exhaustive
    prune_min_postings: int = 100_000

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "SegmentIndex":
        with open(os.path.join(path, "index.json")) as f:
            m = json.load(f)
        return cls(
            spark=spark, path=path, n_docs=int(m["n_docs"]),
            avgdl=float(m["avgdl"]) or 1.0, nb_max=int(m["nb_max"]),
            n_buckets=int(m["n_buckets"]), analyzer=m.get("analyzer", "simple"),
        )

    # -- scans ------------------------------------------------------------
    def _segments(self, terms: list[str]) -> DataFrame:
        segs = self.spark.read.parquet(os.path.join(self.path, "segments"))
        buckets = sorted(
            {r["b"] for r in self.spark.createDataFrame(
                [(t,) for t in terms], "term string"
            ).select(F.pmod(F.xxhash64("term"), F.lit(self.n_buckets)).cast("int").alias("b")).collect()}
        )
        return segs.filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))

    def _meta(self, terms: list[str]) -> pd.DataFrame:
        """Metadata-only scan — binary columns never touched."""
        return (
            self._segments(terms)
            .select("term", "salt", "nb", "count", "max_partial")
            .toPandas()
        )

    def _idf(self, df: int) -> float:
        return float(np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5)))

    def _decode(self, terms: list[str], keys: set[tuple[str, int]] | None) -> DataFrame:
        segs = self._segments(terms)
        if keys is not None:
            key_strs = [f"{t}\x00{s}" for t, s in keys]
            segs = segs.filter(
                F.concat_ws("\x00", F.col("term"), F.col("salt").cast("string")).isin(key_strs)
            )
        return segs.select("term", "docs_vb", "tfs_vb", "dlens_vb").mapInPandas(
            _decode_blocks, _DECODED_SCHEMA
        )

    # -- scoring ----------------------------------------------------------
    def _score(self, decoded: DataFrame, term_df: dict[str, int],
               n_terms_required: int | None, k: int,
               keep_classes: list[int] | None = None) -> DataFrame:
        stats = self.spark.createDataFrame(
            [(t, d) for t, d in term_df.items()], "term string, df long"
        )
        cand = decoded.join(F.broadcast(stats), "term")
        if keep_classes is not None:
            cand = cand.filter(
                F.pmod(F.xxhash64(F.col("doc_id")), F.lit(self.nb_max))
                .cast("int").isin(keep_classes)
            )
        partial = bm25_partial_col(
            F.col("tf").cast("double"), F.col("doc_len").cast("double"),
            F.col("df").cast("double"), self.n_docs, self.avgdl,
        )
        scored = (
            cand.select("doc_id", partial.alias("partial"))
            .groupBy("doc_id")
            .agg(F.sum("partial").alias("raw"), F.count(F.lit(1)).alias("nterms"))
        )
        if n_terms_required is not None:
            scored = scored.filter(F.col("nterms") == n_terms_required)
        return (
            scored.select("doc_id", F.round(F.col("raw"), ROUND_DECIMALS).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    # -- public -----------------------------------------------------------
    def search(self, query: str, k: int = 10, mode: str = "AND",
               prune: bool = True) -> DataFrame:
        terms = sorted(set(analyze_query_py(query, self.analyzer)))
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        if not terms:
            return empty
        meta = self._meta(terms)
        if meta.empty:
            return empty
        found = set(meta["term"].unique())
        is_and = mode.upper() == "AND"
        if is_and and found != set(terms):
            return empty  # a required term is absent from the corpus
        terms = sorted(found)
        term_df = {
            t: int(g["count"].sum()) for t, g in meta.groupby("term")
        }
        required = len(terms) if is_and else None

        if not prune or sum(term_df.values()) <= self.prune_min_postings:
            return self._score(self._decode(terms, None), term_df, required, k)

        # ---- block-max pruning math (driver-side, metadata only) ----
        nb_all = self.nb_max
        ub = np.zeros(nb_all)                      # score upper bound per class
        present = np.ones(nb_all, dtype=bool)      # AND feasibility per class
        cnt_min = np.full(nb_all, np.inf)
        cnt_max = np.zeros(nb_all)
        g = np.arange(nb_all)
        for t, grp in meta.groupby("term"):
            idf = self._idf(term_df[t])
            nb_t = int(grp["nb"].iloc[0])
            mp = np.zeros(nb_t)
            ct = np.zeros(nb_t)
            mp[grp["salt"].to_numpy()] = grp["max_partial"].to_numpy()
            ct[grp["salt"].to_numpy()] = grp["count"].to_numpy()
            ub += idf * mp[g % nb_t]
            cnt_min = np.minimum(cnt_min, ct[g % nb_t])
            cnt_max = np.maximum(cnt_max, ct[g % nb_t])
            present &= ct[g % nb_t] > 0
        feasible = present if is_and else ub > 0
        est = cnt_min if is_and else cnt_max
        order = [int(x) for x in np.argsort(-ub) if feasible[int(x)]]
        if not order:
            return empty

        seed: list[int] = []
        got = 0.0
        for cls in order:
            seed.append(cls)
            got += est[cls]
            if got >= k:
                break

        seed_keys = self._keys_for_classes(meta, terms, seed)
        seed_top = self._score(
            self._decode(terms, seed_keys), term_df, required, k, keep_classes=seed
        ).collect()
        if len(seed_top) >= k:
            # θ is derived from a ROUNDED score; subtract a half-ulp of the
            # rounding so (a) rounding-up can't inflate θ past the true raw
            # k-th score and (b) docs tying the k-th rounded score (broken
            # by doc_id in the final sort) always survive pruning.
            theta = float(seed_top[-1]["score"]) - 0.5 * 10 ** (-ROUND_DECIMALS)
            keep = [c for c in order if ub[c] >= theta or c in set(seed)]
        else:
            keep = order  # not enough seeds: fall back to all feasible classes
        keep_keys = self._keys_for_classes(meta, terms, keep)
        return self._score(
            self._decode(terms, keep_keys), term_df, required, k, keep_classes=keep
        )

    @staticmethod
    def _keys_for_classes(meta: pd.DataFrame, terms: list[str],
                          classes: list[int]) -> set[tuple[str, int]]:
        keys: set[tuple[str, int]] = set()
        cls = np.asarray(classes)
        for t, grp in meta.groupby("term"):
            nb_t = int(grp["nb"].iloc[0])
            have = set(grp["salt"].tolist())
            for s in np.unique(cls % nb_t):
                if int(s) in have:
                    keys.add((t, int(s)))
        return keys
