"""Block-max pruned top-k query execution over the segment store,
generation-aware (base segments + incremental delta generations).

Distributed block-max WAND (SURVEY.md §2.F/§2.J): because the segment
salting is doc-aligned across terms (segments.py — salt classes are nested
powers of two of the SAME hash of doc_id), a global salt class g is a
"block" in the WAND sense: for every query term t its contribution to any
doc in g is bounded by idf_t · partial(max_tf, min_dl) of the compatible
block (evaluated with the QUERY-TIME avgdl — safe under delta-shifted
statistics). So:

  phase 0  metadata-only scan: (term, salt, nb, count, max_tf, min_dl)
           for the query terms — parquet reads NONE of the binary posting
           columns (column pruning) and prunes files/row-groups by term
           (bucket directory + min/max sort). Collected to the driver:
           ≤ |q|·NB_MAX·(1+gens) tiny rows.
  phase 1  seed the threshold θ: exactly score the most-promising global
           classes (highest upper bound) until ≥ k docs are fully scored;
           θ = k-th best true score (minus a half-ulp of the rounding).
  phase 2  prune: keep classes with ub(g) ≥ θ; decode only those blocks,
           score exactly (same columnar BM25 expressions as the naive
           path — no UDF in scoring), take top-k.

Incremental semantics (streaming/ingest.py writes the deltas):
  * every upsert/delete of doc d in generation g writes a tombstone (d,g);
    postings of d from generations < g are dropped after decode
    (last-writer-wins — the reference's idempotent uuid-keyed upsert,
    /root/reference/pkg/es/service.go:119-138).
  * N and avgdl are EXACT (maintained in the docs table per batch);
    per-term df is Lucene-faithful approximate until fold_deltas — counts
    include superseded postings, exactly as Lucene counts deleted docs in
    docFreq until segment merge. fold_deltas restores exact df.

Correctness argument for pruning: a dropped class g has ub(g) < θ ≤ true
k-th score, and every doc's true score is ≤ ub(its class) — tombstone
drops only remove score mass, and ub uses the max over generations — so
dropped docs cannot be in the true top-k. Stray docs decoded via a coarse
block that belong to a dropped class are filtered out by re-deriving their
class from doc_id.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import BM25_B, BM25_K1
from .. import storage
from ..functions.analyzer import analyze_query_py, analyzer_column
from ..functions.hashing import pmod, xxh64_long_np, xxh64_string
from ..storage import join as pjoin
from . import codec
from .bm25 import ROUND_DECIMALS, bm25_partial_col
from .fields import FIELD_SEP
from .segments import SEGMENT_READ_SCHEMA

# trivial-job latency per SparkSession (the T_job term of the prune
# crossover): measured ONCE per session — warmup job first, then the
# median of three — so index loads are deterministic within a session and
# never pay the first-job codegen/scheduler warmup as if it were steady-
# state job latency (ADVICE r3). Keyed by applicationId, not id(spark):
# CPython can reuse a stopped session's id for a new session, which would
# inherit a stale T_job (ADVICE r4); app ids are unique per context.
_TJOB_CACHE: dict[str, float] = {}

# Driver fast-path postings bound (round 6, guide §1.2/§5): below this
# many candidate postings the cheapest possible Spark plan can never beat
# a bounded driver-side read — the SMALLEST python-boundary Spark job
# measures ~0.2-0.35 s fixed at local[32] (bench_extra.py round-6
# measurements: a 1-partition identity mapInPandas job is 0.20 s, the
# full decode+score job 0.5-0.75 s), while 2M postings are ~10-20 MB of
# varbyte parquet that pyarrow + the numpy codec decode and score in
# tens of milliseconds. This is the same measured-crossover discipline
# as prune_min_postings, applied one level down: tiny queries are served
# by a bounded pyarrow read of the SAME parquet segments (never a cache
# — every query re-reads storage), big queries take the distributed
# plan unchanged. Memory bound: 2M postings ≈ 50 MB of int64 arrays.
DRIVER_MAX_POSTINGS = 2_000_000

_META_COLS = ["term", "salt", "nb", "count", "max_tf", "min_dl"]

_DECODED_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("gen", IntegerType()),
        StructField("doc_id", LongType()),
        StructField("tf", LongType()),
        StructField("doc_len", LongType()),
    ]
)


def _decode_blocks(iterator):
    """mapInPandas decoder: segment rows → exploded postings. Arrow-batched,
    numpy-vectorized; one Python call per batch of blocks."""
    empty = pd.DataFrame(
        {"term": pd.Series(dtype="str"), "gen": pd.Series(dtype="int32"),
         "doc_id": pd.Series(dtype="int64"), "tf": pd.Series(dtype="int64"),
         "doc_len": pd.Series(dtype="int64")}
    )
    for pdf in iterator:
        outs = []
        for docs_vb, tfs_vb, dlens_vb, term, gen in zip(
            pdf["docs_vb"], pdf["tfs_vb"], pdf["dlens_vb"], pdf["term"], pdf["gen"]
        ):
            docs = codec.delta_decode(docs_vb).astype(np.int64)
            outs.append(
                pd.DataFrame(
                    {
                        "term": term,
                        "gen": np.int32(gen),
                        "doc_id": docs,
                        "tf": codec.varbyte_decode(tfs_vb).astype(np.int64),
                        "doc_len": codec.varbyte_decode(dlens_vb).astype(np.int64),
                    }
                )
            )
        yield pd.concat(outs) if outs else empty


_POS_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("gen", IntegerType()),
        StructField("doc_id", LongType()),
        StructField("pos", LongType()),
    ]
)


def _decode_blocks_positions(iterator):
    """mapInPandas decoder for phrase queries: segment rows → exploded
    (term, gen, doc_id, pos) rows. Positions reconstructed vectorized
    (codec.positions_decode); doc ids repeated per tf."""
    empty = pd.DataFrame(
        {"term": pd.Series(dtype="str"), "gen": pd.Series(dtype="int32"),
         "doc_id": pd.Series(dtype="int64"), "pos": pd.Series(dtype="int64")}
    )
    for pdf in iterator:
        outs = []
        for docs_vb, tfs_vb, pos_vb, term, gen in zip(
            pdf["docs_vb"], pdf["tfs_vb"], pdf["pos_vb"], pdf["term"], pdf["gen"]
        ):
            if not pos_vb:
                continue
            docs = codec.delta_decode(docs_vb).astype(np.int64)
            tfs = codec.varbyte_decode(tfs_vb)
            flat = codec.positions_decode(pos_vb, tfs).astype(np.int64)
            outs.append(
                pd.DataFrame(
                    {
                        "term": term,
                        "gen": np.int32(gen),
                        "doc_id": np.repeat(docs, tfs.astype(np.int64)),
                        "pos": flat,
                    }
                )
            )
        yield pd.concat(outs) if outs else empty


def _partial_np(tf: np.ndarray, dl: np.ndarray, avgdl: float,
                k1: float = BM25_K1, b: float = BM25_B) -> np.ndarray:
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / max(avgdl, 1e-9)))


@dataclass
class SegmentIndex:
    spark: SparkSession
    path: str
    n_docs: int
    avgdl: float
    nb_max: int
    n_buckets: int
    analyzer: str
    positions: bool = False
    generations: list[int] = field(default_factory=list)  # delta gens, sorted
    # manifest-pointed base layout: fold/merge write a NEW versioned dir and
    # commit it with ONE index.json write (no live-dir swap window)
    seg_dir: str = "segments"
    stats_file: str = "stats.parquet"
    # fielded index (build_segments(fields=...)): per-field docCount/avgdl
    # (Lucene per-field norms) and the field used when a query names none.
    # Posting keys on disk are composite ``field\x1fterm`` strings.
    field_stats: dict | None = None
    default_field: str | None = None
    # below this many candidate postings the two-phase pruned plan costs
    # more (an extra job round-trip + second decode pass) than it saves —
    # go straight exhaustive. load() DERIVES this from measured data (see
    # _derive_crossover); this static value is the fallback when the
    # manifest carries no build metrics. Deployments can still override.
    prune_min_postings: int = 500_000
    # rescore/highlight take the materialized-result + class-cut path
    # (decode positions only for the salt classes the bounded window /
    # top-k occupies) only when the positional decode is
    # volume-dominated: measured at 3M docs / nb_max=256 the 45-class
    # cut of a 50-doc window turns a 135-150 s phrase decode into
    # 7-45 s (BENCH/BASELINE.md (p)); at 5k docs the two extra driver
    # round-trips cost more than the ~1.4 s decode. Overridable like
    # prune_min_postings.
    pos_classes_min_docs: int = 100_000
    # queries whose candidate postings fit under this bound are served by
    # the driver fast path (bounded pyarrow read + numpy scoring — see
    # DRIVER_MAX_POSTINGS); 0 disables the fast path entirely (the
    # distributed-plan parity tests use that).
    driver_max_postings: int = DRIVER_MAX_POSTINGS

    @classmethod
    def load(cls, spark: SparkSession, path: str,
             as_of_gen: int | None = None) -> "SegmentIndex":
        """Open the index — optionally AS OF a committed delta generation
        (time travel): ``as_of_gen=g`` reproduces exactly the state after
        generation g committed (later upserts/tombstones excluded, stats
        from the highest generation <= g), the reproducibility handle a
        training pipeline pins so a rerun reads the same corpus snapshot.
        The whole query path derives from the loaded generation list, so
        this is a load-time filter, not a separate read path. Generations
        folded into the base (gen <= min_gen after fold_deltas) are no
        longer reconstructable — asking for a pre-fold state raises
        rather than silently serving the folded (newer) base."""
        fs = storage.fs_for(path, spark)
        # heal a docs-table swap the ingest crashed in the middle of (the
        # base segment/stats dirs are never swapped — fold/merge commit a
        # new VERSIONED dir through index.json instead). Only attempt the
        # heal — a WRITE — when the live dir is actually missing, so a
        # healthy committed index opens fine from a read-only mount; a
        # stale .bak next to a live dir is left for the next swap's cleanup
        docs_dir = pjoin(path, "docs")
        if not fs.exists(docs_dir):
            storage.restore_swap(fs, docs_dir)
        m = storage.read_json(fs, pjoin(path, "index.json"))
        crossover = cls._derive_crossover(spark, m)
        # delta generations folded into the base are ignored even if their
        # manifests still exist (fold GC is best-effort after its commit)
        min_gen = int(m.get("min_gen", 0))
        if as_of_gen is not None and as_of_gen < min_gen:
            raise ValueError(
                f"as_of_gen={as_of_gen} predates the retained window: "
                f"generations <= {min_gen} were folded into the base and "
                "cannot be reconstructed"
            )
        # generations retired by a delta-tier merge (ingest.
        # merge_delta_tier) are skipped like folded ones; the merged
        # generation tier_min+1 carries their combined state
        tier_min = int(m.get("tier_min_gen", 0))
        if as_of_gen is not None and min_gen < tier_min:
            if as_of_gen == tier_min:
                # post-tier_min state ≡ the merged generation's state
                as_of_gen = tier_min + 1
            elif as_of_gen < tier_min:
                raise ValueError(
                    f"as_of_gen={as_of_gen} was tier-merged: generations "
                    f"<= {tier_min} were squashed into gen {tier_min + 1} "
                    "and cannot be reconstructed individually"
                )
        eff_min = max(min_gen, tier_min)
        gens = []
        # n_docs/avgdl (and field_stats for fielded indexes) come from the
        # HIGHEST committed delta generation — each batch writes the
        # post-batch exact stats — falling back to the base manifest
        stats_src = m
        best_gen = eff_min
        for name in fs.listdir(path):
            if not (name.startswith("delta_manifest_") and name.endswith(".json")):
                continue
            dm = storage.read_json(fs, pjoin(path, name))
            g = int(dm["gen"])
            if not dm.get("committed") or g <= eff_min:
                continue
            if as_of_gen is not None and g > as_of_gen:
                continue
            gens.append(g)
            if g > best_gen:
                best_gen = g
                stats_src = dm
        return cls(
            spark=spark, path=path, n_docs=int(stats_src["n_docs"]),
            avgdl=float(stats_src["avgdl"]) or 1.0,
            nb_max=int(m["nb_max"]), n_buckets=int(m["n_buckets"]),
            analyzer=m.get("analyzer", "simple"),
            positions=bool(m.get("positions", False)),
            generations=sorted(gens),
            **({"prune_min_postings": crossover} if crossover else {}),
            seg_dir=m.get("seg_dir", "segments"),
            stats_file=m.get("stats_file", "stats.parquet"),
            # explicit None check, not truthiness: a delete-only batch on a
            # fielded index writes field_stats with n_docs == 0 entries —
            # falling back to the BASE manifest there would score against
            # norms for documents that no longer exist (ADVICE r4)
            field_stats=(
                stats_src["field_stats"]
                if stats_src.get("field_stats") is not None
                else m.get("field_stats")
            ),
            default_field=m.get("default_field"),
        )

    @staticmethod
    def _derive_crossover(spark: SparkSession, m: dict) -> int | None:
        """Measured prune_min_postings (VERDICT r2 item 9): the two-phase
        pruned plan pays ~2 extra driver-job round-trips (θ-seeding +
        final decode vs one exhaustive decode); it wins when the decode
        volume it saves costs more than those round-trips.

        * T_job — measured LIVE, once per SparkSession (warmup job, then
          the median of three trivial jobs, clamped to [0.02 s, 1 s]);
          on a busy cluster scheduler this is larger and the crossover
          correctly rises. The warmup + per-session cache keep repeated
          loads deterministic and free of first-job codegen latency.
        * decode rate — estimated from the index's OWN build manifest:
          posting_count / stage-2 encode seconds (decode and encode share
          the Arrow/numpy codec machinery; decode is the cheaper
          direction, so this under-estimates the saving).
        * crossover = 4 · T_job · rate — factor 2 for the two extra jobs
          × ~2 for the candidate fraction the pruned plan still decodes —
          clamped to [100k, 10M] postings.

        Returns None (keep the static default) when the manifest carries
        no metrics. At sf0.1 (~120k postings, ~60k postings/s encode)
        this lands on the 100k floor, so the reference queries keep
        routing through the exhaustive branch exactly as the measured
        sandbox crossover demands; at 3M docs (~2.8M postings/s) it
        lands ≈1M, routing hot queries through the pruned plan that wins
        there (BENCH/BASELINE.md (f))."""
        import statistics
        import time

        bm = m.get("build_metrics") or {}
        pc, s2 = m.get("posting_count"), bm.get("stage2_secs")
        if not pc or not s2:
            return None
        key = spark.sparkContext.applicationId
        if key not in _TJOB_CACHE:
            spark.sql("SELECT 1").collect()  # warmup: codegen + scheduler
            samples = []
            for _ in range(3):
                t0 = time.time()
                spark.sql("SELECT 1").collect()
                samples.append(time.time() - t0)
            _TJOB_CACHE[key] = min(max(statistics.median(samples), 0.02), 1.0)
        t_job = _TJOB_CACHE[key]
        rate = float(pc) / max(float(s2), 1e-6)
        return int(min(10_000_000, max(100_000, 4.0 * t_job * rate)))

    # -- scans ------------------------------------------------------------
    def _all_segments(self) -> DataFrame:
        """Union reader over base + delta generations (plan cached on the
        instance — re-listing parquet dirs per query is pure overhead)."""
        if getattr(self, "_segs_cache", None) is None:
            base = self.spark.read.parquet(pjoin(self.path, self.seg_dir)) \
                .withColumn("gen", F.lit(0))
            parts = [base]
            for g in self.generations:
                parts.append(
                    self.spark.read.schema(SEGMENT_READ_SCHEMA).parquet(
                        pjoin(self.path, "delta", f"gen={g}", "segments")
                    ).withColumn("gen", F.lit(g))
                )
            segs = parts[0]
            for p in parts[1:]:
                segs = segs.unionByName(p)
            self._segs_cache = segs
        return self._segs_cache

    def _segments(self, terms: list[str] | None) -> DataFrame:
        segs = self._all_segments()
        if terms is None:
            return segs
        # driver-side XXH64 (parity-pinned with the JVM expression) →
        # bucket directory pruning without a Spark job
        buckets = sorted({pmod(xxh64_string(t), self.n_buckets) for t in terms})
        return segs.filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))

    def _tombstones(self) -> DataFrame | None:
        """(doc_id, tgen) — max tombstone generation per doc."""
        if not self.generations:
            return None
        parts = []
        for g in self.generations:
            parts.append(
                self.spark.read.parquet(
                    pjoin(self.path, "delta", f"gen={g}", "tombstones")
                ).select("doc_id", F.lit(g).alias("tgen"))
            )
        t = parts[0]
        for p in parts[1:]:
            t = t.unionByName(p)
        return t.groupBy("doc_id").agg(F.max("tgen").alias("tgen"))

    def _meta(self, terms: list[str]) -> pd.DataFrame:
        """Metadata-only scan — binary columns never touched. On a local
        base-only index the scan is a direct pyarrow read (row-group
        pruned by the term-sorted layout, no Spark job — the same file
        set and filters the Spark plan reads); delta generations and URI
        stores keep the Spark path. Equivalence is pinned by
        tests/test_fast_path.py."""
        d = self._local_seg_dir()
        if (d is not None and not self.generations
                and self.driver_max_postings > 0):
            return self._meta_local(d, terms)
        return (
            self._segments(terms)
            .select("term", "gen", "salt", "nb", "count", "max_tf", "min_dl")
            .toPandas()
        )

    # -- driver fast path (bounded local reads; see DRIVER_MAX_POSTINGS) --
    def _local_seg_dir(self) -> "str | None":
        """Base-segment directory for the driver fast path, or None when
        the store is not a plain local path (URI stores go through the
        JVM Hadoop filesystem and the distributed plan)."""
        if "://" in self.path:
            return None
        d = os.path.join(self.path, self.seg_dir)
        return d if os.path.isdir(d) else None

    def _fast_eligible(self, filter_ids: "DataFrame | None") -> bool:
        """Fast-path admission: base-only (delta generations carry
        tombstones and per-gen stats — the distributed path owns that
        logic), local storage, and no ES filter context (an arbitrary
        DataFrame the driver cannot evaluate)."""
        return (filter_ids is None and not self.generations
                and self._local_seg_dir() is not None)

    def _bucket_dirs(self, seg_dir: str, terms: list[str]) -> list[tuple]:
        """(bucket_dir, terms_in_bucket) for the buckets the query terms
        hash to — the same driver-side bucket pruning _segments does."""
        by_bucket: dict[int, list[str]] = {}
        for t in terms:
            by_bucket.setdefault(pmod(xxh64_string(t), self.n_buckets),
                                 []).append(t)
        out = []
        for b, ts in sorted(by_bucket.items()):
            bd = os.path.join(seg_dir, f"bucket={b}")
            if os.path.isdir(bd):
                out.append((bd, sorted(ts)))
        return out

    def _meta_local(self, seg_dir: str, terms: list[str]) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        tabs = [
            pq.read_table(bd, columns=_META_COLS,
                          filters=[("term", "in", ts)])
            for bd, ts in self._bucket_dirs(seg_dir, terms)
        ]
        tabs = [t for t in tabs if t.num_rows]
        if not tabs:
            return pd.DataFrame(
                {c: pd.Series(dtype="int64") if c != "term"
                 else pd.Series(dtype="object")
                 for c in ["term", "gen"] + _META_COLS[1:]})
        pdf = pa.concat_tables(tabs).to_pandas()
        pdf.insert(1, "gen", np.int32(0))
        return pdf

    def _blocks_local(self, terms: list[str],
                      keys: "set[tuple[str, int, int]] | None" = None,
                      cols: "list[str] | None" = None) -> pd.DataFrame:
        """Base segment rows WITH binary columns via pyarrow, filtered to
        the query terms (and, for the pruned plan, to the (term, salt)
        block keys) — the fast-path twin of _segments/_filter_keys."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        if cols is None:
            cols = ["term", "salt", "count", "docs_vb", "tfs_vb",
                    "dlens_vb"]
        by_term: "dict[str, list[int]] | None" = None
        if keys is not None:
            by_term = {}
            for t, _gen, s in keys:
                by_term.setdefault(t, []).append(int(s))
        tabs = []
        for bd, ts in self._bucket_dirs(self._local_seg_dir(), terms):
            if by_term is None:
                filters = [("term", "in", ts)]
            else:
                filters = [
                    [("term", "=", t), ("salt", "in", sorted(by_term[t]))]
                    for t in ts if t in by_term
                ]
                if not filters:
                    continue
            tab = pq.read_table(bd, columns=cols, filters=filters)
            if tab.num_rows:
                tabs.append(tab)
        if not tabs:
            return pd.DataFrame(columns=cols)
        return pa.concat_tables(tabs).to_pandas()

    def _decode_local(self, blocks: pd.DataFrame
                      ) -> "tuple[np.ndarray, ...]":
        """Decode fast-path block rows → flat (doc_ids, tfs, dls,
        term_idx, uniq_terms) numpy arrays — the same codec the
        distributed decoder runs, minus the Arrow boundary."""
        terms_b = blocks["term"].to_numpy(object)
        uniq, tcodes = np.unique(terms_b, return_inverse=True)
        docs_l, tfs_l, dls_l, tidx_l = [], [], [], []
        for i in range(len(blocks)):
            d = codec.delta_decode(blocks["docs_vb"].iat[i]).astype(np.int64)
            docs_l.append(d)
            tfs_l.append(codec.varbyte_decode(
                blocks["tfs_vb"].iat[i]).astype(np.int64))
            dls_l.append(codec.varbyte_decode(
                blocks["dlens_vb"].iat[i]).astype(np.int64))
            tidx_l.append(np.full(d.size, tcodes[i], dtype=np.int64))
        if not docs_l:
            z = np.empty(0, np.int64)
            return z, z, z, z, uniq
        return (np.concatenate(docs_l), np.concatenate(tfs_l),
                np.concatenate(dls_l), np.concatenate(tidx_l), uniq)

    def _score_local(self, blocks: pd.DataFrame, term_df: dict,
                     required: "int | None", k: "int | None",
                     keep_classes: "list[int] | None",
                     n_docs: int, avgdl: float,
                     msm: "int | None",
                     after: "tuple[float, int] | None"
                     ) -> list[tuple[int, float]]:
        """Driver twin of _score(...).collect(): same BM25 partials, the
        same HALF_UP rounding semantics (similarity._round_half_up — the
        pinned Spark Round parity), the same (score desc, doc_id asc)
        order and cursor/nterms filters. Returns [(doc_id, score)]."""
        from .. import BM25_B, BM25_K1

        doc_ids, tfs, dls, tidx, uniq = self._decode_local(blocks)
        if doc_ids.size == 0:
            return []
        if keep_classes is not None:
            cls = xxh64_long_np(doc_ids) % np.int64(self.nb_max)
            m = np.isin(cls, np.asarray(keep_classes, dtype=np.int64))
            doc_ids, tfs, dls, tidx = doc_ids[m], tfs[m], dls[m], tidx[m]
            if doc_ids.size == 0:
                return []
        idf = np.array([self._idf(term_df[t], n_docs) for t in uniq])
        tf = tfs.astype(np.float64)
        dl = dls.astype(np.float64)
        denom = tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl / avgdl)
        partial = idf[tidx] * (tf * (BM25_K1 + 1.0)) / denom
        order = np.argsort(doc_ids, kind="stable")
        ds = doc_ids[order]
        ps = partial[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(ds[1:] != ds[:-1]) + 1))
        raw = np.add.reduceat(ps, starts)
        nterms = np.diff(np.concatenate((starts, [ds.size])))
        docs_u = ds[starts]
        if required is not None:
            m = nterms == required
            raw, docs_u, nterms = raw[m], docs_u[m], nterms[m]
        if msm is not None:
            m = nterms >= msm
            raw, docs_u = raw[m], docs_u[m]
        return self._topk_rounded(docs_u, raw, k, after)

    @staticmethod
    def _topk_rounded(docs_u: np.ndarray, raw: np.ndarray,
                      k: "int | None",
                      after: "tuple[float, int] | None"
                      ) -> list[tuple[int, float]]:
        """Exact rounded-order top-k over raw scores: the bulk is ranked
        on raw values; HALF_UP rounding (the expensive repr-based exact
        form) touches only the bounded candidate set around the k-th
        score / the cursor boundary. Exactness: ROUND_DECIMALS quantizes
        to q = 10^-4, |round(x) - x| <= q/2, so round is monotone up to a
        q-wide band — candidates with raw >= kth_raw - q - eps are a
        superset of the rounded-order top-k."""
        from .similarity import _round_half_up

        q = 10.0 ** (-ROUND_DECIMALS)
        eps = 1e-9
        if after is not None:
            a_s, a_d = float(after[0]), int(after[1])
            hi = raw > a_s + 0.5 * q + eps        # rounds above the cursor
            border = (~hi) & (raw >= a_s - 0.5 * q - eps)
            keep = ~hi
            for i in np.flatnonzero(border):
                r = _round_half_up(float(raw[i]), ROUND_DECIMALS)
                if r > a_s or (r == a_s and int(docs_u[i]) <= a_d):
                    keep[i] = False
            docs_u, raw = docs_u[keep], raw[keep]
        if docs_u.size == 0:
            return []
        if k is not None and docs_u.size > k:
            kth = np.partition(raw, docs_u.size - k)[docs_u.size - k]
            m = raw >= kth - q - eps
            docs_u, raw = docs_u[m], raw[m]
        cand = sorted(
            ((-_round_half_up(float(r), ROUND_DECIMALS), int(d))
             for d, r in zip(docs_u, raw)),
        )
        if k is not None:
            cand = cand[:k]
        return [(d, -s) for s, d in cand]

    def _rows_df(self, rows: list[tuple[int, float]]) -> DataFrame:
        return self._values_df(rows, "doc_id long, score double")

    def _values_df(self, rows: list[tuple], schema: str) -> DataFrame:
        """rows → DataFrame as a JVM LocalRelation (SQL VALUES literal).
        createDataFrame(rows) builds a python-RDD-backed frame whose
        every collect() runs a full python job (~0.2-0.35 s measured); a
        LocalRelation collects driver-side with NO job. Doubles go
        through CAST('<repr>' AS DOUBLE) so the binary value round-trips
        exactly (shortest-repr parse, same contract as
        similarity._round_half_up)."""
        if not rows:
            return self._empty_df(schema)
        cols = [c.strip().rsplit(" ", 1) for c in schema.split(",")]
        if len(rows) > 2048:
            # a VALUES literal this big costs more to PARSE than the
            # one python job an Arrow-backed frame pays on collect
            # (measured: 38k rows ≈ 1.5 s parse vs ~0.4 s Arrow) — and
            # result sets are bounded by the fast-path volume caps
            pdf = pd.DataFrame(
                {n: [r[i] for r in rows] for i, (n, _t) in enumerate(cols)})
            return self.spark.createDataFrame(pdf, schema)

        def fmt(v, t):
            t = t.strip()
            if t == "double":
                return f"CAST('{float(v)!r}' AS DOUBLE)"
            return f"CAST({int(v)} AS {self._SQL_TYPES[t]})"

        vals = ", ".join(
            "(" + ", ".join(fmt(v, t) for v, (_n, t) in zip(row, cols))
            + ")" for row in rows
        )
        names = ", ".join(n for n, _t in cols)
        return self.spark.sql(
            f"SELECT * FROM VALUES {vals} AS t({names})")

    _SQL_TYPES = {"long": "BIGINT", "bigint": "BIGINT", "int": "INT",
                  "double": "DOUBLE", "string": "STRING"}

    def _empty_df(self, schema: str) -> DataFrame:
        """Cached empty result frame per schema, as a LocalRelation
        (SELECT ... WHERE 1=0 — no python RDD, no job on collect).
        createDataFrame([], ...) cost ~30-60 ms of driver work per call
        plus a ~0.15 s python job per collect, and every query used to
        build one eagerly whether or not it returned empty (a per-query
        tax the r6 profiling caught); the cached PLAN is a constant, so
        reuse is plan reuse like _segs_cache, not result caching."""
        cache = getattr(self, "_empty_cache", None)
        if cache is None:
            cache = {}
            self._empty_cache = cache
        if schema not in cache:
            sel = ", ".join(
                f"CAST(NULL AS {self._SQL_TYPES[t.strip()]}) AS {n.strip()}"
                for n, t in (c.strip().rsplit(" ", 1)
                             for c in schema.split(","))
            )
            cache[schema] = self.spark.sql(f"SELECT {sel} WHERE 1=0")
        return cache[schema]

    def _idf(self, df: int, n_docs: int | None = None) -> float:
        n = self.n_docs if n_docs is None else n_docs
        return float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))

    def _resolve_field(self, field: str | None) -> tuple[str, int, float]:
        """→ (term_prefix, n_docs, avgdl) for a query. On a fielded index
        (build_segments(fields=...)) the posting keys are composite
        ``field\x1fterm`` strings and scoring uses the QUERIED field's own
        docCount/avgdl from the manifest's field_stats (Lucene per-field
        norms) — never the manifest's global n_docs/avgdl, which for a
        fielded build count the field-exploded token stream (docs x
        fields) and would inflate idf / blend avgdl across fields."""
        if self.field_stats:
            f = field or self.default_field
            if f not in self.field_stats:
                raise KeyError(
                    f"unknown field {f!r}; index has {sorted(self.field_stats)}"
                )
            fs = self.field_stats[f]
            return f + FIELD_SEP, int(fs["n_docs"]), float(fs["avgdl"]) or 1.0
        if field is not None:
            raise ValueError(
                "field-scoped search requires an index built with "
                "build_segments(fields=...); this index is unfielded"
            )
        return "", self.n_docs, self.avgdl

    def _filter_keys(self, segs: DataFrame,
                     keys: set[tuple[str, int, int]]) -> DataFrame:
        """Restrict segment rows to the given (term, gen, salt) block keys
        via a broadcast left-semi join. Bounded plan regardless of |keys|:
        the previous string-concat in-list put up to |q|·NB_MAX·(1+gens)
        literals into the plan (codegen/analysis cost scaling with key
        count, no pushdown on the synthesized column — VERDICT r4 #3)."""
        kdf = self.spark.createDataFrame(
            sorted(keys), "term string, gen int, salt int"
        )
        return segs.join(F.broadcast(kdf), ["term", "gen", "salt"], "left_semi")

    def _decode(self, terms: list[str],
                keys: set[tuple[str, int, int]] | None) -> DataFrame:
        segs = self._segments(terms)
        if keys is not None:
            segs = self._filter_keys(segs, keys)
        # coalesce to core count: query-filtered segment sets are a few
        # small files per bucket; without this every tiny file-partition
        # spawns its own Python worker (decode-side worker storm)
        par = self.spark.sparkContext.defaultParallelism
        return segs.select("term", "gen", "docs_vb", "tfs_vb", "dlens_vb") \
            .coalesce(max(1, par)) \
            .mapInPandas(_decode_blocks, _DECODED_SCHEMA)

    # -- scoring ----------------------------------------------------------
    def _score(self, decoded: DataFrame, term_df: dict[str, int],
               n_terms_required: int | None, k: "int | None",
               keep_classes: list[int] | None = None,
               n_docs: int | None = None,
               avgdl: float | None = None,
               min_terms: int | None = None,
               after: "tuple[float, int] | None" = None,
               filter_ids: DataFrame | None = None) -> DataFrame:
        tomb = self._tombstones()
        if tomb is not None:
            decoded = (
                decoded.join(F.broadcast(tomb), "doc_id", "left")
                .filter(F.col("tgen").isNull() | (F.col("tgen") <= F.col("gen")))
                .drop("tgen")
            )
        if filter_ids is not None:
            # ES filter context: restrict the candidate set WITHOUT touching
            # scores — a left-semi join on doc_id applied before aggregation
            # so filtered-out postings never reach the scorer. The filter
            # set can be corpus-sized, so no broadcast hint: AQE picks the
            # strategy (BHJ when the filter is small, SMJ/shuffled-hash when
            # it isn't).
            decoded = decoded.join(
                filter_ids.select("doc_id"), "doc_id", "left_semi")
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
            F.col("df").cast("double"),
            self.n_docs if n_docs is None else n_docs,
            self.avgdl if avgdl is None else avgdl,
        )
        scored = (
            cand.select("doc_id", partial.alias("partial"))
            .groupBy("doc_id")
            .agg(F.sum("partial").alias("raw"), F.count(F.lit(1)).alias("nterms"))
        )
        if n_terms_required is not None:
            scored = scored.filter(F.col("nterms") == n_terms_required)
        if min_terms is not None:
            scored = scored.filter(F.col("nterms") >= min_terms)
        res = scored.select(
            "doc_id", F.round(F.col("raw"), ROUND_DECIMALS).alias("score"))
        if after is not None:
            # keyset cursor on the ROUNDED (score desc, doc_id asc) total
            # order — the same order pages are served in, so pages never
            # overlap or skip even across score ties
            a_s, a_d = float(after[0]), int(after[1])
            res = res.filter(
                (F.col("score") < a_s)
                | ((F.col("score") == a_s) & (F.col("doc_id") > a_d))
            )
        if k is None:  # full scored match set (facet/collapse consumers)
            return res
        return res.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # -- public -----------------------------------------------------------
    def search(self, query: str, k: int = 10, mode: str = "AND",
               prune: bool = True, field: str | None = None,
               min_should_match: int | None = None,
               after: "tuple[float, int] | None" = None,
               filter_ids: DataFrame | None = None) -> DataFrame:
        """BM25 top-k. On a fielded index ``field`` picks the scope
        (default: the manifest's default_field); terms become composite
        ``field\x1fterm`` keys and BM25 uses that field's docCount/avgdl.
        ``min_should_match`` (OR mode; the ES bool-query knob) keeps only
        docs matching >= that many distinct query terms; the block-max
        pruning lattice tightens with it — a salt class is feasible only
        if at least msm of the terms have postings there (the AND lattice
        is the msm == len(terms) corner of the same rule).
        ``after`` = (score, doc_id) is the ES search_after keyset cursor:
        returns the next k results STRICTLY after the cursor in the
        (score desc, doc_id asc) total order. Deep pagination stays
        O(k) per page (no offset scan); block-max pruning still applies
        because theta is seeded from post-cursor scores, and every doc a
        page needs scores >= that theta.
        ``filter_ids`` is the ES bool.filter context: a (doc_id) DataFrame
        restricting the match set WITHOUT contributing to scores (filters
        carry no BM25 weight in ES either). Pruning stays valid because a
        filter only REMOVES documents: every class upper bound ub(g) still
        bounds every surviving doc's score, and θ — seeded from the
        FILTERED seed classes' k-th score — only prunes classes whose best
        possible (unfiltered) score is already below it."""
        prefix, n_docs, avgdl = self._resolve_field(field)
        terms = sorted(
            {prefix + t for t in analyze_query_py(query, self.analyzer)}
        )
        empty = self._empty_df("doc_id long, score double")
        # a field whose every document was deleted (delta field_stats says
        # n_docs == 0) matches nothing — short-circuit instead of scoring
        # stale postings with degenerate idf (ADVICE r4)
        if not terms or n_docs == 0:
            return empty
        meta = self._meta(terms)
        if meta.empty:
            return empty
        found = set(meta["term"].unique())
        is_and = mode.upper() == "AND"
        if is_and and found != set(terms):
            return empty  # a required term is absent from the corpus
        terms = sorted(found)
        msm = None
        if not is_and and min_should_match is not None:
            msm = int(min_should_match)
            if msm <= 1:
                msm = None  # plain OR
            elif msm > len(terms):
                return empty  # fewer matchable terms than required
        # Lucene-faithful df: includes superseded postings until fold
        term_df = {t: int(g["count"].sum()) for t, g in meta.groupby("term")}
        required = len(terms) if is_and else None

        fast = (self.driver_max_postings > 0
                and self._fast_eligible(filter_ids))
        total = sum(term_df.values())
        if not prune or total <= self.prune_min_postings:
            if fast and total <= self.driver_max_postings:
                return self._rows_df(self._score_local(
                    self._blocks_local(terms), term_df, required, k,
                    None, n_docs, avgdl, msm, after))
            return self._score(self._decode(terms, None), term_df, required, k,
                               n_docs=n_docs, avgdl=avgdl, min_terms=msm,
                               after=after, filter_ids=filter_ids)

        # ---- block-max pruning math (driver-side, metadata only) ----
        nb_all = self.nb_max
        ub = np.zeros(nb_all)                      # score upper bound per class
        present = np.ones(nb_all, dtype=bool)      # AND feasibility per class
        present_cnt = np.zeros(nb_all, dtype=int)  # msm feasibility per class
        cnt_min = np.full(nb_all, np.inf)
        cnt_max = np.zeros(nb_all)
        g = np.arange(nb_all)
        for t, tgrp in meta.groupby("term"):
            idf = self._idf(term_df[t], n_docs)
            mp_full = np.zeros(nb_all)
            ct_full = np.zeros(nb_all)
            for (gen, nb_t), grp in tgrp.groupby(["gen", "nb"]):
                nb_t = int(nb_t)
                mp = np.zeros(nb_t)
                ct = np.zeros(nb_t)
                part = _partial_np(grp["max_tf"].to_numpy(),
                                   grp["min_dl"].to_numpy(), avgdl)
                mp[grp["salt"].to_numpy()] = part
                ct[grp["salt"].to_numpy()] = grp["count"].to_numpy()
                mp_full = np.maximum(mp_full, mp[g % nb_t])
                ct_full += ct[g % nb_t]
            ub += idf * mp_full
            cnt_min = np.minimum(cnt_min, ct_full)
            cnt_max = np.maximum(cnt_max, ct_full)
            present &= ct_full > 0
            present_cnt += (ct_full > 0).astype(int)
        if is_and:
            feasible = present
        elif msm is not None:
            # a doc matching >= msm terms lives in a class where >= msm
            # of the terms have postings — same lattice, looser corner
            feasible = present_cnt >= msm
        else:
            feasible = ub > 0
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

        seed_keys = self._keys_for_classes(meta, seed)
        # θ-seeding: the seed classes' decode volume is bounded (classes
        # are added only until est >= k, blocks target TARGET_BLOCK
        # postings), so on an eligible index the seed phase is a driver-
        # side pyarrow read + numpy score — one Spark job round-trip
        # (~0.2-0.75 s measured, bench_extra.py) removed from every
        # pruned query. Fallback: the original distributed seed job.
        if fast and self._keys_volume(meta, seed_keys) \
                <= self.driver_max_postings:
            seed_top = self._score_local(
                self._blocks_local(terms, seed_keys), term_df, required,
                k, seed, n_docs, avgdl, msm, after)
        else:
            seed_top = [
                (int(r["doc_id"]), float(r["score"])) for r in self._score(
                    self._decode(terms, seed_keys), term_df, required, k,
                    keep_classes=seed, n_docs=n_docs, avgdl=avgdl,
                    min_terms=msm, after=after, filter_ids=filter_ids,
                ).collect()
            ]
        if len(seed_top) >= k:
            # θ is derived from a ROUNDED score; subtract a half-ulp of the
            # rounding so (a) rounding-up can't inflate θ past the true raw
            # k-th score and (b) docs tying the k-th rounded score (broken
            # by doc_id in the final sort) always survive pruning.
            theta = float(seed_top[-1][1]) - 0.5 * 10 ** (-ROUND_DECIMALS)
            keep = [c for c in order if ub[c] >= theta or c in set(seed)]
        else:
            keep = order  # not enough seeds: fall back to all feasible classes
        keep_keys = self._keys_for_classes(meta, keep)
        if fast and self._keys_volume(meta, keep_keys) \
                <= self.driver_max_postings:
            return self._rows_df(self._score_local(
                self._blocks_local(terms, keep_keys), term_df, required,
                k, keep, n_docs, avgdl, msm, after))
        return self._score(
            self._decode(terms, keep_keys), term_df, required, k,
            keep_classes=keep, n_docs=n_docs, avgdl=avgdl, min_terms=msm,
            after=after, filter_ids=filter_ids,
        )

    @staticmethod
    def _keys_volume(meta: pd.DataFrame,
                     keys: "set[tuple[str, int, int]]") -> int:
        """Total posting count of the given (term, gen, salt) block keys
        (from the already-fetched metadata — no extra scan)."""
        return int(sum(
            int(c) for t, g, s, c in zip(
                meta["term"], meta["gen"], meta["salt"], meta["count"])
            if (t, int(g), int(s)) in keys
        ))

    def _phrase_local(self, terms: list[str],
                      keys: "set[tuple[str, int, int]]",
                      within_classes: "list[int] | None"
                      ) -> "list[tuple[int, int]] | None":
        """Driver twin of the slop-0 phrase chain: decode the phrase
        terms' positions from the AND-feasible blocks via pyarrow +
        codec, then count adjacency tuples with sorted-key set
        intersections — (doc_id << log2(M)) | pos keys, one np.isin per
        adjacent term. Exactly the equi-join chain's semantics (the
        distributed plan re-executes the python decode subtree once per
        join branch; here positions decode ONCE). Returns None when the
        packing would overflow or the decoded volume exceeds the bound —
        the caller falls back to the distributed plan. Parity pinned by
        tests/test_fast_path.py."""
        uniq_terms = sorted(set(terms))
        blocks = self._blocks_local(
            uniq_terms, keys,
            cols=["term", "docs_vb", "tfs_vb", "pos_vb"])
        per_term: dict[str, list] = {t: [] for t in uniq_terms}
        total_pos = 0
        for i in range(len(blocks)):
            pvb = blocks["pos_vb"].iat[i]
            if not pvb:
                return None  # positions missing on disk: distributed path
            docs = codec.delta_decode(
                blocks["docs_vb"].iat[i]).astype(np.int64)
            tfs = codec.varbyte_decode(blocks["tfs_vb"].iat[i])
            total_pos += int(tfs.sum())
            if total_pos > 4 * self.driver_max_postings:
                return None  # tf-skewed volume: fall back
            flat = codec.positions_decode(pvb, tfs).astype(np.int64)
            drep = np.repeat(docs, tfs.astype(np.int64))
            per_term[blocks["term"].iat[i]].append((drep, flat))
        arrs = {}
        max_pos, max_doc = 0, 0
        for t in uniq_terms:
            if per_term[t]:
                d = np.concatenate([x[0] for x in per_term[t]])
                p = np.concatenate([x[1] for x in per_term[t]])
            else:
                d, p = np.empty(0, np.int64), np.empty(0, np.int64)
            if within_classes is not None and d.size:
                cls = xxh64_long_np(d) % np.int64(self.nb_max)
                m = np.isin(cls, np.asarray(sorted(within_classes),
                                            dtype=np.int64))
                d, p = d[m], p[m]
            if d.size == 0:
                return []  # a phrase term has no surviving positions
            arrs[t] = (d, p)
            max_pos = max(max_pos, int(p.max()))
            max_doc = max(max_doc, abs(int(d.min())), abs(int(d.max())))
        M = max_pos + len(terms) + 2
        if max_doc > (1 << 62) // M:
            return None  # key packing overflow: distributed path
        keysets = {t: np.sort(arrs[t][0] * M + arrs[t][1])
                   for t in set(terms)}
        S = keysets[terms[0]]
        for i, t in enumerate(terms[1:], start=1):
            if S.size == 0:
                return []
            S = S[np.isin(S + i, keysets[t], assume_unique=True)]
        if S.size == 0:
            return []
        docs_u, counts = np.unique(S // M, return_counts=True)
        return [(int(d), int(c)) for d, c in zip(docs_u, counts)]

    def phrase_search(self, phrase: str, field: str | None = None,
                      slop: int = 0,
                      within_classes: "list[int] | None" = None
                      ) -> DataFrame:
        """Phrase match over the positional segment store →
        (doc_id, phrase_tf). Decodes positions ONLY for the phrase's
        terms, restricted to salt classes where every term is present
        (AND feasibility over the aligned salting — the same pruning
        lattice the scorer uses), then chains adjacency equi-joins.
        Requires an index built with with_positions=True. On a fielded
        index the match is scoped to ``field`` (positions are per-field
        token offsets, so phrases never span fields).

        ``slop`` > 0 is the proximity query (ES match_phrase slop, ordered
        form): a match is any tuple of strictly increasing positions —
        one per term, in query order — whose last term sits within
        ``len(terms) - 1 + slop`` tokens of the first, i.e. up to ``slop``
        extra tokens interleave. phrase_tf counts such tuples. slop == 0
        is exactly the adjacency chain (strictly increasing positions with
        last == first + n - 1 pigeonholes every gap to 1), kept as
        equi-joins for the tighter physical plan. Each intermediate join
        is bounded by ``p_i <= p0 + i + slop`` — implied by the final
        window bound plus strict increase (p_{n-1} >= p_i + (n-1-i)), so
        the per-step pruning never changes results.

        ``within_classes`` restricts the result to docs whose salt class
        is in the list (intersected with the AND-feasibility lattice;
        blocks of a class hold only that class's docs, so the class cut
        is exact) — the hook rescore uses to decode positions ONLY for
        the classes its bounded window occupies."""
        if not self.positions:
            raise ValueError(
                "phrase_search requires a positional index — rebuild with "
                "build_segments(..., with_positions=True); this index was "
                "built without positions"
            )
        prefix, _, _ = self._resolve_field(field)
        terms = [prefix + t for t in analyze_query_py(phrase, self.analyzer)]
        empty = self._empty_df("doc_id long, phrase_tf long")
        if not terms:
            return empty
        meta = self._meta(sorted(set(terms)))
        if meta.empty or set(meta["term"].unique()) != set(terms):
            return empty
        # AND-feasible classes only
        nb_all = self.nb_max
        g = np.arange(nb_all)
        present = np.ones(nb_all, dtype=bool)
        for t, tgrp in meta.groupby("term"):
            ct_full = np.zeros(nb_all)
            for (gen, nb_t), grp in tgrp.groupby(["gen", "nb"]):
                nb_t = int(nb_t)
                ct = np.zeros(nb_t)
                ct[grp["salt"].to_numpy()] = grp["count"].to_numpy()
                ct_full += ct[g % nb_t]
            present &= ct_full > 0
        if within_classes is not None:
            mask = np.zeros(nb_all, dtype=bool)
            mask[[c for c in within_classes if 0 <= c < nb_all]] = True
            present &= mask
        classes = [int(x) for x in np.flatnonzero(present)]
        if not classes:
            return empty
        keys = self._keys_for_classes(meta, classes)
        # driver fast path (slop-0 only; slop chains and delta/tombstone
        # state keep the distributed plan): the blocks are bounded by the
        # AND-feasibility cut, and the distributed join chain re-executes
        # its python decode subtree once per adjacency branch — measured
        # 2-8 s for a two-term phrase at sf1.0 vs ~50 ms here.
        # admission on POSTING count (known from metadata); the decoder
        # itself re-checks the actual POSITION volume (sum tf, unknown
        # here) against 4x the bound and bails to the distributed plan
        # on tf-skewed data — so admission and runtime guard agree at
        # avg tf <= 4, and heavier docs degrade to a safe fallback
        if (self.driver_max_postings > 0 and slop <= 0
                and self._fast_eligible(None)
                and self._keys_volume(meta, keys)
                <= self.driver_max_postings):
            rows = self._phrase_local(terms, keys, within_classes)
            if rows is not None:
                return self._values_df(rows, "doc_id long, phrase_tf long")
        segs = self._filter_keys(self._segments(sorted(set(terms))), keys)
        par = self.spark.sparkContext.defaultParallelism
        decoded = segs.select("term", "gen", "docs_vb", "tfs_vb", "pos_vb") \
            .coalesce(max(1, par)) \
            .mapInPandas(_decode_blocks_positions, _POS_SCHEMA)
        if within_classes is not None:
            # the block-level cut is a SUPERSET when a low-df term's
            # nb_t < nb_max (one block salt covers several global
            # classes); this columnar re-derivation makes the cut exact
            decoded = decoded.filter(
                F.pmod(F.xxhash64(F.col("doc_id")), F.lit(nb_all))
                .cast("int").isin([int(c) for c in within_classes]))
        tomb = self._tombstones()
        if tomb is not None:
            decoded = (
                decoded.join(F.broadcast(tomb), "doc_id", "left")
                .filter(F.col("tgen").isNull() | (F.col("tgen") <= F.col("gen")))
                .drop("tgen")
            )
        cur = decoded.filter(F.col("term") == terms[0]).select("doc_id", F.col("pos").alias("p0"))
        for i, t in enumerate(terms[1:], start=1):
            nxt = decoded.filter(F.col("term") == t).select(
                F.col("doc_id").alias(f"d{i}"), F.col("pos").alias(f"p{i}")
            )
            if slop <= 0:
                pos_cond = F.col(f"p{i}") == F.col("p0") + i
            else:
                pos_cond = (F.col(f"p{i}") > F.col(f"p{i - 1}" if i > 1 else "p0")) & (
                    F.col(f"p{i}") <= F.col("p0") + i + slop
                )
            cur = cur.join(
                nxt,
                (F.col("doc_id") == F.col(f"d{i}")) & pos_cond,
            ).drop(f"d{i}")
        return (
            cur.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("phrase_tf"))
            .orderBy("doc_id")
        )

    def phrase_prefix_search(self, phrase: str, field: str | None = None,
                             max_expansions: int = 50) -> DataFrame:
        """ES ``match_phrase_prefix`` (the autocomplete query): exact
        phrase over every term but the LAST, which is a prefix expanded
        to the first ``max_expansions`` term-dictionary entries in
        lexicographic order (Lucene's expansion order and default cap),
        then matched as a MultiPhraseQuery — a position tuple counts if
        the last slot holds ANY expansion. → (doc_id, phrase_tf).

        Cost shape: the expansion is a METADATA-ONLY term-dictionary
        scan (the term-sorted segment layout row-group-prunes the range,
        like prefix_postings) with a bounded collect of <= max_expansions
        terms; the positional decode then reads only the exact terms +
        expansions, restricted to salt classes where every exact term AND
        at least one expansion is present — the same feasibility lattice
        phrase_search uses, with an OR corner for the expansion slot."""
        if not self.positions:
            raise ValueError(
                "phrase_prefix_search requires a positional index — "
                "rebuild with build_segments(..., with_positions=True)"
            )
        prefix, _, _ = self._resolve_field(field)
        toks = analyze_query_py(phrase, self.analyzer)
        empty = self._empty_df("doc_id long, phrase_tf long")
        if not toks:
            return empty
        exact = [prefix + t for t in toks[:-1]]
        last = prefix + toks[-1]
        expansions = [
            r["term"] for r in
            self._all_segments().filter(F.col("term").startswith(last))
            .select("term").distinct()
            .orderBy("term").limit(int(max_expansions)).collect()
        ]
        if not expansions:
            return empty
        all_terms = sorted(set(exact) | set(expansions))
        meta = self._meta(all_terms)
        if meta.empty or not set(exact) <= set(meta["term"].unique()):
            return empty
        nb_all = self.nb_max
        g = np.arange(nb_all)
        present = np.ones(nb_all, dtype=bool)
        exp_present = np.zeros(nb_all, dtype=bool)
        exact_set = set(exact)
        for t, tgrp in meta.groupby("term"):
            ct_full = np.zeros(nb_all)
            for (gen, nb_t), grp in tgrp.groupby(["gen", "nb"]):
                nb_t = int(nb_t)
                ct = np.zeros(nb_t)
                ct[grp["salt"].to_numpy()] = grp["count"].to_numpy()
                ct_full += ct[g % nb_t]
            if t in exact_set:
                present &= ct_full > 0
            else:
                exp_present |= ct_full > 0
        present &= exp_present
        classes = [int(x) for x in np.flatnonzero(present)]
        if not classes:
            return empty
        keys = self._keys_for_classes(meta, classes)
        segs = self._filter_keys(self._segments(all_terms), keys)
        par = self.spark.sparkContext.defaultParallelism
        decoded = segs.select("term", "gen", "docs_vb", "tfs_vb",
                              "pos_vb") \
            .coalesce(max(1, par)) \
            .mapInPandas(_decode_blocks_positions, _POS_SCHEMA)
        tomb = self._tombstones()
        if tomb is not None:
            decoded = (
                decoded.join(F.broadcast(tomb), "doc_id", "left")
                .filter(F.col("tgen").isNull()
                        | (F.col("tgen") <= F.col("gen")))
                .drop("tgen")
            )
        n = len(toks)
        if n == 1:
            # bare prefix phrase: every occurrence of any expansion counts
            return (
                decoded.filter(F.col("term").isin(expansions))
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("phrase_tf"))
                .orderBy("doc_id")
            )
        cur = decoded.filter(F.col("term") == exact[0]).select(
            "doc_id", F.col("pos").alias("p0"))
        for i, t in enumerate(exact[1:], start=1):
            nxt = decoded.filter(F.col("term") == t).select(
                F.col("doc_id").alias(f"d{i}"), F.col("pos").alias(f"p{i}"))
            cur = cur.join(
                nxt,
                (F.col("doc_id") == F.col(f"d{i}"))
                & (F.col(f"p{i}") == F.col("p0") + i),
            ).drop(f"d{i}")
        i = n - 1
        lastdf = decoded.filter(F.col("term").isin(expansions)).select(
            F.col("doc_id").alias(f"d{i}"), F.col("pos").alias(f"p{i}"))
        cur = cur.join(
            lastdf,
            (F.col("doc_id") == F.col(f"d{i}"))
            & (F.col(f"p{i}") == F.col("p0") + i),
        ).drop(f"d{i}")
        return (
            cur.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("phrase_tf"))
            .orderBy("doc_id")
        )

    def highlight(self, query: str, docs: DataFrame,
                  text_col: str = "content", doc_col: str = "doc_id",
                  k: int = 10, mode: str = "AND",
                  window: int = 8, prune: bool = True) -> DataFrame:
        """Top-k with snippets (the ES highlighter analog): BM25 search,
        then per hit the ``window``-token span covering the most distinct
        query terms, rendered from ``docs``' text with the index's own
        tokenization (see operators/highlight.py). Positions come from
        the positional store for JUST the query terms — the same data
        the phrase path decodes — so no corpus re-tokenize; the ``docs``
        join touches only the k hits. Requires with_positions=True;
        non-fielded indexes only (a fielded snippet would need the
        field's own source text)."""
        if not self.positions:
            raise ValueError(
                "highlight requires a positional index — rebuild with "
                "build_segments(..., with_positions=True)"
            )
        topk = self.search(query, k=k, mode=mode, prune=prune)
        terms = sorted(set(analyze_query_py(query, self.analyzer)))
        empty = self._empty_df(
            "doc_id long, score double, snippet string, n_window_terms long")
        if not terms:
            return empty
        meta = self._meta(terms)
        if meta.empty:
            return empty
        # decode positions only for the salt classes the k hits occupy
        # when the decode is volume-dominated (same gate + measurement as
        # rescore — BENCH/BASELINE.md (p); k hits cover <= k classes, so
        # at k=10 / nb_max=256 the cut removes >= 96% of the volume).
        # Exactness: highlight_topk joins positions to the k hit ids, so
        # sibling docs sharing a kept block drop out there.
        segs = self._segments(sorted(set(meta["term"].unique())))
        hit_ids = None
        if (k <= self.nb_max // 4
                and self.n_docs >= self.pos_classes_min_docs):
            rows = topk.collect()
            if not rows:
                return empty
            hit_ids = [int(r["doc_id"]) for r in rows]
            topk = self._rows_df(
                [(int(r["doc_id"]), float(r["score"])) for r in rows])
            # salt classes of the <= k hits, derived driver-side with the
            # parity-pinned hash (was a distinct+collect Spark job over a
            # local relation — pure round-trip overhead)
            from ..functions.hashing import xxh64_long
            classes = sorted(
                {pmod(xxh64_long(d), self.nb_max) for d in hit_ids})
            segs = self._filter_keys(segs,
                                     self._keys_for_classes(meta, classes))
        par = self.spark.sparkContext.defaultParallelism
        decoded = (
            segs
            .select("term", "gen", "docs_vb", "tfs_vb", "pos_vb")
            .coalesce(max(1, par))
            .mapInPandas(_decode_blocks_positions, _POS_SCHEMA)
        )
        tomb = self._tombstones()
        if tomb is not None:
            decoded = (
                decoded.join(F.broadcast(tomb), "doc_id", "left")
                .filter(F.col("tgen").isNull() | (F.col("tgen") <= F.col("gen")))
                .drop("tgen")
            )
        from .highlight import highlight_topk

        return highlight_topk(
            topk, decoded.select("term", "doc_id", "pos"), docs, terms,
            text_col, doc_col, window, hit_ids=hit_ids,
        )

    def more_like_this(self, doc_id: int, docs: DataFrame,
                       text_col: str = "content", doc_col: str = "doc_id",
                       k: int = 10, max_query_terms: int = 25,
                       min_term_freq: int = 1, min_doc_freq: int = 1,
                       prune: bool = True) -> DataFrame:
        """ES more_like_this over the PERSISTED index (the scale path of
        operators/search_ext.more_like_this). The inverted store has no
        forward (doc → terms) index — exactly ES's situation without
        term vectors — so the source doc's (term, tf) comes from
        re-analyzing its text out of ``docs`` (ONE row, driver-side,
        like ES's like-text analysis); df comes from the metadata-only
        block scan (zero posting decode). Term selection (tf·idf desc,
        6-dp half-up rounding, term-asc tie-break) is a ≤|doc| python
        sort; the query itself is the ordinary pruned OR search at k+1
        with the source dropped — exact, since removing at most one row
        from an exact top-(k+1) leaves the exact top-k of the rest."""
        from .similarity import _round_half_up

        empty = self._empty_df("doc_id long, score double")
        row = (docs.filter(F.col(doc_col) == int(doc_id))
               .select(text_col).limit(1).collect())
        if not row or row[0][0] is None:
            return empty
        toks = analyze_query_py(row[0][0], self.analyzer)
        if not toks:
            return empty
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        prefix, n_docs, avgdl = self._resolve_field(None)
        meta = self._meta(sorted(prefix + t for t in tf))
        if meta.empty or n_docs == 0:
            return empty
        term_df = {t[len(prefix):]: int(g["count"].sum())
                   for t, g in meta.groupby("term")}
        ranked = sorted(
            ((_round_half_up(tf[t] * self._idf(df_t, n_docs), 6), t)
             for t, df_t in term_df.items()
             if tf[t] >= int(min_term_freq) and df_t >= int(min_doc_freq)),
            key=lambda x: (-x[0], x[1]),
        )[: int(max_query_terms)]
        if not ranked:
            return empty
        sel = self.search(" ".join(sorted(t for _, t in ranked)),
                          k=int(k) + 1, mode="OR", prune=prune)
        return (sel.filter(F.col("doc_id") != int(doc_id))
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(int(k)))

    def match_ids(self, query: str, mode: str = "AND",
                  field: str | None = None,
                  min_should_match: int | None = None) -> DataFrame:
        """The FULL match set (doc_id only, no top-k cut) — what facet
        aggregation runs over. Exhaustive decode of the query terms'
        postings (block-max pruning is inapplicable: every match is
        needed, not just the best k), tombstone-aware, with the same
        AND/OR/msm predicate as search()."""
        prefix, n_docs, _ = self._resolve_field(field)
        terms = sorted(
            {prefix + t for t in analyze_query_py(query, self.analyzer)}
        )
        empty = self._empty_df("doc_id long")
        if not terms or n_docs == 0:
            return empty
        meta = self._meta(terms)
        if meta.empty:
            return empty
        found = set(meta["term"].unique())
        is_and = mode.upper() == "AND"
        if is_and and found != set(terms):
            return empty
        need = len(found) if is_and else max(1, int(min_should_match or 1))
        if need > len(found):
            return empty
        decoded = self._decode(sorted(found), None)
        tomb = self._tombstones()
        if tomb is not None:
            decoded = (
                decoded.join(F.broadcast(tomb), "doc_id", "left")
                .filter(F.col("tgen").isNull() | (F.col("tgen") <= F.col("gen")))
                .drop("tgen")
            )
        return (
            decoded.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("nterms"))
            .filter(F.col("nterms") >= need)
            .select("doc_id")
        )

    def search_facets(self, query: str, docs: DataFrame,
                      facet_cols: list[str], mode: str = "AND",
                      doc_col: str = "doc_id",
                      min_should_match: int | None = None) -> DataFrame:
        """ES terms-aggregation analog: bucket counts of ``facet_cols``
        over the ENTIRE match set of ``query`` (not just the top k —
        exactly like ES aggs run on all hits). One distributed groupBy
        per facet over the doc_id-joined metadata; the match set is a
        semi-join-shaped doc_id column, so only the facet columns of
        matching docs are ever read (column pruning). Output
        (facet, value, n) ordered (facet asc, n desc, value asc) — the
        ES bucket order, made total for determinism."""
        ids = self.match_ids(query, mode, min_should_match=min_should_match)
        joined = docs.select(
            F.col(doc_col).alias("doc_id"), *facet_cols
        ).join(ids, "doc_id")
        parts = [
            joined.groupBy(F.col(c).alias("value"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(c).alias("facet"), "value", "n")
            for c in facet_cols
        ]
        cur = parts[0]
        for pdf in parts[1:]:
            cur = cur.unionByName(pdf)
        return cur.orderBy(F.asc("facet"), F.desc("n"), F.asc("value"))

    def rescore(self, query: str, phrase: str, k: int = 10,
                window_size: int = 50, query_weight: float = 1.0,
                rescore_weight: float = 1.0, mode: str = "AND",
                slop: int = 0) -> DataFrame:
        """ES ``rescore`` analog (the reference's query surface lives in
        Elasticsearch — configs/referenceSchema.json — which rescores a
        top window with a secondary query, typically ``match_phrase``):
        take the BM25 top ``window_size`` of ``query``, score ``phrase``
        against those docs with Lucene PhraseQuery semantics — idf summed
        over the phrase's term LIST (duplicates counted per occurrence),
        tf = phrase frequency, the same k1/b length saturation — and
        re-rank by

            query_weight * bm25 + rescore_weight * phrase_score

        Docs outside the window never enter (ES semantics); window docs
        without the phrase keep phrase_score = 0. ``slop`` > 0 rescores
        with the ordered proximity form instead of exact adjacency (tf =
        proximity-tuple count, phrase_search's slop semantics). Requires
        a positional index (phrase_search).

        Scale shape: the window is <= window_size rows, so everything
        derived from it is broadcast-sized. The phrase match is the
        class-pruned positional decode phrase_search already does; its
        output and the one-term doc_len decode are both cut down to the
        window by a broadcast left-semi join BEFORE the outer join, so no
        corpus-sized side ever builds a hash table."""
        # Two window shapes, picked by how much the window's salt classes
        # can prune the positional decode (same-window A/B at sf0.1: a
        # 50-doc window covers 31/64 classes — the cut saves ~2% there
        # but costs two extra driver round-trips; at nb_max=256 the same
        # window covers <= 20% of classes and the decode cut dominates):
        #   * window_size <= nb_max/4 — MATERIALIZE the window (bounded
        #     <= window_size rows), derive its classes with one tiny
        #     local-relation job, and restrict the phrase + doc_len
        #     decodes to those classes;
        #   * otherwise — keep the window lazy (no extra jobs) and decode
        #     all AND-feasible classes, the pre-optimization shape.
        use_classes = (int(window_size) <= self.nb_max // 4
                       and self.n_docs >= self.pos_classes_min_docs)
        if use_classes:
            win_rows = self.search(query, k=window_size, mode=mode).collect()
            if not win_rows:
                return self._empty_df("doc_id long, score double")
            win = self.spark.createDataFrame(
                [(int(r["doc_id"]), float(r["score"])) for r in win_rows],
                "doc_id long, score double")
        else:
            win = self.search(query, k=window_size, mode=mode)
        prefix, n_docs, avgdl = self._resolve_field(None)
        pterms = [prefix + t
                  for t in analyze_query_py(phrase, self.analyzer)]
        qw, rw = float(query_weight), float(rescore_weight)

        def rank(df: DataFrame) -> DataFrame:
            return df.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

        passthrough = win.select(
            "doc_id", F.round(F.lit(qw) * F.col("score"),
                              ROUND_DECIMALS).alias("score"))
        if not pterms:
            return rank(passthrough)
        meta = self._meta(sorted(set(pterms)))
        if meta.empty or set(meta["term"].unique()) != set(pterms):
            # a phrase term absent from the corpus => no phrase matches
            return rank(passthrough)
        # Lucene-faithful df (metadata counts, superseded postings included
        # until fold — same caveat as search()); idf summed per OCCURRENCE
        term_df = {t: int(g["count"].sum()) for t, g in meta.groupby("term")}
        idf_sum = sum(self._idf(term_df[t], n_docs) for t in pterms)
        win_classes = None
        if use_classes:
            win_classes = [
                int(r["c"]) for r in
                win.select(F.pmod(F.xxhash64(F.col("doc_id")),
                                  F.lit(self.nb_max)).cast("int").alias("c"))
                .distinct().collect()
            ]
        win_ids = F.broadcast(win.select("doc_id"))
        ph = (self.phrase_search(phrase, slop=slop,
                                 within_classes=win_classes)
              .join(win_ids, "doc_id", "left_semi"))
        # doc_len: decode ONE phrase term's postings (every phrase doc
        # contains every phrase term), restricted to the window's salt
        # classes at the block level when those are known,
        # window-restricted, tombstone-aware
        dl = self._decode(
            [pterms[0]],
            None if win_classes is None else self._keys_for_classes(
                meta[meta["term"] == pterms[0]], win_classes))
        tomb = self._tombstones()
        if tomb is not None:
            dl = (dl.join(F.broadcast(tomb), "doc_id", "left")
                  .filter(F.col("tgen").isNull()
                          | (F.col("tgen") <= F.col("gen")))
                  .drop("tgen"))
        dl = (dl.join(win_ids, "doc_id", "left_semi")
              .groupBy("doc_id").agg(F.max("doc_len").alias("doc_len")))
        ptf = F.col("phrase_tf").cast("double")
        sat = ptf * (BM25_K1 + 1.0) / (
            ptf + BM25_K1 * (1.0 - BM25_B
                             + BM25_B * F.col("doc_len") / F.lit(avgdl)))
        sec = (ph.join(dl, "doc_id")
               .select("doc_id", (F.lit(idf_sum) * sat).alias("sec")))
        combined = win.join(F.broadcast(sec), "doc_id", "left").select(
            "doc_id",
            F.round(F.lit(qw) * F.col("score")
                    + F.lit(rw) * F.coalesce(F.col("sec"), F.lit(0.0)),
                    ROUND_DECIMALS).alias("score"))
        return rank(combined)

    def _scored_match_set(self, query: str, mode: str = "AND",
                          field: str | None = None) -> DataFrame:
        """Full rounded (doc_id, score) BM25 match set — no top-k cut and
        NO block-max pruning, because every consumer (function_score,
        boosting, dis_max) applies a per-document transform that voids
        the per-class score upper bounds. Exhaustive decode, same
        tombstone/df semantics as search()."""
        prefix, n_docs, avgdl = self._resolve_field(field)
        terms = sorted(
            {prefix + t for t in analyze_query_py(query, self.analyzer)}
        )
        empty = self._empty_df("doc_id long, score double")
        if not terms or n_docs == 0:
            return empty
        meta = self._meta(terms)
        if meta.empty:
            return empty
        found = set(meta["term"].unique())
        is_and = mode.upper() == "AND"
        if is_and and found != set(terms):
            return empty
        terms = sorted(found)
        term_df = {t: int(g["count"].sum()) for t, g in meta.groupby("term")}
        required = len(terms) if is_and else None
        return self._score(self._decode(terms, None), term_df, required,
                           None, n_docs=n_docs, avgdl=avgdl)

    def count(self, query: str, mode: str = "AND",
              field: str | None = None,
              min_should_match: int | None = None) -> DataFrame:
        """ES ``_count`` API: the match-set size without ranking — one
        row (count). Rides match_ids (exhaustive by definition: counting
        needs every match, top-k pruning is inapplicable); the plan is
        the match semi-shape plus a single scalar aggregate."""
        ids = self.match_ids(query, mode, field=field,
                             min_should_match=min_should_match)
        return ids.agg(F.count(F.lit(1)).cast("long").alias("count"))

    def describe(self) -> DataFrame:
        """ES ``_cat/indices`` / ``_stats`` analog: one row of index
        health, METADATA-ONLY (the docs table, the segment columns
        minus the vb binaries, and the loaded manifest — no posting
        bytes decoded): live/deleted doc counts, avgdl, delta
        generations, term/block/posting counts, layout knobs. The
        operational check a 10^12-file deployment runs before and after
        every ingest window."""
        docs = self.spark.read.parquet(pjoin(self.path, "docs"))
        if "deleted" in docs.columns:
            docs = docs.filter(~F.col("deleted"))
        seg_stats = (
            self._all_segments()
            .agg(F.countDistinct("term").alias("n_terms"),
                 F.count(F.lit(1)).alias("n_blocks"),
                 F.sum("count").alias("n_postings"))
        )
        doc_stats = docs.agg(F.count(F.lit(1)).alias("docs_live"))
        # the docs table holds only LIVE rows (apply_upserts anti-joins
        # replaced/deleted ids out); true deletions = tombstoned ids with
        # no live row — tombstones that merely superseded an upsert have
        # a live replacement
        tomb = self._tombstones()
        if tomb is None:
            del_stats = self.spark.range(1).select(
                F.lit(0).cast("long").alias("docs_deleted"))
        else:
            del_stats = (
                tomb.join(docs.select("doc_id").distinct(),
                          "doc_id", "left_anti")
                .agg(F.count(F.lit(1)).alias("docs_deleted"))
            )
        return (
            doc_stats.crossJoin(seg_stats).crossJoin(del_stats)
            .select(
                F.lit(self.n_docs).cast("long").alias("n_docs"),
                F.col("docs_live").cast("long"),
                F.col("docs_deleted").cast("long"),
                F.round(F.lit(self.avgdl), 4).alias("avgdl"),
                F.lit(len(self.generations)).cast("int")
                .alias("delta_generations"),
                F.col("n_terms").cast("long"),
                F.col("n_blocks").cast("long"),
                F.col("n_postings").cast("long"),
                F.lit(self.n_buckets).cast("int").alias("n_buckets"),
                F.lit(self.nb_max).cast("int").alias("nb_max"),
                F.lit(bool(self.positions)).alias("positions"),
                F.lit(sorted(self.field_stats) if self.field_stats else []
                      ).alias("fields"),
            )
        )

    def has_child(self, child_query: str, relations: DataFrame,
                  k: int = 10, score_mode: str = "max",
                  mode: str = "AND", child_col: str = "doc_id",
                  parent_col: str = "parent_id") -> DataFrame:
        """ES ``has_child`` joining query: return PARENT ids whose
        children match ``child_query``, scored by folding the children's
        BM25 — score_mode in {max, sum, avg, none} (ES's score modes;
        'none' scores every parent 0.0 like ES's default). ``relations``
        maps child doc_id → parent_id (the join-field table; ES stores
        the same mapping in its join field).

        Plan: the child match set (exhaustive — the fold over children
        voids per-class bounds) joins the relation column-pruned to
        (child, parent), then ONE partial-aggregable parent fold. The
        relation join shuffles on doc_id, bounded by matching children —
        never all children. Output (parent_id, score)."""
        if score_mode not in ("max", "sum", "avg", "none"):
            raise ValueError(f"unknown score_mode {score_mode!r}")
        scored = self._scored_match_set(child_query, mode)
        rel = relations.select(F.col(child_col).alias("doc_id"),
                               F.col(parent_col).alias("parent_id"))
        joined = scored.join(rel, "doc_id")
        agg = {"max": F.max("score"), "sum": F.sum("score"),
               "avg": F.avg("score"),
               "none": F.lit(0.0)}[score_mode]
        return (
            joined.groupBy("parent_id")
            .agg(F.round(agg, ROUND_DECIMALS).alias("score"))
            .orderBy(F.desc("score"), F.asc("parent_id"))
            .limit(k)
        )

    def has_parent(self, parent_query: str, relations: DataFrame,
                   k: int = 10, score: bool = False,
                   mode: str = "AND", child_col: str = "doc_id",
                   parent_col: str = "parent_id") -> DataFrame:
        """ES ``has_parent`` joining query: return CHILD ids whose parent
        matches ``parent_query``. ``score=False`` (the ES default) gives
        every child 0.0; ``score=True`` propagates the parent's BM25 to
        each of its children. One broadcast-friendly join of the parent
        match/score set into the relation. Output (doc_id, score)."""
        scored = self._scored_match_set(parent_query, mode)
        if not score:
            scored = scored.select("doc_id", F.lit(0.0).alias("score"))
        rel = relations.select(F.col(child_col).alias("child_id"),
                               F.col(parent_col).alias("doc_id"))
        return (
            rel.join(scored, "doc_id")
            .select(F.col("child_id").alias("doc_id"),
                    F.round(F.col("score"), ROUND_DECIMALS).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def constant_score(self, query: str, boost: float = 1.0, k: int = 10,
                       mode: str = "AND",
                       field: str | None = None) -> DataFrame:
        """ES constant_score query: every matching doc scores exactly
        ``boost`` — the filter-to-query wrapper (no BM25 computed at
        all; the plan is match_ids + a literal). Ties break by doc_id
        like everywhere else, so the top-k is the first k doc_ids."""
        ids = self.match_ids(query, mode, field=field)
        return (
            ids.select("doc_id",
                       F.round(F.lit(float(boost)), ROUND_DECIMALS)
                       .alias("score"))
            .orderBy(F.asc("doc_id"))
            .limit(k)
        )

    def boosting(self, positive: str, negative: str,
                 negative_boost: float = 0.5, k: int = 10,
                 mode: str = "AND",
                 field: str | None = None) -> DataFrame:
        """ES boosting query: rank by the positive query's BM25; any doc
        ALSO matching the negative query (OR over its terms, like ES's
        inner query default) keeps its rank signal but demoted —
        score · negative_boost. Exhaustive over the positive match set
        (the demotion multiplier voids block-max bounds: a demoted seed
        doc can fall below an unseen undemoted one); the negative side
        is a match_ids semi-shape joined as an existence flag."""
        pos = self._scored_match_set(positive, mode, field)
        neg = self.match_ids(negative, "OR", field=field) \
            .withColumn("neg", F.lit(True))
        nb = float(negative_boost)
        demoted = pos.join(neg, "doc_id", "left").select(
            "doc_id",
            F.round(
                F.when(F.col("neg"), F.col("score") * F.lit(nb))
                .otherwise(F.col("score")), ROUND_DECIMALS).alias("score"))
        return (demoted.orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k))

    def dis_max(self, queries: list[str], tie_breaker: float = 0.0,
                k: int = 10, field: str | None = None) -> DataFrame:
        """ES dis_max query: per doc, the BEST subquery score plus
        ``tie_breaker`` times the others —

            max(s_i) + tie_breaker · (Σ s_i − max(s_i))

        Each subquery scores as an OR match (the ES match default). One
        scored set per subquery, a no-shuffle union, one (doc) agg of
        max+sum — never a per-doc loop. Exhaustive (the max across
        subqueries is not boundable by any single subquery's block
        maxima)."""
        tb = float(tie_breaker)
        empty = self._empty_df("doc_id long, score double")
        sets = [self._scored_match_set(q, "OR", field) for q in queries]
        sets = [s for s in sets if s is not None]
        if not sets:
            return empty
        cur = sets[0]
        for s in sets[1:]:
            cur = cur.unionByName(s)
        combined = (
            cur.groupBy("doc_id")
            .agg(F.max("score").alias("best"), F.sum("score").alias("tot"))
            .select(
                "doc_id",
                F.round(F.col("best")
                        + F.lit(tb) * (F.col("tot") - F.col("best")),
                        ROUND_DECIMALS).alias("score"))
        )
        return (combined.orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k))

    def function_score(self, query: str, docs: DataFrame, factor_col: str,
                       k: int = 10, mode: str = "AND", factor: float = 1.0,
                       modifier: str = "log1p",
                       boost_mode: str = "multiply",
                       doc_col: str = "doc_id",
                       field: str | None = None) -> DataFrame:
        """ES ``function_score`` / ``field_value_factor`` analog: top-k by

            bm25 <boost_mode> modifier(factor * doc[factor_col])

        with modifier in {log1p, sqrt, none} and boost_mode in
        {multiply, sum} — the recency/popularity boost shape the
        reference's ES queries get for free from the serving index.

        Block-max pruning is OFF here by construction: a per-document
        multiplier voids the per-class score upper bounds (a low-BM25 doc
        with a huge field value can out-rank every seed), so this scores
        the FULL match set — exhaustive decode like match_ids — joins the
        boost column (column-pruned to (doc_id, factor_col)), and takes
        top-k via orderBy+limit (TakeOrderedAndProject: per-partition
        heaps, k rows to the driver)."""
        if modifier not in ("log1p", "sqrt", "none"):
            raise ValueError(f"unknown modifier {modifier!r}")
        if boost_mode not in ("multiply", "sum"):
            raise ValueError(f"unknown boost_mode {boost_mode!r}")
        scored = self._scored_match_set(query, mode, field)
        fac = F.col(factor_col).cast("double") * F.lit(float(factor))
        boost = {"log1p": F.log1p(fac), "sqrt": F.sqrt(fac),
                 "none": fac}[modifier]
        boosts = docs.select(F.col(doc_col).alias("doc_id"),
                             boost.alias("boost"))
        combined = (F.col("score") * F.col("boost")
                    if boost_mode == "multiply"
                    else F.col("score") + F.col("boost"))
        return (
            scored.join(boosts, "doc_id")
            .select("doc_id",
                    F.round(combined, ROUND_DECIMALS).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def search_histogram(self, query: str, docs: DataFrame, field: str,
                         interval: float, mode: str = "AND",
                         doc_col: str = "doc_id") -> DataFrame:
        """ES histogram aggregation over the ENTIRE match set (like
        search_facets: aggs see all hits, not the top k): buckets of
        ``field`` at fixed ``interval``, key = floor(value/interval) ·
        interval (the ES bucket key), empty buckets omitted (ES
        min_doc_count=1 form). One semi-join-shaped match set + one
        groupBy; the metadata scan is column-pruned to (doc_id, field).
        Output (bucket double, n long) ordered by bucket."""
        iv = float(interval)
        if iv <= 0:
            raise ValueError("interval must be positive")
        ids = self.match_ids(query, mode)
        # docs missing the field are ignored (ES histogram semantics)
        joined = docs.select(F.col(doc_col).alias("doc_id"),
                             F.col(field).cast("double").alias("v")
                             ).filter(F.col("v").isNotNull()
                                      ).join(ids, "doc_id")
        return (
            joined.select(
                (F.floor(F.col("v") / F.lit(iv)) * F.lit(iv)).alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("bucket")
        )

    def search_stats(self, query: str, docs: DataFrame, field: str,
                     mode: str = "AND", doc_col: str = "doc_id") -> DataFrame:
        """ES stats aggregation over the entire match set: one row of
        (count, min, max, sum, avg) for ``field`` — a single partial-
        aggregable pass, no shuffle wider than one row per partition.
        sum/avg rounded to ROUND_DECIMALS for oracle-stable compares."""
        ids = self.match_ids(query, mode)
        # docs missing the field are ignored (ES stats counts docs WITH
        # the field, and min/max/sum/avg would skip them anyway)
        joined = docs.select(F.col(doc_col).alias("doc_id"),
                             F.col(field).cast("double").alias("v")
                             ).filter(F.col("v").isNotNull()
                                      ).join(ids, "doc_id")
        return joined.agg(
            F.count(F.lit(1)).alias("count"),
            F.min("v").alias("min"),
            F.max("v").alias("max"),
            F.round(F.sum("v"), ROUND_DECIMALS).alias("sum"),
            F.round(F.avg("v"), ROUND_DECIMALS).alias("avg"),
        )

    def search_cardinality(self, query: str, docs: DataFrame, field: str,
                           mode: str = "AND", doc_col: str = "doc_id",
                           exact: bool = False,
                           rsd: float = 0.05) -> DataFrame:
        """ES cardinality aggregation: distinct count of ``field`` over
        the match set. Default is the HLL++ sketch
        (approx_count_distinct, max relative error ``rsd``) — the SAME
        algorithm ES's cardinality agg uses, mergeable across partitions
        with fixed sketch memory (the reason exact distinct is the wrong
        default at 100 TB). ``exact=True`` switches to a true distinct
        (one extra shuffle) for small sets / oracle gates.
        Output: one row (value long)."""
        ids = self.match_ids(query, mode)
        joined = docs.select(F.col(doc_col).alias("doc_id"), field
                             ).join(ids, "doc_id")
        agg = (F.count_distinct(F.col(field)) if exact
               else F.approx_count_distinct(F.col(field), rsd))
        return joined.agg(agg.cast("long").alias("value"))

    def significant_terms(self, query: str, docs: DataFrame, k: int = 10,
                          mode: str = "AND", text_col: str = "text",
                          doc_col: str = "doc_id",
                          min_doc_count: int = 1) -> DataFrame:
        """ES significant_terms aggregation (JLH heuristic): terms
        over-represented in the MATCH SET (foreground) relative to the
        whole index (background) —

            JLH = (fg% − bg%) · (fg% / bg%)

        with fg% = fg/|matches|, bg% = df/n_docs. The query's own terms
        are excluded (ES does the same — they are trivially significant).

        Sides are sourced the scale-right way round: background df comes
        from the AT-REST per-term stats table (O(vocabulary) metadata, no
        corpus scan — reflects the base build, like ES's shard-level
        background), while the foreground re-analyzes ONLY the matched
        documents with the index's own vectorized analyzer (distinct
        terms per doc — document frequency, not term frequency). The one
        scalar driver value is |matches| (a count aggregate). Output
        (term, fg, bg, score), top-k by score desc / term asc."""
        if self.field_stats:
            # the at-rest stats table keys composite field\x1fterm rows on
            # a fielded index — joining them against the unprefixed
            # foreground would silently yield nothing; refuse loudly
            raise ValueError(
                "significant_terms supports unfielded indexes; per-field "
                "background models are unimplemented"
            )
        ids = self.match_ids(query, mode)
        n_fg = ids.count()
        empty = self._empty_df("term string, fg long, bg long, score double")
        if n_fg == 0:
            return empty
        # Join the match set into docs BEFORE the analyzer/explode
        # (VERDICT r5 #1): Catalyst never pushes a join below a Generate,
        # so the previous analyze-then-join form tokenized the ENTIRE
        # corpus and only then discarded non-matches — a full-corpus
        # scan+tokenize per aggregation at scale. With the join first,
        # only the matched documents are re-analyzed.
        matched = docs.select(
            F.col(doc_col).alias("doc_id"), F.col(text_col).alias("_fg_text")
        ).join(ids, "doc_id")
        fg = (
            matched.select(
                F.explode(F.array_distinct(
                    analyzer_column(F.col("_fg_text"), self.analyzer)
                )).alias("term"),
            )
            .groupBy("term").agg(F.count(F.lit(1)).alias("fg"))
        )
        bg = (
            self.spark.read.parquet(pjoin(self.path, self.stats_file))
            .groupBy("term").agg(F.sum("df").alias("bg"))
        )
        qterms = sorted(set(analyze_query_py(query, self.analyzer)))
        fgp = F.col("fg").cast("double") / F.lit(float(n_fg))
        bgp = F.col("bg").cast("double") / F.lit(float(self.n_docs))
        score = (fgp - bgp) * (fgp / bgp)
        return (
            fg.join(bg, "term")
            .filter(~F.col("term").isin(qterms)
                    & (F.col("fg") >= int(min_doc_count)))
            .select("term", "fg", "bg",
                    F.round(score, ROUND_DECIMALS).alias("score"))
            .orderBy(F.desc("score"), F.asc("term"))
            .limit(k)
        )

    def search_synonyms(self, query: str, synonyms: dict[str, list[str]],
                        k: int = 10, mode: str = "AND",
                        field: str | None = None) -> DataFrame:
        """ES synonym filter / Lucene SynonymQuery analog (the reference's
        index gets synonyms from the ES analysis chain —
        configs/referenceSchema.json): each analyzed query term expands to
        its synonym set, and the SET scores as ONE pseudo-term — per doc
        tf = Σ member tfs, df = max member df (Lucene SynonymWeight's
        docFreq), one idf per set. AND mode requires every SET matched
        (by any member), not every member; a set with no member in the
        corpus makes an AND query empty and is skipped under OR.

        Plan shape: decode of exactly the member terms' postings, a
        broadcast (term → set) mapping join, a (doc_id, set) partial-
        aggregable sum (the synonym fold), a broadcast per-set df join,
        then the same doc-level aggregation every query pays. The extra
        exchange vs plain search is the (doc_id, set) groupBy — bounded
        by the decoded posting count, never corpus-sized."""
        prefix, n_docs, avgdl = self._resolve_field(field)
        base = analyze_query_py(query, self.analyzer)
        groups: list[set[str]] = []
        seen: set[str] = set()
        for t in base:
            if t in seen:
                continue
            seen.add(t)
            members = {t}
            for s in synonyms.get(t, []):
                members.update(analyze_query_py(s, self.analyzer))
            groups.append({prefix + m for m in members})
        empty = self._empty_df("doc_id long, score double")
        if not groups or n_docs == 0:
            return empty
        meta = self._meta(sorted(set().union(*groups)))
        if meta.empty:
            return empty
        df_by_term = {t: int(g["count"].sum())
                      for t, g in meta.groupby("term")}
        is_and = mode.upper() == "AND"
        mapping: list[tuple[str, int]] = []
        gid_df: dict[int, int] = {}
        for g in groups:
            present = sorted(g & set(df_by_term))
            if not present:
                if is_and:
                    return empty  # a whole set absent => no AND match
                continue
            gid = len(gid_df)
            mapping.extend((t, gid) for t in present)
            gid_df[gid] = max(df_by_term[t] for t in present)
        if not mapping:
            return empty
        decoded = self._decode(sorted({t for t, _ in mapping}), None)
        tomb = self._tombstones()
        if tomb is not None:
            decoded = (
                decoded.join(F.broadcast(tomb), "doc_id", "left")
                .filter(F.col("tgen").isNull()
                        | (F.col("tgen") <= F.col("gen")))
                .drop("tgen")
            )
        mdf = self.spark.createDataFrame(mapping, "term string, gid int")
        gstats = self.spark.createDataFrame(
            [(g, d) for g, d in gid_df.items()], "gid int, df long")
        grouped = (
            decoded.join(F.broadcast(mdf), "term")
            .groupBy("doc_id", "gid")
            .agg(F.sum("tf").alias("tf"), F.max("doc_len").alias("doc_len"))
        )
        partial = bm25_partial_col(
            F.col("tf").cast("double"), F.col("doc_len").cast("double"),
            F.col("df").cast("double"), n_docs, avgdl)
        scored = (
            grouped.join(F.broadcast(gstats), "gid")
            .select("doc_id", partial.alias("partial"))
            .groupBy("doc_id")
            .agg(F.sum("partial").alias("raw"),
                 F.count(F.lit(1)).alias("ngroups"))
        )
        if is_and:
            scored = scored.filter(F.col("ngroups") == len(gid_df))
        return (
            scored.select("doc_id",
                          F.round(F.col("raw"), ROUND_DECIMALS)
                          .alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def search_multi(self, query: str, weights: dict[str, float],
                     k: int = 10, mode: str = "AND") -> DataFrame:
        """Weighted multi-field BM25 top-k over the persisted fielded
        store — the ES ``multi_match`` (most_fields) analog for the
        reference schema's boosted per-field indexes
        (configs/referenceSchema.json:50-59): each queried field scores
        with its OWN norms (df, docCount, avgdl from the manifest's
        field_stats) and the document score is the boost-weighted sum
        across fields. mode="AND" requires every query term to match in
        at least one queried field (ES most_fields + operator=and);
        "OR" keeps any doc with any (field, term) hit.

        One scan serves all fields: the composite ``field\\x1fterm`` keys
        of every (field, term) pair go through the same metadata-pruned
        decode as a single-field query, and the per-field idf·boost is
        precomputed driver-side into a |fields|·|terms|-row broadcast —
        scoring stays 100% columnar. Fields whose delta field_stats say
        n_docs == 0 (fully deleted) contribute nothing."""
        if not self.field_stats:
            raise ValueError(
                "search_multi requires an index built with "
                "build_segments(fields=...); this index is unfielded"
            )
        unknown = set(weights) - set(self.field_stats)
        if unknown:
            raise KeyError(
                f"unknown fields {sorted(unknown)}; index has "
                f"{sorted(self.field_stats)}"
            )
        base_terms = sorted(set(analyze_query_py(query, self.analyzer)))
        empty = self._empty_df("doc_id long, score double")
        fparams = {}
        for f, w in weights.items():
            fs = self.field_stats[f]
            if int(fs["n_docs"]) > 0:
                fparams[f] = (float(w), int(fs["n_docs"]),
                              float(fs["avgdl"]) or 1.0)
        if not base_terms or not fparams:
            return empty
        comp = sorted(f + FIELD_SEP + t for f in fparams for t in base_terms)
        meta = self._meta(comp)
        if meta.empty:
            return empty
        found = sorted(meta["term"].unique())
        is_and = mode.upper() == "AND"
        matched_base = {c.split(FIELD_SEP, 1)[1] for c in found}
        if is_and and matched_base != set(base_terms):
            return empty  # a required term is absent from every field
        # Lucene-faithful df per composite key (superseded postings count
        # until fold, same as search()); idf uses the FIELD's docCount
        term_df = {t: int(g["count"].sum()) for t, g in meta.groupby("term")}
        rows = []
        for c in found:
            f, t = c.split(FIELD_SEP, 1)
            w, n_f, avgdl_f = fparams[f]
            rows.append((c, t, w * self._idf(term_df[c], n_f), avgdl_f))
        params = self.spark.createDataFrame(
            rows, "term string, base string, widf double, favgdl double"
        )
        decoded = self._decode(found, None)
        tomb = self._tombstones()
        if tomb is not None:
            decoded = (
                decoded.join(F.broadcast(tomb), "doc_id", "left")
                .filter(F.col("tgen").isNull() | (F.col("tgen") <= F.col("gen")))
                .drop("tgen")
            )
        cand = decoded.join(F.broadcast(params), "term")
        tf = F.col("tf").cast("double")
        dl = F.col("doc_len").cast("double")
        partial = (
            F.col("widf") * tf * (BM25_K1 + 1.0)
            / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / F.col("favgdl")))
        )
        scored = (
            cand.select("doc_id", "base", partial.alias("partial"))
            .groupBy("doc_id")
            .agg(F.sum("partial").alias("raw"),
                 F.countDistinct("base").alias("nbase"))
        )
        if is_and:
            scored = scored.filter(F.col("nbase") == len(base_terms))
        return (
            scored.select(
                "doc_id", F.round(F.col("raw"), ROUND_DECIMALS).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def prefix_postings(self, prefix: str,
                        field: str | None = None) -> DataFrame:
        """Live postings of every term starting with ``prefix`` — the ES
        ``prefix`` query's expansion stage, as a term-RANGE scan over the
        segment store: ``term.startswith(prefix)`` reaches parquet as a
        pushed StringStartsWith filter, and because segment files are
        term-SORTED (segments.py stage 2), row-group min/max statistics
        prune everything outside the range — the scan decodes only
        matching blocks even though bucket directories (term-HASH
        partitioned) cannot pre-select. On a fielded index the range is
        scoped to ``field`` (default: the manifest's default_field) via
        the composite key prefix. Output (term, doc_id, tf), term
        stripped of the field prefix, ordered for determinism."""
        fprefix, _, _ = self._resolve_field(field)
        full = fprefix + prefix
        segs = self._all_segments().filter(F.col("term").startswith(full))
        par = self.spark.sparkContext.defaultParallelism
        decoded = (
            segs.select("term", "gen", "docs_vb", "tfs_vb", "dlens_vb")
            .coalesce(max(1, par))
            .mapInPandas(_decode_blocks, _DECODED_SCHEMA)
        )
        tomb = self._tombstones()
        if tomb is not None:
            decoded = (
                decoded.join(F.broadcast(tomb), "doc_id", "left")
                .filter(F.col("tgen").isNull() | (F.col("tgen") <= F.col("gen")))
                .drop("tgen")
            )
        term_out = (
            F.expr(f"substring(term, {len(fprefix) + 1})") if fprefix
            else F.col("term")
        )
        return (
            decoded.select(term_out.alias("term"), "doc_id", "tf")
            .orderBy("term", "doc_id")
        )

    def explain(self, query: str, doc_id: int) -> DataFrame:
        """The ES explain API over the persisted store: per-term BM25
        breakdown (term, tf, df, doc_len, idf, partial) of one doc's
        score. Decodes only the query terms' blocks, filters to the one
        doc_id, and reuses the logical explain kernel with the store's
        Lucene-faithful df (block-count sums) and manifest norms — so
        sum(partial) == the rounded-partial sum behind search()'s score
        for that doc."""
        from .search_ext import explain_score

        prefix, n_docs, avgdl = self._resolve_field(None)
        terms = sorted(
            {prefix + t for t in analyze_query_py(query, self.analyzer)}
        )
        empty = self._empty_df("term string, tf long, df long, doc_len long, "
                               "idf double, partial double")
        if not terms or n_docs == 0:
            return empty
        meta = self._meta(terms)
        if meta.empty:
            return empty
        found = sorted(set(meta["term"].unique()))
        term_df = {t: int(g["count"].sum()) for t, g in meta.groupby("term")}
        decoded = self._decode(found, None)
        tomb = self._tombstones()
        if tomb is not None:
            decoded = (
                decoded.join(F.broadcast(tomb), "doc_id", "left")
                .filter(F.col("tgen").isNull()
                        | (F.col("tgen") <= F.col("gen")))
                .drop("tgen")
            )
        stats = self.spark.createDataFrame(
            [(t, d) for t, d in term_df.items()], "term string, df long")
        return explain_score(
            decoded.select("term", "doc_id", "tf", "doc_len"), stats,
            n_docs, avgdl, query, doc_id, analyzer=self.analyzer)

    def collapse(self, query: str, docs: DataFrame, group_col: str,
                 k: int = 10, mode: str = "OR",
                 doc_col: str = "doc_id") -> DataFrame:
        """ES field collapsing over the persisted store: best hit per
        ``docs[group_col]``, groups ranked by that best score. Like
        facets, collapse aggregates over the ENTIRE match set, so
        block-max pruning is inapplicable by definition — one exhaustive
        decode of the query terms feeds the full scored set (k=None),
        then the shared struct-argmax kernel
        (search_ext.collapse_scored). The ``docs`` join carries only the
        (doc_id, group_col) columns of matching docs."""
        from .search_ext import collapse_scored

        prefix, n_docs, avgdl = self._resolve_field(None)
        terms = sorted(
            {prefix + t for t in analyze_query_py(query, self.analyzer)}
        )
        empty = self._empty_df("group_key string, doc_id long, score double")
        if not terms or n_docs == 0:
            return empty
        meta = self._meta(terms)
        if meta.empty:
            return empty
        found = set(meta["term"].unique())
        is_and = mode.upper() == "AND"
        if is_and and found != set(terms):
            return empty
        terms = sorted(found)
        term_df = {t: int(g["count"].sum()) for t, g in meta.groupby("term")}
        full = self._score(self._decode(terms, None), term_df,
                           len(terms) if is_and else None, None,
                           n_docs=n_docs, avgdl=avgdl)
        return collapse_scored(full, docs, group_col, k, doc_col=doc_col)

    def suggest(self, prefix: str, k: int = 10,
                field: str | None = None) -> DataFrame:
        """ES completion/term suggester: top-k dictionary terms with the
        given prefix, ranked by document frequency (df desc, term asc).
        METADATA-ONLY — df is the sum of block posting counts (the same
        Lucene-faithful approximate-until-fold df search() scores with),
        so no posting bytes are ever decoded: the scan reads the (term,
        count) columns of the pushed StringStartsWith range over
        term-sorted row groups, aggregates once, and TakeOrderedAndProject
        cuts k. Output (term, df)."""
        fprefix, _, _ = self._resolve_field(field)
        segs = self._all_segments().filter(
            F.col("term").startswith(fprefix + prefix))
        term_out = (
            F.expr(f"substring(term, {len(fprefix) + 1})") if fprefix
            else F.col("term")
        )
        return (
            segs.groupBy("term").agg(F.sum("count").alias("df"))
            .select(term_out.alias("term"), F.col("df").cast("long").alias("df"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(int(k))
        )

    def _fuzzy_expansions(self, term: str, max_edits: int,
                          field: str | None,
                          max_expansions: int) -> tuple[str, list[str]]:
        """(field_prefix, expansion terms within levenshtein <= max_edits)
        — the ES fuzzy query's term expansion, over the segment store's
        term dictionary. The scan is metadata-only (term column, binary
        postings never read) and the edit distance runs JVM-side
        (F.levenshtein — no UDF), behind a cheap pushable length
        pre-filter. Expansions are capped like ES (max_expansions,
        closest-first: edit distance, then term) so a pathological
        neighborhood cannot explode the decode set."""
        fprefix, _, _ = self._resolve_field(field)
        segs = self._all_segments()
        if fprefix:
            segs = segs.filter(F.col("term").startswith(fprefix))
        base = (F.expr(f"substring(term, {len(fprefix) + 1})") if fprefix
                else F.col("term"))
        dist = F.levenshtein(F.col("t"), F.lit(term))
        cand = (
            segs.select(base.alias("t"))
            .filter(F.length("t").between(len(term) - max_edits,
                                          len(term) + max_edits))
            .select("t", dist.alias("d"))
            .filter(F.col("d") <= max_edits)
            .distinct()
            .orderBy("d", "t")
            .limit(max_expansions)
        )
        return fprefix, [r["t"] for r in cand.collect()]

    def fuzzy_postings(self, term: str, max_edits: int = 1,
                       field: str | None = None,
                       max_expansions: int = 50) -> DataFrame:
        """Live postings of every term within ``max_edits`` levenshtein
        edits of ``term`` (the ES fuzzy query's expansion). Output
        (term, doc_id, tf) with the field prefix stripped, ordered."""
        fprefix, exp = self._fuzzy_expansions(term, max_edits, field,
                                              max_expansions)
        if not exp:
            return self._empty_df("term string, doc_id long, tf long")
        decoded = self._decode(sorted(fprefix + t for t in exp), None)
        tomb = self._tombstones()
        if tomb is not None:
            decoded = (
                decoded.join(F.broadcast(tomb), "doc_id", "left")
                .filter(F.col("tgen").isNull() | (F.col("tgen") <= F.col("gen")))
                .drop("tgen")
            )
        term_out = (
            F.expr(f"substring(term, {len(fprefix) + 1})") if fprefix
            else F.col("term")
        )
        return (
            decoded.select(term_out.alias("term"), "doc_id", "tf")
            .orderBy("term", "doc_id")
        )

    def _regexp_expansions(self, pattern: str, field: str | None,
                           max_expansions: int) -> tuple[str, list[str]]:
        """ES regexp-query expansion: FULL-match (the ES semantics —
        patterns are implicitly anchored) over the term dictionary.
        ES intersects a regex automaton with the FST; the analog here is
        a JVM regexp over the distinct-term column of a metadata-only
        scan (binary postings never read) — a general regex cannot push
        down, but the term dictionary is orders of magnitude smaller
        than the postings. Capped term-ascending (deterministic) like
        ES max_expansions."""
        fprefix, _, _ = self._resolve_field(field)
        segs = self._all_segments()
        if fprefix:
            segs = segs.filter(F.col("term").startswith(fprefix))
        base = (F.expr(f"substring(term, {len(fprefix) + 1})") if fprefix
                else F.col("term"))
        cand = (
            segs.select(base.alias("t"))
            .filter(F.regexp_like(F.col("t"), F.lit(f"^(?:{pattern})$")))
            .distinct()
            .orderBy("t")
            .limit(max_expansions)
        )
        return fprefix, [r["t"] for r in cand.collect()]

    def regexp_postings(self, pattern: str, field: str | None = None,
                        max_expansions: int = 50) -> DataFrame:
        """Live postings of every term fully matching ``pattern`` (the
        ES regexp query's expansion). Output (term, doc_id, tf) with the
        field prefix stripped, ordered. Constant-score expansion like
        prefix; score with the fuzzy_search OR shape if ranking is
        needed."""
        fprefix, exp = self._regexp_expansions(pattern, field,
                                               max_expansions)
        if not exp:
            return self._empty_df("term string, doc_id long, tf long")
        decoded = self._decode(sorted(fprefix + t for t in exp), None)
        tomb = self._tombstones()
        if tomb is not None:
            decoded = (
                decoded.join(F.broadcast(tomb), "doc_id", "left")
                .filter(F.col("tgen").isNull() | (F.col("tgen") <= F.col("gen")))
                .drop("tgen")
            )
        term_out = (
            F.expr(f"substring(term, {len(fprefix) + 1})") if fprefix
            else F.col("term")
        )
        return (
            decoded.select(term_out.alias("term"), "doc_id", "tf")
            .orderBy("term", "doc_id")
        )

    def fuzzy_search(self, term: str, k: int = 10, max_edits: int = 1,
                     field: str | None = None,
                     max_expansions: int = 50) -> DataFrame:
        """BM25 top-k over the fuzzy expansion set, scored as an OR
        query — each expanded term contributes with its OWN df (idf),
        so exact-form matches naturally outrank rare typo forms the way
        ES's blended rewrite intends. Rank-identical to
        search(" ".join(expansions), mode="OR", prune=False)."""
        prefix, n_docs, avgdl = self._resolve_field(field)
        empty = self._empty_df("doc_id long, score double")
        if n_docs == 0:
            return empty
        _, exp = self._fuzzy_expansions(term, max_edits, field,
                                        max_expansions)
        if not exp:
            return empty
        comp = sorted(prefix + t for t in exp)
        meta = self._meta(comp)
        if meta.empty:
            return empty
        term_df = {t: int(g["count"].sum()) for t, g in meta.groupby("term")}
        return self._score(self._decode(sorted(term_df), None), term_df,
                           None, k, n_docs=n_docs, avgdl=avgdl)

    def prefix_search(self, prefix: str, k: int = 10,
                      field: str | None = None) -> DataFrame:
        """Top-k docs matching any term with the given prefix (ES prefix
        query under its constant_score rewrite — no tf/idf): ranked by
        the number of DISTINCT matching terms, doc_id tiebreak."""
        return (
            self.prefix_postings(prefix, field)
            .groupBy("doc_id")
            .agg(F.countDistinct("term").alias("n_terms"))
            .orderBy(F.desc("n_terms"), F.asc("doc_id"))
            .limit(k)
        )

    def term_lookup(self, term: str, field: str | None = None) -> DataFrame:
        """Single-term postings fetch over the segment store (live docs).
        ``field`` scopes the lookup on a fielded index."""
        prefix, _, _ = self._resolve_field(field)
        decoded = self._decode([prefix + term], None)
        tomb = self._tombstones()
        if tomb is not None:
            decoded = (
                decoded.join(F.broadcast(tomb), "doc_id", "left")
                .filter(F.col("tgen").isNull() | (F.col("tgen") <= F.col("gen")))
            )
        return decoded.select("doc_id", "tf").orderBy("doc_id")

    @staticmethod
    def _keys_for_classes(meta: pd.DataFrame,
                          classes: list[int]) -> set[tuple[str, int, int]]:
        keys: set[tuple[str, int, int]] = set()
        cls = np.asarray(classes)
        for (t, gen, nb_t), grp in meta.groupby(["term", "gen", "nb"]):
            nb_t = int(nb_t)
            have = set(grp["salt"].tolist())
            for s in np.unique(cls % nb_t):
                if int(s) in have:
                    keys.add((t, int(gen), int(s)))
        return keys


def search_sharded(indexes: "list[SegmentIndex]", query: str, k: int = 10,
                   mode: str = "AND",
                   min_should_match: int | None = None,
                   filter_ids: DataFrame | None = None) -> DataFrame:
    """ES alias / distributed-search analog: one BM25 top-k over N shard
    indexes that returns EXACTLY what a single index built over the union
    corpus would return. That is the property ES's coordinating node gets
    from its df-merging dfs_query_then_fetch mode — and the property a
    10^12-file build needs, because at that scale the index IS built as
    independent per-partition-range shards (the reference delegates this
    to the ES cluster; see BASELINE north rule's term-range partitioning
    + two-level merge).

    How exactness is preserved:
      * global stats are merged BEFORE scoring — n_docs = Σ shardᵢ.n_docs,
        avgdl = Σ(n_docsᵢ·avgdlᵢ)/Σ n_docsᵢ (i.e. total tokens over total
        docs), per-term df = Σ shard metadata counts — so idf and length
        norms are identical to the union index's;
      * each shard contributes its tombstone-filtered decoded postings;
        AND-mode shards missing a query term are skipped outright (a doc
        matching ALL terms must find every term in its OWN shard);
      * ONE global aggregation scores the union — doc_ids are required to
        be globally unique across shards (the partitioned-build contract:
        disjoint id ranges per shard, recorded in each manifest's lineage).

    Scale shape: per-shard work is the same metadata-pruned, column-pruned
    decode a single-shard query does; the union is a no-shuffle
    concatenation; the (term → global df) join is a broadcast of |q| rows;
    top-k is TakeOrderedAndProject. Shards are never copied or merged to
    serve a query.
    """
    if not indexes:
        raise ValueError("search_sharded needs at least one index")
    spark = indexes[0].spark
    an = indexes[0].analyzer
    if any(ix.analyzer != an for ix in indexes):
        raise ValueError(
            "shards disagree on analyzer: "
            f"{sorted({ix.analyzer for ix in indexes})}"
        )
    if any(ix.field_stats for ix in indexes):
        raise ValueError(
            "search_sharded supports unfielded shards; fielded alias "
            "search needs per-field stat merging (unimplemented)"
        )
    terms = sorted(set(analyze_query_py(query, an)))
    empty = indexes[0]._empty_df("doc_id long, score double")
    if not terms:
        return empty
    is_and = mode.upper() == "AND"
    n_docs = sum(ix.n_docs for ix in indexes)
    if n_docs == 0:
        return empty
    avgdl = sum(ix.n_docs * ix.avgdl for ix in indexes) / n_docs
    term_df: dict[str, int] = {}
    metas = []
    for ix in indexes:
        meta = ix._meta(terms)
        metas.append(meta)
        for t, g in (() if meta.empty else meta.groupby("term")):
            term_df[t] = term_df.get(t, 0) + int(g["count"].sum())
    if not term_df or (is_and and set(term_df) != set(terms)):
        return empty  # AND needs every term somewhere in the union
    msm = None
    if not is_and and min_should_match is not None:
        msm = int(min_should_match)
        if msm <= 1:
            msm = None  # plain OR
        elif msm > len(term_df):
            return empty  # fewer matchable terms than required
    decoded = None
    for ix, meta in zip(indexes, metas):
        if meta.empty:
            continue
        shard_terms = sorted(meta["term"].unique())
        if is_and and set(shard_terms) != set(terms):
            continue  # this shard cannot host an all-terms doc
        if msm is not None and len(shard_terms) < msm:
            continue  # a doc's terms live in ITS shard: < msm present
        d = ix._decode(shard_terms, None)
        tomb = ix._tombstones()
        if tomb is not None:
            d = (d.join(F.broadcast(tomb), "doc_id", "left")
                 .filter(F.col("tgen").isNull()
                         | (F.col("tgen") <= F.col("gen")))
                 .drop("tgen"))
        decoded = d if decoded is None else decoded.unionByName(d)
    if decoded is None:
        return empty
    if filter_ids is not None:
        # ES bool.filter across the alias: one semi-join on the UNIONED
        # decode (same pre-aggregation placement as the single-index
        # path; scores untouched)
        decoded = decoded.join(filter_ids.select("doc_id"),
                               "doc_id", "left_semi")
    stats = spark.createDataFrame(
        [(t, d) for t, d in term_df.items()], "term string, df long")
    partial = bm25_partial_col(
        F.col("tf").cast("double"), F.col("doc_len").cast("double"),
        F.col("df").cast("double"), n_docs, avgdl)
    scored = (
        decoded.join(F.broadcast(stats), "term")
        .select("doc_id", partial.alias("partial"))
        .groupBy("doc_id")
        .agg(F.sum("partial").alias("raw"),
             F.count(F.lit(1)).alias("nterms"))
    )
    if is_and:
        scored = scored.filter(F.col("nterms") == len(terms))
    elif msm is not None:
        scored = scored.filter(F.col("nterms") >= msm)
    return (
        scored.select("doc_id",
                      F.round(F.col("raw"), ROUND_DECIMALS).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
