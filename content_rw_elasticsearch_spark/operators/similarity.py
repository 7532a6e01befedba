"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; LSH (random-hyperplane)
bucketed search as the scale path. Both are pure columnar expressions —
the dot products run in whole-stage codegen via zip_with/aggregate, no
Python in the hot path.

Scale notes: brute force is O(Q·N) — fine when Q (the query set) is small
and broadcast; the LSH variant prunes N to one bucket per query
(approximate recall, exact precision within the bucket). The hyperplanes
are deterministic literals (seeded numpy on the driver), so the DuckDB
oracle replays bucketing and scoring exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ROUND = 4


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def cosine_topk(
    spark: SparkSession, emb: DataFrame, query_ids: list[int], k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k for each query vector (self
    excluded). Output: (query_id, neighbor_id, cos) with deterministic
    (cos desc, neighbor_id asc) ranking on the rounded score."""
    base = emb.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("v")
    )
    q = base.filter(F.col("neighbor_id").isin(query_ids)).select(
        F.col("neighbor_id").alias("query_id"), F.col("v").alias("qv")
    )
    cos = _dot(F.col("qv"), F.col("v")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, ROUND).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
        .orderBy("query_id", "rank")
    )


def cosine_topk_sql(query_ids: list[int], k: int = 5) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         round(list_dot_product(q.qv, b.v)
               / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(b.v, b.v))),
               {ROUND}) AS cos
  FROM base b CROSS JOIN q
  WHERE b.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= {k}
ORDER BY query_id, rank
"""


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, tiny, literal-izable)."""
    rng = np.random.RandomState(seed)
    return [[round(float(x), 6) for x in rng.randn(dim)] for _ in range(n_planes)]


def _bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    bits = [
        F.when(_dot(vec, F.array(*[F.lit(w) for w in p])) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _dim_of(emb: DataFrame, vec_col: str, dim: int | None) -> int:
    """Embedding dimensionality without a Spark job when the caller knows
    it (array<float> carries no length in the schema, so the only
    alternative is a .first() probe — one whole extra job per plan)."""
    if dim is not None:
        return dim
    return len(emb.select(vec_col).first()[0])


def ann_lsh_topk(
    spark: SparkSession, emb: DataFrame, query_ids: list[int], k: int = 5,
    n_planes: int = 8, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate NN: random-hyperplane LSH buckets; each query searches
    ONLY its own bucket (recall < 1 by design; precision exact). At scale
    the bucket column is a partition/cluster key, so a query touches one
    partition instead of N. Pass ``dim`` to skip the schema probe job."""
    dim = _dim_of(emb, vec_col, dim)
    planes = hyperplanes(dim, n_planes, seed)
    base = emb.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("bucket", _bucket_expr(F.col("v"), planes))
    q = base.filter(F.col("neighbor_id").isin(query_ids)).select(
        F.col("neighbor_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    cos = _dot(F.col("qv"), F.col("v")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        base.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, ROUND).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
        .orderBy("query_id", "rank")
    )


def ann_multiprobe_topk(
    spark: SparkSession, emb: DataFrame, query_ids: list[int], k: int = 5,
    n_planes: int = 8, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Multi-probe LSH ANN: each query searches its own bucket PLUS every
    bucket at Hamming distance 1 (flip one hyperplane bit) — recovers the
    near-misses where query and true neighbor straddle exactly one
    hyperplane, the dominant recall-loss mode of single-bucket probing.
    Probed volume is (n_planes+1)/2^n_planes of N — still a vanishing
    fraction at scale, and the probe list is computed on the broadcast
    (query) side so the big table is still touched via its bucket
    partition key. Buckets partition the space, so probes are disjoint —
    no dedupe stage. Pass ``dim`` to skip the schema probe job."""
    dim = _dim_of(emb, vec_col, dim)
    planes = hyperplanes(dim, n_planes, seed)
    base = emb.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("bucket", _bucket_expr(F.col("v"), planes))
    probe_list = F.array(
        F.col("qbucket"),
        *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
    )
    q = (
        base.filter(F.col("neighbor_id").isin(query_ids))
        .select(
            F.col("neighbor_id").alias("query_id"), F.col("v").alias("qv"),
            F.col("bucket").alias("qbucket"),
        )
        .withColumn("probe", F.explode(probe_list))
    )
    cos = _dot(F.col("qv"), F.col("v")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        base.join(F.broadcast(q), F.col("bucket") == F.col("probe"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, ROUND).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
        .orderBy("query_id", "rank")
    )


def ann_multitable_topk(
    spark: SparkSession, emb: DataFrame, query_ids: list[int], k: int = 5,
    n_planes: int = 8, n_tables: int = 3, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Multi-TABLE LSH ANN — the classic complement to multi-probe: L
    independent hyperplane sets (seeds seed, seed+1, ...), each vector
    hashes to one bucket PER TABLE, and a query probes exactly its own
    bucket in every table. A true neighbor is missed only if it straddles
    ≥1 plane in EVERY table — P(miss) = (1 - p^b)^L instead of (1 - p^b),
    at probed volume ≈ L/2^n_planes of N (vs (n_planes+1)/2^n_planes for
    Hamming-1 multi-probe at the same n_planes).

    Physical shape: the table dimension is unrolled on BOTH sides as an
    explode — at rest this IS the L-table index layout ((table, bucket) is
    the partition key, the base data is stored once per table, exactly how
    FAISS/Annoy-style LSH forests shard). Tables can overlap on a
    candidate, so the scored projection is deduped with a distinct on
    (query_id, neighbor_id, cos) — cos is a pure function of the pair, so
    distinct ≡ dedupe-by-pair — before the per-query top-k window."""
    dim = _dim_of(emb, vec_col, dim)
    tables = [hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    base = emb.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("v")
    )
    bucketed = base.select(
        "neighbor_id", "v",
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("tbl"),
                     _bucket_expr(F.col("v"), planes).alias("bucket"))
            for t, planes in enumerate(tables)
        ])).alias("tb"),
    ).select("neighbor_id", "v", "tb.tbl", "tb.bucket")
    q = bucketed.filter(F.col("neighbor_id").isin(query_ids)).select(
        F.col("neighbor_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("tbl").alias("qtbl"), F.col("bucket").alias("qbucket"),
    )
    cos = _dot(F.col("qv"), F.col("v")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        bucketed.join(
            F.broadcast(q),
            (F.col("tbl") == F.col("qtbl")) & (F.col("bucket") == F.col("qbucket")),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, ROUND).alias("cos"))
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
        .orderBy("query_id", "rank")
    )


def ann_multitable_topk_sql(
    dim: int, query_ids: list[int], k: int = 5, n_planes: int = 8,
    n_tables: int = 3, seed: int = 42,
) -> str:
    """Oracle replay of ann_multitable_topk (identical literal plane sets
    per table; distinct on the scored pair before the top-k window)."""
    ids = ", ".join(str(i) for i in query_ids)
    per_table = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed + t)
        bucket_terms = " + ".join(
            f"(CASE WHEN list_dot_product(v, {p!r}::DOUBLE[]) > 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )
        per_table.append(
            f"SELECT vec_id, v, {t} AS tbl, {bucket_terms} AS bucket FROM base"
        )
    union = "\n  UNION ALL\n  ".join(per_table)
    return f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
bucketed AS (
  {union}
),
q AS (SELECT vec_id AS query_id, v AS qv, tbl AS qtbl, bucket AS qbucket
      FROM bucketed WHERE vec_id IN ({ids})),
scored AS (
  SELECT DISTINCT q.query_id, b.vec_id AS neighbor_id,
         round(list_dot_product(q.qv, b.v)
               / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(b.v, b.v))),
               {ROUND}) AS cos
  FROM bucketed b JOIN q ON b.tbl = q.qtbl AND b.bucket = q.qbucket
  WHERE b.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= {k}
ORDER BY query_id, rank
"""


def ann_multiprobe_topk_sql(
    dim: int, query_ids: list[int], k: int = 5, n_planes: int = 8, seed: int = 42
) -> str:
    """Oracle replay of ann_multiprobe_topk (identical literal planes,
    Hamming-1 probe set via xor)."""
    planes = hyperplanes(dim, n_planes, seed)
    ids = ", ".join(str(i) for i in query_ids)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, {p!r}::DOUBLE[]) > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    probes = ", ".join(["q.qbucket"] + [f"xor(q.qbucket, {1 << i})" for i in range(n_planes)])
    return f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
bucketed AS (SELECT vec_id, v, {bucket_terms} AS bucket FROM base),
q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket
      FROM bucketed WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         round(list_dot_product(q.qv, b.v)
               / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(b.v, b.v))),
               {ROUND}) AS cos
  FROM bucketed b JOIN q ON b.bucket IN ({probes})
  WHERE b.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= {k}
ORDER BY query_id, rank
"""


def ann_lsh_topk_sql(
    dim: int, query_ids: list[int], k: int = 5, n_planes: int = 8, seed: int = 42
) -> str:
    """Oracle replay: identical literal hyperplanes → identical buckets."""
    planes = hyperplanes(dim, n_planes, seed)
    ids = ", ".join(str(i) for i in query_ids)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, {p!r}::DOUBLE[]) > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
bucketed AS (SELECT vec_id, v, {bucket_terms} AS bucket FROM base),
q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket
      FROM bucketed WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         round(list_dot_product(q.qv, b.v)
               / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(b.v, b.v))),
               {ROUND}) AS cos
  FROM bucketed b JOIN q ON b.bucket = q.qbucket
  WHERE b.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= {k}
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-bucketed complement to the LSH
# family above, per the task brief's "IVF or LSH-bucketed variant".
# ---------------------------------------------------------------------------

CENTROID_ROUND = 6   # quantize centroids each iteration: makes the Spark
# training loop and the pure-numpy oracle replay bit-identical (float sum
# order differs between Spark's avg and numpy's mean at ~1e-13; rounding
# to 1e-6 absorbs it — same trick as hyperplanes())
ASSIGN_ROUND = 9     # quantize assignment scores before the argmax so a
# ~1e-13 cross-engine cosine difference cannot flip a cluster assignment


def _round_half_up(x: float, nd: int) -> float:
    """Spark's ROUND semantics for doubles, exactly: HALF_UP applied to
    the SHORTEST DECIMAL REPR of the double (Spark's Round expression
    goes through BigDecimal.valueOf(double) = Double.toString, which is
    the same shortest round-trip repr python's repr() produces). Neither
    python round() (banker's HALF_EVEN) nor floor(|x|·10^nd + 0.5) on
    the binary value matches: the latter rounds 0.15 → 0.1 at nd=1
    because binary 0.15 is 0.1499…, while Spark reads "0.15" and
    HALF_UPs it to 0.2 (caught by
    tests/test_pipeline_ops.py::test_round_half_up_matches_decimal)."""
    import decimal

    return float(
        decimal.Decimal(repr(float(x))).quantize(
            decimal.Decimal(1).scaleb(-nd), rounding=decimal.ROUND_HALF_UP
        )
    )


def _cos_scores_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """array<double> of round(cos(vec, c_j), ASSIGN_ROUND) per centroid."""
    vnorm = F.sqrt(_dot(vec, vec))
    scores = []
    for c in centroids:
        carr = F.array(*[F.lit(w) for w in c])
        cn = float(np.sqrt(np.dot(c, c)))
        scores.append(F.round(_dot(vec, carr) / (vnorm * F.lit(cn)), ASSIGN_ROUND))
    return F.array(*scores)


def _cluster_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """argmax_j cos(vec, c_j), first-wins on (rounded) ties — mirrors
    numpy argmax in the oracle replay."""
    scores = _cos_scores_expr(vec, centroids)
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def ivf_centroids(
    spark: SparkSession, emb: DataFrame, k_clusters: int = 8, iters: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int | None = None,
) -> list[list[float]]:
    """Train IVF centroids with ``iters`` Lloyd iterations of spherical
    k-means (assign by cosine, update by coordinate mean), entirely as
    DataFrame jobs — one groupBy-agg job per iteration, no explode: the
    per-coordinate means are ``dim`` columnar avg() expressions.

    Determinism/replayability: init is the ``k_clusters`` lowest-id
    vectors; every centroid coordinate is rounded to CENTROID_ROUND after
    init and after each update, so an independent numpy replay
    (_ivf_replay_py) reproduces the training bit-for-bit — that replay IS
    the DuckDB oracle's centroid source. Empty clusters keep their
    previous centroid (numpy replay does the same).

    Scale: each iteration is one scan + one k_clusters-row aggregate
    (map-side partial, broadcastable result). At 100 TB you train on a
    sample (emb.sample(...)) — centroid quality needs only a bounded
    sample, and assignment of the full corpus happens once at index time
    with the trained literals (ann_ivf_topk / the bucket partition key).
    """
    dim = _dim_of(emb, vec_col, dim)
    base = emb.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v"))
    init = base.orderBy("vid").limit(k_clusters).collect()
    cents = [[_round_half_up(float(x), CENTROID_ROUND) for x in r["v"]]
             for r in init]
    for _ in range(iters):
        assigned = base.withColumn("cluster", _cluster_expr(F.col("v"), cents))
        rows = assigned.groupBy("cluster").agg(
            *[F.round(F.avg(F.col("v")[i]), CENTROID_ROUND).alias(f"c{i}")
              for i in range(dim)]
        ).collect()
        new = {int(r["cluster"]): [float(r[f"c{i}"]) for i in range(dim)]
               for r in rows}
        cents = [new.get(j, cents[j]) for j in range(len(cents))]
    return cents


def ann_ivf_topk(
    spark: SparkSession, emb: DataFrame, query_ids: list[int], k: int = 5,
    k_clusters: int = 8, n_probe: int = 2, iters: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int | None = None, centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN top-k: vectors are bucketed by nearest trained centroid
    (the inverted file); a query scans only its ``n_probe`` nearest
    centroids' buckets, scored by exact cosine (precision exact, recall
    approximate like every IVF index — FAISS IndexIVFFlat semantics).
    With n_probe == k_clusters the probe set covers every bucket and the
    result provably equals exhaustive brute force (pinned by test).

    Physical shape at scale: ``cluster`` is the at-rest partition key
    (like the LSH variants' bucket); the probe list is built on the
    broadcast query side (n_probe ids via one array_sort over k_clusters
    scores), so the big side is touched only via partition-prunable
    equality on its cluster column. No dedupe stage — clusters partition
    the space, probes are disjoint."""
    dim = _dim_of(emb, vec_col, dim)
    if centroids is None:
        centroids = ivf_centroids(
            spark, emb, k_clusters, iters, id_col, vec_col, dim)
    base = emb.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("cluster", _cluster_expr(F.col("v"), centroids))
    # top-n_probe centroid ids per query: sort ([-score, idx]) structs asc
    # == score desc with first-wins (lower idx) ties, matching the replay
    scores = _cos_scores_expr(F.col("qv"), centroids)
    ranked = F.array_sort(F.transform(
        scores,
        lambda s, i: F.struct((-s).alias("neg"), i.alias("idx")),
    ))
    q = (
        base.filter(F.col("neighbor_id").isin(query_ids))
        .select(F.col("neighbor_id").alias("query_id"), F.col("v").alias("qv"))
        .withColumn("probe", F.explode(F.slice(ranked, 1, n_probe)["idx"]))
    )
    cos = _dot(F.col("qv"), F.col("v")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        base.join(F.broadcast(q), F.col("cluster") == F.col("probe"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cos, ROUND).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
        .orderBy("query_id", "rank")
    )


def _ivf_replay_py(
    vecs: "dict[int, np.ndarray]", k_clusters: int, iters: int,
) -> list[list[float]]:
    """Independent numpy replay of ivf_centroids (the oracle's trainer):
    same init (lowest ids), same cosine argmax with ASSIGN_ROUND
    quantization and first-wins ties, same CENTROID_ROUND half-up
    quantization of the coordinate means, same empty-cluster carry."""
    ids = sorted(vecs)
    cents = [np.array([_round_half_up(float(x), CENTROID_ROUND)
                       for x in vecs[i]]) for i in ids[:k_clusters]]
    for _ in range(iters):
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for i in ids:
            v = vecs[i]
            vn = float(np.sqrt(v @ v))
            sc = [
                _round_half_up(float(v @ c / (vn * np.sqrt(c @ c))), ASSIGN_ROUND)
                for c in cents
            ]
            j = int(np.argmax(sc))
            sums[j] = sums.get(j, np.zeros_like(v)) + v
            counts[j] = counts.get(j, 0) + 1
        cents = [
            np.array([_round_half_up(float(x), CENTROID_ROUND)
                      for x in sums[j] / counts[j]])
            if j in counts else cents[j]
            for j in range(len(cents))
        ]
    return [[float(x) for x in c] for c in cents]


def ann_ivf_topk_sql(
    dim: int, query_ids: list[int], k: int = 5, k_clusters: int = 8,
    n_probe: int = 2, iters: int = 3, sf_dir: str | None = None,
) -> str:
    """Oracle for ann_ivf_topk: training is replayed by the independent
    numpy trainer (_ivf_replay_py) over the driver's own parquet — the
    iterative Lloyd loop is not expressible in the driver's SQL subset —
    and the SEARCH phase (assignment, probe selection, scoring, top-k)
    runs natively in DuckDB against those literal centroids, exactly like
    the LSH oracles replay literal hyperplanes."""
    import os

    import duckdb

    sf = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf}/embeddings.parquet'"
    ).fetchall()
    vecs = {int(i): np.asarray(v, dtype=np.float64) for i, v in rows}
    cents = _ivf_replay_py(vecs, k_clusters, iters)
    ids = ", ".join(str(i) for i in query_ids)

    def cos_sql(c: list[float]) -> str:
        cn = float(np.sqrt(np.dot(c, c)))
        return (f"round(list_dot_product(v, {c!r}::DOUBLE[])"
                f" / (sqrt(list_dot_product(v, v)) * {cn!r}), {ASSIGN_ROUND})")

    score_list = "[" + ", ".join(cos_sql(c) for c in cents) + "]"
    # unrolled [(−score_j, j)] struct list: list-comprehension-free (binder
    # scoping of comprehensions over lateral columns is DuckDB-fragile)
    struct_list = "[" + ", ".join(
        f"{{'neg': -cscores[{j + 1}], 'idx': {j}}}" for j in range(len(cents))
    ) + "]"
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored_base AS (
  SELECT vec_id, v, {score_list} AS cscores FROM base
),
clustered AS (
  SELECT vec_id, v, CAST(list_position(cscores, list_max(cscores)) - 1 AS INT) AS cluster
  FROM scored_base
),
q AS (
  SELECT vec_id AS query_id, v AS qv, u.probe
  FROM scored_base,
       LATERAL unnest(list_transform(
         list_slice(list_sort({struct_list}), 1, {n_probe}),
         s -> s.idx)) AS u(probe)
  WHERE vec_id IN ({ids})
),
scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         round(list_dot_product(q.qv, b.v)
               / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(b.v, b.v))),
               {ROUND}) AS cos
  FROM clustered b JOIN q ON b.cluster = q.probe
  WHERE b.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= {k}
ORDER BY query_id, rank
"""
