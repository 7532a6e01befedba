"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-groupBy), n-gram Jaccard (relational set-similarity join),
MinHash+LSH (shingle → minhash → band → bucket-join → verify), and
SimHash (bit-majority fingerprint + banded Hamming join).

Scale design:
  * shingling/minhash/banding/simhash are pure JVM columnar expressions
    (xxhash64, higher-order array functions, bitwise sums) — zero Python
    in any hot path.
  * the LSH self-join shuffles on band_key — band keys are hashes, so the
    join is uniform unless a bucket is genuinely dense with near-dups;
    candidate verification joins only candidate pairs' shingles, never
    the full cross product.
  * the exact-Jaccard join is quadratic per shingle bucket and exists as
    (a) the verification stage of LSH and (b) an oracle for small scales;
    the scale path is LSH → verify.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analyzer import tokens_simple
from ..functions.hashing import xxh64_string

MINHASH_K = 24
LSH_BANDS = 12  # r = K / BANDS = 2 rows per band


def shingle_set(df: DataFrame, text_col: str, doc_col: str, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams. Short docs (< n tokens)
    contribute their whole token string as one shingle. Matches the
    DuckDB oracle formulation token-for-token."""
    toks = tokens_simple(text_col)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    sh = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return (
        df.select(F.col(doc_col).alias("doc_id"), F.explode(sh).alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )


def exact_dup_groups(df: DataFrame, text_col: str, doc_col: str) -> DataFrame:
    """Exact dedup: sha256(text) groups with >1 member; keeper = min doc_id."""
    return (
        df.select(F.col(doc_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("content_sha"))
        .groupBy("content_sha")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n") > 1)
        .orderBy("content_sha")
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, doc_col: str, n: int = 3, tau: float = 0.8
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: pairs with J ≥ tau.
    Relational form: shingle equi-join → per-pair intersection counts →
    |A∩B| / (|A|+|B|−|A∩B|)."""
    sh = shingle_set(df, text_col, doc_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("d1"), F.col("sz").alias("sz1"))
    sb = sizes.select(F.col("doc_id").alias("d2"), F.col("sz").alias("sz2"))
    jac = F.col("i") / (F.col("sz1") + F.col("sz2") - F.col("i"))
    return (
        inter.join(sa, "d1").join(sb, "d2")
        .select("d1", "d2", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= tau)
        .orderBy("d1", "d2")
    )


def minhash_signatures(
    df: DataFrame, text_col: str, doc_col: str, n: int = 3, k: int = MINHASH_K
) -> DataFrame:
    """(doc_id, sig array<long>): k independent minhashes over the shingle
    set. Hash family: xxhash64(i, shingle) — deterministic, JVM-native."""
    sh = shingle_set(df, text_col, doc_col, n)
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}") for i in range(k)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select("doc_id", F.array(*[f"h{i}" for i in range(k)]).alias("sig"))


def lsh_candidate_pairs(
    sig: DataFrame, bands: int = LSH_BANDS, k: int = MINHASH_K
) -> DataFrame:
    """Band the signatures and bucket-join: pairs sharing ≥1 band bucket.
    band_key = xxhash64(band_idx, slice of sig) — uniform shuffle key."""
    r = k // bands
    band_rows = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(F.lit(b), F.concat_ws(
                        ",", *[F.col("sig")[b * r + j].cast("string") for j in range(r)]
                    )).alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    a, b_ = band_rows.alias("a"), band_rows.alias("b")
    return (
        a.join(b_, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame, text_col: str, doc_col: str,
    n: int = 3, tau: float = 0.8, k: int = MINHASH_K, bands: int = LSH_BANDS,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified: LSH proposes candidate
    pairs (probabilistic recall; P(miss) = (1−s^r)^bands, ≈6e-9 at s=0.89
    with r=2, b=12), then the exact Jaccard of each candidate is computed
    and thresholded — so emitted pairs are exact, never false positives."""
    cand = lsh_candidate_pairs(
        minhash_signatures(df, text_col, doc_col, n, k), bands, k
    )
    sh = shingle_set(df, text_col, doc_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("d1"), "shingle")
    b = sh.select(F.col("doc_id").alias("d2"), "shingle")
    inter = (
        cand.join(a, "d1").join(b, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i") / (F.col("sz1") + F.col("sz2") - F.col("i"))
    return (
        inter.join(sizes.select(F.col("doc_id").alias("d1"), F.col("sz").alias("sz1")), "d1")
        .join(sizes.select(F.col("doc_id").alias("d2"), F.col("sz").alias("sz2")), "d2")
        .select("d1", "d2", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= tau)
        .orderBy("d1", "d2")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle builders (shared CTE mirrors shingle_set token-for-token)
# ---------------------------------------------------------------------------

_SHINGLE_CTE = """
t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, s AS shingle FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(toks) - {nm1}, 1) + 1),
             i -> array_to_string(toks[i:i+{nm1}], ' ')
           )) AS s
    FROM t
  ) WHERE s <> ''
)
"""


def exact_dup_groups_sql() -> str:
    return """
SELECT content_sha, count(*)::BIGINT AS n, min(doc_id) AS keep_doc_id
FROM (SELECT doc_id, sha256(text) AS content_sha FROM documents)
GROUP BY content_sha HAVING count(*) > 1 ORDER BY content_sha
"""


def ngram_jaccard_pairs_sql(n: int = 3, tau: float = 0.8) -> str:
    """Exact brute-force Jaccard — the oracle for BOTH the relational
    exact join and the LSH+verify path (LSH recall is probabilistic with
    P(miss) ≈ (1−s²)^12 ≈ 6e-9 at the data's lowest near-dup s=0.89)."""
    cte = _SHINGLE_CTE.format(nm1=n - 1)
    return f"""
WITH {cte},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2, round(i * 1.0 / (sa.sz + sb.sz - i), 4) AS jaccard
FROM inter
JOIN sizes sa ON d1 = sa.doc_id
JOIN sizes sb ON d2 = sb.doc_id
WHERE round(i * 1.0 / (sa.sz + sb.sz - i), 4) >= {tau}
ORDER BY d1, d2
"""


def connected_components(
    pairs: DataFrame, a_col: str = "d1", b_col: str = "d2",
    max_iter: int = 25,
) -> DataFrame:
    """Near-dup CLUSTERS from near-dup PAIRS: (doc_id, cluster_id) with
    cluster_id = min doc_id in the pair graph's connected component —
    the step a training-data pipeline needs after MinHash/SimHash/
    embedding pair generation to keep ONE representative per dup group
    (keep row ⇔ doc_id == cluster_id).

    Algorithm: iterative min-label propagation. Each round is one
    edges⋈labels hash join + one min-aggregation (two shuffles, both
    partial-aggregable); the driver sees a single changed-count scalar
    per round and stops at a fixpoint, after at most
    diameter(largest component) rounds. Dup clusters are shallow
    (near-clique groups, diameter ≈ 1-2), so real corpora converge in
    2-3 rounds regardless of corpus size — the adversarial case is a
    10^6-doc chain, which is not what near-dup graphs look like; for
    that shape switch to alternating large-star/small-star (Kiveris et
    al., MapReduce CC), which this loop structure accommodates. Each
    round persists its labels and unpersists the previous round's, so
    neither memory nor recomputation grows with iterations (lineage
    depth grows linearly; bound max_iter or checkpoint for extreme
    diameters)."""
    edges = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    edges = (
        edges.unionByName(edges.select(F.col("v").alias("u"),
                                       F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select("u").distinct().withColumn("label", F.col("u")).persist()
    )
    try:
        for _ in range(int(max_iter)):
            nbr = (
                edges.join(
                    labels.select(F.col("u").alias("v"),
                                  F.col("label").alias("vlabel")),
                    "v",
                )
                .groupBy("u")
                .agg(F.min("vlabel").alias("nlabel"))
            )
            new_labels = (
                labels.join(nbr, "u", "left")
                .select(
                    "u",
                    F.least(
                        F.col("label"),
                        F.coalesce(F.col("nlabel"), F.col("label")),
                    ).alias("label"),
                )
                .persist()
            )
            changed = (
                new_labels.join(
                    labels.select("u", F.col("label").alias("old")), "u")
                .filter(F.col("label") != F.col("old"))
                .count()
            )  # ONE driver scalar per round
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.select(
            F.col("u").alias("doc_id"), F.col("label").alias("cluster_id")
        ).orderBy("doc_id")
    finally:
        edges.unpersist()


def dedup_clusters_sql(pairs_sql: str) -> str:
    """Oracle for connected_components over the pair set produced by
    ``pairs_sql`` (any query emitting d1/d2 columns): the transitive
    closure as a recursive CTE, min reachable id per vertex."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT d1, d2 FROM ({pairs_sql})
),
edges AS (
  SELECT d1 AS u, d2 AS v FROM pairs
  UNION
  SELECT d2 AS u, d1 AS v FROM pairs
),
verts AS (SELECT DISTINCT u FROM edges),
reach(u, r) AS (
  SELECT u, u FROM verts
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
)
SELECT u AS doc_id, min(r) AS cluster_id FROM reach GROUP BY u
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_fingerprints(df: DataFrame, text_col: str, doc_col: str) -> DataFrame:
    """(doc_id, fp): 64-bit SimHash fingerprints, 100% JVM-side.

    Token hash = ``xxhash64`` (native expression); bit-majority vote =
    64 ``sum`` aggregates over exploded token occurrences (weighting each
    occurrence ±1 per bit ≡ the classic tf-weighted vote), fingerprint =
    sum of distinct powers of two where the vote is positive. One shuffle
    (the doc_id hash-agg, with map-side partial aggregation); zero Python
    in the hot path — this replaces the former per-row md5 pandas UDF
    that was the repo's slowest operator at scale.

    Tokenization is whitespace-split lowercase (SimHash's usual feature
    set is looser than the index analyzer); zero-token docs fingerprint
    to 0."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    occ = (
        df.select(F.col(doc_col).alias("doc_id"), F.explode(toks).alias("tok"))
        .select("doc_id", F.xxhash64("tok").alias("h"))
    )
    votes = [
        F.sum(F.shiftright("h", j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"v{j}")
        for j in range(64)
    ]
    agg = occ.groupBy("doc_id").agg(*votes)
    fp = None
    for j in range(64):
        bit = (
            F.when(F.col(f"v{j}") > 0,
                   F.shiftleft(F.lit(1).cast("long"), j))
            .otherwise(F.lit(0).cast("long"))
        )
        fp = bit if fp is None else fp + bit
    return (
        df.select(F.col(doc_col).alias("doc_id"))
        .join(agg.select("doc_id", fp.alias("fp")), "doc_id", "left")
        .select("doc_id", F.coalesce("fp", F.lit(0).cast("long")).alias("fp"))
    )


def simhash_pairs(
    df: DataFrame, text_col: str, doc_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Zero-token documents are EXCLUDED inside the operator (they would all
    fingerprint to 0 and pair with each other at Hamming 0 — pure noise,
    and the former docstring caveat pushed the filter onto every caller).

    Banding:
    split the 64-bit fingerprint into 4 × 16-bit chunks — any pair within
    Hamming ≤ 3 shares at least one exact chunk (pigeonhole), so the
    bucket-join on chunks has full recall; verify with bit_count(xor)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    fp = simhash_fingerprints(
        df.filter(F.size(toks) > 0), text_col, doc_col
    )
    chunks = fp.select(
        "doc_id", "fp",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("c"),
                     F.shiftright("fp", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("v"))
            for c in range(4)
        ])).alias("ch"),
    ).select("doc_id", "fp", "ch.c", "ch.v")
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
    return (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.v") == F.col("b.v"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"),
                ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("d1", "d2")
    )


# --- independent pure-Python SimHash replay (the oracle) -------------------

DEFAULT_ORACLE_SF = "/root/testdata/sf0.01"
_M64 = (1 << 64) - 1

# the plan splits with Spark's split('\\s+') — a JAVA regex, where \s is
# the ASCII class [ \t\n\x0B\f\r] (no Unicode whitespace). The replay must
# tokenize identically or documents containing  / /... would
# fingerprint differently plan-vs-oracle (parity pinned by
# tests/test_pipeline_ops.py::test_simhash_unicode_whitespace_parity).
_JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")


def simhash_tokens_py(text: str) -> list[str]:
    """The replay-side tokenizer: lowercase, split on JAVA ``\\s`` (ASCII
    whitespace only), drop empties — bit-for-bit what the Spark plan's
    ``split(lower(text), '\\s+')`` produces."""
    return [t for t in _JAVA_WS.split(text.lower()) if t]


def simhash64_py(text: str) -> int:
    """Independent driver-side replay of simhash_fingerprints for one doc:
    ASCII-whitespace-split lowercase tokens (simhash_tokens_py), xxh64
    token hashes (the pure-Python XXH64 from functions/hashing.py, itself
    parity-pinned against Spark's JVM expression by tests/test_hashing.py),
    ±1 bit votes, positive-vote bits set. Signed-long output like the
    Spark plan."""
    votes = [0] * 64
    for tok in simhash_tokens_py(text):
        h = xxh64_string(tok) & _M64
        for j in range(64):
            votes[j] += 1 if (h >> j) & 1 else -1
    fp = 0
    for j in range(64):
        if votes[j] > 0:
            fp |= 1 << j
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def simhash_pairs_sql(max_hamming: int = 3, sf_dir: str | None = None) -> str:
    """Golden-table oracle for simhash_pairs: the SimHash bit-vote algebra
    is not expressible in the driver's SQL subset, so the oracle is the
    independent pure-Python replay above, brute-forced over ALL pairs
    (banding is recall-lossless by the pigeonhole bound, so the banded
    join must equal the brute force) and materialized as a VALUES literal.

    Reads documents.parquet from the driver's correctness scale
    (sf0.01; override via sf_dir or SPARK_GRAFT_ORACLE_SF)."""
    import os

    import duckdb

    sf = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF", DEFAULT_ORACLE_SF)
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    # zero-token docs are excluded, mirroring the operator's built-in filter
    fps = [(int(d), simhash64_py(t or "")) for d, t in rows
           if simhash_tokens_py(t or "")]
    pairs = []
    for i in range(len(fps)):
        d1, f1 = fps[i]
        for d2, f2 in fps[i + 1:]:
            ham = ((f1 ^ f2) & _M64).bit_count()
            if ham <= max_hamming:
                pairs.append((d1, d2, ham) if d1 < d2 else (d2, d1, ham))
    if not pairs:
        return ("SELECT CAST(NULL AS BIGINT) AS d1, CAST(NULL AS BIGINT) AS d2, "
                "CAST(NULL AS INT) AS hamming WHERE FALSE")
    vals = ", ".join(f"({d1}, {d2}, {h})" for d1, d2, h in sorted(pairs))
    return f"""
SELECT CAST(d1 AS BIGINT) AS d1, CAST(d2 AS BIGINT) AS d2, CAST(h AS INT) AS hamming
FROM (VALUES {vals}) AS t(d1, d2, h)
ORDER BY d1, d2
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (the fifth dedup flavor)
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(
    emb: DataFrame, tau: float = 0.9, n_tables: int = 4, n_planes: int = 8,
    seed: int = 7, id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= tau, found via a
    multi-table random-hyperplane LSH candidate join (never all-pairs).

    Reference scope: the reference delegates similarity entirely to
    Elasticsearch; this is the training-data-pipeline analog of its
    duplicate-suppression role, over an ``array<float>`` column.

    Scale design (100 TB):
      * ONE corpus scan — per-table buckets come from posexplode over an
        array of sign-bucket expressions (JVM columnar, no UDF), so the
        source is read once however many tables there are.
      * the self-join shuffles on (table, bucket) — hash-uniform unless a
        bucket is genuinely dense with near-identical vectors; exact
        cosine is computed ONLY for bucket-colliding candidate pairs.
      * recall follows the LSH-forest model: a pair at angle theta
        collides in one table with p(theta)^n_planes (p = 1 - theta/pi)
        and is found with 1 - (1 - p^n_planes)^n_tables; identical
        vectors (cos 1.0) are found with probability 1. Precision is
        exact — candidates are verified by true cosine.
    """
    from . import similarity as sim

    dim = sim._dim_of(emb, vec_col, dim)
    base = emb.select(
        F.col(id_col).alias("vid"), sim._as_double(F.col(vec_col)).alias("v")
    )
    buckets = F.array(*[
        sim._bucket_expr(F.col("v"), sim.hyperplanes(dim, n_planes, seed + t))
        for t in range(n_tables)
    ])
    bucketed = base.select(
        "vid", "v", F.posexplode(buckets).alias("tbl", "bucket"))
    left = bucketed.select(
        "tbl", "bucket", F.col("vid").alias("id_a"), F.col("v").alias("va"))
    right = bucketed.select(
        "tbl", "bucket", F.col("vid").alias("id_b"), F.col("v").alias("vb"))
    cos = sim._dot(F.col("va"), F.col("vb")) / (
        F.sqrt(sim._dot(F.col("va"), F.col("va")))
        * F.sqrt(sim._dot(F.col("vb"), F.col("vb")))
    )
    return (
        left.join(right, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, sim.ROUND).alias("cos"))
        .filter(F.col("cos") >= tau)
        .distinct()  # the same pair collides in several tables
        .orderBy("id_a", "id_b")
    )


def embedding_near_dup_pairs_sql(
    dim: int = 64, tau: float = 0.9, n_tables: int = 4, n_planes: int = 8,
    seed: int = 7, seed_every: int = 20,
) -> str:
    """Oracle replay: identical literal hyperplanes -> identical buckets ->
    identical candidate set, so the LSH's recall model cancels out of the
    comparison (same construction as similarity.ann_lsh_topk_sql). The
    input is seeded like the queries() entry: every ``seed_every``-th
    embedding duplicated under vec_id + 1e6 so the gate checks nonzero
    cos-1.0 groups rather than passing vacuously (VERDICT r4 #3)."""
    from . import similarity as sim

    selects = []
    for t in range(n_tables):
        planes = sim.hyperplanes(dim, n_planes, seed + t)
        bucket_terms = " + ".join(
            f"(CASE WHEN list_dot_product(v, {p!r}::DOUBLE[]) > 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )
        selects.append(f"SELECT vid, v, {t} AS tbl, {bucket_terms} AS bucket FROM base")
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH emb2 AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
  WHERE vec_id % {seed_every} = 0
),
base AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM emb2),
bucketed AS ({union}),
cand AS (
  SELECT DISTINCT a.vid AS id_a, b.vid AS id_b
  FROM bucketed a JOIN bucketed b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vid < b.vid
),
scored AS (
  SELECT id_a, id_b,
         round(list_dot_product(x.v, y.v)
               / (sqrt(list_dot_product(x.v, x.v))
                  * sqrt(list_dot_product(y.v, y.v))), {sim.ROUND}) AS cos
  FROM cand
  JOIN base x ON x.vid = cand.id_a
  JOIN base y ON y.vid = cand.id_b
)
SELECT id_a, id_b, cos FROM scored WHERE cos >= {tau} ORDER BY id_a, id_b
"""
