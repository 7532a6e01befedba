"""Corpus sources.

The engine's primary input is a table shaped exactly like BASELINE.json
``input_hint``: (repo string, path string, commit string, lang string,
content string) — an Iceberg table of source-code repositories in
production; Parquet here (the sandbox Spark has no Iceberg catalog jar, and
the scan/MERGE patterns are identical DataSourceV2 code paths).

Reference analog: the Kafka `CombinedPostPublicationEvents` source
(/root/reference/pkg/message/message_handler.go:38-61) — a stream of content
records. Our batch-first equivalent is a snapshot scan of the corpus table;
streaming/ingest.py holds the incremental path.

Two providers:
  * ``documents_as_corpus`` — deterministic adapter from the driver-supplied
    documents.parquet into the corpus shape (pure column expressions, so the
    DuckDB oracle can replay it verbatim).
  * ``synthesize_corpus`` — a fully deterministic, partition-layout-
    independent synthetic source-code corpus (seeded; every value is a pure
    function of the row id), used by tests for analyzer/index goldens and
    by the scaling benchmark. No Python RNG, no external data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Zipf-ish vocabulary: repetition count encodes frequency. Includes
# code-stopword-like hot terms (`return`, `import`, `self`, `the`) so
# hot-term skew is exercised (SURVEY.md §7 hard part 2).
_VOCAB: list[str] = (
    ["return"] * 24 + ["import"] * 18 + ["self"] * 14 + ["the"] * 12
    + ["def"] * 10 + ["value"] * 8 + ["data"] * 8 + ["index"] * 6
    + ["result"] * 6 + ["count"] * 5 + ["table"] * 5 + ["query"] * 4
    + ["batch"] * 4 + ["merge"] * 3 + ["shuffle"] * 3 + ["partition"] * 3
    + ["posting"] * 2 + ["varbyte"] * 2 + ["tokenizer"] * 2 + ["lucene"] * 2
    + ["bm25", "wand", "blockmax", "iceberg", "catalyst", "tungsten",
       "segment", "manifest", "checkpoint", "lineage", "quartz", "zephyr"]
)
_LANGS = ["python", "go", "java", "js", "rust", "md"]


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → (doc_id, repo, path, commit, lang, content).

    DuckDB-replayable mapping (md5/concat/mod exist identically there):
        repo    = 'org' || (doc_id % 7)
        path    = 'src/' || source || '/doc_' || doc_id || '.txt'
        commit  = md5(cast(doc_id as string))
        content = text
    """
    d = read_documents(spark, sf_dir)
    return d.select(
        F.col("doc_id"),
        F.concat(F.lit("org"), (F.col("doc_id") % 7).cast("string")).alias("repo"),
        F.concat(F.lit("src/"), F.col("source"), F.lit("/doc_"),
                 F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.md5(F.col("doc_id").cast("string")).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def _pick(vocab: list[str], id_col, pos_col, seed: int):
    """Deterministic vocab pick: pure function of (row id, position, seed).
    xxhash64 is a JVM built-in — no Python, no RNG state, identical result
    for any partitioning of the range."""
    arr = F.array(*[F.lit(w) for w in vocab])
    idx = F.pmod(F.xxhash64(id_col, pos_col, F.lit(seed)), F.lit(len(vocab)))
    return F.element_at(arr, (idx + 1).cast("int"))


def synthesize_corpus(
    spark: SparkSession, n_docs: int, seed: int = 42, parts: int | None = None
) -> DataFrame:
    """Deterministic synthetic source-code corpus with pinned edge rows.

    Row values depend only on (id, seed) — regenerating at any parallelism
    yields byte-identical rows (docID/content determinism, SURVEY.md §7
    hard part 1). Edge rows (FIXTURES.md §1): empty content (id 0),
    whitespace-only (id 1), non-ASCII (id 2), HTML-entity literals (id 3),
    same (repo,path) at two commits (ids 4,5), hot-term doc (id 6),
    very long doc (id 7).
    """
    base = spark.range(0, n_docs, 1, parts or spark.sparkContext.defaultParallelism)
    id_ = F.col("id")
    # body: 20–120 words, length a hash of id
    nwords = (F.pmod(F.xxhash64(id_, F.lit(seed + 1)), F.lit(101)) + 20).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), nwords - 1),
        lambda p: _pick(_VOCAB, id_, p, seed),
    )
    # sprinkle camelCase/snake_case identifiers so the code analyzer differs
    # from the simple one on real material
    ident = F.concat(
        F.lit("parse"), F.initcap(_pick(_VOCAB, id_, F.lit(-1), seed)),
        F.lit("Response_"), F.pmod(F.xxhash64(id_, F.lit(seed + 2)), F.lit(997)).cast("string"),
    )
    body = F.concat_ws(" ", F.concat_ws(" ", words), ident)
    content = (
        F.when(id_ == 0, F.lit(""))
        .when(id_ == 1, F.lit("   \t  \n  "))
        .when(id_ == 2, F.lit("def café_naïve(): return Über süß"))
        .when(id_ == 3, F.lit('x = "&nbsp;<div class=\\"interactive-comp\\">"'))
        .when(id_ == 6, F.concat(F.lit("hotterm "), F.repeat(F.lit("saturate "), 500)))
        .when(id_ == 7, F.repeat(F.lit("longdoc filler tokenizer posting "), 400))
        .otherwise(body)
    )
    repo = F.when(id_.isin(4, 5), F.lit("org0/dup-repo")).otherwise(
        F.concat(F.lit("org"), F.pmod(id_, F.lit(7)).cast("string"),
                 F.lit("/repo"), F.pmod(id_, F.lit(23)).cast("string"))
    )
    path = F.when(id_.isin(4, 5), F.lit("src/dup/mod.py")).otherwise(
        F.concat(F.lit("src/pkg"), F.pmod(id_, F.lit(13)).cast("string"),
                 F.lit("/mod_"), id_.cast("string"), F.lit(".py"))
    )
    commit = F.sha1(F.concat(repo, F.lit(":"), id_.cast("string")))
    lang = F.element_at(
        F.array(*[F.lit(l) for l in _LANGS]),
        (F.pmod(F.xxhash64(id_, F.lit(seed + 3)), F.lit(len(_LANGS))) + 1).cast("int"),
    )
    return base.select(
        repo.alias("repo"), path.alias("path"), commit.alias("commit"),
        lang.alias("lang"), content.alias("content"),
    )


def with_doc_id(corpus: DataFrame) -> DataFrame:
    """Deterministic 63-bit docID from the natural key (repo, path, commit).

    NOT monotonically_increasing_id(): that is partition-layout-dependent
    and breaks rank-identical checks across cluster sizes (SURVEY.md §7
    hard part 1). xxhash64 of the key is stable everywhere.
    """
    return corpus.withColumn(
        "doc_id",
        F.abs(F.xxhash64(F.col("repo"), F.col("path"), F.col("commit"))),
    )


def with_content_sha(corpus: DataFrame) -> DataFrame:
    """Ingest invariant column: sha256(content) must be preserved end-to-end
    (BASELINE.json input_hint; reference analog — byte-identical payload
    upserts keyed by uuid, /root/reference/pkg/es/service.go:119-128)."""
    return corpus.withColumn("content_sha256", F.sha2(F.col("content"), 256))
