"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship BM25 top-k over sf0.001 documents.
queries()         — one callable per implemented operator (SURVEY.md §2).
oracle_sql()      — DuckDB-equivalent SQL for each query (tables documents,
                    lineitem, ... are pre-registered views).
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from content_rw_elasticsearch_spark import __version__, oracle
from content_rw_elasticsearch_spark.engine import InMemoryIndex
from content_rw_elasticsearch_spark.operators.fields import FieldedIndex
from content_rw_elasticsearch_spark.operators.segments import build_segments
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex
from content_rw_elasticsearch_spark.operators import (
    dedup,
    multimodal,
    similarity,
    textstats,
)
from content_rw_elasticsearch_spark.plans import concordance as CONC
from content_rw_elasticsearch_spark.plans import index_model as IM
from content_rw_elasticsearch_spark.plans import relational as R
from content_rw_elasticsearch_spark.queries import REFERENCE_QUERIES

ANN_QUERY_IDS = [0, 7, 42, 99, 123]
EMBEDDING_DIM = 64  # driver embeddings.parquet schema (TESTDATA.md)

_INDEX_CACHE: dict[tuple, InMemoryIndex] = {}
_SEG_CACHE: dict[tuple, SegmentIndex] = {}
_FIELD_CACHE: dict[tuple, FieldedIndex] = {}

# field-scoped index surface (operators/fields.py — the ES per-field
# analyzed indexes analog): title = the enriched table's title derivation
# (first 5 whitespace words), body = the full text
def _field_exprs_spark():
    from pyspark.sql import functions as F
    return {
        "title": F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 5)),
        "body": F.col("text"),
    }


FIELD_EXPRS_SQL = {
    "title": "array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')",
    "body": "text",
}


def _fielded_index_for(spark: SparkSession, sf_dir: str) -> FieldedIndex:
    key = (id(spark), sf_dir)
    if key not in _FIELD_CACHE:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        _FIELD_CACHE[key] = FieldedIndex.build(
            docs, _field_exprs_spark(), doc_col="doc_id", analyzer="simple"
        )
    return _FIELD_CACHE[key]


def _index_for(spark: SparkSession, sf_dir: str) -> InMemoryIndex:
    """Build (once per sf_dir) the in-memory index over documents.parquet."""
    key = (id(spark), sf_dir)
    if key not in _INDEX_CACHE:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        _INDEX_CACHE[key] = InMemoryIndex.build(
            docs, text_col="text", doc_col="doc_id", analyzer="simple"
        )
    return _INDEX_CACHE[key]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 2-term AND BM25 top-10 on sf0.001."""
    idx = _index_for(spark, "/root/testdata/sf0.001")
    return idx.search("hash join", k=10, mode="AND")


def _segment_index_for(spark: SparkSession, sf_dir: str,
                       with_positions: bool = False) -> SegmentIndex:
    """Build (once per sf_dir+version+layout) the compressed segment index
    under /tmp and load it. Resumable build — a committed index is reused.
    The positional variant lives in its own cache dir (different on-disk
    layout) and serves the phrase queries."""
    key = (id(spark), sf_dir, with_positions)
    if key not in _SEG_CACHE:
        slug = sf_dir.strip("/").replace("/", "_")
        pos = "_pos" if with_positions else ""
        out = f"/tmp/spark_graft_segidx_v{__version__}{pos}_{slug}"
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        build_segments(
            docs, out, text_col="text", doc_col="doc_id", analyzer="simple",
            n_buckets=4, target_block=512, nb_max=64, snapshot_id=sf_dir,
            with_positions=with_positions,
        )
        _SEG_CACHE[key] = SegmentIndex.load(spark, out)
    return _SEG_CACHE[key]


def _fielded_segment_index_for(spark: SparkSession, sf_dir: str) -> SegmentIndex:
    """The AT-REST fielded index: build_segments(fields=...) writes
    composite ``field\x1fterm`` postings + per-field manifest stats, and
    SegmentIndex.search(field=...) queries the persisted store with that
    field's own norms — the path a reference user's `title:X` takes
    against the on-disk index (configs/referenceSchema.json:50-59)."""
    key = (id(spark), sf_dir, "fielded")
    if key not in _SEG_CACHE:
        slug = sf_dir.strip("/").replace("/", "_")
        out = f"/tmp/spark_graft_segidx_v{__version__}_fielded_{slug}"
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        build_segments(
            docs, out, doc_col="doc_id", analyzer="simple",
            n_buckets=4, target_block=512, nb_max=64, snapshot_id=sf_dir,
            fields=_field_exprs_spark(),
        )
        _SEG_CACHE[key] = SegmentIndex.load(spark, out)
    return _SEG_CACHE[key]


def _shard_indexes_for(spark: SparkSession, sf_dir: str,
                       n_shards: int = 2) -> list[SegmentIndex]:
    """Two shard indexes built over disjoint doc_id % n halves — the
    partitioned-build shape a 10^12-file corpus uses (each shard is an
    independent build over its id range; operators/wand.search_sharded
    merges df/n_docs/avgdl at query time)."""
    key = (id(spark), sf_dir, "shards", n_shards)
    if key not in _SEG_CACHE:
        from pyspark.sql import functions as F
        slug = sf_dir.strip("/").replace("/", "_")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        idxs = []
        for s in range(n_shards):
            out = (f"/tmp/spark_graft_segidx_v{__version__}"
                   f"_shard{s}of{n_shards}_{slug}")
            build_segments(
                docs.filter(F.col("doc_id") % n_shards == s), out,
                text_col="text", doc_col="doc_id", analyzer="simple",
                n_buckets=2, target_block=512, nb_max=64,
                snapshot_id=sf_dir,
            )
            idxs.append(SegmentIndex.load(spark, out))
        _SEG_CACHE[key] = idxs
    return _SEG_CACHE[key]


def _wand_query(name: str, prune: bool, spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = REFERENCE_QUERIES[name]
    seg = _segment_index_for(spark, sf_dir)
    return seg.search(spec["query"], k=spec["k"], mode=spec["mode"], prune=prune)


def _bm25_query(name: str, spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = REFERENCE_QUERIES[name]
    idx = _index_for(spark, sf_dir)
    return idx.search(spec["query"], k=spec["k"], mode=spec["mode"])


def _phrase_query(phrase: str, spark: SparkSession, sf_dir: str,
                  slop: int = 0) -> DataFrame:
    """Phrase match via the positional segment store (operators/wand.py
    phrase_search): salt-class-pruned decode of only the phrase terms'
    position lists — the scale path, not a corpus re-tokenize. ``slop``
    > 0 is the ordered proximity form (ES match_phrase slop)."""
    seg = _segment_index_for(spark, sf_dir, with_positions=True)
    return seg.phrase_search(phrase, slop=slop)


def _term_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two postings-fetch shapes union-gated in one slot (50-query cap):
    'term' = single-term lookup on the in-memory index; 'prefix' = the
    ES prefix-query expansion as a term-RANGE scan over the PERSISTED
    segment store (pushed StringStartsWith + term-sorted row-group
    pruning — see SegmentIndex.prefix_postings); 'fuzzy' = the ES fuzzy
    expansion (JVM levenshtein over the term dictionary, metadata-only
    scan — see SegmentIndex.fuzzy_postings); 'regexp' = the ES regexp
    expansion (anchored full-match over the term dictionary — see
    SegmentIndex.regexp_postings); 'suggest' = the ES completion/term
    suggester (top-k prefix terms by df, METADATA-ONLY scan — see
    SegmentIndex.suggest; rides the postings columns as doc_id=NULL,
    tf=df)."""
    from pyspark.sql import functions as F
    seg = _segment_index_for(spark, sf_dir)
    a = _index_for(spark, sf_dir).term_lookup("dup").select(
        F.lit("term").alias("variant"), F.lit("dup").alias("term"),
        "doc_id", "tf")
    b = seg.prefix_postings("s").select(
        F.lit("prefix").alias("variant"), "term", "doc_id", "tf")
    c = seg.fuzzy_postings("sow", max_edits=1).select(
        F.lit("fuzzy").alias("variant"), "term", "doc_id", "tf")
    d = seg.regexp_postings("jo.n|dup").select(
        F.lit("regexp").alias("variant"), "term", "doc_id", "tf")
    e = seg.suggest("s", k=8).select(
        F.lit("suggest").alias("variant"), "term",
        F.lit(None).cast("long").alias("doc_id"),
        F.col("df").cast("long").alias("tf"))
    return a.unionByName(b).unionByName(c).unionByName(d).unionByName(e)


def _term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    idx = _index_for(spark, sf_dir)
    return idx.stats.select("term", "df").orderBy("term")


def _corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    idx = _index_for(spark, sf_dir)
    return spark.createDataFrame(
        [(idx.n_docs, round(idx.avgdl, 4))], "n_docs long, avgdl double"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in REFERENCE_QUERIES:
        out[f"bm25_{name}"] = functools.partial(_bm25_query, name)
    # compressed segment store + block-max WAND path (oracle: the same
    # BM25 SQL — the physical path must be rank-identical to the logical).
    # The pruned (wand_) plan keeps all four shapes; the exhaustive
    # (segment_) plan keeps one AND + one OR — consolidation that holds
    # every query inside the driver's 50-query correctness cap (r3 let 5
    # operators rotate out of the checked set).
    for name in ("and_two", "or_three"):
        out[f"segment_{name}"] = functools.partial(_wand_query, name, False)
    for name in ("and_two", "single_hot", "or_three", "and_allhot"):
        out[f"wand_{name}"] = functools.partial(_wand_query, name, True)

    # bm25_single_hot also carries more_like_this (the ES MLT query:
    # tf·idf "interesting terms" selected from a source doc → OR BM25
    # with the source excluded — operators/search_ext.py) union-gated as
    # a second variant, a strict strengthening inside the 50-query cap.
    def _single_hot_and_mlt(spark, sf_dir):
        from pyspark.sql import functions as F

        from content_rw_elasticsearch_spark.operators.search_ext import (
            more_like_this,
        )
        spec = REFERENCE_QUERIES["single_hot"]
        idx = _index_for(spark, sf_dir)
        a = idx.search(spec["query"], k=spec["k"], mode=spec["mode"]
                       ).withColumn("variant", F.lit("hot"))
        b = more_like_this(idx.postings, idx.stats, idx.n_docs, idx.avgdl,
                           doc_id=7, k=10, min_term_freq=2, min_doc_freq=2
                           ).withColumn("variant", F.lit("mlt"))
        # same MLT over the PERSISTED segment store (source text
        # re-analyzed driver-side, df from the metadata-only scan, pruned
        # OR search) — must be rank-identical to the same oracle
        seg = _segment_index_for(spark, sf_dir)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        c = seg.more_like_this(7, docs, text_col="text", doc_col="doc_id",
                               k=10, min_term_freq=2, min_doc_freq=2
                               ).withColumn("variant", F.lit("mlt_seg"))
        return a.unionByName(b).unionByName(c)

    out["bm25_single_hot"] = _single_hot_and_mlt

    # bm25_and_skewed also carries ES field collapsing (best hit per
    # documents.lang via one partial-aggregable struct-argmax — NOT a
    # window; operators/search_ext.collapse_topk) as a second variant;
    # group_key is NULL on the base leg.
    def _and_skewed_and_collapse(spark, sf_dir):
        from pyspark.sql import functions as F

        from content_rw_elasticsearch_spark.operators.search_ext import (
            collapse_topk,
        )
        spec = REFERENCE_QUERIES["and_skewed"]
        idx = _index_for(spark, sf_dir)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = idx.search(spec["query"], k=spec["k"], mode=spec["mode"]).select(
            F.lit("and").alias("variant"),
            F.lit(None).cast("string").alias("group_key"),
            "doc_id", "score")
        b = collapse_topk(idx.postings, idx.stats, idx.n_docs, idx.avgdl,
                          "hash join row", docs, "lang", k=10).select(
            F.lit("collapse").alias("variant"), "group_key", "doc_id",
            "score")
        # the same collapse over the PERSISTED store (exhaustive decode →
        # full scored set → shared struct-argmax) — rank-identical
        seg = _segment_index_for(spark, sf_dir)
        c = seg.collapse("hash join row", docs, "lang", k=10,
                         mode="OR").select(
            F.lit("collapse_seg").alias("variant"), "group_key", "doc_id",
            "score")
        return a.unionByName(b).unionByName(c)

    out["bm25_and_skewed"] = _and_skewed_and_collapse

    # wand_or_three carries search_after keyset pagination on top of the
    # same pruned OR plan: page 1 (k=5) + page 2 (k=5, after = page 1's
    # last (score, doc_id) cursor) must EQUAL the one-shot top-10 — the
    # oracle pages the same SQL with row_number. The page-1 collect is
    # the inherent sequentiality of cursor pagination (k rows, bounded).
    def _wand_or_paged(spark, sf_dir):
        from pyspark.sql import functions as F
        spec = REFERENCE_QUERIES["or_three"]
        seg = _segment_index_for(spark, sf_dir)
        half = spec["k"] // 2
        p1 = seg.search(spec["query"], k=half, mode="OR", prune=True)
        last = p1.collect()[-1]
        p2 = seg.search(spec["query"], k=spec["k"] - half, mode="OR",
                        prune=True, after=(last["score"], last["doc_id"]))
        return p1.withColumn("page", F.lit(1)).unionByName(
            p2.withColumn("page", F.lit(2)))

    out["wand_or_three"] = _wand_or_paged

    # wand_and_two also carries the ES bool.filter context (r5): the SAME
    # pruned plan with a metadata filter (documents.lang = 'en') that
    # restricts matches WITHOUT touching scores — θ is seeded from
    # filtered scores and the class upper bounds stay valid because a
    # filter only removes docs (see SegmentIndex.search). 141 of 500
    # sf0.01 docs match the AND + filter, so the leg is non-vacuous.
    def _wand_and_two_filtered(spark, sf_dir):
        from pyspark.sql import functions as F
        spec = REFERENCE_QUERIES["and_two"]
        seg = _segment_index_for(spark, sf_dir)
        base = seg.search(spec["query"], k=spec["k"], mode=spec["mode"],
                          prune=True).withColumn("variant", F.lit("pruned"))
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        flt = seg.search(
            spec["query"], k=spec["k"], mode=spec["mode"], prune=True,
            filter_ids=docs.filter(F.col("lang") == "en").select("doc_id"),
        ).withColumn("variant", F.lit("filtered"))
        return base.unionByName(flt)

    out["wand_and_two"] = _wand_and_two_filtered

    # segment_and_two also carries sharded/alias search (r5): the same
    # query over TWO disjoint doc_id%2 shard indexes must be
    # rank-identical to the union-index gate and to the same oracle —
    # the ES dfs_query_then_fetch property (global df/n_docs/avgdl
    # merged before scoring) that a partitioned 10^12-file build needs.
    def _segment_and_two_sharded(spark, sf_dir):
        from pyspark.sql import functions as F

        from content_rw_elasticsearch_spark.operators.wand import (
            search_sharded,
        )
        spec = REFERENCE_QUERIES["and_two"]
        base = _wand_query("and_two", False, spark, sf_dir).withColumn(
            "variant", F.lit("exhaustive"))
        sh = search_sharded(_shard_indexes_for(spark, sf_dir),
                            spec["query"], k=spec["k"], mode=spec["mode"]
                            ).withColumn("variant", F.lit("sharded"))
        return base.unionByName(sh)

    out["segment_and_two"] = _segment_and_two_sharded

    # bm25_and_empty also carries the synonym query (r5): the base leg
    # keeps the absent-term AND (0 rows — the correct empty), and the
    # 'syn' leg expands the absent term through a synonym set
    # (zzzabsent→scan), making the same AND satisfiable under Lucene
    # SynonymQuery semantics (tf summed, df = max member df) — so this
    # slot now proves a NONZERO result too, not just plan validity.
    def _and_empty_and_syn(spark, sf_dir):
        from pyspark.sql import functions as F
        spec = REFERENCE_QUERIES["and_empty"]
        idx = _index_for(spark, sf_dir)
        a = idx.search(spec["query"], k=spec["k"], mode=spec["mode"]
                       ).withColumn("variant", F.lit("empty"))
        seg = _segment_index_for(spark, sf_dir)
        b = seg.search_synonyms(spec["query"], {"zzzabsent": ["scan"]},
                                k=spec["k"], mode="AND"
                                ).withColumn("variant", F.lit("syn"))
        return a.unionByName(b)

    out["bm25_and_empty"] = _and_empty_and_syn

    # wand_single_hot also carries the ES rescore analog (r5): the BM25
    # top-30 window of "join" re-ranked by a match_phrase "hash join"
    # secondary (Lucene PhraseQuery scoring over the positional store),
    # combined = 1.0*bm25 + 1.0*phrase_score — vs a DuckDB replay of the
    # window + phrase chain + combination (oracle.rescore_sql).
    def _wand_single_hot_rescore(spark, sf_dir):
        from pyspark.sql import functions as F
        spec = REFERENCE_QUERIES["single_hot"]
        seg = _segment_index_for(spark, sf_dir)
        base = seg.search(spec["query"], k=spec["k"], mode=spec["mode"],
                          prune=True).withColumn("variant", F.lit("pruned"))
        segp = _segment_index_for(spark, sf_dir, with_positions=True)
        rs = segp.rescore(spec["query"], "hash join", k=spec["k"],
                          window_size=30).withColumn(
            "variant", F.lit("rescore"))
        return base.unionByName(rs)

    out["wand_single_hot"] = _wand_single_hot_rescore

    # wand_and_allhot also carries ES function_score/field_value_factor
    # (r5): bm25 * log1p(n_chars) over the FULL match set (per-doc
    # multipliers void block-max pruning — see
    # SegmentIndex.function_score), top-k via TakeOrderedAndProject.
    def _wand_and_allhot_fscore(spark, sf_dir):
        from pyspark.sql import functions as F
        spec = REFERENCE_QUERIES["and_allhot"]
        seg = _segment_index_for(spark, sf_dir)
        base = seg.search(spec["query"], k=spec["k"], mode=spec["mode"],
                          prune=True).withColumn("variant", F.lit("pruned"))
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        fs = seg.function_score(spec["query"], docs, "n_chars",
                                k=spec["k"], mode=spec["mode"]
                                ).withColumn("variant", F.lit("fscore"))
        return base.unionByName(fs)

    out["wand_and_allhot"] = _wand_and_allhot_fscore
    # segment_or_three carries the ES-highlighter analog on top of the
    # same exhaustive (prune=False) OR ranking: score still compared to
    # the same BM25 oracle, PLUS per-hit best-window snippet +
    # n_window_terms from the positional store (operators/highlight.py)
    # — a strict strengthening of the original gate inside the 50 cap.
    def _segment_or_highlight(spark, sf_dir):
        spec = REFERENCE_QUERIES["or_three"]
        seg = _segment_index_for(spark, sf_dir, with_positions=True)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return seg.highlight(spec["query"], docs, text_col="text",
                             doc_col="doc_id", k=spec["k"], mode="OR",
                             prune=False)

    out["segment_or_three"] = _segment_or_highlight
    # minimum_should_match (the ES bool-query should knob) union-gated
    # into the or_large_k slot (50-query cap): 'or' = the original plain
    # OR gate; 'msm2' = the logical plan keeping docs matching >= 2 of
    # the 3 terms; 'msm2_wand' = the PRUNED segment store whose
    # feasibility lattice tightens to classes where >= 2 terms have
    # postings — all three rank-identical to the same oracle predicate.
    def _or_large_k_variants(spark, sf_dir):
        from pyspark.sql import functions as F
        spec = REFERENCE_QUERIES["or_large_k"]
        idx = _index_for(spark, sf_dir)
        seg = _segment_index_for(spark, sf_dir)
        a = idx.search(spec["query"], k=spec["k"], mode="OR").withColumn(
            "variant", F.lit("or"))
        b = idx.search(spec["query"], k=spec["k"], mode="OR",
                       min_should_match=2).withColumn("variant", F.lit("msm2"))
        c = seg.search(spec["query"], k=spec["k"], mode="OR", prune=True,
                       min_should_match=2).withColumn(
            "variant", F.lit("msm2_wand"))
        return a.unionByName(b).unionByName(c)

    out["bm25_or_large_k"] = _or_large_k_variants
    # NOT semantics (§2.G) + the full ES bool-query composition
    # (must/should/must_not/msm in ONE scored plan — operators/boolquery)
    # union-gated in one slot: 'not' = the original NOT gate; 'bool' =
    # the logical bool plan; 'bool_seg' = the same query over the
    # persisted segment store — all value-compared to the same oracles.
    def _bm25_not(spark, sf_dir):
        from pyspark.sql import functions as F

        from content_rw_elasticsearch_spark.operators.bm25 import bm25_topk
        from content_rw_elasticsearch_spark.operators.boolquery import (
            bool_topk,
            segment_bool_topk,
        )
        idx = _index_for(spark, sf_dir)
        a = bm25_topk(idx.postings, idx.stats, idx.n_docs, idx.avgdl,
                      "hash join", k=10, mode="AND", not_terms=["row"]
                      ).withColumn("variant", F.lit("not"))
        b = bool_topk(idx.postings, idx.stats, idx.n_docs, idx.avgdl,
                      must="hash", should="join row scan", must_not="dup",
                      k=10).withColumn("variant", F.lit("bool"))
        seg = _segment_index_for(spark, sf_dir)
        c = segment_bool_topk(seg, must="hash", should="join row scan",
                              must_not="dup", k=10).withColumn(
            "variant", F.lit("bool_seg"))
        return a.unionByName(b).unionByName(c)

    out["bm25_not"] = _bm25_not

    # code-aware Arrow analyzer end-to-end (camelCase/snake splitting +
    # per-token ascii folding preserve-original); oracle = pure-Python
    # golden table (identifier splitting isn't in the SQL subset)
    def _bm25_code_analyzer(spark, sf_dir):
        key = (id(spark), sf_dir, "code")
        if key not in _INDEX_CACHE:
            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            _INDEX_CACHE[key] = InMemoryIndex.build(
                docs, text_col="text", doc_col="doc_id", analyzer="code"
            )
        return _INDEX_CACHE[key].search("hash join", k=10, mode="AND")

    out["bm25_code_analyzer"] = _bm25_code_analyzer
    # field-scoped search (§2.J — ES per-field analyzed indexes): the SAME
    # query against title vs body ranks differently (per-field df/avgdl)
    out["bm25_field_title"] = lambda s, d: _fielded_index_for(s, d).search(
        "hash join", field="title", k=10, mode="AND")
    out["bm25_field_body"] = lambda s, d: _fielded_index_for(s, d).search(
        "hash join", field="body", k=10, mode="AND")
    # the PERSISTED fielded index (composite field\x1fterm segment store,
    # per-field manifest norms) — same oracle as the in-memory fielded
    # path: at-rest field scoping must be rank-identical to the logical.
    # Both field shapes union-gated in ONE query (50-query cap; same
    # consolidation as phrase_matches) — r5 freed the second slot for
    # dedup_embedding_cosine.
    def _segment_fielded(spark, sf_dir):
        from pyspark.sql import functions as F
        idx = _fielded_segment_index_for(spark, sf_dir)
        a = idx.search("hash join", field="title", k=10, mode="AND"
                       ).withColumn("field", F.lit("title"))
        b = idx.search("hash join", field="body", k=10, mode="AND"
                       ).withColumn("field", F.lit("body"))
        # ES multi_match most_fields with boosts (title^2), one decode
        # pass over both fields' composite keys, per-field norms
        c = idx.search_multi("hash join", {"title": 2.0, "body": 1.0},
                             k=10, mode="AND").withColumn("field", F.lit("multi"))
        return a.unionByName(b).unionByName(c)

    out["segment_fielded"] = _segment_fielded

    # all phrase shapes in one gated query (see the 50-query cap note):
    # two exact phrases plus two PROXIMITY legs (slop>0 — ordered
    # within-window tuples): slop=1 on "customer group" matches the
    # one-token-interleaved "customer data group" docs adjacency can't,
    # and slop=2 on "hash join" also counts stretched tuples.
    def _phrase_matches(spark, sf_dir):
        from pyspark.sql import functions as F
        legs = [("hash join", 0), ("customer data group", 0),
                ("customer group", 1), ("hash join", 2)]
        parts = [
            _phrase_query(p, spark, sf_dir, slop=s)
            .withColumn("phrase", F.lit(p)).withColumn("slop", F.lit(s))
            for p, s in legs
        ]
        # r5: match_phrase_prefix leg — exact 'customer' + prefix 'da'
        # expanded lexicographically (MultiPhraseQuery), marked slop=-1
        seg = _segment_index_for(spark, sf_dir, with_positions=True)
        parts.append(
            seg.phrase_prefix_search("customer da", max_expansions=50)
            .withColumn("phrase", F.lit("customer da*"))
            .withColumn("slop", F.lit(-1)))
        cur = parts[0]
        for p in parts[1:]:
            cur = cur.unionByName(p)
        return cur

    out["phrase_matches"] = _phrase_matches
    out["index_term_postings"] = _term_postings

    # per-term df + global n_docs/avgdl in one gated query (50-query cap)
    def _index_stats(spark, sf_dir):
        return _term_stats(spark, sf_dir).crossJoin(
            _corpus_stats(spark, sf_dir))

    out["index_stats"] = _index_stats
    # IndexModel ETL (reference pkg/mapper + pkg/message parity, SURVEY §2.B/C/E)
    out["etl_index_model"] = lambda s, d: IM.to_index_model(
        IM.enriched_from_documents(s, d)).orderBy("uid")
    out["etl_delete_set"] = lambda s, d: IM.delete_set(IM.enriched_from_documents(s, d))
    out["etl_routing_counts"] = lambda s, d: IM.routing_counts(
        IM.enriched_from_documents(s, d))
    out["etl_people_buckets"] = lambda s, d: IM.annotation_buckets(
        IM.annotations_from_documents(s, d), "PERSON", "cmr_people", joined=True)
    out["etl_topic_buckets"] = lambda s, d: IM.annotation_buckets(
        IM.annotations_from_documents(s, d), "TOPIC", "cmr_topics", joined=True)
    # COMPANY branch (mapper.go:126-128) — oracle-gated through the driver
    out["etl_company_buckets"] = lambda s, d: IM.annotation_buckets(
        IM.annotations_from_documents(s, d), "COMPANY", "cmr_companynames",
        joined=True)
    # the COMPLETE assembled IndexModel document (mapper.go:54-90): scalars
    # + all buckets + primaries in one wide row per written doc
    out["etl_full_document"] = lambda s, d: IM.full_index_model(
        IM.enriched_from_documents(s, d),
        IM.annotations_from_documents(s, d)).orderBy("uid")
    out["etl_primary_theme"] = lambda s, d: IM.primary_theme(
        IM.annotations_from_documents(s, d))
    # E4 section accumulation + E6 author gating (mapper.go:272-291, :107-124)
    out["etl_sections"] = lambda s, d: IM.section_accumulation(
        IM.annotations_from_documents(s, d))
    out["etl_authors"] = lambda s, d: IM.author_buckets(
        IM.annotations_from_documents(s, d))
    # D2 concordance grouping/alias model (concordance.go:97-119)
    out["etl_concordance_model"] = lambda s, d: CONC.concordance_model(
        CONC.concordances_from_documents(s, d), joined=True)
    out["etl_cmr_id_fallback"] = lambda s, d: IM.cmr_id_fallback(
        IM.annotations_from_documents(s, d))
    # relational operator plans (SURVEY §2.D/F/H + A2)
    out["join_region_revenue"] = R.region_revenue
    out["window_top3_orders"] = R.top3_orders_per_customer
    # A2 JSON deserialize + event-time windowed aggregation (tumbling /
    # sliding / session, streaming/windows.py — the batch form of the
    # watermarked streaming plans) union-gated in one query (50-query cap)
    out["events_profile"] = R.events_profile
    out["upsert_last_writer_wins"] = R.last_writer_wins
    out["antijoin_unmatched_lookups"] = R.unmatched_lookups

    # training-data pipeline operators
    def _docs(s, d):
        return s.read.parquet(f"{d}/documents.parquet")

    def _emb(s, d):
        return s.read.parquet(f"{d}/embeddings.parquet")

    # the corpus has no exact dups at sf0.01, which made this gate pass
    # vacuously on 0 rows (VERDICT r4 #3) — union a doc_id-shifted copy of
    # every 25th document so real duplicate groups exist; the oracle SQL
    # seeds identically
    def _dedup_exact(s, d):
        from pyspark.sql import functions as F
        docs = _docs(s, d).select("doc_id", "text")
        dup = docs.filter(F.col("doc_id") % 25 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        return dedup.exact_dup_groups(docs.unionByName(dup), "text", "doc_id")

    out["dedup_exact_groups"] = _dedup_exact
    out["dedup_ngram_jaccard"] = lambda s, d: dedup.ngram_jaccard_pairs(
        _docs(s, d), "text", "doc_id", n=3, tau=0.8)
    # minhash slot also carries the clustering step a dedup pipeline
    # actually keys retention on: connected components over the verified
    # pair graph (doc_id, cluster_id = min id in component), value-gated
    # against a recursive-CTE transitive closure of the same pair SQL.
    def _dedup_minhash_and_clusters(s, d):
        from pyspark.sql import functions as F
        pairs = dedup.minhash_lsh_dedup(_docs(s, d), "text", "doc_id",
                                        n=3, tau=0.8)
        a = pairs.select(F.lit("pair").alias("variant"), "d1", "d2",
                         "jaccard")
        b = dedup.connected_components(pairs).select(
            F.lit("cluster").alias("variant"),
            F.col("doc_id").alias("d1"),
            F.col("cluster_id").alias("d2"),
            F.lit(None).cast("double").alias("jaccard"))
        return a.unionByName(b)

    out["dedup_minhash_lsh"] = _dedup_minhash_and_clusters
    out["dedup_simhash"] = lambda s, d: dedup.simhash_pairs(
        _docs(s, d), "text", "doc_id", max_hamming=3)

    # embedding-cosine near-dup (fifth dedup flavor): multi-table LSH
    # candidates + exact-cosine verify. Seeded like dedup_exact_groups —
    # every 20th embedding duplicated under vec_id+1e6 — so the gate
    # checks nonzero cos-1.0 pairs; the oracle SQL seeds identically.
    def _dedup_emb(s, d):
        from pyspark.sql import functions as F
        emb = _emb(s, d).select("vec_id", "embedding")
        dup = emb.filter(F.col("vec_id") % 20 == 0).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
        return dedup.embedding_near_dup_pairs(
            emb.unionByName(dup), tau=0.9, dim=EMBEDDING_DIM)

    out["dedup_embedding_cosine"] = _dedup_emb
    out["sim_cosine_topk"] = lambda s, d: similarity.cosine_topk(
        s, _emb(s, d), ANN_QUERY_IDS, k=5)
    out["sim_ann_lsh_topk"] = lambda s, d: similarity.ann_lsh_topk(
        s, _emb(s, d), ANN_QUERY_IDS, k=5, dim=EMBEDDING_DIM)
    # both probe-expansion ANN shapes union-gated in ONE query (50-query
    # cap; same consolidation as phrase_matches/segment_fielded) — the
    # disjoint variant column keeps each operator's rows hash-gated.
    # Freed slot goes to sim_ann_ivf_topk (the centroid-bucketed family).
    def _sim_ann_probes(s, d):
        from pyspark.sql import functions as F
        mp = similarity.ann_multiprobe_topk(
            s, _emb(s, d), ANN_QUERY_IDS, k=5, dim=EMBEDDING_DIM
        ).withColumn("variant", F.lit("multiprobe"))
        mt = similarity.ann_multitable_topk(
            s, _emb(s, d), ANN_QUERY_IDS, k=5, dim=EMBEDDING_DIM
        ).withColumn("variant", F.lit("multitable"))
        return mp.unionByName(mt)

    out["sim_ann_probes"] = _sim_ann_probes
    out["sim_ann_ivf_topk"] = lambda s, d: similarity.ann_ivf_topk(
        s, _emb(s, d), ANN_QUERY_IDS, k=5, dim=EMBEDDING_DIM)
    # all four text-analysis operators in one doc_id-joined gated query
    # (50-query cap): each operator's columns are disjoint, so the value
    # hash still gates every one of them individually
    def _text_profile(s, d):
        docs = _docs(s, d)
        return (
            textstats.token_counts(docs, "text", "doc_id")
            .join(textstats.quality_scores(docs, "text", "doc_id"), "doc_id")
            .join(textstats.language_id(docs, "text", "doc_id"), "doc_id")
            .join(textstats.language_id_ngram(docs, "text", "doc_id"), "doc_id")
            .join(textstats.fingerprints(docs, "text", "doc_id"), "doc_id")
        )

    out["text_profile"] = _text_profile
    out["multimodal_metadata"] = lambda s, d: multimodal.media_metadata(
        multimodal.media_from_documents(_docs(s, d)))
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, spec in REFERENCE_QUERIES.items():
        out[f"bm25_{name}"] = oracle.bm25_topk_sql(
            spec["query"], k=spec["k"], mode=spec["mode"]
        )
    for name in ("and_two", "single_hot", "or_three", "and_allhot"):
        spec = REFERENCE_QUERIES[name]
        sql = oracle.bm25_topk_sql(spec["query"], k=spec["k"], mode=spec["mode"])
        if name == "and_two":
            out[f"segment_{name}"] = sql
        out[f"wand_{name}"] = sql
    # r5 variant legs in the wand slots: filter context (and_two),
    # rescore (single_hot), function_score (and_allhot), sharded search
    # (segment_and_two) — each unions the original gate with the new
    # feature's own oracle replay
    _spec = REFERENCE_QUERIES["and_two"]
    out["segment_and_two"] = (
        "SELECT *, 'exhaustive' AS variant FROM ("
        + oracle.bm25_topk_sql(_spec["query"], k=_spec["k"],
                               mode=_spec["mode"])
        + ") UNION ALL SELECT *, 'sharded' AS variant FROM ("
        + oracle.bm25_topk_sql(_spec["query"], k=_spec["k"],
                               mode=_spec["mode"]) + ")"
    )
    out["wand_and_two"] = (
        "SELECT *, 'pruned' AS variant FROM ("
        + oracle.bm25_topk_sql(_spec["query"], k=_spec["k"],
                               mode=_spec["mode"])
        + ") UNION ALL SELECT *, 'filtered' AS variant FROM ("
        + oracle.bm25_topk_sql(_spec["query"], k=_spec["k"],
                               mode=_spec["mode"],
                               filter_where="lang = 'en'") + ")"
    )
    _spec = REFERENCE_QUERIES["and_empty"]
    out["bm25_and_empty"] = (
        "SELECT *, 'empty' AS variant FROM ("
        + oracle.bm25_topk_sql(_spec["query"], k=_spec["k"],
                               mode=_spec["mode"])
        + ") UNION ALL SELECT *, 'syn' AS variant FROM ("
        + oracle.synonym_topk_sql(_spec["query"], {"zzzabsent": ["scan"]},
                                  k=_spec["k"], mode="AND") + ")"
    )
    _spec = REFERENCE_QUERIES["single_hot"]
    out["wand_single_hot"] = (
        "SELECT *, 'pruned' AS variant FROM ("
        + oracle.bm25_topk_sql(_spec["query"], k=_spec["k"],
                               mode=_spec["mode"])
        + ") UNION ALL SELECT *, 'rescore' AS variant FROM ("
        + oracle.rescore_sql(_spec["query"], "hash join", k=_spec["k"],
                             window_size=30) + ")"
    )
    _spec = REFERENCE_QUERIES["and_allhot"]
    out["wand_and_allhot"] = (
        "SELECT *, 'pruned' AS variant FROM ("
        + oracle.bm25_topk_sql(_spec["query"], k=_spec["k"],
                               mode=_spec["mode"])
        + ") UNION ALL SELECT *, 'fscore' AS variant FROM ("
        + oracle.function_score_sql(_spec["query"], k=_spec["k"],
                                    mode=_spec["mode"]) + ")"
    )
    # single_hot carries the more_like_this variant (same params as the
    # Spark leg: source doc 7, min_term_freq=2, min_doc_freq=2)
    _spec = REFERENCE_QUERIES["single_hot"]
    out["bm25_single_hot"] = (
        "SELECT *, 'hot' AS variant FROM ("
        + oracle.bm25_topk_sql(_spec["query"], k=_spec["k"],
                               mode=_spec["mode"])
        + ") UNION ALL SELECT *, 'mlt' AS variant FROM ("
        + oracle.more_like_this_sql(7, k=10, min_term_freq=2,
                                    min_doc_freq=2)
        + ") UNION ALL SELECT *, 'mlt_seg' AS variant FROM ("
        + oracle.more_like_this_sql(7, k=10, min_term_freq=2,
                                    min_doc_freq=2) + ")"
    )
    # and_skewed carries the field-collapsing variant (best hit per lang)
    _spec = REFERENCE_QUERIES["and_skewed"]
    out["bm25_and_skewed"] = (
        "SELECT *, CAST(NULL AS VARCHAR) AS group_key, 'and' AS variant "
        "FROM ("
        + oracle.bm25_topk_sql(_spec["query"], k=_spec["k"],
                               mode=_spec["mode"])
        + ") UNION ALL SELECT doc_id, score, group_key, "
        "'collapse' AS variant FROM ("
        + oracle.collapse_topk_sql("hash join row", "lang", k=10)
        + ") UNION ALL SELECT doc_id, score, group_key, "
        "'collapse_seg' AS variant FROM ("
        + oracle.collapse_topk_sql("hash join row", "lang", k=10) + ")"
    )
    _spec = REFERENCE_QUERIES["or_three"]
    out["segment_or_three"] = oracle.highlight_sql(
        _spec["query"], k=_spec["k"], mode="OR")
    _half = _spec["k"] // 2
    out["wand_or_three"] = (
        "SELECT doc_id, score, ((rn - 1) // " + str(_half)
        + " + 1)::INT AS page FROM (SELECT *, row_number() OVER "
        "(ORDER BY score DESC, doc_id ASC) AS rn FROM ("
        + oracle.bm25_topk_sql(_spec["query"], k=_spec["k"], mode="OR")
        + "))"
    )
    # or_large_k carries the minimum_should_match variants; the msm SQL
    # (HAVING count >= 2) gates BOTH the logical and the pruned-WAND legs
    _spec = REFERENCE_QUERIES["or_large_k"]
    _plain = oracle.bm25_topk_sql(_spec["query"], k=_spec["k"], mode="OR")
    _msm = oracle.bm25_topk_sql(_spec["query"], k=_spec["k"], mode="OR",
                                min_should_match=2)
    out["bm25_or_large_k"] = (
        "SELECT *, 'or' AS variant FROM (" + _plain
        + ") UNION ALL SELECT *, 'msm2' AS variant FROM (" + _msm
        + ") UNION ALL SELECT *, 'msm2_wand' AS variant FROM (" + _msm + ")"
    )
    _bool = oracle.bool_topk_sql(must="hash", should="join row scan",
                                 must_not="dup", k=10)
    out["bm25_not"] = (
        "SELECT *, 'not' AS variant FROM ("
        + oracle.bm25_topk_sql("hash join", k=10, mode="AND",
                               not_terms=["row"])
        + ") UNION ALL SELECT *, 'bool' AS variant FROM (" + _bool
        + ") UNION ALL SELECT *, 'bool_seg' AS variant FROM (" + _bool + ")"
    )
    # code-analyzer BM25: independent pure-Python golden (VALUES literal)
    out["bm25_code_analyzer"] = oracle.bm25_code_topk_sql("hash join", k=10, mode="AND")
    from content_rw_elasticsearch_spark.operators.fields import (
        fielded_bm25_multi_sql,
        fielded_bm25_sql,
    )
    out["bm25_field_title"] = fielded_bm25_sql(
        FIELD_EXPRS_SQL, "hash join", field="title", k=10, mode="AND")
    out["bm25_field_body"] = fielded_bm25_sql(
        FIELD_EXPRS_SQL, "hash join", field="body", k=10, mode="AND")
    # at-rest fielded path: SAME oracle — persisted field scoping must be
    # rank-identical to the logical fielded plan (both shapes union-gated)
    out["segment_fielded"] = (
        "SELECT *, 'title' AS field FROM (" + out["bm25_field_title"]
        + ") UNION ALL SELECT *, 'body' AS field FROM ("
        + out["bm25_field_body"]
        + ") UNION ALL SELECT *, 'multi' AS field FROM ("
        + fielded_bm25_multi_sql(FIELD_EXPRS_SQL, "hash join",
                                 {"title": 2.0, "body": 1.0},
                                 k=10, mode="AND") + ")"
    )
    out["phrase_matches"] = " UNION ALL ".join(
        f"SELECT *, '{p}' AS phrase, {s} AS slop FROM ("
        + oracle.phrase_match_sql(p, slop=s) + ")"
        for p, s in [("hash join", 0), ("customer data group", 0),
                     ("customer group", 1), ("hash join", 2)]
    ) + (
        " UNION ALL SELECT *, 'customer da*' AS phrase, -1 AS slop FROM ("
        + oracle.phrase_prefix_sql("customer da", max_expansions=50) + ")"
    )
    out["index_term_postings"] = (
        "SELECT 'term' AS variant, 'dup' AS term, doc_id, tf FROM ("
        + oracle.term_postings_sql("dup")
        + ") UNION ALL SELECT 'prefix' AS variant, term, doc_id, tf FROM ("
        + oracle.prefix_postings_sql("s")
        + ") UNION ALL SELECT 'fuzzy' AS variant, term, doc_id, tf FROM ("
        + oracle.fuzzy_postings_sql("sow", max_edits=1)
        + ") UNION ALL SELECT 'regexp' AS variant, term, doc_id, tf FROM ("
        + oracle.regexp_postings_sql("jo.n|dup")
        + ") UNION ALL SELECT 'suggest' AS variant, term, "
        "CAST(NULL AS BIGINT) AS doc_id, df AS tf FROM ("
        + oracle.suggest_sql("s", k=8) + ")"
    )
    out["index_stats"] = (
        "SELECT t.term, t.df, c.n_docs, c.avgdl FROM ("
        + oracle.term_stats_sql() + ") t CROSS JOIN ("
        + oracle.corpus_stats_sql() + ") c"
    )
    out["etl_index_model"] = oracle.index_model_sql()
    out["etl_delete_set"] = oracle.delete_set_sql()
    out["etl_routing_counts"] = oracle.routing_counts_sql()
    out["etl_people_buckets"] = oracle.annotation_buckets_sql("PERSON", "cmr_people")
    out["etl_topic_buckets"] = oracle.annotation_buckets_sql("TOPIC", "cmr_topics")
    out["etl_company_buckets"] = oracle.annotation_buckets_sql(
        "COMPANY", "cmr_companynames")
    out["etl_full_document"] = oracle.full_document_sql()
    out["etl_primary_theme"] = oracle.primary_theme_sql()
    out["etl_sections"] = oracle.sections_sql()
    out["etl_authors"] = oracle.authors_sql()
    out["etl_concordance_model"] = CONC.concordance_model_sql()
    out["etl_cmr_id_fallback"] = oracle.cmr_id_fallback_sql()
    out["join_region_revenue"] = R.region_revenue_sql()
    out["window_top3_orders"] = R.top3_orders_per_customer_sql()
    out["events_profile"] = R.events_profile_sql()
    out["upsert_last_writer_wins"] = R.last_writer_wins_sql()
    out["antijoin_unmatched_lookups"] = R.unmatched_lookups_sql()
    # seeded input (see queries()): every 25th doc duplicated under a
    # shifted doc_id so the gate checks nonzero duplicate groups
    out["dedup_exact_groups"] = """
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 25 = 0
)
SELECT content_sha, count(*)::BIGINT AS n, min(doc_id) AS keep_doc_id
FROM (SELECT doc_id, sha256(text) AS content_sha FROM docs2)
GROUP BY content_sha HAVING count(*) > 1 ORDER BY content_sha
"""
    out["dedup_ngram_jaccard"] = dedup.ngram_jaccard_pairs_sql(n=3, tau=0.8)
    # LSH+verify must equal the exact-join result (recall caveat in docstring)
    _pairs_sql = dedup.ngram_jaccard_pairs_sql(n=3, tau=0.8)
    out["dedup_minhash_lsh"] = (
        "SELECT 'pair' AS variant, d1, d2, jaccard FROM (" + _pairs_sql
        + ") UNION ALL SELECT 'cluster' AS variant, doc_id AS d1, "
        "cluster_id AS d2, CAST(NULL AS DOUBLE) AS jaccard FROM ("
        + dedup.dedup_clusters_sql(_pairs_sql) + ")"
    )
    # dedup_simhash: the bit-vote algebra is not SQL-expressible, so the
    # oracle is an independent pure-Python brute-force replay materialized
    # as a VALUES golden table (pinned to the driver's sf0.01 scale)
    out["dedup_simhash"] = dedup.simhash_pairs_sql(max_hamming=3)
    out["dedup_embedding_cosine"] = dedup.embedding_near_dup_pairs_sql(
        dim=EMBEDDING_DIM, tau=0.9, seed_every=20)
    out["sim_cosine_topk"] = similarity.cosine_topk_sql(ANN_QUERY_IDS, k=5)
    out["sim_ann_lsh_topk"] = similarity.ann_lsh_topk_sql(64, ANN_QUERY_IDS, k=5)
    out["sim_ann_probes"] = (
        "SELECT *, 'multiprobe' AS variant FROM ("
        + similarity.ann_multiprobe_topk_sql(64, ANN_QUERY_IDS, k=5)
        + ") UNION ALL SELECT *, 'multitable' AS variant FROM ("
        + similarity.ann_multitable_topk_sql(EMBEDDING_DIM, ANN_QUERY_IDS, k=5)
        + ")"
    )
    out["sim_ann_ivf_topk"] = similarity.ann_ivf_topk_sql(
        EMBEDDING_DIM, ANN_QUERY_IDS, k=5)
    out["text_profile"] = (
        "SELECT * FROM (" + textstats.token_counts_sql() + ") a JOIN ("
        + textstats.quality_scores_sql() + ") b USING (doc_id) JOIN ("
        + textstats.language_id_sql() + ") c USING (doc_id) JOIN ("
        + textstats.language_id_ngram_sql() + ") e USING (doc_id) JOIN ("
        + textstats.fingerprints_sql() + ") d USING (doc_id)"
    )
    out["multimodal_metadata"] = multimodal.media_metadata_sql()
    return out
