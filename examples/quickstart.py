"""End-to-end quickstart: everything a reference user needs to switch.

Builds a tiny index, then exercises the whole query surface in one
SparkSession — search, phrase, autocomplete, compound queries,
aggregations, sharded/alias search, incremental ingest, and the health
row. Run it anywhere:

    PYTHONPATH=. python examples/quickstart.py [workdir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from content_rw_elasticsearch_spark.operators.segments import (  # noqa: E402
    build_segments,
)
from content_rw_elasticsearch_spark.operators.wand import (  # noqa: E402
    SegmentIndex,
    search_sharded,
)
from content_rw_elasticsearch_spark.session import get_spark  # noqa: E402
from content_rw_elasticsearch_spark.streaming.ingest import (  # noqa: E402
    apply_upserts,
)

DOCS = [
    (1, "def hash_join(build, probe): return probe.lookup(build)", "py"),
    (2, "fn merge_sort(mut rows: Vec<Row>) -> Vec<Row> { rows.sort(); rows }",
     "rs"),
    (3, "SELECT * FROM lineitem JOIN orders USING (orderkey)", "sql"),
    (4, "func scanTable(t *Table) []Row { return t.rows }", "go"),
    (5, "class HashTable: probe and build sides share the hash", "py"),
]


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="crwes_quickstart_")
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.createDataFrame(
        DOCS, "doc_id long, content string, lang string")

    # 1. build a positional index with the code-aware analyzer
    idx_dir = f"{work}/idx"
    build_segments(corpus, idx_dir, text_col="content", doc_col="doc_id",
                   analyzer="code", n_buckets=2, target_block=16, nb_max=4,
                   with_positions=True)
    idx = SegmentIndex.load(spark, idx_dir)
    idx.prune_min_postings = 0  # tiny corpus: force the pruned plan

    show = lambda name, df: print(  # noqa: E731
        f"-- {name}:", [tuple(r) for r in df.collect()])

    # 2. the query surface
    show("bm25 top-k", idx.search("hash join", k=3))
    show("phrase", idx.phrase_search("hash join"))
    show("autocomplete", idx.phrase_prefix_search("merge so"))
    show("fuzzy", idx.fuzzy_search("hashh", max_edits=1, k=3))
    show("filter ctx", idx.search(
        "hash", k=3,
        filter_ids=corpus.filter(F.col("lang") == "py").select("doc_id")))
    show("boosting", idx.boosting("hash", "table", negative_boost=0.2, k=3))
    show("dis_max", idx.dis_max(["hash probe", "merge sort"], 0.3, k=3))
    show("synonyms", idx.search_synonyms(
        "lookup", {"lookup": ["probe", "scan"]}, k=3, mode="OR"))
    show("facets", idx.search_facets("hash", corpus, ["lang"]))
    show("stats agg", idx.search_stats(
        "hash", corpus.withColumn("n_chars", F.length("content")),
        "n_chars"))
    show("health", idx.describe())

    # 3. sharded/alias search — two independent builds, one logical index
    sh = []
    for s in range(2):
        d = f"{work}/shard{s}"
        build_segments(corpus.filter(F.col("doc_id") % 2 == s), d,
                       text_col="content", doc_col="doc_id",
                       analyzer="code", n_buckets=1, target_block=16,
                       nb_max=4)
        sh.append(SegmentIndex.load(spark, d))
    show("sharded", search_sharded(sh, "hash join", k=3))

    # 4. incremental ingest: upsert one doc, delete another, query again
    batch = spark.createDataFrame(
        [(1, "def hash_join_v2(): pass", False), (4, None, True)],
        "doc_id long, content string, deleted boolean")
    apply_upserts(spark, idx_dir, batch, text_col="content",
                  deleted_col="deleted")
    idx2 = SegmentIndex.load(spark, idx_dir)
    idx2.prune_min_postings = 0
    show("after upsert", idx2.search("hash", k=5))
    show("health after", idx2.describe())

    # 5. lifecycle: snapshot the current state, keep ingesting, restore
    from content_rw_elasticsearch_spark.maintenance import (
        load_alias,
        restore_index,
        rollover_ingest,
        snapshot_index,
    )
    snap = snapshot_index(idx_dir, f"{work}/snap")
    print("-- snapshot:", snap["n_docs"], "docs,", snap["n_files"], "files")
    restore_index(f"{work}/snap", f"{work}/restored")
    r = SegmentIndex.load(spark, f"{work}/restored")
    r.prune_min_postings = 0
    show("restored", r.search("hash", k=3))

    # 6. rollover alias: batches roll to a new shard past max_docs;
    # readers span the alias via sharded search
    alias = f"{work}/alias"
    for lo in (0, 3):
        b = spark.createDataFrame(
            [(100 + lo + i, f"rolled hash doc{100 + lo + i}", False)
             for i in range(3)],
            "doc_id long, content string, deleted boolean")
        rollover_ingest(spark, alias, b, max_docs=3, text_col="content",
                        deleted_col="deleted", n_buckets=1,
                        target_block=16, nb_max=4)
    shards2 = load_alias(spark, alias)
    for s2 in shards2:
        s2.prune_min_postings = 0
    show(f"alias ({len(shards2)} shards)",
         search_sharded(shards2, "rolled hash", k=3))

    print(f"workdir: {work}")
    spark.stop()


if __name__ == "__main__":
    main()
