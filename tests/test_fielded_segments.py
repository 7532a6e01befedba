"""Field-scoped search through the PERSISTED segment store (the at-rest
path): build_segments(fields=...) writes composite ``field\x1fterm``
postings + per-field manifest stats, and SegmentIndex.search(field=...)
must consume them — scoring with the queried field's own docCount/avgdl
(Lucene per-field norms), never the manifest's field-exploded globals.

Cross-checked against the in-memory FieldedIndex, whose results are in
turn pinned to the independent DuckDB replay in test_fields.py — so the
at-rest path is transitively oracle-equal.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from content_rw_elasticsearch_spark.operators.fields import FieldedIndex
from content_rw_elasticsearch_spark.operators.segments import build_segments
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex

SF = "/root/testdata/sf0.001"
OUT = "/tmp/spark_graft_test_fielded_seg"
OUT_POS = "/tmp/spark_graft_test_fielded_seg_pos"


def _fields():
    return {
        "title": F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 5)),
        "body": F.col("text"),
    }


@pytest.fixture(scope="module")
def seg_idx(spark):
    shutil.rmtree(OUT, ignore_errors=True)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    build_segments(
        docs, OUT, doc_col="doc_id", analyzer="simple", n_buckets=4,
        target_block=64, nb_max=16, fields=_fields(),
    )
    yield SegmentIndex.load(spark, OUT)
    shutil.rmtree(OUT, ignore_errors=True)


@pytest.fixture(scope="module")
def mem_idx(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = FieldedIndex.build(docs, _fields(), doc_col="doc_id")
    yield idx
    idx.unpersist()


def test_manifest_field_stats_loaded(seg_idx):
    assert seg_idx.field_stats is not None
    assert set(seg_idx.field_stats) == {"title", "body"}
    assert seg_idx.default_field == "title"
    t, b = seg_idx.field_stats["title"], seg_idx.field_stats["body"]
    # per-field norms: titles are 5 tokens, bodies the full text
    assert t["avgdl"] < b["avgdl"]
    # REAL doc counts, not the field-exploded token-stream count the
    # manifest's global n_docs carries for fielded builds
    assert t["n_docs"] == b["n_docs"]
    assert seg_idx.n_docs == t["n_docs"] + b["n_docs"]  # documented global


@pytest.mark.parametrize("field", ["title", "body"])
@pytest.mark.parametrize("mode", ["AND", "OR"])
def test_at_rest_matches_in_memory(seg_idx, mem_idx, field, mode):
    got = [(r["doc_id"], r["score"]) for r in
           seg_idx.search("hash join", field=field, k=10, mode=mode).collect()]
    want = [(r["doc_id"], r["score"]) for r in
            mem_idx.search("hash join", field=field, k=10, mode=mode).collect()]
    assert got == want and got


def test_at_rest_pruned_matches_exhaustive(seg_idx, mem_idx):
    # force the two-phase block-max pruned plan through the fielded path
    seg_idx.prune_min_postings = 0
    try:
        got = [(r["doc_id"], r["score"]) for r in
               seg_idx.search("hash join", field="body", k=10,
                              mode="AND", prune=True).collect()]
    finally:
        seg_idx.prune_min_postings = 500_000
    want = [(r["doc_id"], r["score"]) for r in
            mem_idx.search("hash join", field="body", k=10).collect()]
    assert got == want and got


def test_title_vs_body_rank_differently(seg_idx):
    title = [(r["doc_id"], r["score"]) for r in
             seg_idx.search("hash join", field="title", k=10).collect()]
    body = [(r["doc_id"], r["score"]) for r in
            seg_idx.search("hash join", field="body", k=10).collect()]
    assert title and body and title != body


def test_default_field_is_first(seg_idx):
    explicit = [(r["doc_id"], r["score"]) for r in
                seg_idx.search("hash join", field="title", k=10).collect()]
    default = [(r["doc_id"], r["score"]) for r in
               seg_idx.search("hash join", k=10).collect()]
    assert default == explicit


def test_unknown_field_raises(seg_idx):
    with pytest.raises(KeyError):
        seg_idx.search("x", field="nope")


def test_field_on_unfielded_index_raises(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    out = str(tmp_path / "plain")
    build_segments(docs, out, text_col="text", doc_col="doc_id",
                   n_buckets=2, target_block=64, nb_max=4)
    idx = SegmentIndex.load(spark, out)
    with pytest.raises(ValueError, match="unfielded"):
        idx.search("hash join", field="title")


def test_fielded_term_lookup(seg_idx, mem_idx):
    got = [(r["doc_id"], r["tf"]) for r in
           seg_idx.term_lookup("hash", field="title").collect()]
    want = [(r["doc_id"], r["tf"]) for r in
            mem_idx.postings.filter(
                (F.col("field") == "title") & (F.col("term") == "hash")
            ).select("doc_id", "tf").orderBy("doc_id").collect()]
    assert got == want and got


def test_fielded_positional_phrase(spark):
    """Fielded + positional compose: a phrase scoped to body (== text)
    must equal the unfielded positional index's phrase result, and a
    5-token title field can never contain tokens past position 4."""
    shutil.rmtree(OUT_POS, ignore_errors=True)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    build_segments(
        docs, OUT_POS, doc_col="doc_id", analyzer="simple", n_buckets=2,
        target_block=64, nb_max=8, with_positions=True, fields=_fields(),
    )
    try:
        idx = SegmentIndex.load(spark, OUT_POS)
        got = [(r["doc_id"], r["phrase_tf"]) for r in
               idx.phrase_search("hash join", field="body").collect()]
        from content_rw_elasticsearch_spark.operators import postings as P

        tok = P.tokenized(docs, "text", "doc_id")
        want = [(r["doc_id"], r["phrase_tf"]) for r in
                P.phrase_match(P.build_positional_postings(tok),
                               ["hash", "join"]).collect()]
        assert got == want and got
    finally:
        shutil.rmtree(OUT_POS, ignore_errors=True)


# --- fielded incremental ingest -------------------------------------------

INGEST_OUT = "/tmp/spark_graft_test_fielded_ingest"


def _search_pairs(idx, query, field, k=10, mode="AND"):
    return [(r["doc_id"], r["score"]) for r in
            idx.search(query, field=field, k=k, mode=mode).collect()]


def test_fielded_ingest_gate_and_roundtrip(spark):
    """apply_upserts on a fielded index: refuses unprefixed batches
    (the manifest gate), accepts the build's fields mapping, maintains
    per-field stats across generations, and after fold_deltas is
    rank-identical to an in-memory FieldedIndex over the updated corpus."""
    from content_rw_elasticsearch_spark.streaming import ingest

    shutil.rmtree(INGEST_OUT, ignore_errors=True)
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    build_segments(
        docs, INGEST_OUT, doc_col="doc_id", analyzer="simple", n_buckets=4,
        target_block=64, nb_max=16, fields=_fields(),
    )
    try:
        ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
        upd, dead = ids[3], ids[4]
        updates = spark.createDataFrame(
            [
                (upd, "zzzfreshterm alpha " + "filler " * 30, False),
                (9_999_999_101, "zzzfreshterm beta gamma", False),
                (dead, "", True),
            ],
            "doc_id long, text string, deleted boolean",
        )
        # the gate: no fields / wrong names both refuse
        with pytest.raises(ValueError, match="fielded"):
            ingest.apply_upserts(spark, INGEST_OUT, updates, "text",
                                 "doc_id", "deleted")
        with pytest.raises(ValueError, match="do not match"):
            ingest.apply_upserts(spark, INGEST_OUT, updates, "text",
                                 "doc_id", "deleted",
                                 fields={"title": F.col("text")})
        man = ingest.apply_upserts(spark, INGEST_OUT, updates, "text",
                                   "doc_id", "deleted", fields=_fields())
        assert man["committed"] and man["field_stats"]
        # per-field stats stayed REAL doc counts: 200 + 1 new - 1 deleted
        assert man["field_stats"]["title"]["n_docs"] == 200
        assert man["field_stats"]["body"]["n_docs"] == 200

        idx = SegmentIndex.load(spark, INGEST_OUT)
        assert idx.field_stats["body"]["n_docs"] == 200
        # zzzfreshterm is title-positioned in both new docs (first 5 words)
        got_t = {d for d, _ in _search_pairs(idx, "zzzfreshterm", "title")}
        assert got_t == {upd, 9_999_999_101}
        # deleted doc invisible in every field
        assert dead not in {
            d for d, _ in _search_pairs(idx, "the", "body", k=1000, mode="OR")
        }

        # fold → exact df; compare against in-memory fielded index on the
        # updated corpus (the same transitively-oracle-pinned reference)
        ingest.fold_deltas(spark, INGEST_OUT)
        idx2 = SegmentIndex.load(spark, INGEST_OUT)
        assert not idx2.generations
        updated = (
            docs.select("doc_id", "text")
            .filter(~F.col("doc_id").isin([upd, dead]))
            .unionByName(
                updates.filter(~F.col("deleted")).select("doc_id", "text"))
        )
        mem = FieldedIndex.build(updated, _fields(), doc_col="doc_id")
        try:
            for fld in ("title", "body"):
                got = _search_pairs(idx2, "hash join", fld)
                want = [(r["doc_id"], r["score"]) for r in
                        mem.search("hash join", field=fld, k=10).collect()]
                assert got == want and got
        finally:
            mem.unpersist()
    finally:
        shutil.rmtree(INGEST_OUT, ignore_errors=True)


def test_fielded_positional_ingest_and_fold(spark):
    """Fielded + positional + incremental compose: phrase results stay
    correct through an upsert generation and through fold (whose fielded
    path joins doc_len per (doc, field) via the composite-term prefix)."""
    from content_rw_elasticsearch_spark.streaming import ingest

    out = INGEST_OUT + "_pos"
    shutil.rmtree(out, ignore_errors=True)
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(150)
    build_segments(
        docs, out, doc_col="doc_id", analyzer="simple", n_buckets=2,
        target_block=64, nb_max=8, with_positions=True, fields=_fields(),
    )
    try:
        updates = spark.createDataFrame(
            [(9_999_999_201,
              "zzzalpha zzzbeta unique words extra beyond title phrase here",
              False)],
            "doc_id long, text string, deleted boolean",
        )
        ingest.apply_upserts(spark, out, updates, "text", "doc_id",
                             "deleted", fields=_fields())
        idx = SegmentIndex.load(spark, out)
        got = [(r["doc_id"], r["phrase_tf"]) for r in
               idx.phrase_search("zzzalpha zzzbeta", field="title").collect()]
        assert got == [(9_999_999_201, 1)]

        ingest.fold_deltas(spark, out)
        idx2 = SegmentIndex.load(spark, out)
        got = [(r["doc_id"], r["phrase_tf"]) for r in
               idx2.phrase_search("zzzalpha zzzbeta", field="title").collect()]
        assert got == [(9_999_999_201, 1)]
        # title is 5 tokens: a body-only adjacency must not leak into title
        assert idx2.phrase_search("phrase here", field="title").count() == 0
        assert idx2.phrase_search("phrase here", field="body").count() == 1
    finally:
        shutil.rmtree(out, ignore_errors=True)
