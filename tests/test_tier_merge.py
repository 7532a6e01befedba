"""Delta-tier merge (streaming/ingest.merge_delta_tier): the two-level
merge the north rule requires — squash all live delta generations into
one new generation at O(delta volume), base untouched; fold_deltas
remains the O(index) major merge.

Correctness contract: queries, postings, phrase matches, and fielded
norms are IDENTICAL before and after the merge; time travel into the
merged range raises; a later upsert stacks a fresh generation on top of
the merged one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from content_rw_elasticsearch_spark.operators.segments import build_segments
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex
from content_rw_elasticsearch_spark.streaming.ingest import (
    apply_upserts,
    fold_deltas,
    merge_delta_tier,
)

SF = "/root/testdata/sf0.001"


def _build(spark, out, **kw):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    build_segments(docs, out, doc_col="doc_id", n_buckets=2,
                   target_block=64, nb_max=4, **kw)
    return docs


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, content string, deleted boolean")


def _three_generations(spark, out):
    """gen1: update 2 docs + insert 1; gen2: re-update one of them +
    delete one base doc; gen3: delete the gen1 insert."""
    apply_upserts(spark, out, _batch(spark, [
        (1, "merge tier alpha data", False),
        (2, "merge tier beta join", False),
        (9001, "brand new merge doc", False),
    ]), "content", "doc_id", "deleted")
    apply_upserts(spark, out, _batch(spark, [
        (1, "merge tier alpha reworked row", False),
        (3, "", True),
    ]), "content", "doc_id", "deleted")
    apply_upserts(spark, out, _batch(spark, [
        (9001, "", True),
    ]), "content", "doc_id", "deleted")


def _state(idx):
    """df-independent invariants: result rankings (not scores — a merge
    TIGHTENS Lucene-approximate df by dropping superseded in-set copies,
    so scores may rise, exactly like a Lucene segment merge), exact
    postings (doc_id, tf), and corpus stats."""
    hits = [r["doc_id"] for r in
            idx.search("merge tier", k=20, mode="AND").collect()]
    posts = [(r["doc_id"], r["tf"]) for r in idx.term_lookup("merge").collect()]
    # OR probe over base docs: the merge tightens delta-term df, which
    # reorders NEAR-TIE base docs — the guaranteed invariant is the
    # result SET, so compare order-insensitively
    some = sorted(r["doc_id"] for r in
                  idx.search("data row", k=20, mode="OR").collect())
    return hits, posts, some, idx.n_docs, idx.avgdl


def test_tier_merge_preserves_query_state(spark, tmp_path):
    out = str(tmp_path / "tier")
    _build(spark, out, text_col="text")
    _three_generations(spark, out)
    before = _state(SegmentIndex.load(spark, out))
    man = merge_delta_tier(spark, out)
    assert man is not None and man["merged_from"] == [1, 2, 3]
    idx = SegmentIndex.load(spark, out)
    assert idx.generations == [man["gen"]] == [4]
    assert _state(idx) == before
    # deleted docs stay dead, live update is the latest version
    live = {r["doc_id"] for r in idx.term_lookup("merge").collect()}
    assert 9001 not in live and 1 in live and 2 in live


def test_tier_merge_single_generation_is_noop(spark, tmp_path):
    out = str(tmp_path / "tier1")
    _build(spark, out, text_col="text")
    apply_upserts(spark, out, _batch(spark, [(1, "solo batch", False)]),
                  "content", "doc_id", "deleted")
    assert merge_delta_tier(spark, out) is None
    # after a successful merge the single merged gen is also a no-op
    apply_upserts(spark, out, _batch(spark, [(2, "second batch", False)]),
                  "content", "doc_id", "deleted")
    assert merge_delta_tier(spark, out) is not None
    assert merge_delta_tier(spark, out) is None


def test_tier_merge_time_travel_boundaries(spark, tmp_path):
    out = str(tmp_path / "tier_tt")
    _build(spark, out, text_col="text")
    _three_generations(spark, out)
    man = merge_delta_tier(spark, out)
    with pytest.raises(ValueError, match="tier-merged"):
        SegmentIndex.load(spark, out, as_of_gen=2)
    # as-of the tier boundary == the merged generation's state
    b = SegmentIndex.load(spark, out, as_of_gen=3)
    assert b.generations == [man["gen"]]
    # a post-merge upsert stacks on top and is excluded by as_of
    apply_upserts(spark, out, _batch(spark, [(5, "post merge doc", False)]),
                  "content", "doc_id", "deleted")
    now = SegmentIndex.load(spark, out)
    assert now.generations == [man["gen"], man["gen"] + 1]
    asof = SegmentIndex.load(spark, out, as_of_gen=man["gen"])
    assert asof.generations == [man["gen"]]
    assert asof.term_lookup("post").count() == 0
    assert now.term_lookup("post").count() == 1


def test_fold_after_tier_merge_equals_plain_fold(spark, tmp_path):
    """fold(tier_merge(X)) ≡ fold(X) EXACTLY, scores included — the
    major merge lands on the same exact-df state either way."""
    out_a, out_b = str(tmp_path / "tier_fold_a"), str(tmp_path / "tier_fold_b")
    for out in (out_a, out_b):
        _build(spark, out, text_col="text")
        _three_generations(spark, out)
    merge_delta_tier(spark, out_a)
    fold_deltas(spark, out_a)
    fold_deltas(spark, out_b)
    a, b = SegmentIndex.load(spark, out_a), SegmentIndex.load(spark, out_b)
    assert a.generations == b.generations == []
    for idx_q in ("merge tier", "data row"):
        got = [(r["doc_id"], r["score"]) for r in
               a.search(idx_q, k=20, mode="OR").collect()]
        want = [(r["doc_id"], r["score"]) for r in
                b.search(idx_q, k=20, mode="OR").collect()]
        assert got == want and got
    assert (a.n_docs, a.avgdl) == (b.n_docs, b.avgdl)


def test_tier_merge_positional_phrases(spark, tmp_path):
    out = str(tmp_path / "tier_pos")
    _build(spark, out, text_col="text", with_positions=True)
    apply_upserts(spark, out, _batch(spark, [
        (1, "alpha beta gamma alpha beta", False),
    ]), "content", "doc_id", "deleted")
    apply_upserts(spark, out, _batch(spark, [
        (2, "alpha beta once", False),
    ]), "content", "doc_id", "deleted")
    before = [(r["doc_id"], r["phrase_tf"]) for r in
              SegmentIndex.load(spark, out).phrase_search("alpha beta").collect()]
    assert before == [(1, 2), (2, 1)]
    merge_delta_tier(spark, out)
    after = [(r["doc_id"], r["phrase_tf"]) for r in
             SegmentIndex.load(spark, out).phrase_search("alpha beta").collect()]
    assert after == before


def test_tier_merge_fielded_norms(spark, tmp_path):
    out = str(tmp_path / "tier_field")
    fields = {
        "title": F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 3)),
        "body": F.col("text"),
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    build_segments(docs, out, doc_col="doc_id", n_buckets=2,
                   target_block=64, nb_max=4, fields=fields)
    ufields = {
        "title": F.concat_ws(" ", F.slice(F.split(F.col("content"), " "), 1, 3)),
        "body": F.col("content"),
    }
    apply_upserts(spark, out, _batch(spark, [
        (1, "tier field one data", False)]), "content", "doc_id", "deleted",
        fields=ufields)
    apply_upserts(spark, out, _batch(spark, [
        (2, "tier field two join", False)]), "content", "doc_id", "deleted",
        fields=ufields)
    pre = SegmentIndex.load(spark, out)
    before = [(r["doc_id"], r["score"]) for r in
              pre.search("tier field", field="title", k=10).collect()]
    fstats_before = pre.field_stats
    man = merge_delta_tier(spark, out)
    idx = SegmentIndex.load(spark, out)
    assert idx.field_stats == fstats_before and man["field_stats"] is not None
    after = [(r["doc_id"], r["score"]) for r in
             idx.search("tier field", field="title", k=10).collect()]
    assert after == before and after


def test_maybe_compact_policy(spark, tmp_path):
    """Tiered merge policy: maybe_compact squashes only when live
    generations reach max_gens, keeping read amplification bounded while
    query state stays identical to an uncompacted twin."""
    from content_rw_elasticsearch_spark.streaming.ingest import maybe_compact

    out_a, out_b = str(tmp_path / "pol_a"), str(tmp_path / "pol_b")
    for out in (out_a, out_b):
        _build(spark, out, text_col="text")
    batches = [
        [(1, "policy merge alpha", False)],
        [(2, "policy merge beta", False)],
        [(1, "policy merge alpha two", False)],
        [(9001, "policy merge fresh", False)],
    ]
    for rows in batches:
        apply_upserts(spark, out_a, _batch(spark, rows),
                      "content", "doc_id", "deleted")
        man = maybe_compact(spark, out_a, max_gens=3)
        n_live = len(SegmentIndex.load(spark, out_a).generations)
        assert n_live <= 3, f"policy let {n_live} generations accumulate"
        apply_upserts(spark, out_b, _batch(spark, rows),
                      "content", "doc_id", "deleted")
    a, b = SegmentIndex.load(spark, out_a), SegmentIndex.load(spark, out_b)
    assert len(a.generations) < len(b.generations) == 4
    got = sorted((r["doc_id"], r["tf"]) for r in a.term_lookup("policy").collect())
    want = sorted((r["doc_id"], r["tf"]) for r in b.term_lookup("policy").collect())
    assert got == want and got
    assert (a.n_docs, a.avgdl) == (b.n_docs, b.avgdl)


def test_stream_ingest_compact_after(spark, tmp_path):
    """compact_after wires the policy into the streaming foreachBatch
    loop: after the drain the index holds fewer live generations than
    microbatches, with all streamed docs searchable."""
    import os

    from content_rw_elasticsearch_spark.streaming.ingest import stream_ingest

    out = str(tmp_path / "stream_tier")
    _build(spark, out, text_col="text")
    src = str(tmp_path / "src")
    for i, rows in enumerate([
        [(9101, "tierstream one", False)],
        [(9102, "tierstream two", False)],
        [(9103, "tierstream three", False)],
    ], start=1):
        spark.createDataFrame(
            rows, "doc_id long, content string, deleted boolean"
        ).coalesce(1).write.parquet(f"{src}/b{i}")
        # pin mtimes so FileStreamSource batch order is deterministic
        for root, _, names in os.walk(f"{src}/b{i}"):
            for n in names:
                os.utime(os.path.join(root, n), (1_700_000_000 + i * 10,) * 2)
    stream = (
        spark.readStream.schema("doc_id long, content string, deleted boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = stream_ingest(spark, stream, out, str(tmp_path / "ckpt"),
                      "content", "doc_id", "deleted", compact_after=2)
    q.awaitTermination(180)
    idx = SegmentIndex.load(spark, out)
    assert len(idx.generations) < 3
    got = {r["doc_id"] for r in idx.search("tierstream", k=10, mode="AND").collect()}
    assert got == {9101, 9102, 9103}
