"""Storage-spill encode path (round 5): the partitionBy(epart) parquet
write + pyarrow-fed encoder must produce EXACTLY the segment store the
shuffle-fed encoder produces — block for block, byte for byte — for both
the plain and positional layouts, and queries over it must match.
"""

from __future__ import annotations

import shutil

from content_rw_elasticsearch_spark.operators import segments
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex
from content_rw_elasticsearch_spark.sources.corpus import (
    synthesize_corpus,
    with_doc_id,
)


def _blocks(spark, out):
    rows = {}
    for r in spark.read.parquet(f"{out}/segments").collect():
        rows[(r["term"], r["salt"])] = (
            r["nb"], r["count"], r["max_tf"], r["min_dl"],
            bytes(r["docs_vb"]), bytes(r["tfs_vb"]), bytes(r["dlens_vb"]),
            bytes(r["pos_vb"] or b""), r["bucket"],
        )
    return rows


def _build(spark, corpus, out, path, **kw):
    shutil.rmtree(out, ignore_errors=True)
    return segments.build_segments(
        corpus.select("doc_id", "content"), out, "content", "doc_id",
        n_buckets=3, target_block=64, nb_max=8, encode_path=path, **kw
    )


def test_spill_encode_identical_to_inline(spark, tmp_path):
    corpus = with_doc_id(synthesize_corpus(spark, 300, seed=5))
    a, b = str(tmp_path / "inline"), str(tmp_path / "spill")
    m_in = _build(spark, corpus, a, "inline")
    m_sp = _build(spark, corpus, b, "spill")
    assert m_sp["posting_count"] == m_in["posting_count"] > 0
    assert _blocks(spark, a) == _blocks(spark, b)
    # the spill dir is derived data, removed after the segments commit
    import os
    assert not os.path.exists(f"{b}/espill")
    # query parity through the spill-built store
    ia, ib = SegmentIndex.load(spark, a), SegmentIndex.load(spark, b)
    qa = [tuple(r) for r in ia.search("def return", k=10, mode="AND").collect()]
    qb = [tuple(r) for r in ib.search("def return", k=10, mode="AND").collect()]
    assert qa == qb and len(qa) == 10


def test_spill_encode_positional(spark, tmp_path):
    corpus = with_doc_id(synthesize_corpus(spark, 150, seed=9))
    a, b = str(tmp_path / "inline_p"), str(tmp_path / "spill_p")
    _build(spark, corpus, a, "inline", with_positions=True)
    _build(spark, corpus, b, "spill", with_positions=True)
    assert _blocks(spark, a) == _blocks(spark, b)
    ia, ib = SegmentIndex.load(spark, a), SegmentIndex.load(spark, b)
    # phrase guaranteed present: first two analyzed tokens of a real doc
    from content_rw_elasticsearch_spark.functions.analyzer import (
        analyze_query_py,
    )
    from pyspark.sql import functions as F
    text = corpus.filter(F.length("content") > 50).first()["content"]
    phrase = " ".join(analyze_query_py(text, "simple")[:2])
    pa = [tuple(r) for r in ia.phrase_search(phrase).collect()]
    pb = [tuple(r) for r in ib.phrase_search(phrase).collect()]
    assert pa == pb and len(pa) > 0


def test_spill_auto_threshold_routes_small_builds_inline(spark, tmp_path):
    """Auto mode must keep small builds on the shuffle path (no espill
    write) — the threshold is the contract the driver's sf0.01/sf0.1
    gates rely on."""
    corpus = with_doc_id(synthesize_corpus(spark, 50, seed=3))
    out = str(tmp_path / "auto")
    import os
    seen = {"spill": False}
    orig = segments.encode_segments_spill

    def spy(*a, **k):
        seen["spill"] = True
        return orig(*a, **k)

    segments.encode_segments_spill = spy
    try:
        _build(spark, corpus, out, None)
    finally:
        segments.encode_segments_spill = orig
    assert not seen["spill"] and os.path.exists(f"{out}/index.json")
