"""Pins for the round-4 fixes (VERDICT/ADVICE r3).

1. Prune-crossover determinism: T_job is measured once per SparkSession
   (warmup + median), so repeated SegmentIndex.load calls derive the
   SAME prune_min_postings — plan choice can no longer flip between
   identical loads (ADVICE r3 item 3).
2. Encoder order-invariance: the numpy-grouping encoder (no JVM
   sortWithinPartitions) produces byte-identical posting blocks
   regardless of input row order — grouping is argsort-based, and
   doc_ids are re-sorted per group inside the encoder.
3. analyze_eventlog reports seconds under *_s keys (ADVICE r3 item 5).
"""

from __future__ import annotations

import json
import shutil

import numpy as np
from pyspark.sql import functions as F

from content_rw_elasticsearch_spark.operators import codec, segments
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex
from content_rw_elasticsearch_spark.sources.corpus import (
    synthesize_corpus,
    with_doc_id,
)

OUT = "/tmp/spark_graft_test_r4_crossover"


def test_crossover_deterministic_across_loads(spark):
    shutil.rmtree(OUT, ignore_errors=True)
    corpus = with_doc_id(synthesize_corpus(spark, 150, seed=7))
    segments.build_segments(
        corpus.select("doc_id", "content"), OUT, "content", "doc_id",
        n_buckets=2, target_block=64, nb_max=8,
    )
    try:
        a = SegmentIndex.load(spark, OUT).prune_min_postings
        b = SegmentIndex.load(spark, OUT).prune_min_postings
        c = SegmentIndex.load(spark, OUT).prune_min_postings
        assert a == b == c  # same session -> same cached T_job -> same plan
    finally:
        shutil.rmtree(OUT, ignore_errors=True)


def test_encoder_order_invariant(spark):
    """Same salted postings in two different physical orders must encode
    to the identical set of (term, salt, docs_vb, tfs_vb, dlens_vb)."""
    rng = np.random.default_rng(3)
    rows = []
    for t, nb in (("alpha", 2), ("beta", 1), ("gamma", 4)):
        for d in rng.choice(5000, size=40, replace=False):
            rows.append((t, int(d % nb), nb, int(d), int(d % 7 + 1),
                         int(d % 90 + 10)))
    df = spark.createDataFrame(
        rows, "term string, salt int, nb int, doc_id long, tf long, doc_len long"
    )

    def blocks(sdf):
        out = {}
        for r in segments.encode_segments(sdf, partitions=3).collect():
            out[(r["term"], r["salt"])] = (
                r["count"], r["max_tf"], r["min_dl"],
                bytes(r["docs_vb"]), bytes(r["tfs_vb"]), bytes(r["dlens_vb"]),
            )
        return out

    a = blocks(df.orderBy("doc_id"))
    b = blocks(df.orderBy(F.desc("term"), F.desc("doc_id")))
    assert a == b and len(a) == 2 + 1 + 4
    # and the blocks decode back to exactly the input postings
    got = set()
    for (term, salt), (_, _, _, dvb, tvb, lvb) in a.items():
        for d, tf, dl in zip(codec.delta_decode(dvb), codec.varbyte_decode(tvb),
                             codec.varbyte_decode(lvb)):
            got.add((term, salt, int(d), int(tf), int(dl)))
    want = {(t, s, d, tf, dl) for t, s, _nb, d, tf, dl in rows}
    assert got == want


def test_analyze_eventlog_reports_seconds(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo/scripts")
    import analyze_eventlog

    log = tmp_path / "app"
    events = [
        {"Event": "SparkListenerApplicationStart", "Timestamp": 1000},
        {"Event": "SparkListenerTaskEnd", "Stage ID": 0,
         "Task Info": {"Launch Time": 1000, "Finish Time": 4000},
         "Task Metrics": {"Executor Run Time": 2000,
                          "Executor CPU Time": 1.5e9,
                          "JVM GC Time": 100}},
        {"Event": "SparkListenerApplicationEnd", "Timestamp": 9000},
    ]
    log.write_text("\n".join(json.dumps(e) for e in events))
    r = analyze_eventlog.analyze(str(log))
    assert "run_ms" not in r and "cpu_ms" not in r  # the mislabeled keys
    assert r["run_s"] == 2.0 and r["cpu_s"] == 1.5 and r["gc_s"] == 0.1
    assert r["app_wall_s"] == 8.0
    # derived terms consistent with the renamed keys
    assert r["wait_s"] == round(2.0 - 1.5 - 0.1, 1)
