"""Benchmark harness — segment-index build + reference-query latencies.

Default mode (the driver's per-round run): benches the REAL engine path —
compressed segment build (staging → salted encode → manifests) over
$SPARK_GRAFT_SF_DIR/documents.parquet on local[$SPARK_GRAFT_CPUS], then
the reference query set through the segment store. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "index_build_sec": ...,
   "docs_per_sec": ..., "n_docs": ..., "cpus": ..., "query_p50_sec": ...}

Synthetic mode (SPARK_GRAFT_SYNTH_DOCS=N): same job over a deterministic
N-doc synthetic code corpus (sources/corpus.py, seed 42) — used by
scripts/bench_scaling.py to evidence the two-cluster-size scaling
criterion (local[8] vs local[32] on identical input; BASELINE.md (b)).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from content_rw_elasticsearch_spark.operators.segments import build_segments  # noqa: E402
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex  # noqa: E402
from content_rw_elasticsearch_spark.queries import REFERENCE_QUERIES  # noqa: E402
from content_rw_elasticsearch_spark.session import get_spark  # noqa: E402
from content_rw_elasticsearch_spark.sources.corpus import (  # noqa: E402
    synthesize_corpus,
    with_doc_id,
)


def run(sf_dir: str, cpus: int, synth_docs: int | None = None) -> dict:
    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")
    if synth_docs:
        corpus = with_doc_id(synthesize_corpus(spark, synth_docs, seed=42))
        corpus = corpus.select("doc_id", "content")
        text_col, label = "content", f"synthetic:{synth_docs}"
        n_docs = synth_docs
    else:
        corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
        text_col, label = "text", sf_dir
        n_docs = corpus.count()

    out_dir = f"/tmp/spark_graft_bench_idx_{cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    manifest = build_segments(
        corpus, out_dir, text_col=text_col, doc_col="doc_id",
        n_buckets=8, snapshot_id=label,
    )
    build_sec = time.time() - t0

    idx = SegmentIndex.load(spark, out_dir)
    # warmup MUST touch real postings (python workers, parquet page cache,
    # codegen): use the corpus's own hottest term, not a fixed string that
    # may not exist in this corpus
    hot = (
        spark.read.parquet(f"{out_dir}/stats.parquet")
        .orderBy("df", ascending=False).limit(1).collect()[0]["term"]
    )
    idx.search(hot, k=10).collect()

    qtimes: dict[str, float] = {}
    for name, spec in REFERENCE_QUERIES.items():
        t = time.time()
        idx.search(spec["query"], k=spec["k"], mode=spec["mode"]).collect()
        qtimes[name] = round(time.time() - t, 4)

    total = round(build_sec + sum(qtimes.values()), 4)
    result = {
        "metric": "segment_index_build_plus_reference_queries",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": label,
        "index_build_sec": round(build_sec, 4),
        "docs_per_sec": round(n_docs / build_sec, 2),
        "n_docs": n_docs,
        "cpus": cpus,
        "query_p50_sec": round(sorted(qtimes.values())[len(qtimes) // 2], 4),
        "build_metrics": manifest.get("build_metrics", {}),
    }
    spark.stop()
    shutil.rmtree(out_dir, ignore_errors=True)
    return result


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    synth = os.environ.get("SPARK_GRAFT_SYNTH_DOCS")
    print(json.dumps(run(sf_dir, cpus, int(synth) if synth else None)))
