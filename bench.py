"""Benchmark harness — segment-index build + reference-query latencies.

Default mode (the driver's per-round run): benches the REAL engine path —
compressed segment build (staging → salted encode → manifests) over
$SPARK_GRAFT_SF_DIR/documents.parquet on local[$SPARK_GRAFT_CPUS], then
the reference query set through the segment store. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "index_build_sec": ...,
   "docs_per_sec": ..., "n_docs": ..., "cpus": ..., "query_p50_sec": ...}

Noise discipline (VERDICT r4 #1: BENCH_r04.json recorded a ~2x noisy
window with no control): sf mode runs the build+query leg
$SPARK_GRAFT_BENCH_RUNS times (default 2) in one session and reports the
MIN leg as the headline — `runs` carries every leg's (value,
index_build_sec, query_p50_sec) so the recorded JSON shows the window
spread instead of silently baking it in. The once-per-round extras
(phrase store, ingest+fold, fielded build) run on the first leg only.

Synthetic mode (SPARK_GRAFT_SYNTH_DOCS=N): single-leg by design — the
scaling scripts (scripts/bench_scaling*.py) own their repeat/interleave
discipline and must see raw legs, not a min.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from content_rw_elasticsearch_spark.operators.segments import build_segments  # noqa: E402
from content_rw_elasticsearch_spark.operators.wand import SegmentIndex  # noqa: E402
from content_rw_elasticsearch_spark.queries import REFERENCE_QUERIES  # noqa: E402
from content_rw_elasticsearch_spark.session import get_spark  # noqa: E402
from content_rw_elasticsearch_spark.sources.corpus import (  # noqa: E402
    synthesize_corpus,
    with_doc_id,
)


def _build_and_query(spark, corpus, text_col, label, n_docs, out_dir):
    """One build+query leg: segment build from scratch + the reference
    query set (exhaustive route and forced-prune route). Returns the
    leg's headline dict."""
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

    # block-max WAND pruned branch, FORCED (prune_min_postings=0): at small
    # scale every query ducks under the crossover threshold and takes the
    # exhaustive branch, so the two-phase pruned plan's latency would
    # otherwise never be measured (the correctness of the branch is gated
    # by the wand_* driver queries + tests)
    saved = idx.prune_min_postings
    idx.prune_min_postings = 0
    qtimes_pruned: dict[str, float] = {}
    for name, spec in REFERENCE_QUERIES.items():
        t = time.time()
        idx.search(spec["query"], k=spec["k"], mode=spec["mode"], prune=True).collect()
        qtimes_pruned[name] = round(time.time() - t, 4)
    idx.prune_min_postings = saved

    return {
        "value": round(build_sec + sum(qtimes.values()), 4),
        "index_build_sec": round(build_sec, 4),
        "docs_per_sec": round(n_docs / build_sec, 2),
        "queries": qtimes,
        "query_p50_sec": round(sorted(qtimes.values())[len(qtimes) // 2], 4),
        "queries_pruned_forced": qtimes_pruned,
        "pruned_p50_sec": round(
            sorted(qtimes_pruned.values())[len(qtimes_pruned) // 2], 4
        ),
        "build_metrics": manifest.get("build_metrics", {}),
        "hot_term": hot,
    }


def run(sf_dir: str, cpus: int, synth_docs: int | None = None) -> dict:
    # shuffle partitions must scale with DATA, not just cores: at 3M docs
    # (~270M posting rows) 8 reduce partitions put ~34M rows in each hash
    # aggregate — it spills, and it spills MORE at higher core counts
    # (concurrent reducers share the heap), which silently taxes the
    # high-parallelism leg of the scaling measurement. ~2M rows per
    # partition keeps the agg in memory at any leg.
    if synth_docs:
        n_hint = synth_docs
    else:
        # footer-only row count (no Spark job, no full scan) so the
        # data-sized rule holds for ANY sf dir, not just the 100k default
        import duckdb
        n_hint = duckdb.sql(
            f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
        ).fetchone()[0]
    shuffle_parts = max(cpus * 4, n_hint // 25_000)
    # SPARK_GRAFT_LOCAL_CLUSTER=1: spawn N separate 1-core EXECUTOR JVMs
    # (Spark's local-cluster mode) instead of N task threads in one JVM.
    # This is the faithful stand-in for "N vs 4N executors": a real
    # cluster scales JVM COUNT (per-JVM heap, GC, and python-worker pools
    # stay constant), while local[N] multiplies task threads inside one
    # shared heap — coupling the legs through allocation pressure that no
    # multi-executor deployment has. Requires PYTHONPATH to carry the
    # repo for executor-side python workers.
    extra_conf = {
        # the contract is ONE JSON line on stdout, parsed by the external
        # driver. JVM unified logging writes to STDOUT asynchronously (a
        # GCLocker-retry warning was observed landing AFTER the JSON line,
        # which a last-line parse reads instead of the result) — disable
        # it for bench sessions so nothing else can reach stdout
        "spark.driver.extraJavaOptions": "-Xlog:disable",
    }
    if os.environ.get("SPARK_GRAFT_LOCAL_CLUSTER"):
        mem_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "6144"))
        master = f"local-cluster[{cpus},1,{mem_mb}]"
        # local-cluster legs run a driver + N executor JVMs + python
        # workers on N taskset-pinned cores — heartbeat threads starve
        # behind minute-long encode tasks and the default 120 s network
        # timeout kills the app mid-build ("Could not find AppClient",
        # campaign 9). A real cluster pins one executor per NODE, so the
        # long timeouts only paper over the sandbox's deliberate
        # overcommit, not an engine property.
        extra_conf.update({
            "spark.network.timeout": "600s",
            "spark.executor.heartbeatInterval": "60s",
            "spark.worker.timeout": "600",
            "spark.storage.blockManagerHeartbeatTimeoutMs": "600000",
            # executor JVMs spawn their own python workers, which need the
            # repo importable (local[N] inherits the driver's sys.path;
            # separate executor JVMs do not — this is exactly what
            # spark-submit --py-files does on a real cluster)
            "spark.executorEnv.PYTHONPATH": (
                os.environ.get("PYTHONPATH", "") + os.pathsep + REPO
            ).lstrip(os.pathsep),
        })
    else:
        master = f"local[{cpus}]"
    spark = get_spark(
        app_name="bench", master=master, shuffle_partitions=shuffle_parts,
        extra_conf=extra_conf,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if synth_docs:
        # source partitions must be DATA-sized and identical across legs:
        # synthesize_corpus defaults to defaultParallelism (= cores), which
        # hands the low-parallelism leg multi-million-doc map tasks whose
        # tokenize/explode/partial-agg state degrades superlinearly — a
        # configuration penalty that masquerades as poor scaling. ~25k docs
        # per task bounds map-side state the same way at every core count.
        parts = max(cpus * 4, synth_docs // 25_000)
        corpus = with_doc_id(synthesize_corpus(spark, synth_docs, seed=42,
                                               parts=parts))
        corpus = corpus.select("doc_id", "content")
        text_col, label = "content", f"synthetic:{synth_docs}"
        n_docs = synth_docs
    else:
        corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
        text_col, label = "text", sf_dir
        n_docs = corpus.count()

    # SPARK_GRAFT_BENCH_DIR: relocate the index store (e.g. to /dev/shm)
    # to take the store off the single shared virtual disk when measuring
    # compute scaling — a real N->4N cluster scales disks with executors
    out_base = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp")
    out_dir = f"{out_base}/spark_graft_bench_idx_{cpus}"

    # SPARK_GRAFT_SKIP_QUERIES=1: indexing-throughput-only mode for the
    # executor-faithful (local-cluster) scaling legs — the query warm-up
    # decodes the corpus's hottest term, which needs more heap than a
    # 1-core executor gets; the scaling metric is docs/sec of the BUILD.
    if os.environ.get("SPARK_GRAFT_SKIP_QUERIES"):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        manifest = build_segments(
            corpus, out_dir, text_col=text_col, doc_col="doc_id",
            n_buckets=8, snapshot_id=label,
        )
        build_sec = time.time() - t0
        result = {
            "metric": "segment_index_build_only",
            "value": round(build_sec, 4), "unit": "sec", "queries": {},
            "sf": label,
            "index_build_sec": round(build_sec, 4),
            "docs_per_sec": round(n_docs / build_sec, 2),
            "n_docs": n_docs, "cpus": cpus, "query_p50_sec": None,
            "build_metrics": manifest.get("build_metrics", {}),
        }
        spark.stop()
        shutil.rmtree(out_dir, ignore_errors=True)
        return result

    n_legs = 1 if synth_docs else max(
        1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    )
    legs = [
        _build_and_query(spark, corpus, text_col, label, n_docs, out_dir)
        for _ in range(n_legs)
    ]
    best = min(legs, key=lambda r: r["value"])
    hot = legs[0]["hot_term"]

    # once-per-round extras, run once against the last leg's index ------
    # phrase latency through the positional segment store (sf mode only —
    # the scaling legs must keep the identical non-positional job)
    phrase_times: dict[str, float] = {}
    fielded_build_sec = None
    positional_build_sec = None
    if not synth_docs:
        pos_dir = out_dir + "_pos"
        shutil.rmtree(pos_dir, ignore_errors=True)
        # positional build overhead (companion to fielded_build_sec): the
        # positions dimension ships an extra array column through the
        # encode boundary — one number so its cost is measured, not argued
        t = time.time()
        build_segments(
            corpus, pos_dir, text_col=text_col, doc_col="doc_id",
            n_buckets=8, snapshot_id=label, with_positions=True,
        )
        positional_build_sec = round(time.time() - t, 4)
        pidx = SegmentIndex.load(spark, pos_dir)
        pidx.phrase_search(hot).collect()  # warm the positional decode path
        for phrase in ("hash join", "customer data group"):
            t = time.time()
            pidx.phrase_search(phrase).collect()
            phrase_times[phrase.replace(" ", "_")] = round(time.time() - t, 4)
        shutil.rmtree(pos_dir, ignore_errors=True)

        # fielded build overhead (VERDICT r4 #6): two fields over the same
        # corpus ≈ 2x posting rows through the identical pipeline — one
        # number so the field dimension's cost is measured, not argued
        from pyspark.sql import functions as F
        fdir = out_dir + "_fielded"
        shutil.rmtree(fdir, ignore_errors=True)
        t = time.time()
        build_segments(
            corpus, fdir, doc_col="doc_id", n_buckets=8, snapshot_id=label,
            fields={
                "title": F.concat_ws(
                    " ", F.slice(F.split(F.col(text_col), " "), 1, 5)),
                "body": F.col(text_col),
            },
        )
        fielded_build_sec = round(time.time() - t, 4)
        shutil.rmtree(fdir, ignore_errors=True)

    # incremental ingest + fold latency (sf mode only): three 500-doc
    # upsert batches (delta generations) against the live index, then the
    # compaction, then one post-fold query as a sanity re-warm. Measures
    # the apply_upserts delta-generation overhead SCALE.md argues about.
    ingest_times: list[float] = []
    fold_sec = None
    tier_merge_sec = None
    if not synth_docs:
        from pyspark.sql import functions as F

        from content_rw_elasticsearch_spark.streaming.ingest import (
            apply_upserts,
            fold_deltas,
            merge_delta_tier,
        )

        for b in range(3):
            updates = (
                corpus.filter(F.col("doc_id") % 7 == b)
                .limit(500)
                .withColumn(
                    text_col,
                    F.concat(F.col(text_col), F.lit(f" benchupdate{b}")),
                )
            )
            t = time.time()
            apply_upserts(spark, out_dir, updates, text_col=text_col)
            ingest_times.append(round(time.time() - t, 4))
        # delta-tier merge (minor merge, O(delta volume)) timed BEFORE the
        # fold so the two compaction levels get separate numbers; fold then
        # runs on the merged state (fold∘merge ≡ fold, pinned by
        # test_fold_after_tier_merge_equals_plain_fold)
        t = time.time()
        merge_delta_tier(spark, out_dir)
        tier_merge_sec = round(time.time() - t, 4)
        t = time.time()
        fold_deltas(spark, out_dir)
        fold_sec = round(time.time() - t, 4)
        idx = SegmentIndex.load(spark, out_dir)
        idx.search(hot, k=10).collect()

    result = {
        "metric": "segment_index_build_plus_reference_queries",
        "value": best["value"],
        "unit": "sec",
        "queries": best["queries"],
        "sf": label,
        "index_build_sec": best["index_build_sec"],
        "docs_per_sec": best["docs_per_sec"],
        "n_docs": n_docs,
        "cpus": cpus,
        "query_p50_sec": best["query_p50_sec"],
        "queries_pruned_forced": best["queries_pruned_forced"],
        "phrase_queries": phrase_times,
        "pruned_p50_sec": best["pruned_p50_sec"],
        "build_metrics": best["build_metrics"],
        "ingest_batch_secs": ingest_times,
        "tier_merge_sec": tier_merge_sec,
        "fold_sec": fold_sec,
        "fielded_build_sec": fielded_build_sec,
        "positional_build_sec": positional_build_sec,
        # window-spread evidence: headline = min leg; a wide spread here
        # flags a noisy host window (compare legs before calling any
        # cross-round delta a regression)
        "runs": [
            {"value": r["value"], "index_build_sec": r["index_build_sec"],
             "query_p50_sec": r["query_p50_sec"]}
            for r in legs
        ],
    }
    spark.stop()
    shutil.rmtree(out_dir, ignore_errors=True)
    return result


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    synth = os.environ.get("SPARK_GRAFT_SYNTH_DOCS")
    print(json.dumps(run(sf_dir, cpus, int(synth) if synth else None)))
