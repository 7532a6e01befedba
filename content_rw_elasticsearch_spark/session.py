"""SparkSession helpers tuned for the engine.

Local-mode defaults mirror what we'd set on a real cluster: AQE on (runtime
skew-join splitting + coalesce), explicit shuffle-partition sizing, Arrow
enabled for every pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "content-rw-elasticsearch-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # coalescing OFF: measured 4x wall-clock regression on the
        # applyInPandas encode shuffle at local[32] (it re-schedules the
        # grouped-map stage pathologically); skew-join stays on as the
        # runtime safety net behind the structural salting
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # env-overridable for A/B (BENCH/BASELINE.md (l)): the encode
        # boundary ships lean 5-col int rows, where larger batches
        # amortize per-batch Arrow framing without meaningful memory cost
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"))
        # force the serialized sort-based shuffle writer even at the
        # sandbox's ~120 shuffle partitions. Below the default threshold
        # (200) Spark picks BypassMergeSortShuffleWriter — one open
        # lz4-buffered stream PER reduce partition PER map task; at 8
        # concurrent tasks that is ~1000 hot 32k stream buffers thrashing
        # the shared L3 (thread dumps caught the encode map stage inside
        # LZ4BlockOutputStream flush / file open churn; jcmd profile,
        # BENCH/BASELINE.md (j)). The sort writer buffers rows in memory
        # pages, radix-sorts by partition id, and streams ONE file out —
        # the writer every >200-partition production shuffle uses anyway,
        # so this aligns the sandbox with the deployment-shaped path.
        .config("spark.shuffle.sort.bypassMergeThreshold", "2")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
