"""Relational operator plans — the reference's join/lookup/streaming
semantics re-expressed over the driver's TPC-H-ish tables.

Each maps a reference operator (SURVEY.md §2) to its idiomatic Spark form:
  D1/D3 broadcast dimension joins  — concordance/config lookups
         (pkg/concept/concordance.go:58-95, pkg/config/config.go:39-49)
  A2     JSON deserialize           — message decode
         (pkg/message/message_handler.go:84-89)
  §2.H   last-writer-wins upsert    — idempotent uuid-keyed writes
         (pkg/es/service.go:119-128)
  §2.F   windowed top-k             — ours (absent in the reference; the
         building block for distributed top-k per group)
  D1-anti unmatched-lookup warn set — mapper.go:76-79 logs+skips unmatched
         concept ids; the relational form is a left-anti join
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/D3: orders joined through two broadcast dims (nation, region).
    The dims are small → explicit broadcast = zero shuffle on the fact
    side except the final tiny aggregation."""
    orders, customer = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    nation, region = _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("r_name")
    )


def region_revenue_sql() -> str:
    return """
SELECT r_name,
       round(sum(o_totalprice), 2) AS revenue,
       count(*)::BIGINT AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.F windowed top-k with deterministic tiebreaks."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "rank",
                F.round("o_totalprice", 2).alias("total"))
        .orderBy("o_custkey", "rank")
    )


def top3_orders_per_customer_sql() -> str:
    return """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER w AS INT) AS rank,
       round(o_totalprice, 2) AS total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
QUALIFY rank <= 3
ORDER BY o_custkey, rank
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 JSON deserialize (from_json + null gate on malformed records)."""
    ev = _t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k long")["k"]
    return (
        ev.withColumn("k", k)
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


def events_json_extract_sql() -> str:
    return """
SELECT event_type,
       sum(CAST(props->>'$.k' AS BIGINT))::BIGINT AS sum_k,
       count(*)::BIGINT AS n
FROM events
WHERE CAST(props->>'$.k' AS BIGINT) IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 JSON deserialize + the three event-time window shapes
    (streaming/windows.py) in ONE union-gated query (50-query cap, same
    consolidation as phrase_matches): the disjoint ``variant`` column
    keeps each operator's rows value-hash-gated individually. The window
    plans here are the EXACT code the streaming tests run with a
    watermark — batch gating + streamed execution of one shared plan."""
    from content_rw_elasticsearch_spark.streaming import windows as W

    ev = _t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k long")["k"]
    json_rows = (
        ev.withColumn("k", k)
        .filter(F.col("k").isNotNull())
        .groupBy(F.col("event_type").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("double").alias("sum_value"),
        )
        .select(
            F.lit("json").alias("variant"),
            F.lit(None).cast("long").alias("win_start_s"),
            F.lit(None).cast("long").alias("win_end_s"),
            "key", "n_events", "sum_value",
        )
    )

    def tag(df: DataFrame, variant: str) -> DataFrame:
        return df.select(
            F.lit(variant).alias("variant"),
            "win_start_s", "win_end_s", "key", "n_events", "sum_value",
        )

    tumbling = tag(W.windowed_counts(ev, window="1 hour"), "tumbling")
    sliding = tag(
        W.windowed_counts(ev, window="1 hour", slide="30 minutes"), "sliding"
    )
    sessions = tag(W.session_counts(ev, gap="12 hours"), "session")
    return (
        json_rows.unionByName(tumbling)
        .unionByName(sliding)
        .unionByName(sessions)
        .orderBy("variant", "key", "win_start_s")
    )


def events_profile_sql() -> str:
    from content_rw_elasticsearch_spark.streaming import windows as W

    json_sql = """
SELECT 'json' AS variant,
       NULL::BIGINT AS win_start_s, NULL::BIGINT AS win_end_s,
       event_type AS key,
       count(*)::BIGINT AS n_events,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS DOUBLE) AS sum_value
FROM events
WHERE CAST(props->>'$.k' AS BIGINT) IS NOT NULL
GROUP BY event_type
"""
    return (
        json_sql
        + " UNION ALL SELECT 'tumbling' AS variant, win_start_s, win_end_s,"
        " key, n_events, sum_value FROM ("
        + W.windowed_counts_sql(window="1 hour")
        + ") UNION ALL SELECT 'sliding' AS variant, win_start_s, win_end_s,"
        " key, n_events, sum_value FROM ("
        + W.windowed_counts_sql(window="1 hour", slide="30 minutes")
        + ") UNION ALL SELECT 'session' AS variant, win_start_s, win_end_s,"
        " key, n_events, sum_value FROM ("
        + W.session_counts_sql(gap="12 hours")
        + ")"
    )


def last_writer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.H idempotent upsert semantics, batch form: latest event per
    (user_id, event_type) — last-writer-wins keyed by ts with a
    deterministic event_id tiebreak (the reference's uuid-keyed upsert,
    es/service.go:119-128, makes replays idempotent the same way)."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id",
                F.round("value", 2).alias("last_value"))
        .orderBy("user_id", "event_type")
    )


def last_writer_wins_sql() -> str:
    return """
SELECT user_id, event_type, event_id, round(value, 2) AS last_value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id, event_type
"""


def unmatched_lookups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 anti-join: customers whose nation has no region row — the
    'unmatched concept id → warn + skip' set (mapper.go:76-79) as a
    left_anti join. TPC-H has no orphan keys, so the gated dim DROPS
    region 0: region-0 nations' customers become a real nonzero warn set
    (VERDICT r4 #3 — a 0-row gate proved only plan validity)."""
    customer, nation = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_regionkey") != 0)
    nk = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey) \
               .select("n_nationkey")
    return (
        customer.join(nk, customer.c_nationkey == nk.n_nationkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


def unmatched_lookups_sql() -> str:
    return """
SELECT c_custkey FROM customer
WHERE c_nationkey NOT IN (
  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_regionkey <> 0
)
ORDER BY c_custkey
"""
