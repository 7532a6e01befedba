"""Event-time windowed aggregation with watermarks.

The reference pipeline is purely per-message (message_handler.go commits
each record independently; it has no event-time aggregation), so these
operators come from the training-data-pipeline side of the brief: the
rate/volume/sessionization rollups a 100 TB ingest needs — events-per-
window dashboards, per-user sessionization for quality filtering, late-
data-tolerant counters.

Design: each operator is a PLAN builder that works unchanged on batch
and streaming DataFrames — `F.window` / `F.session_window` are logical
expressions, so the identical code path is (a) value-gated against a
DuckDB oracle through the driver in batch form and (b) run under
Structured Streaming with a watermark in tests (file source →
availableNow → memory sink). That is the Spark-first shape: one
declarative plan, two execution modes.

Scale notes (100 TB / continuous):
  * tumbling/sliding counts shuffle once on (window, key) with map-side
    partial aggregation — the window expression is computed BEFORE the
    exchange, so each mapper pre-folds its rows per bucket and the
    exchange carries one partial row per (window, key, mapper), not one
    per event.
  * watermarks bound streaming state: a window's state is dropped as
    soon as `watermark > window.end`, so state size is
    O(active_windows × keys), independent of stream length. Late rows
    older than the watermark are filtered before touching state.
  * session windows shuffle on the session key; Spark merges
    overlapping [ts, ts+gap) ranges partition-locally after the
    exchange. Skewed keys (one bot user with millions of events) are
    the same hazard as any keyed agg — cap per-key input upstream or
    pre-split by day before sessionizing.
  * exact boundary semantics (pinned by tests/test_windows.py, measured
    on Spark 4.1): an event at exactly `prev_ts + gap` MERGES into the
    session (sessions are half-open [start, last_ts + gap) but the
    merge test is `ts <= current_end`); a new session needs a STRICT
    `ts - prev_ts > gap`. The DuckDB oracle's gaps-and-islands SQL uses
    the same strict inequality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    """Apply the watermark on streaming inputs only — batch plans reject
    withWatermark-dependent semantics and don't need one."""
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def _finish(win: Column) -> list[Column]:
    """Project window bounds as epoch SECONDS (long): timezone-proof for
    the cross-engine value compare (session tz is UTC; unix_timestamp
    floors sub-second parts, matching the oracle's epoch_us // 1e6)."""
    return [
        F.unix_timestamp(win.getField("start")).alias("win_start_s"),
        F.unix_timestamp(win.getField("end")).alias("win_end_s"),
    ]


def windowed_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding/hopping) event-time counts:
    (win_start_s, win_end_s, key, n_events, sum_value). Batch and
    streaming; on a stream pass ``watermark`` and use append output mode
    to emit each window exactly once, finalized."""
    src = _with_watermark(df, ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    agg = src.groupBy(win.alias("win"), F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 2).alias("sum_value"),
    )
    return agg.select(*_finish(F.col("win")), "key", "n_events", "sum_value")


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows per key: a session is a maximal run of
    events where each is within ``gap`` of the previous (inclusive —
    see the boundary note in the module docstring); session end =
    last_ts + gap. Output (win_start_s, win_end_s, key, n_events,
    sum_value) with key cast to string so callers can union it with
    string-keyed window shapes."""
    src = _with_watermark(df, ts_col, watermark)
    agg = src.groupBy(
        F.session_window(F.col(ts_col), gap).alias("win"),
        F.col(key_col).cast("string").alias("key"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 2).alias("sum_value"),
    )
    return agg.select(*_finish(F.col("win")), "key", "n_events", "sum_value")


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (batch replay of the same semantics)
# ---------------------------------------------------------------------------

_US = 1_000_000


def _interval_us(spec: str) -> int:
    """'1 hour' / '30 minutes' / '45 seconds' → microseconds (the subset
    the oracles need; Spark's full CalendarInterval grammar not required)."""
    n, unit = spec.split()
    mult = {
        "second": _US, "seconds": _US,
        "minute": 60 * _US, "minutes": 60 * _US,
        "hour": 3600 * _US, "hours": 3600 * _US,
        "day": 86400 * _US, "days": 86400 * _US,
    }[unit]
    return int(n) * mult


def windowed_counts_sql(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
    slide: str | None = None,
) -> str:
    """Bucket arithmetic on integer microseconds — identical alignment to
    Spark's epoch-anchored windows, no reliance on DuckDB time_bucket's
    own origin conventions. Sliding windows enumerate the w/s overlapping
    buckets per row via a literal offsets join."""
    w_us = _interval_us(window)
    s_us = _interval_us(slide) if slide else w_us
    assert w_us % s_us == 0, "window must be a multiple of slide"
    n_off = w_us // s_us
    offs = ", ".join(f"({k})" for k in range(n_off))
    return f"""
WITH ev AS (
  SELECT epoch_us({ts_col}) AS t_us, {key_col} AS key, {value_col} AS val
  FROM {table}
),
bucketed AS (
  SELECT ((t_us // {s_us}) - offs.k) * {s_us} AS ws_us, key, val
  FROM ev CROSS JOIN (VALUES {offs}) AS offs(k)
  WHERE ((t_us // {s_us}) - offs.k) * {s_us} + {w_us} > t_us
)
SELECT ws_us // {_US} AS win_start_s,
       (ws_us + {w_us}) // {_US} AS win_end_s,
       key, count(*)::BIGINT AS n_events,
       round(sum(val), 2) AS sum_value
FROM bucketed
GROUP BY ws_us, key
ORDER BY win_start_s, key
"""


def session_counts_sql(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    gap: str = "30 minutes",
) -> str:
    """Gaps-and-islands replay of F.session_window: a NEW session starts
    only on a STRICT > gap jump (Spark merges the exact-boundary event —
    pinned by tests/test_windows.py::test_session_boundary_semantics)."""
    g_us = _interval_us(gap)
    return f"""
WITH ev AS (
  SELECT epoch_us({ts_col}) AS t_us,
         CAST({key_col} AS VARCHAR) AS key,
         {value_col} AS val
  FROM {table}
),
marks AS (
  SELECT key, t_us, val,
         CASE WHEN t_us - lag(t_us) OVER w > {g_us}
              OR lag(t_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY key ORDER BY t_us)
),
sess AS (
  SELECT key, t_us, val,
         sum(new_sess) OVER (PARTITION BY key ORDER BY t_us
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marks
)
SELECT min(t_us) // {_US} AS win_start_s,
       (max(t_us) + {g_us}) // {_US} AS win_end_s,
       key, count(*)::BIGINT AS n_events,
       round(sum(val), 2) AS sum_value
FROM sess
GROUP BY key, sid
ORDER BY key, win_start_s
"""
