"""Event-time windowed aggregation (streaming/windows.py): batch
semantics pins + the STREAMING execution of the same plans — watermark
late-data drop, append-mode finalized-window emission, session windows
over microbatches. The batch forms are driver-gated against the DuckDB
oracle via events_profile; these tests cover what the oracle can't: the
streaming runtime behavior."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from content_rw_elasticsearch_spark.streaming import windows as W

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _m(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def test_session_boundary_semantics(spark):
    """Pin the exact-gap merge rule the oracle SQL mirrors: an event at
    exactly prev_ts + gap MERGES (strict > starts a new session), and
    session end = last_ts + gap."""
    rows = [
        (1, _m(0)),       # session A
        (1, _m(30)),      # exactly gap later -> MERGES
        (1, _m(59.99)),   # within gap of prev -> merges
        (2, _m(0)),       # session B1
        (2, _m(30) + dt.timedelta(seconds=1)),  # strictly past gap -> B2
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["key"], r["win_start_s"], r["win_end_s"]): r["n_events"]
        for r in W.session_counts(
            df.withColumn("value", F.lit(1.0)), gap="30 minutes"
        ).collect()
    }
    e = lambda m: int((_m(m) - dt.datetime(1970, 1, 1)).total_seconds())  # noqa: E731
    assert got == {
        ("1", e(0), e(59.99 + 30)): 3,
        ("2", e(0), e(30)): 1,
        ("2", e(30) + 1, e(60) + 1): 1,
    }


def test_windowed_counts_batch_tumbling_and_sliding(spark):
    """Epoch-aligned bucket bounds; a sliding event lands in exactly
    window/slide buckets."""
    df = spark.createDataFrame(
        [("a", _m(5), 1.0), ("a", _m(20), 2.0), ("b", _m(70), 4.0)],
        "event_type string, ts timestamp, value double",
    )
    tumb = {
        (r["key"], r["win_start_s"]): (r["n_events"], r["sum_value"])
        for r in W.windowed_counts(df, window="1 hour").collect()
    }
    h0 = int((T0 - dt.datetime(1970, 1, 1)).total_seconds())
    assert tumb == {("a", h0): (2, 3.0), ("b", h0 + 3600): (1, 4.0)}
    slid = sorted(
        (r["key"], r["win_start_s"], r["n_events"])
        for r in W.windowed_counts(
            df, window="1 hour", slide="30 minutes"
        ).collect()
    )
    # a@10:05 -> [9:30,10:30) and [10:00,11:00); a@10:20 same two buckets;
    # b@11:10 -> [10:40? no] [10:30,11:30)? 11:10 is in starts 10:30 & 11:00
    assert slid == [
        ("a", h0 - 1800, 2),
        ("a", h0, 2),
        ("b", h0 + 1800, 1),
        ("b", h0 + 3600, 1),
    ]


def _write_batches(spark, src: str, batches: list[list[tuple]]) -> None:
    """One parquet dir per microbatch, mtimes pinned so FileStreamSource
    replays them in order with maxFilesPerTrigger=1."""
    now = time.time()
    for i, rows in enumerate(batches):
        d = f"{src}/b{i}"
        spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        ).coalesce(1).write.parquet(d)
        ts = now - 60 * (len(batches) - i)
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (ts, ts))


def test_streaming_tumbling_watermark_append(spark, tmp_path):
    """The SAME windowed_counts plan under Structured Streaming: append
    mode emits a window exactly once, only after the watermark passes its
    end; a row older than the watermark is dropped before it touches
    state. NB the watermark from batch N's data reliably gates batch
    N+2 in this file-source/availableNow setup (measured on Spark 4.1:
    the progress log showed a late row surviving the batch right after
    the one that raised the watermark), so the late row arrives two
    batches after the watermark-raising event."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write_batches(
        spark,
        src,
        [
            # batch 0: 10:05 plus 11:10 — the latter raises the
            # watermark to 10:10 for later batches
            [("a", _m(5), 1.0), ("a", _m(70), 4.0)],
            # batch 1: innocuous 11:15 (one batch of lag — see note)
            [("a", _m(75), 5.0)],
            # batch 2: a LATE row at 9:01 (window end 10:00 <= wm →
            # dropped), plus 13:30 (final watermark 12:30 finalizes the
            # 10:00 and 11:00 windows; the 13:00 one stays in state)
            [("a", _m(-59), 100.0), ("a", _m(210), 8.0)],
        ],
    )
    stream = (
        spark.readStream.schema("event_type string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        W.windowed_counts(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("win_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM win_sink").collect()
    got = {(r["key"], r["win_start_s"]): (r["n_events"], r["sum_value"]) for r in rows}
    h0 = int((T0 - dt.datetime(1970, 1, 1)).total_seconds())
    # finalized: [10,11) with ONLY the on-time row (the late 9:01 row was
    # dropped — its 100.0 must appear nowhere) and [11,12); the [13,14)
    # window is unemitted state
    assert got == {("a", h0): (1, 1.0), ("a", h0 + 3600): (2, 9.0)}
    assert len(rows) == 2
    # the drop is observable in the state-operator metrics, not just by
    # absence: exactly one row was discarded by the watermark gate
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    assert dropped == 1


def test_streaming_session_watermark_append(spark, tmp_path):
    """session_counts under streaming: events split ACROSS microbatches
    merge into one session (state-store merge), finalized once the
    watermark passes session end + nothing is emitted for still-open
    sessions."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write_batches(
        spark,
        src,
        [
            [("u1", _m(0), 1.0), ("u1", _m(10), 2.0)],
            # u1@10:25 extends the batch-0 session across the batch
            # boundary; u1@18:00 (t=480m) pushes the watermark far past
            # the merged session's end so it finalizes, and itself stays
            # open in state
            [("u1", _m(25), 4.0), ("u1", _m(480), 8.0)],
        ],
    )
    stream = (
        spark.readStream.schema("event_type string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        W.session_counts(
            stream, key_col="event_type", gap="30 minutes", watermark="1 hour"
        )
        .writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM sess_sink").collect()
    e = lambda m: int((_m(m) - dt.datetime(1970, 1, 1)).total_seconds())  # noqa: E731
    got = {
        (r["key"], r["win_start_s"], r["win_end_s"]): (r["n_events"], r["sum_value"])
        for r in rows
    }
    # ONE merged 3-event session [10:00, 10:55) — cross-batch merge —
    # finalized; the 18:00 singleton is still open (not emitted)
    assert got == {("u1", e(0), e(55)): (3, 7.0)}
    assert len(rows) == 1
