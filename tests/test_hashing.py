"""Pin driver-side XXH64 to Spark's xxhash64 expression — the bucket/salt
contract the query path relies on for jobless pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from content_rw_elasticsearch_spark.functions.hashing import (
    pmod,
    xxh64_long,
    xxh64_string,
)

STRINGS = ["", "a", "return", "café", "x" * 31, "y" * 32, "z" * 100,
           "the quick brown fox", "\x00\x01", "snake_case_name"]
LONGS = [0, 1, -1, 42, 2**31, -(2**31), 2**62, -(2**62), 9_999_999_001]


def test_string_parity_with_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string").select(
        "s", F.xxhash64("s").alias("h"),
        F.pmod(F.xxhash64("s"), F.lit(8)).cast("int").alias("b"),
    )
    for r in df.collect():
        assert xxh64_string(r["s"]) == r["h"], r["s"]
        assert pmod(xxh64_string(r["s"]), 8) == r["b"]


def test_long_parity_with_spark(spark):
    df = spark.createDataFrame([(v,) for v in LONGS], "v long").select(
        "v", F.xxhash64("v").alias("h"),
        F.pmod(F.xxhash64("v"), F.lit(16)).cast("int").alias("b"),
    )
    for r in df.collect():
        assert xxh64_long(r["v"]) == r["h"], r["v"]
        assert pmod(xxh64_long(r["v"]), 16) == r["b"]
