"""Analyzer conformance goldens — the analog of the reference's pinned
transformer tests (/root/reference/pkg/html/transformer_test.go:10-139:
composite golden + per-operator goldens)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from content_rw_elasticsearch_spark.functions.analyzer import (
    analyze_code_py,
    analyze_query_py,
    tokens_code,
    tokens_simple,
)

SIMPLE_GOLDENS = [
    ("Hash JOIN row", ["hash", "join", "row"]),
    ("", []),
    ("   \t \n ", []),
    ("a,b;;c--d", ["a", "b", "c", "d"]),
    ("x1 2y", ["x1", "2y"]),
    ("café", ["caf"]),  # non-ascii is a separator in the simple analyzer
]

CODE_GOLDENS = [
    # camelCase split with original preserved
    ("parseHTTPResponse", ["parsehttpresponse", "parse", "http", "response"]),
    # snake_case split; original has '_' stripped
    ("snake_case_name", ["snakecasename", "snake", "case", "name"]),
    # plain lowercase word: no duplicate sub-tokens
    ("return", ["return"]),
    # ascii folding with preserve_original: folded stream follows original
    ("café", ["café", "cafe"]),
    ("", []),
    ("x = y + 1", ["x", "y", "1"]),
    # digits do not force a split (consistent with 'v2' staying whole)
    ("HTTPServer2", ["httpserver2", "http", "server2"]),
]


@pytest.mark.parametrize("text,expected", SIMPLE_GOLDENS)
def test_simple_analyzer_golden(spark, text, expected):
    df = spark.createDataFrame([(text,)], "t string").select(
        tokens_simple("t").alias("toks")
    )
    assert df.collect()[0]["toks"] == expected
    assert analyze_query_py(text, "simple") == expected  # doc/query parity


@pytest.mark.parametrize("text,expected", CODE_GOLDENS)
def test_code_analyzer_golden(text, expected):
    assert analyze_code_py(text) == expected


def test_code_analyzer_udf_matches_python(spark):
    texts = [t for t, _ in CODE_GOLDENS] + ["Über SüßWasser_fisch42"]
    df = spark.createDataFrame([(t,) for t in texts], "t string").select(
        "t", tokens_code(F.col("t")).alias("toks")
    )
    for row in df.collect():
        assert row["toks"] == analyze_code_py(row["t"])


def test_stage_order_pinned():
    """Composite golden (analog of transformer_test.go:10-51): the fold is
    PER TOKEN with preserve_original — only tokens that folding changes
    are doubled; ASCII tokens in a mixed document keep tf == 1."""
    got = analyze_code_py("naïve parseXMLDoc_v2 café")
    assert got == [
        "naïve", "naive",
        "parsexmldocv2", "parse", "xml", "doc", "v2",
        "café", "cafe",
    ]
