"""Field-scoped search (operators/fields.py): the ES per-field analyzed
indexes analog. Pins that `title:X` and `body:X` are genuinely different
queries (per-field postings, df, avgdl, docCount) and that the Spark plan
is value-identical to the independent DuckDB replay."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from content_rw_elasticsearch_spark.operators.fields import (
    FieldedIndex,
    fielded_bm25_sql,
)

SF = "/root/testdata/sf0.001"

FIELD_EXPRS_SQL = {
    "title": "array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')",
    "body": "text",
}


@pytest.fixture(scope="module")
def fidx(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = FieldedIndex.build(
        docs,
        {
            "title": F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 5)),
            "body": F.col("text"),
        },
        doc_col="doc_id",
    )
    yield idx
    idx.unpersist()


def _duck(sql: str):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return [tuple(r) for r in con.sql(sql).fetchall()]


def test_per_field_stats_differ(fidx):
    t_n, t_avgdl = fidx.field_stats["title"]
    b_n, b_avgdl = fidx.field_stats["body"]
    assert t_n == b_n  # every doc has both fields here
    assert t_avgdl < b_avgdl  # titles are 5 tokens, bodies are the full text
    # df is per (field, term): the same term is rarer in titles
    dfs = {
        r["field"]: r["df"]
        for r in fidx.stats.filter(F.col("term") == "hash").collect()
    }
    assert dfs["title"] < dfs["body"]


def test_title_vs_body_results_differ(fidx):
    title = [(r["doc_id"], r["score"]) for r in
             fidx.search("hash join", field="title", k=10).collect()]
    body = [(r["doc_id"], r["score"]) for r in
            fidx.search("hash join", field="body", k=10).collect()]
    assert title and body
    assert title != body  # field scoping must change the ranking


@pytest.mark.parametrize("field", ["title", "body"])
@pytest.mark.parametrize("mode", ["AND", "OR"])
def test_fielded_bm25_matches_duckdb_oracle(fidx, field, mode):
    got = [(r["doc_id"], r["score"]) for r in
           fidx.search("hash join", field=field, k=10, mode=mode).collect()]
    want = _duck(fielded_bm25_sql(FIELD_EXPRS_SQL, "hash join",
                                  field=field, k=10, mode=mode))
    assert got == [(int(d), float(s)) for d, s in want]


def test_unknown_field_raises(fidx):
    with pytest.raises(KeyError):
        fidx.search("x", field="nope")
