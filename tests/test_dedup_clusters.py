"""connected_components (operators/dedup.py): near-dup pairs → clusters.

Pinned against a python union-find on hand graphs (chain — worst-case
diameter for the propagation loop — triangle, isolated pair) and the
recursive-CTE DuckDB oracle on driver data (sf0.001).
"""

from __future__ import annotations

import duckdb
import pytest

from content_rw_elasticsearch_spark.operators import dedup


def _uf_clusters(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return sorted((v, find(v)) for v in parent)


@pytest.mark.parametrize("pairs", [
    # chain 1-2-3-4-5: min label walks the whole diameter (4 rounds)
    [(1, 2), (2, 3), (3, 4), (4, 5)],
    # triangle + isolated pair + reversed-order edge
    [(10, 11), (11, 12), (12, 10), (20, 21), (31, 30)],
    # two components sharing no vertices, one singleton edge
    [(7, 3), (3, 9), (100, 50)],
])
def test_connected_components_vs_union_find(spark, pairs):
    df = spark.createDataFrame(pairs, "d1 long, d2 long")
    got = [(r["doc_id"], r["cluster_id"]) for r in
           dedup.connected_components(df).collect()]
    assert got == _uf_clusters(pairs)


def test_connected_components_empty(spark):
    df = spark.createDataFrame([], "d1 long, d2 long")
    out = dedup.connected_components(df)
    assert out.count() == 0
    assert out.columns == ["doc_id", "cluster_id"]


def test_clusters_vs_recursive_oracle(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "text")
    pairs = dedup.minhash_lsh_dedup(docs, "text", "doc_id", n=3, tau=0.8)
    got = [(r["doc_id"], r["cluster_id"]) for r in
           dedup.connected_components(pairs).collect()]
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_smoke}/documents.parquet'")
    exp = con.sql(dedup.dedup_clusters_sql(
        dedup.ngram_jaccard_pairs_sql(n=3, tau=0.8))).fetchall()
    assert got == [(d, c) for d, c in exp]
    assert len(got) > 0  # the gate is not vacuous at sf0.001
