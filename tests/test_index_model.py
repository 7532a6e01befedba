"""IndexModel ETL goldens — analog of the reference's
pkg/html/transformer_test.go (composite chain golden) and
pkg/message/message_handler_test.go (routing/drop paths)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from content_rw_elasticsearch_spark.functions.textfns import html_text_chain
from content_rw_elasticsearch_spark.plans import index_model as IM

COMPOSITE_IN = (
    '  <body><div class="interactive-comp">ignore me</div>'
    "<pull-quote>quote text</pull-quote>"
    '<script type="x">var a=1;</script>'
    "<p>Keep&nbsp;this &amp; that &lt;tag&gt;</p>"
    "embed1 [caption id=\"c\"]cap[/caption]   spaced\t\tout</body> "
)
# pinned composite result (chain order C1→C9 then trim; analog of
# transformer_test.go:10-51)
COMPOSITE_OUT = "Keep this & that cap spaced out"


def test_html_chain_composite_golden(spark):
    df = spark.createDataFrame([(COMPOSITE_IN,)], "body string").select(
        html_text_chain("body").alias("out")
    )
    assert df.collect()[0]["out"] == COMPOSITE_OUT


def test_html_chain_blank(spark):
    """Blank-input golden (transformer_test.go:87-100)."""
    df = spark.createDataFrame([("",), ("   \t ",)], "body string").select(
        html_text_chain("body").alias("out")
    )
    assert [r["out"] for r in df.collect()] == ["", ""]


@pytest.fixture(scope="module")
def enriched(spark, sf_smoke):
    return IM.enriched_from_documents(spark, sf_smoke).persist()


def test_drop_paths(enriched):
    """All drop gates (message_handler_test.go:190-461 analog)."""
    out = IM.to_index_model(enriched)
    rows = {r["uuid"]: r for r in out.collect()}
    src = {r["doc_id"]: r for r in enriched.collect()}
    for doc_id, row in src.items():
        uuid = row["uuid"]
        expect_dropped = (
            IM.SYNTHETIC_PREFIX in row["tid"]               # B1
            or row["marked_deleted"]                         # delete path
            or row["type"] not in IM.ALLOWED_TYPES           # B3
            or IM.CONTENT_TYPE_BY_TYPE.get(row["type"], "") == ""  # B4/B5
        )
        assert (uuid not in rows) == expect_dropped, (doc_id, row["type"])


def test_collection_routing(enriched):
    out = IM.to_index_model(enriched)
    got = {(r["content_type"], r["collection"]) for r in out.collect()}
    assert got == {("article", "FTCom"), ("video", "FTVideos"), ("audio", "FTAudios")}


def test_delete_set_excludes_synthetic(enriched):
    dels = {r["uuid"] for r in IM.delete_set(enriched).collect()}
    src = enriched.collect()
    for row in src:
        should = row["marked_deleted"] and IM.SYNTHETIC_PREFIX not in row["tid"]
        assert (row["uuid"] in dels) == should


def test_bucket_order_preserved(spark, sf_smoke):
    """E1 order preservation: concepts appear in first-annotation order
    (golden order pinned by exampleElasticModel.json:49-76 in the ref)."""
    anns = IM.annotations_from_documents(spark, sf_smoke)
    buckets = IM.annotation_buckets(anns, "PERSON", "cmr_people")
    raw = (
        IM.filtered_annotations(anns)
        .filter(F.col("concept_type") == "PERSON")
        .orderBy("ann_pos")
        .collect()
    )
    by_uuid: dict[str, list[str]] = {}
    for r in sorted(raw, key=lambda r: r["ann_pos"]):
        lst = by_uuid.setdefault(r["uuid"], [])
        if r["concept_id"] not in lst:
            lst.append(r["concept_id"])
    got = {r["uuid"]: list(r["cmr_people"]) for r in buckets.collect()}
    assert got == by_uuid
