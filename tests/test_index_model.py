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


def _infer_ct(row) -> str:
    """Pure-Python replica of B4 readContentType (message_handler.go:137-160)
    used as the independent expectation for the plan's inference column."""
    if "ft-upp-audio" in row["ct_header"]:
        return "audio"
    if "ft-upp-article" in row["ct_header"]:
        return "article"
    for auth, _, ct in IM.CONTENT_METADATA:
        if auth in row["authority"]:
            return ct
    for _, origin, ct in IM.CONTENT_METADATA:
        if origin in row["origin"]:
            return ct
    return ""


def test_drop_paths(enriched):
    """All drop gates (message_handler_test.go:190-461 analog), including
    the B4 inference + PAC-origin escape."""
    out = IM.to_index_model(enriched)
    rows = {r["uid"]: r for r in out.collect()}
    src = {r["doc_id"]: r for r in enriched.collect()}
    for doc_id, row in src.items():
        ct = _infer_ct(row)
        expect_dropped = (
            IM.SYNTHETIC_PREFIX in row["tid"]               # B1
            or row["type"] not in IM.ALLOWED_TYPES           # B3
            or ct == ""                                      # B4 gate (+B5)
            or row["marked_deleted"]                         # delete path
        )
        assert (row["uuid"] not in rows) == expect_dropped, (doc_id, row["type"])
        if not expect_dropped:
            assert rows[row["uuid"]]["content_type"] == ct


def test_collection_routing(enriched):
    out = IM.to_index_model(enriched)
    got = {(r["content_type"], r["collection"]) for r in out.collect()}
    assert got == {
        ("article", "FTCom"), ("blog", "FTBlogs"),
        ("video", "FTVideos"), ("audio", "FTAudios"),
    }


def test_nullable_vs_empty_semantics(enriched):
    """Pointer fields stay NULL where the reference leaves nil; value
    fields are '' (exampleElasticModel.json:3-4,17 analog)."""
    out = IM.to_index_model(enriched).collect()
    saw_null_publish = saw_empty_byline = saw_null_thumb = saw_thumb = False
    for r in out:
        assert r["byline"] is not None  # *model.Byline is always assigned
        assert r["story_id"] is None    # never populated by the mapper
        assert r["length_millis"] is not None  # int32 zero-value, not nil
        saw_null_publish |= r["last_publish"] is None
        saw_empty_byline |= r["byline"] == ""
        saw_null_thumb |= r["thumbnail_url"] is None
        saw_thumb |= r["thumbnail_url"] is not None
    assert saw_null_publish and saw_empty_byline and saw_null_thumb and saw_thumb


def test_delete_set_control_flow(enriched):
    """Delete path gates: synthetic → allowed-type → inference(+PAC escape)
    → markedDeleted (message_handler.go:69-120)."""
    dels = {r["uuid"]: r["collection"] for r in IM.delete_set(enriched).collect()}
    colls = {ct: meta[0] for ct, meta in IM.ES_CT_META.items()}
    for row in enriched.collect():
        ct = _infer_ct(row)
        should = (
            row["marked_deleted"]
            and IM.SYNTHETIC_PREFIX not in row["tid"]
            and row["type"] in IM.ALLOWED_TYPES
            and (ct != "" or row["origin"] == IM.PAC_ORIGIN)
        )
        assert (row["uuid"] in dels) == should
        if should:
            assert dels[row["uuid"]] == colls.get(ct, "")


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


def test_author_only_skips_people(spark, sf_smoke):
    """E6 (mapper.go:107-124): a person annotation whose only TME id is an
    Authors id is suppressed from the people bucket; authors are populated
    only under hasAuthor/hasContributor with an Authors id present
    (message_handler_test.go exercises this same gating)."""
    anns = IM.annotations_from_documents(spark, sf_smoke).persist()
    out = {r["uuid"]: r for r in IM.author_buckets(anns).collect()}
    raw = (
        IM.filtered_annotations(anns)
        .filter(F.col("concept_type") == "PERSON")
        .orderBy("ann_pos")
        .collect()
    )
    psfx, asfx = IM.B64_TAXONOMY["PN"], IM.B64_TAXONOMY["Authors"]
    expect_people: dict[str, list[str]] = {}
    expect_authors: dict[str, list[str]] = {}
    expect_author_ids: dict[str, list[str]] = {}
    saw_author_only = saw_author_row = False
    for r in sorted(raw, key=lambda r: r["ann_pos"]):
        person_found = any(x.endswith(psfx) for x in r["ann_ids"])
        author_ids = [x for x in r["ann_ids"] if x.endswith(asfx)]
        if person_found or not author_ids:
            lst = expect_people.setdefault(r["uuid"], [])
            if r["pref_label"] not in lst:
                lst.append(r["pref_label"])
        else:
            saw_author_only = True
        if r["predicate"] in IM.AUTHOR_PREDICATES and author_ids:
            saw_author_row = True
            lst = expect_authors.setdefault(r["uuid"], [])
            if r["pref_label"] not in lst:
                lst.append(r["pref_label"])
            ids = expect_author_ids.setdefault(r["uuid"], [])
            for x in (author_ids[0], r["concept_id"]):
                if x not in ids:
                    ids.append(x)
    assert saw_author_only and saw_author_row  # both branches exercised
    for uuid, row in out.items():
        got_people = row["cmr_people"].split("|") if row["cmr_people"] else []
        assert got_people == expect_people.get(uuid, []), uuid
        got_authors = row["cmr_authors"].split("|") if row["cmr_authors"] else []
        assert got_authors == expect_authors.get(uuid, []), uuid
        got_ids = row["cmr_authors_ids"].split("|") if row["cmr_authors_ids"] else []
        assert got_ids == expect_author_ids.get(uuid, []), uuid
    anns.unpersist()


def test_primary_section_last_wins(spark, sf_smoke):
    """E4 (mapper.go:286-289): cmr_primarysection is assigned
    UNCONDITIONALLY per isPrimaryClassifiedBy annotation — the LAST one in
    metadata order wins (unlike setPrimaryTheme's first-wins guard)."""
    anns = IM.annotations_from_documents(spark, sf_smoke)
    out = {r["uuid"]: r for r in IM.section_accumulation(anns).collect()}
    raw = (
        IM.filtered_annotations(anns)
        .filter(F.col("predicate") == IM.PRIMARY_SECTION_PREDICATE)
        .collect()
    )
    last: dict[str, tuple[int, str]] = {}
    multi = set()
    for r in raw:
        if r["uuid"] in last:
            multi.add(r["uuid"])
        if r["uuid"] not in last or r["ann_pos"] > last[r["uuid"]][0]:
            last[r["uuid"]] = (r["ann_pos"], r["pref_label"])
    assert multi  # at least one doc has >1 isPrimaryClassifiedBy annotation
    for uuid, (_, label) in last.items():
        if uuid in out:
            assert out[uuid]["cmr_primarysection"] == label, uuid
