"""The assembled IndexModel document (plans/index_model.full_index_model):

* one-shot golden: the reference's own fixture
  (testEnrichedContentModel1.json → testElasticModel1.json) driven through
  the SINGLE assembled plan — scalars + every bucket + both primaries in
  one row, the ToIndexModel (mapper.go:54-90) parity check the per-part
  tests could only do piecewise;
* internal cross-check: the one-pass pivoted bucket plan
  (all_annotation_buckets) must equal the composition of the per-bucket
  plans on the synthetic sf0.001 corpus — same semantics, 3 shuffles
  instead of 18.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from content_rw_elasticsearch_spark.plans import index_model as IM

from test_reference_goldens import (
    CONTENT_FIELD_MAP,
    REF,
    _ann_df,
    _enriched_df,
    _load,
    _split,
)

import os

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available"
)

SF = "/root/testdata/sf0.001"


def test_full_document_matches_reference_golden_one_shot(spark):
    ec = _load("testEnrichedContentModel1.json")
    expected = _load("testElasticModel1.json")
    enriched = _enriched_df(spark, ec, "tid_2", "article")
    anns = _ann_df(spark, ec, "testConcordanceResponse1.json")
    out = IM.full_index_model(enriched, anns).collect()
    assert len(out) == 1
    row = out[0].asDict()

    # scalar projection (B8)
    for exp_key, col in CONTENT_FIELD_MAP.items():
        want = expected.get(exp_key)
        if want is None and exp_key == "length_millis":
            want = 0
        if want is None and exp_key in ("scoop", "mark_deleted",
                                        "bestStory", "lookupFailure"):
            want = False
        assert row[col] == want, exp_key
    assert row["publish_reference"] == "tid_2"

    # every array bucket, element-for-element (order included)
    for col in IM.ALL_BUCKET_FIELDS:
        assert _split(row[col]) == (expected.get(col) or []), col

    # primaries
    assert row["cmr_primarytheme"] == expected["cmr_primarytheme"]
    assert row["cmr_primarytheme_id"] == expected["cmr_primarytheme_id"]
    assert row["cmr_primarysection"] == expected.get("cmr_primarysection")
    assert row["cmr_primarysection_id"] == expected.get("cmr_primarysection_id")


def test_one_pass_buckets_equal_per_bucket_plans(spark):
    anns = IM.annotations_from_documents(spark, SF).cache()
    got = {r["uuid"]: r.asDict()
           for r in IM.all_annotation_buckets(anns).collect()}

    def norm(v):
        return v or ""

    for ct, (label_col, ids_col) in IM.TAXONOMY_FIELDS.items():
        want = {r["uuid"]: r
                for r in IM.taxonomy_buckets(anns, ct, label_col, ids_col).collect()}
        for uuid, w in want.items():
            assert norm(got[uuid][label_col]) == norm(w[label_col]), (ct, uuid)
            assert norm(got[uuid][ids_col]) == norm(w[ids_col]), (ct, uuid)
        # and nothing extra: uuids absent from the per-bucket plan are
        # empty in the pivot
        for uuid, g in got.items():
            if uuid not in want:
                assert norm(g[label_col]) == ""

    authors = {r["uuid"]: r for r in IM.author_buckets(anns).collect()}
    for uuid, w in authors.items():
        for c in ("cmr_people", "cmr_people_ids", "cmr_authors", "cmr_authors_ids"):
            assert norm(got[uuid][c]) == norm(w[c]), (c, uuid)

    secs = {r["uuid"]: r for r in IM.section_accumulation(anns).collect()}
    for uuid, w in secs.items():
        assert norm(got[uuid]["cmr_sections"]) == norm(w["cmr_sections"])
        assert norm(got[uuid]["cmr_sections_ids"]) == norm(w["cmr_sections_ids"])
    anns.unpersist()


def test_full_document_company_branch_populated(spark):
    """COMPANY must flow through the assembled document on the synthetic
    corpus (the seventh mapper branch, mapper.go:126-128)."""
    enriched = IM.enriched_from_documents(spark, SF)
    anns = IM.annotations_from_documents(spark, SF)
    n = (
        IM.full_index_model(enriched, anns)
        .filter(F.col("cmr_companynames") != "")
        .count()
    )
    assert n > 0
