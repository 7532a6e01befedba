"""The IndexModel ETL — the reference's record-mapping pipeline re-expressed
as one declarative DataFrame plan.

Reference hot path: pkg/message/message_handler.go:69-135 (per-message
filters/routing) + pkg/mapper/mapper.go:54-263 (ToIndexModel projection and
annotation fan-in). Stage order below is PINNED to the reference's control
flow; every stage cites its origin. Catalyst then does what the reference
does by hand (cheap gates first — message_handler.go:79-99): filter
reordering, constant folding of the literal maps, whole-stage codegen of
the regex chain.

The synthetic EnrichedContent table is derived deterministically from the
driver's documents.parquet with pure column expressions so the DuckDB
oracle (oracle.py) replays every stage bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import api_url, html_text_chain, title_text_chain, web_url

# message_handler.go:162-171 isAllowedType — note "" IS allowed there
ALLOWED_TYPES = ["Article", "Video", "MediaResource", "Audio", "ContentPackage", ""]
# message_handler.go:19 + :79-82
SYNTHETIC_PREFIX = "SYNTHETIC-REQ-MON"
# message_handler.go:23-24 — Content-Type header fragments (stage 1 of B4)
AUDIO_CT_HEADER = "ft-upp-audio"
ARTICLE_CT_HEADER = "ft-upp-article"
# configs/app.yml:23-42 contentMetadata — (authority, origin, contentType);
# stage 2 matches identifiers.authority, stage 3 the Origin-System-Id header
CONTENT_METADATA = [
    ("http://api.ft.com/system/FTCOM-METHODE", "methode-web-pub", "article"),
    ("http://api.ft.com/system/FT-LABS-WP", "wordpress", "blog"),
    ("http://api.ft.com/system/NEXT-VIDEO-EDITOR", "next-video-editor", "video"),
    ("http://api.ft.com/system/cct", "http://cmdb.ft.com/systems/cct", "article"),
    ("http://api.ft.com/system/spark", "http://cmdb.ft.com/systems/spark", "article"),
]
# pkg/config/config.go:26 — empty contentType escapes the gate for PAC origin
PAC_ORIGIN = "http://cmdb.ft.com/systems/pac"
# configs/app.yml:44-61 esContentTypeMetadata: contentType → (collection,
# format, category); collection drives B6 routing, format/category B8 fields
ES_CT_META = {
    "article": ("FTCom", "Articles", "article"),
    "blog": ("FTBlogs", "Blogs", "blogPost"),
    "video": ("FTVideos", "Videos", "video"),
    "audio": ("FTAudios", "Audios", "audio"),
}
# configs/app.yml:10-20 predicates to skip (B7, mapper.go:150-164)
SKIP_PREDICATES = ["mentions", "hasDisplayTag"]
# mapper.go:272-291 handleSectionMapping predicate set (E4)
SECTION_PREDICATES = [
    "about", "majorMentions", "implicitlyAbout",
    "isClassifiedBy", "implicitlyClassifiedBy",
]
PRIMARY_SECTION_PREDICATE = "isPrimaryClassifiedBy"
AUTHOR_PREDICATES = ["hasAuthor", "hasContributor"]  # mapper.go:115
# mapper.go:22-23 — thumbnail URL template (C10)
IMAGE_SERVICE_URL = (
    "https://www.ft.com/__origami/service/image/v2/images/raw/"
    "http%3A%2F%2Fprod-upp-image-read.ft.com%2F[image_uuid]"
    "?source=search&fit=scale-down&width=167"
)
IMAGE_PLACEHOLDER = "[image_uuid]"
# mapper.go:25-31 TME taxonomy names, pre-encoded (getCmrID base64-encodes
# at :310; constants here are base64.b64encode of ON/PN/Authors/Topics/GL/
# Sections — pinned by tests/test_index_model.py)
B64_TAXONOMY = {
    "ON": "T04=", "PN": "UE4=", "Authors": "QXV0aG9ycw==",
    "Topics": "VG9waWNz", "GL": "R0w=", "Sections": "U2VjdGlvbnM=",
}
# mapper.go:100-148 — concept types that set the primary theme on `about`,
# with the taxonomy used for the theme id fallback
THEME_TAXONOMY_BY_TYPE = {
    "ORGANISATION": "ON", "PERSON": "PN", "TOPIC": "Topics", "LOCATION": "GL",
}
# deterministic injected index timestamp (C12 — mapper.go:172 uses
# wall-clock; tests there null it out. We inject instead: reproducible.)
DEFAULT_INDEX_DATE = "2026-01-01T00:00:00.000Z"

_TYPES7 = ["Article", "Video", "MediaResource", "Audio", "ContentPackage", "Weird", ""]
_PREDICATES10 = [
    "about", "mentions", "isClassifiedBy", "hasDisplayTag", "majorMentions",
    "implicitlyAbout", "implicitlyClassifiedBy", "isPrimaryClassifiedBy",
    "hasAuthor", "hasContributor",
]
# all seven mapper fan-in branches (mapper.go:92-148) — COMPANY included so
# the companynames branch is oracle-gated through the driver, not just the
# reference golden fixtures
_CONCEPT_TYPES = ["PERSON", "ORGANISATION", "LOCATION", "TOPIC", "GENRE",
                  "BRAND", "COMPANY"]
# concept type → (labels field, ids field) in the assembled IndexModel
# (schema.go:41-71 json names; GENRE serializes as cmr_genre/cmr_genre_id).
# PERSON is absent: its people/authors buckets carry the author gating
# (mapper.go:107-124) and are handled separately.
TAXONOMY_FIELDS = {
    "ORGANISATION": ("cmr_orgnames", "cmr_orgnames_ids"),
    "COMPANY": ("cmr_companynames", "cmr_companynames_ids"),
    "BRAND": ("cmr_brands", "cmr_brands_ids"),
    "TOPIC": ("cmr_topics", "cmr_topics_ids"),
    "LOCATION": ("cmr_regions", "cmr_regions_ids"),
    "GENRE": ("cmr_genre", "cmr_genre_id"),
}


def enriched_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → synthetic EnrichedContent (schema.go:90-120
    analog). Every column is a deterministic pure function of doc_id/text
    so the DuckDB oracle regenerates the identical table.

    Covers the full Content surface the mapper consumes: identifiers
    authority + Origin/Content-Type headers (B4 inputs), byline/standfirst/
    description, scoop/canBeSyndicated/canBeDistributed, first/last publish
    dates (empty → null semantics), mainImage apiUrl, dataSource
    (duration, mediaType) for length_millis."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    doc_id = F.col("doc_id")
    text = F.col("text")
    typ = F.try_element_at(
        F.array(*[F.lit(t) for t in _TYPES7]), (doc_id % 7 + 1).cast("int")
    )
    authorities = F.array(*[F.lit(a) for a, _, _ in CONTENT_METADATA])
    origins = F.array(*[F.lit(o) for _, o, _ in CONTENT_METADATA])
    # body / bodyXML / description exercise all three body branches of
    # mapper.go:201-215: html-chained body, bodyXML fallback (B2), and the
    # description passthrough when both are empty
    body_case = (
        F.when(doc_id % 41 == 3, F.lit(""))
        .when(doc_id % 11 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("<p>"), text, F.lit("</p>")))
    )
    body_xml_case = (
        F.when(doc_id % 41 == 3, F.lit(""))
        .when(doc_id % 11 == 0, F.concat(
            F.lit('<body><script type="x">junk</script>'), text,
            F.lit('&nbsp;[caption id="a"]cap[/caption] embed1</body>'),
        ))
        .otherwise(F.lit(""))
    )
    return d.select(
        doc_id,
        text,
        F.md5(doc_id.cast("string")).alias("uuid"),
        F.when(doc_id % 53 == 0,
               F.concat(F.lit(SYNTHETIC_PREFIX), doc_id.cast("string")))
        .otherwise(F.concat(F.lit("tid_"), doc_id.cast("string"))).alias("tid"),
        typ.alias("type"),
        F.concat_ws(" ", F.slice(F.split(text, " "), 1, 5)).alias("title"),
        body_case.alias("body"),
        body_xml_case.alias("body_xml"),
        # B4 stage-1 input: Content-Type header (message_handler.go:138-144)
        F.when(doc_id % 13 == 0, F.lit("application/vnd.ft-upp-audio+json"))
        .when(doc_id % 13 == 1, F.lit("application/vnd.ft-upp-article+json"))
        .otherwise(F.lit("")).alias("ct_header"),
        # B4 stage-2 input: identifiers[0].authority (schema.go:127-130)
        F.coalesce(
            F.try_element_at(authorities, (doc_id % 17 + 1).cast("int")),
            F.lit(""),
        ).alias("authority"),
        # B4 stage-3 input: Origin-System-Id header (+ PAC escape slot)
        F.coalesce(
            F.try_element_at(origins, (doc_id % 19 + 1).cast("int")),
            F.when(doc_id % 19 == 5, F.lit(PAC_ORIGIN))
            .otherwise(F.lit("unknown-origin")),
        ).alias("origin"),
        F.when(doc_id % 4 == 0, F.lit("")).otherwise(
            F.concat(F.lit("By <b>Author "), (doc_id % 50).cast("string"),
                     F.lit("</b> &amp; staff"))
        ).alias("byline"),
        F.when(doc_id % 6 == 0, F.lit("")).otherwise(
            F.concat(F.lit("Standfirst "), (doc_id % 30).cast("string"))
        ).alias("standfirst"),
        F.concat(F.lit("Plain description "), doc_id.cast("string")).alias("description"),
        (doc_id % 9 == 0).alias("scoop"),
        F.try_element_at(
            F.array(F.lit("yes"), F.lit("no"), F.lit("verify")),
            (doc_id % 4 + 1).cast("int"),
        ).alias("can_be_syndicated"),
        F.try_element_at(
            F.array(F.lit("yes"), F.lit("no")),
            (doc_id % 3 + 1).cast("int"),
        ).alias("can_be_distributed"),
        F.when(doc_id % 23 == 0, F.lit("")).otherwise(F.concat(
            F.date_format(
                F.timestamp_add("MINUTE", doc_id.cast("int"),
                                F.lit("2024-01-01 00:00:00").cast("timestamp")),
                "yyyy-MM-dd'T'HH:mm:ss",
            ),
            F.lit(".000Z"),
        )).alias("published_date"),
        F.when(doc_id % 29 == 0, F.lit("")).otherwise(F.concat(
            F.date_format(
                F.timestamp_add("MINUTE", doc_id.cast("int"),
                                F.lit("2023-12-01 00:00:00").cast("timestamp")),
                "yyyy-MM-dd'T'HH:mm:ss",
            ),
            F.lit(".000Z"),
        )).alias("first_published_date"),
        # mainImage members[0].apiUrl analog; the mapper extracts the image
        # uuid as the last '/'-segment (mapper.go:235-237)
        F.when(doc_id % 5 == 0, F.lit("")).otherwise(
            F.concat(F.lit("http://api.ft.com/content/"),
                     F.md5(F.concat(doc_id.cast("string"), F.lit("img"))))
        ).alias("main_image"),
        # dataSource (schema.go:122-125) — one synthetic rendition; the
        # multi-rendition first-match rule is pinned by the reference
        # golden fixture tests (testEnrichedContentModel4.json has 4)
        F.array(
            F.struct(
                (doc_id * 37 % 600000).cast("int").alias("duration"),
                F.try_element_at(
                    F.array(F.lit("video/mp4"), F.lit("audio/mp3"), F.lit("text/html")),
                    (doc_id % 3 + 1).cast("int"),
                ).alias("media_type"),
            )
        ).alias("data_sources"),
        (doc_id % 97 == 0).alias("marked_deleted"),
    )


def inferred_content_type() -> F.Column:
    """B4 — the reference's 3-stage content-type resolution
    (readContentType, message_handler.go:137-160): Content-Type header
    fragment match → identifiers.authority substring match vs the config
    authorities → Origin-System-Id substring match; else ''."""
    c = F.when(F.col("ct_header").contains(AUDIO_CT_HEADER), F.lit("audio")) \
         .when(F.col("ct_header").contains(ARTICLE_CT_HEADER), F.lit("article"))
    for auth, _, ct in CONTENT_METADATA:
        c = c.when(F.col("authority").contains(auth), F.lit(ct))
    for _, origin, ct in CONTENT_METADATA:
        c = c.when(F.col("origin").contains(origin), F.lit(ct))
    return c.otherwise(F.lit(""))


def _es_meta_map(idx: int) -> F.Column:
    return F.create_map(
        *[F.lit(x) for ct, meta in ES_CT_META.items() for x in (ct, meta[idx])]
    )


def gated(enriched: DataFrame) -> DataFrame:
    """B1→B5 control-flow gates shared by the write and delete paths
    (message_handler.go:69-110): synthetic tid, allowed type, content-type
    inference with the PAC-origin escape."""
    return (
        enriched
        # B1 synthetic-tid gate (message_handler.go:79-82 —
        # strings.Contains, not a prefix match)
        .filter(~F.col("tid").contains(SYNTHETIC_PREFIX))
        # B2 bodyXML fallback (message_handler.go:91-94)
        .withColumn("body", F.coalesce(F.nullif("body", F.lit("")), F.col("body_xml")))
        # B3 allowed-type gate (message_handler.go:96-99, isAllowedType :162-171)
        .filter(F.col("type").isin(ALLOWED_TYPES))
        # B4 content-type inference (readContentType :137-160)
        .withColumn("content_type", inferred_content_type())
        # empty contentType fails UNLESS the message came from PAC
        # (message_handler.go:105-109)
        .filter((F.col("content_type") != "") | (F.col("origin") == PAC_ORIGIN))
    )


def to_index_model(enriched: DataFrame,
                   index_date: str = DEFAULT_INDEX_DATE) -> DataFrame:
    """B1→B8 in reference order (message_handler.go:69-135), then the wide
    IndexModel projection (mapper.go:170-263, schema.go:3-88).

    Nullability is semantic and matches the reference's pointer fields:
    byline/lead_headline/body are always-set strings (possibly ''), while
    last_publish/initial_publish/thumbnail_url/can_be_* stay NULL when the
    reference leaves the pointer nil (pinned by
    test/testdata/exampleElasticModel.json:3-4,17). story_id/storymodel_id
    are typed nulls — the mapper never populates them; mark_deleted/
    bestStory/lookupFailure are Go zero-values (false)."""
    coll_map, fmt_map, cat_map = _es_meta_map(0), _es_meta_map(1), _es_meta_map(2)
    img_uuid = F.element_at(F.split("main_image", "/"), -1)
    return (
        gated(enriched)
        # delete short-circuit precedes the write path (message_handler.go:112-120)
        .filter(~F.col("marked_deleted"))
        # B5 no-content gate (message_handler.go:122-125) — drops the
        # PAC-origin escapes with no inferable type too
        .filter((F.col("uuid") != "") & (F.col("content_type") != ""))
        # B6 collection routing (message_handler.go:111 + app.yml:44-61)
        .withColumn("collection", coll_map[F.col("content_type")])
        # B8 projection (mapper.go:170-263) + C-chain on body (mapper.go:202-211)
        .select(
            F.col("uuid").alias("uid"),
            "collection",
            "content_type",
            # internalContentType mirrors contentType (mapper.go:175-177)
            F.col("content_type").alias("internal_content_type"),
            cat_map[F.col("content_type")].alias("category"),
            fmt_map[F.col("content_type")].alias("format"),
            # title/byline go through the SHORT chain (mapper.go:183-193):
            # entities → tags → trim → whitespace
            title_text_chain("title").alias("lead_headline"),
            title_text_chain("byline").alias("byline"),
            # body: full chain when body set, else raw description
            # (mapper.go:201-215 — the description passthrough is NOT chained)
            F.when(F.col("body") != "", html_text_chain("body"))
            .otherwise(F.col("description")).alias("body"),
            F.col("scoop"),
            F.col("can_be_syndicated"),
            F.col("can_be_distributed"),
            # empty publish dates stay nil pointers (mapper.go:194-199)
            F.nullif("published_date", F.lit("")).alias("last_publish"),
            F.nullif("first_published_date", F.lit("")).alias("initial_publish"),
            F.col("standfirst").alias("short_description"),
            # thumbnail (mapper.go:223-240): non-blog + mainImage present;
            # image uuid = last '/'-segment of the member apiUrl, templated
            # into the image-service URL (the reference's internal-content
            # HTTP fan-out is modeled as the member apiUrl column)
            F.when(
                (F.col("content_type") != "blog") & (F.col("main_image") != ""),
                F.replace(F.lit(IMAGE_SERVICE_URL), F.lit(IMAGE_PLACEHOLDER), img_uuid),
            ).alias("thumbnail_url"),
            # length_millis (mapper.go:243-255): video → FIRST dataSource
            # with a video/* mediaType; audio → first dataSource; else 0
            F.coalesce(
                F.when(
                    F.col("content_type") == "video",
                    F.try_element_at(
                        F.filter(
                            F.col("data_sources"),
                            lambda d: d["media_type"].startswith("video"),
                        ),
                        F.lit(1),
                    )["duration"],
                ).when(
                    F.col("content_type") == "audio",
                    F.try_element_at("data_sources", F.lit(1))["duration"],
                ),
                F.lit(0),
            ).cast("int").alias("length_millis"),
            web_url(F.col("uuid")).alias("url"),
            api_url(F.col("uuid")).alias("model_api_url"),
            F.col("tid").alias("publish_reference"),
            F.lit(index_date).alias("index_date"),
            F.lit(False).alias("mark_deleted"),
            F.lit(False).alias("best_story"),
            F.lit(False).alias("lookup_failure"),
            F.lit(None).cast("int").alias("story_id"),
            F.lit(None).cast("int").alias("storymodel_id"),
        )
    )


def delete_set(enriched: DataFrame) -> DataFrame:
    """A5 delete path (message_handler.go:112-120, es/service.go:130-138):
    (collection, uuid) pairs to delete. Control flow pinned to the
    reference: synthetic gate → allowed-type gate → content-type inference
    (with PAC escape) → MarkedDeleted branch. A PAC-origin doc with no
    inferable type IS deleted — with an empty collection (the zero-value
    ESContentTypeMetadataMap.Get(\"\") lookup)."""
    coll_map = _es_meta_map(0)
    return (
        gated(enriched)
        .filter(F.col("marked_deleted"))
        .select(
            "uuid",
            F.coalesce(coll_map[F.col("content_type")], F.lit("")).alias("collection"),
        )
        .orderBy("uuid")
    )


def annotations_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic Annotations (schema.go:132-145 analog): three positional
    annotation slots per document, derived from the text tokens.

    Each annotation carries the full Thing surface the mapper consumes:
    concept_id (canonical id), pref_label, predicate, concept_type, and
    tme_ids — the concordance TME ids (concordance.go:97-119) with
    deterministic base64 taxonomy suffixes so getCmrID/getCmrIDWithFallback
    (mapper.go:303-324) exercise both match and fallback branches.
    ann_ids = [canonical] + tme_ids (mapper.go:79-84)."""
    base = enriched_from_documents(spark, sf_dir).select("doc_id", "uuid", "text")
    parts = []
    for pos in (1, 2, 3):
        k = F.col("doc_id") + 31 * pos
        tme = F.filter(
            F.array(
                F.when(k % 3 == 0, F.concat(F.lit("tme-"), k.cast("string"),
                                            F.lit(B64_TAXONOMY["PN"]))),
                F.when(k % 4 == 0, F.concat(F.lit("tme-"), k.cast("string"),
                                            F.lit(B64_TAXONOMY["Authors"]))),
                F.when(k % 5 == 0, F.concat(F.lit("tme-"), k.cast("string"),
                                            F.lit(B64_TAXONOMY["Sections"]))),
                F.when(k % 7 == 2, F.concat(F.lit("tme-"), k.cast("string"),
                                            F.lit(B64_TAXONOMY["ON"]))),
                F.when(k % 7 == 4, F.concat(F.lit("tme-"), k.cast("string"),
                                            F.lit(B64_TAXONOMY["Topics"]))),
                F.when(k % 7 == 6, F.concat(F.lit("tme-"), k.cast("string"),
                                            F.lit(B64_TAXONOMY["GL"]))),
                F.when(k % 2 == 0, F.concat(F.lit("tme-"), k.cast("string"),
                                            F.lit("xq"))),
            ),
            lambda x: x.isNotNull(),
        )
        cid = F.try_element_at(F.split(F.col("text"), " "), F.lit(pos * 3))
        parts.append(
            base.select(
                "uuid",
                F.lit(pos).alias("ann_pos"),
                cid.alias("concept_id"),
                F.concat(F.lit("P-"), cid).alias("pref_label"),
                # 5*pos makes slots 1 and 3 share a predicate, so a doc can
                # carry TWO isPrimaryClassifiedBy annotations — required to
                # pin the last-writer-wins primary-section semantics (E4)
                F.try_element_at(
                    F.array(*[F.lit(p) for p in _PREDICATES10]),
                    ((F.col("doc_id") + 5 * pos) % 10 + 1).cast("int"),
                ).alias("predicate"),
                F.try_element_at(
                    F.array(*[F.lit(t) for t in _CONCEPT_TYPES]),
                    ((F.col("doc_id") * pos) % len(_CONCEPT_TYPES) + 1).cast("int"),
                ).alias("concept_type"),
                tme.alias("tme_ids"),
            )
        )
    anns = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return (
        anns.filter(F.col("concept_id").isNotNull() & (F.col("concept_id") != ""))
        .withColumn("ann_ids", F.concat(F.array("concept_id"), F.col("tme_ids")))
    )


def filtered_annotations(anns: DataFrame) -> DataFrame:
    """B7 predicate filter (mapper.go:150-164; predicates app.yml:10-20)."""
    return anns.filter(~F.col("predicate").isin(SKIP_PREDICATES))


def _first_seen_array(df: DataFrame, elem: F.Column, order: F.Column,
                      out_col: str) -> DataFrame:
    """appendIfNotExists (mapper.go:326-333) as a distributed plan:
    keep each element's FIRST occurrence position, dedupe, then rebuild
    the array in first-seen order. Deterministic under any partitioning —
    no collect_list-order dependence. Emits a '|'-joined scalar so the
    driver canonicalizer can hash it."""
    return (
        df.select("uuid", elem.alias("e"), order.alias("o"))
        .groupBy("uuid", "e")
        .agg(F.min("o").alias("o"))
        .groupBy("uuid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("o", "e"))),
                    lambda s: s["e"],
                ),
                "|",
            ).alias(out_col)
        )
    )


def annotation_buckets(anns: DataFrame, concept_type: str, out_col: str,
                       joined: bool = False) -> DataFrame:
    """E1/E2/E3 — order-preserving deduped fan-in of concept ids into a
    taxonomy array (appendIfNotExists, mapper.go:326-333; per-type routing
    mapper.go:92-148). Order = first annotation position (the golden files
    pin element order: test/testdata/exampleElasticModel.json:49-76).

    Implementation: min(ann_pos) per (uuid, concept) — dedupe — then
    sort_array over (pos, id) structs → transform to ids. Deterministic
    under any partitioning; no collect_list-order dependence.

    ``joined=True`` emits the array as a '|'-joined scalar (order intact)
    so the driver's canonicalizer — which cannot hash array cells — can
    value-compare against the DuckDB oracle."""
    first_pos = (
        filtered_annotations(anns)
        .filter(F.col("concept_type") == concept_type)
        .groupBy("uuid", "concept_id")
        .agg(F.min("ann_pos").alias("p"))
    )
    bucket = F.transform(
        F.array_sort(F.collect_list(F.struct("p", "concept_id"))),
        lambda s: s["concept_id"],
    )
    if joined:
        bucket = F.array_join(bucket, "|")
    return (
        first_pos.groupBy("uuid")
        .agg(bucket.alias(out_col))
        .orderBy("uuid")
    )


def taxonomy_buckets(anns: DataFrame, concept_type: str,
                     label_col: str, ids_col: str) -> DataFrame:
    """E1/E2/E3 with the FULL reference field pair: per concept type,
    pref_labels (appendIfNotExists order) AND the flattened ann_ids
    (prepareElasticField order — each annotation contributes
    [canonical] + tme_ids, globally deduped first-seen). This is what
    populateAnnotationRelatedFields does per switch branch
    (mapper.go:92-148); used by the reference-golden fixture tests.
    Emits '|'-joined scalars."""
    flt = filtered_annotations(anns).filter(F.col("concept_type") == concept_type)
    labels = _first_seen_array(flt, F.col("pref_label"), F.col("ann_pos"), label_col)
    ids = _first_seen_array(
        flt.select("uuid", "ann_pos", F.posexplode("ann_ids").alias("i", "id")),
        F.col("id"), F.col("ann_pos") * 100 + F.col("i"), ids_col,
    )
    return labels.join(ids, "uuid").orderBy("uuid")


def section_accumulation(anns: DataFrame) -> DataFrame:
    """E4 — handleSectionMapping (mapper.go:272-291): annotations whose
    predicate is about/majorMentions/implicitlyAbout/isClassifiedBy/
    implicitlyClassifiedBy/isPrimaryClassifiedBy accumulate pref_label into
    cmr_sections and their ann_ids into cmr_sections_ids (both
    appendIfNotExists-deduped in annotation order); isPrimaryClassifiedBy
    ALSO overwrites cmr_primarysection(+id) — LAST writer wins (the
    reference assigns unconditionally, unlike setPrimaryTheme's first-wins
    guard at :294-296). The primary-section id is
    getCmrIDWithFallback("Sections", ann_ids) (mapper.go:288,316-324)."""
    secs = filtered_annotations(anns).filter(
        F.col("predicate").isin(SECTION_PREDICATES + [PRIMARY_SECTION_PREDICATE])
    )
    labels = _first_seen_array(secs, F.col("pref_label"), F.col("ann_pos"),
                               "cmr_sections")
    # prepareElasticField appends ann_ids in annotation order; the global
    # first-seen order key is (ann_pos, index-within-ann_ids)
    ids_exploded = secs.select(
        "uuid", "ann_pos", F.posexplode("ann_ids").alias("i", "id")
    )
    ids = _first_seen_array(ids_exploded, F.col("id"),
                            F.col("ann_pos") * 100 + F.col("i"),
                            "cmr_sections_ids")
    primary = primary_section(anns)
    return (
        labels.join(ids, "uuid")
        .join(primary, "uuid", "left")
        .orderBy("uuid")
    )


def primary_section(anns: DataFrame) -> DataFrame:
    """E4 primary-section part of handleSectionMapping (mapper.go:285-289):
    isPrimaryClassifiedBy assigns unconditionally, so the LAST annotation
    wins; its id is getCmrIDWithFallback("Sections", ann_ids)."""
    sfx = B64_TAXONOMY["Sections"]
    fallback_id = F.coalesce(
        F.try_element_at(
            F.filter(F.col("ann_ids"), lambda x: x.endswith(sfx)), F.lit(1)
        ),
        F.try_element_at("ann_ids", F.lit(2)),
        F.try_element_at("ann_ids", F.lit(1)),
    )
    w = Window.partitionBy("uuid").orderBy(F.desc("ann_pos"))
    return (
        filtered_annotations(anns)
        .filter(F.col("predicate") == PRIMARY_SECTION_PREDICATE)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "uuid",
            F.col("pref_label").alias("cmr_primarysection"),
            fallback_id.alias("cmr_primarysection_id"),
        )
    )


def author_buckets(anns: DataFrame) -> DataFrame:
    """E6 — author gating (mapper.go:107-124), person-type annotations:

    * people bucket: pref_label/ann_ids added UNLESS the annotation is
      author-only — i.e. no TME People ('PN') id AND an Authors id exists
      (`if personFound || !authorFound`).
    * authors bucket: only under predicate hasAuthor/hasContributor AND an
      Authors TME id present; cmr_authors_ids gets the matching Authors id
      then the canonical id (appendIfNotExists order, :117-119).

    Emits one row per uuid with any person-type annotation; empty buckets
    are '' (the '|'-join of an empty array)."""
    persons = filtered_annotations(anns).filter(F.col("concept_type") == "PERSON")
    person_sfx, author_sfx = B64_TAXONOMY["PN"], B64_TAXONOMY["Authors"]
    author_id = F.try_element_at(
        F.filter(F.col("ann_ids"), lambda x: x.endswith(author_sfx)), F.lit(1)
    )
    persons = persons.withColumn("author_id", author_id).withColumn(
        "person_found",
        F.exists(F.col("ann_ids"), lambda x: x.endswith(person_sfx)),
    )
    people_rows = persons.filter(
        F.col("person_found") | F.col("author_id").isNull()
    )
    people = _first_seen_array(people_rows, F.col("pref_label"),
                               F.col("ann_pos"), "cmr_people")
    people_ids = _first_seen_array(
        people_rows.select("uuid", "ann_pos",
                           F.posexplode("ann_ids").alias("i", "id")),
        F.col("id"), F.col("ann_pos") * 100 + F.col("i"), "cmr_people_ids",
    )
    author_rows = persons.filter(
        F.col("predicate").isin(AUTHOR_PREDICATES) & F.col("author_id").isNotNull()
    )
    authors = _first_seen_array(author_rows, F.col("pref_label"),
                                F.col("ann_pos"), "cmr_authors")
    author_ids = _first_seen_array(
        author_rows.select(
            "uuid", "ann_pos",
            F.posexplode(F.array("author_id", "concept_id")).alias("i", "id"),
        ),
        F.col("id"), F.col("ann_pos") * 10 + F.col("i"), "cmr_authors_ids",
    )
    base = persons.select("uuid").distinct()
    out = base
    for part in (people, people_ids, authors, author_ids):
        out = out.join(part, "uuid", "left")
    return out.select(
        "uuid",
        *[F.coalesce(F.col(c), F.lit("")).alias(c)
          for c in ("cmr_people", "cmr_people_ids", "cmr_authors", "cmr_authors_ids")],
    ).orderBy("uuid")


def primary_theme(anns: DataFrame) -> DataFrame:
    """E5 first-wins primary theme (mapper.go:293-301): the FIRST `about`
    annotation of a theme-setting concept type (organisation/person/topic/
    location — mapper.go:100-148) sets cmr_primarytheme; its id comes from
    getCmrIDWithFallback with the branch's TME taxonomy (ON/PN/Topics/GL)."""
    tax_map = F.create_map(*[
        F.lit(x)
        for ct, tax in THEME_TAXONOMY_BY_TYPE.items()
        for x in (ct, B64_TAXONOMY[tax])
    ])
    sfx = tax_map[F.col("concept_type")]
    fallback_id = F.coalesce(
        F.try_element_at(
            F.filter(F.col("ann_ids"), lambda x: x.endswith(sfx)), F.lit(1)
        ),
        F.try_element_at("ann_ids", F.lit(2)),
        F.try_element_at("ann_ids", F.lit(1)),
    )
    w = Window.partitionBy("uuid").orderBy("ann_pos")
    return (
        filtered_annotations(anns)
        .filter(F.col("predicate") == "about")
        .filter(F.col("concept_type").isin(list(THEME_TAXONOMY_BY_TYPE)))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "uuid",
            F.col("pref_label").alias("cmr_primarytheme"),
            fallback_id.alias("cmr_primarytheme_id"),
        )
        .orderBy("uuid")
    )


def cmr_id_fallback(anns: DataFrame, taxonomy: str = "TOPIC") -> DataFrame:
    """C11 — getCmrIDWithFallback (mapper.go:303-324): per document, pick
    the annotation id whose value ends with base64(taxonomy); if none,
    fall back to ids[1], else ids[0]. Ids are taken in annotation order
    (the reference scans the slice in order).

    To exercise BOTH branches deterministically, ids are suffixed with the
    base64 marker for docs where the first annotation position is even —
    the marker plays the role of the TME taxonomy suffix."""
    import base64

    suffix = base64.b64encode(taxonomy.encode()).decode()
    ids = (
        anns.groupBy("uuid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ann_pos", "concept_id"))),
                lambda s: F.concat(
                    s["concept_id"],
                    F.when(s["ann_pos"] % 2 == 0, F.lit(suffix)).otherwise(F.lit("")),
                ),
            ).alias("ids")
        )
    )
    matched = F.filter(F.col("ids"), lambda x: x.endswith(suffix))
    picked = F.when(F.size(matched) > 0, F.try_element_at(matched, F.lit(1))).otherwise(
        F.coalesce(F.try_element_at("ids", F.lit(2)), F.try_element_at("ids", F.lit(1)))
    )
    return ids.select("uuid", picked.alias("cmr_id")).orderBy("uuid")


# every array bucket the assembled document carries ('|'-joined scalars)
ALL_BUCKET_FIELDS = (
    [c for pair in TAXONOMY_FIELDS.values() for c in pair]
    + ["cmr_people", "cmr_people_ids", "cmr_authors", "cmr_authors_ids",
       "cmr_sections", "cmr_sections_ids"]
)

_ENTRY_T = "array<struct<field:string,elem:string,ord:bigint>>"


def all_annotation_buckets(anns: DataFrame) -> DataFrame:
    """Every taxonomy/people/authors/sections bucket of the IndexModel in
    ONE pass over the annotations (populateAnnotationRelatedFields,
    mapper.go:92-148 + handleSectionMapping :272-284).

    Instead of running the per-bucket plans (9 aggregations + a 10-way
    join — 18+ shuffles), each annotation row emits its (field, elem, ord)
    contributions as one flattened struct array; the stream then takes
    min(ord) per (uuid, field, elem) [appendIfNotExists first-seen], joins
    elements back into ordered '|'-strings per (uuid, field), and pivots
    the fixed field list into one wide row per uuid. Three shuffles total
    regardless of how many buckets the schema grows.

    Semantics per branch are identical to taxonomy_buckets /
    author_buckets / section_accumulation (pinned by
    tests/test_index_model.py::test_one_pass_buckets_equal_per_bucket_plans):
    ids order key = ann_pos*100 + index-within-ann_ids, authors
    = ann_pos*10 + [authorID, canonicalID] (mapper.go:117-119), people
    rows author-only-suppressed (:111-114)."""
    person_sfx, author_sfx = B64_TAXONOMY["PN"], B64_TAXONOMY["Authors"]
    rows = (
        filtered_annotations(anns)
        .withColumn("author_id", F.try_element_at(
            F.filter(F.col("ann_ids"), lambda x: x.endswith(author_sfx)),
            F.lit(1)))
        .withColumn("person_found", F.exists(
            F.col("ann_ids"), lambda x: x.endswith(person_sfx)))
    )
    empty = F.array().cast(_ENTRY_T)
    pos = F.col("ann_pos").cast("long")

    def entry(field: str, elem, ord_col) -> F.Column:
        return F.struct(F.lit(field).alias("field"), elem.alias("elem"),
                        ord_col.cast("long").alias("ord"))

    def label_and_ids(cond, label_col: str, ids_col: str) -> list[F.Column]:
        lab = F.when(cond, F.array(entry(label_col, F.col("pref_label"), pos))) \
               .otherwise(empty)
        ids = F.when(cond, F.transform(
            F.col("ann_ids"),
            lambda x, i: entry(ids_col, x, pos * 100 + i.cast("long")),
        ).cast(_ENTRY_T)).otherwise(empty)
        return [lab, ids]

    branches: list[F.Column] = []
    for ct, (label_col, ids_col) in TAXONOMY_FIELDS.items():
        branches += label_and_ids(F.col("concept_type") == ct, label_col, ids_col)
    people_cond = (F.col("concept_type") == "PERSON") & (
        F.col("person_found") | F.col("author_id").isNull()
    )
    branches += label_and_ids(people_cond, "cmr_people", "cmr_people_ids")
    author_cond = (
        (F.col("concept_type") == "PERSON")
        & F.col("predicate").isin(AUTHOR_PREDICATES)
        & F.col("author_id").isNotNull()
    )
    branches.append(
        F.when(author_cond, F.array(
            entry("cmr_authors", F.col("pref_label"), pos),
            entry("cmr_authors_ids", F.col("author_id"), pos * 10),
            entry("cmr_authors_ids", F.col("concept_id"), pos * 10 + 1),
        )).otherwise(empty)
    )
    branches += label_and_ids(
        F.col("predicate").isin(SECTION_PREDICATES + [PRIMARY_SECTION_PREDICATE]),
        "cmr_sections", "cmr_sections_ids",
    )

    entries = (
        rows.select("uuid", F.explode(F.flatten(F.array(*branches))).alias("en"))
        .select("uuid", "en.field", "en.elem", "en.ord")
    )
    ordered_join = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("o"), F.col("elem").alias("e")))),
            lambda s: s["e"],
        ),
        "|",
    )
    per_field = (
        entries.groupBy("uuid", "field", "elem")
        .agg(F.min("ord").alias("o"))
        .groupBy("uuid", "field")
        .agg(ordered_join.alias("val"))
    )
    return per_field.groupBy("uuid").pivot("field", ALL_BUCKET_FIELDS).agg(
        F.first("val")
    )


def full_index_model(enriched: DataFrame, anns: DataFrame,
                     index_date: str = DEFAULT_INDEX_DATE) -> DataFrame:
    """The COMPLETE assembled IndexModel document (schema.go:3-88): the
    B1→B8 scalar projection (to_index_model) joined with every annotation
    bucket, the primary theme (first `about` wins, mapper.go:293-301) and
    the primary section (last isPrimaryClassifiedBy wins, :285-289) into
    one wide row per written document — what ToIndexModel (mapper.go:54-90)
    returns for one message, as one distributed plan for the whole corpus.

    Bucket arrays are '|'-joined scalars coalesced to '' when the document
    has no such annotations (Go's nil slice — the golden fixtures treat
    absent and empty alike); primary theme/section stay NULL (pointer
    fields). All four parts hash-partition on the document uuid, so the
    assembly joins co-shuffle on one key; the bucket side is ONE pivoted
    plan (see all_annotation_buckets), not a join per taxonomy."""
    base = to_index_model(enriched, index_date)
    buckets = all_annotation_buckets(anns).withColumnRenamed("uuid", "uid")
    theme = primary_theme(anns).withColumnRenamed("uuid", "uid")
    section = primary_section(anns).withColumnRenamed("uuid", "uid")
    out = (
        base.join(buckets, "uid", "left")
        .join(theme, "uid", "left")
        .join(section, "uid", "left")
    )
    return out.select(
        *[c for c in base.columns],
        *[F.coalesce(F.col(c), F.lit("")).alias(c) for c in ALL_BUCKET_FIELDS],
        "cmr_primarytheme", "cmr_primarytheme_id",
        "cmr_primarysection", "cmr_primarysection_id",
    )


def routing_counts(enriched: DataFrame) -> DataFrame:
    """Compact B1–B6 summary: documents per target collection."""
    return (
        to_index_model(enriched)
        .groupBy("collection")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("collection")
    )
