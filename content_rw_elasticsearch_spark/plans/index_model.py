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

from ..functions.textfns import api_url, html_text_chain, web_url

# message_handler.go:162-171 isAllowedType — note "" IS allowed there
ALLOWED_TYPES = ["Article", "Video", "MediaResource", "Audio", "ContentPackage", ""]
# message_handler.go:19 + :79-82
SYNTHETIC_PREFIX = "SYNTHETIC-REQ-MON"
# configs/app.yml:44-61 contentMetadata → collection routing (B6)
CONTENT_TYPE_BY_TYPE = {
    "Article": "article", "Video": "video", "MediaResource": "video",
    "Audio": "audio", "ContentPackage": "article", "": "",
}
COLLECTION_BY_CONTENT_TYPE = {"article": "FTCom", "video": "FTVideos", "audio": "FTAudios"}
# configs/app.yml:10-20 predicates to skip (B7, mapper.go:150-164)
SKIP_PREDICATES = ["mentions", "hasDisplayTag"]
# deterministic injected index timestamp (C12 — mapper.go:172 uses
# wall-clock; tests there null it out. We inject instead: reproducible.)
DEFAULT_INDEX_DATE = "2026-01-01T00:00:00.000Z"

_TYPES7 = ["Article", "Video", "MediaResource", "Audio", "ContentPackage", "Weird", ""]
_PREDICATES5 = ["about", "mentions", "isClassifiedBy", "hasDisplayTag", "majorMentions"]
_CONCEPT_TYPES6 = ["PERSON", "ORGANISATION", "LOCATION", "TOPIC", "GENRE", "BRAND"]


def enriched_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → synthetic EnrichedContent (schema.go:90-120
    analog): uuid, tid, type, title, body, body_xml, published_date,
    marked_deleted. Deterministic pure functions of doc_id/text."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    doc_id = F.col("doc_id")
    text = F.col("text")
    typ = F.try_element_at(
        F.array(*[F.lit(t) for t in _TYPES7]), (doc_id % 7 + 1).cast("int")
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
        F.when(doc_id % 11 == 0, F.lit("")).otherwise(
            F.concat(F.lit("<p>"), text, F.lit("</p>"))
        ).alias("body"),
        F.when(doc_id % 11 == 0, F.concat(
            F.lit('<body><script type="x">junk</script>'), text,
            F.lit('&nbsp;[caption id="a"]cap[/caption] embed1</body>'),
        )).otherwise(F.lit("")).alias("body_xml"),
        F.concat(
            F.date_format(
                F.timestamp_add("MINUTE", doc_id.cast("int"),
                                F.lit("2024-01-01 00:00:00").cast("timestamp")),
                "yyyy-MM-dd'T'HH:mm:ss",
            ),
            F.lit(".000Z"),
        ).alias("published_date"),
        (doc_id % 97 == 0).alias("marked_deleted"),
    )


def to_index_model(enriched: DataFrame,
                   index_date: str = DEFAULT_INDEX_DATE) -> DataFrame:
    """B1→B8 in reference order (message_handler.go:69-135, mapper.go:170-263)."""
    ct_map = F.create_map(*[F.lit(x) for kv in CONTENT_TYPE_BY_TYPE.items() for x in kv])
    coll_map = F.create_map(*[F.lit(x) for kv in COLLECTION_BY_CONTENT_TYPE.items() for x in kv])
    return (
        enriched
        # B1 synthetic-tid gate (message_handler.go:79-82 —
        # strings.Contains, not a prefix match)
        .filter(~F.col("tid").contains(SYNTHETIC_PREFIX))
        # delete short-circuit happens BEFORE mapping (message_handler.go:112-120)
        .filter(~F.col("marked_deleted"))
        # B2 bodyXML fallback (message_handler.go:91-94)
        .withColumn("body", F.coalesce(F.nullif("body", F.lit("")), F.col("body_xml")))
        # B3 allowed-type gate (message_handler.go:96-99, isAllowedType :162-171)
        .filter(F.col("type").isin(ALLOWED_TYPES))
        # B4 content-type resolution (readContentType :137-160)
        .withColumn("content_type", ct_map[F.col("type")])
        # B5 no-content gate (message_handler.go:122-125)
        .filter((F.col("uuid") != "") & (F.col("content_type") != ""))
        # B6 collection routing (message_handler.go:111 + app.yml:44-61)
        .withColumn("collection", coll_map[F.col("content_type")])
        # B8 projection (mapper.go:170-263) + C-chain on body (mapper.go:202-211)
        .select(
            "uuid", "collection", "content_type", "title",
            html_text_chain("body").alias("clean_body"),
            web_url(F.col("uuid")).alias("web_url"),
            api_url(F.col("uuid")).alias("api_url"),
            "published_date",
            F.lit(index_date).alias("index_date"),
        )
    )


def delete_set(enriched: DataFrame) -> DataFrame:
    """A5 delete path (message_handler.go:112-120, es/service.go:130-138):
    uuids to delete, post synthetic gate."""
    return (
        enriched.filter(~F.col("tid").contains(SYNTHETIC_PREFIX))
        .filter(F.col("marked_deleted"))
        .select("uuid")
        .orderBy("uuid")
    )


def annotations_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic Annotations (schema.go:132-145 analog): three positional
    annotation slots per document, derived from the text tokens."""
    base = enriched_from_documents(spark, sf_dir).select("doc_id", "uuid", "text")
    parts = []
    for pos in (1, 2, 3):
        parts.append(
            base.select(
                "uuid",
                F.lit(pos).alias("ann_pos"),
                F.try_element_at(F.split(F.col("text"), " "), F.lit(pos * 3)).alias("concept_id"),
                F.try_element_at(
                    F.array(*[F.lit(p) for p in _PREDICATES5]),
                    ((F.col("doc_id") + pos) % 5 + 1).cast("int"),
                ).alias("predicate"),
                F.try_element_at(
                    F.array(*[F.lit(t) for t in _CONCEPT_TYPES6]),
                    ((F.col("doc_id") * pos) % 6 + 1).cast("int"),
                ).alias("concept_type"),
            )
        )
    anns = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return anns.filter(F.col("concept_id").isNotNull() & (F.col("concept_id") != ""))


def filtered_annotations(anns: DataFrame) -> DataFrame:
    """B7 predicate filter (mapper.go:150-164; predicates app.yml:10-20)."""
    return anns.filter(~F.col("predicate").isin(SKIP_PREDICATES))


def annotation_buckets(anns: DataFrame, concept_type: str, out_col: str) -> DataFrame:
    """E1/E2/E3 — order-preserving deduped fan-in of concept ids into a
    taxonomy array (appendIfNotExists, mapper.go:326-333; per-type routing
    mapper.go:92-148). Order = first annotation position (the golden files
    pin element order: test/testdata/exampleElasticModel.json:49-76).

    Implementation: min(ann_pos) per (uuid, concept) — dedupe — then
    sort_array over (pos, id) structs → transform to ids. Deterministic
    under any partitioning; no collect_list-order dependence."""
    first_pos = (
        filtered_annotations(anns)
        .filter(F.col("concept_type") == concept_type)
        .groupBy("uuid", "concept_id")
        .agg(F.min("ann_pos").alias("p"))
    )
    return (
        first_pos.groupBy("uuid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "concept_id"))),
                lambda s: s["concept_id"],
            ).alias(out_col)
        )
        .orderBy("uuid")
    )


def primary_theme(anns: DataFrame) -> DataFrame:
    """E5 first-wins primary theme (mapper.go:293-301): the FIRST `about`
    annotation in metadata order sets cmr_primarytheme."""
    w = Window.partitionBy("uuid").orderBy("ann_pos")
    return (
        filtered_annotations(anns)
        .filter(F.col("predicate") == "about")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("uuid", F.col("concept_id").alias("cmr_primarytheme"))
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


def routing_counts(enriched: DataFrame) -> DataFrame:
    """Compact B1–B6 summary: documents per target collection."""
    return (
        to_index_model(enriched)
        .groupBy("collection")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("collection")
    )
