"""D2 — concordance grouping/alias model as a declarative plan.

Reference: pkg/concept/concordance.go:97-119 (TransformToConceptModel).
For an ordered concordances response (rows of concept id + identifier):

* every concept id gets a model entry;
* identifiers under the FT-TME authority accumulate into the concept's
  ``TmeIDs`` in response order;
* identifiers under the UPP authority create an ALIAS entry keyed by
  ``ThingURIPrefix + identifierValue`` — first alias wins, ids that are
  already concept keys are not aliased, and the alias SNAPSHOTS the TME
  ids accumulated so far (Go copies the struct at alias time, so TME rows
  AFTER the UPP row do not reach the alias).

The mapper consumes this as: annIDs = [canonical id] + TmeIDs
(pkg/mapper/mapper.go:74-84); unmatched annotation ids are skipped with a
warning (mapper.go:76-79 — the D1 anti-join warn set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TME_AUTHORITY = "http://api.ft.com/system/FT-TME"
UPP_AUTHORITY = "http://api.ft.com/system/UPP"
THING_URI_PREFIX = "http://api.ft.com/things/"


def concordance_model(conc: DataFrame, joined: bool = False) -> DataFrame:
    """(pos, concept_id, authority, identifier_value) → (concept_id,
    tme_ids). ``pos`` is the response row order (the snapshot semantics
    above are order-defined). ``joined=True`` emits tme_ids as a
    '|'-joined scalar for the driver canonicalizer.

    Documented divergence: if an alias id ALSO appears as a concept id in
    later rows, Go merges TME appends into the previously-created alias
    entry; this plan keeps the direct entry only (the alias is dropped
    because the id is a concept key). Real concordance responses never
    alias an id that is itself a concorded concept of the same response;
    the row-at-a-time replica below keeps Go's exact behavior and the
    fixture test pins both against testConcordanceResponse1.json."""
    tme = conc.filter(F.col("authority") == TME_AUTHORITY).select(
        "concept_id", "pos", "identifier_value"
    )
    base_ids = conc.select("concept_id").distinct()
    ordered_list = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "identifier_value"))),
        lambda s: s["identifier_value"],
    )
    tme_agg = tme.groupBy("concept_id").agg(ordered_list.alias("tme_ids"))
    base = base_ids.join(tme_agg, "concept_id", "left").select(
        "concept_id",
        F.coalesce("tme_ids", F.array().cast("array<string>")).alias("tme_ids"),
    )

    w = Window.partitionBy("alias_id").orderBy("pos")
    aliases = (
        conc.filter(F.col("authority") == UPP_AUTHORITY)
        .withColumn(
            "alias_id", F.concat(F.lit(THING_URI_PREFIX), F.col("identifier_value"))
        )
        # ids that are already concept keys are never aliased
        .join(
            base_ids.withColumnRenamed("concept_id", "alias_id"),
            "alias_id", "left_anti",
        )
        # first alias for an id wins
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("alias_id", F.col("concept_id").alias("src"),
                F.col("pos").alias("alias_pos"))
    )
    # snapshot: only TME rows of the source concept SEEN BEFORE the alias row
    alias_tme = (
        aliases.join(
            tme,
            (aliases["src"] == tme["concept_id"])
            & (tme["pos"] < aliases["alias_pos"]),
            "left",
        )
        .groupBy("alias_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("identifier_value").isNotNull(),
                            F.struct("pos", "identifier_value"),
                        )
                    )
                ),
                lambda s: s["identifier_value"],
            ).alias("tme_ids")
        )
        .select(F.col("alias_id").alias("concept_id"), "tme_ids")
    )
    out = base.unionByName(alias_tme)
    col = F.array_join("tme_ids", "|") if joined else F.col("tme_ids")
    return out.select("concept_id", col.alias("tme_ids")).orderBy("concept_id")


def concordances_from_documents(spark, sf_dir: str) -> DataFrame:
    """Deterministic synthetic concordances response derived from
    documents.parquet (one concept per doc, five ordered slots). Exercises
    every D2 branch: TME accumulation in response order, non-TME
    authorities ignored, a UPP self-identifier (never aliased — the id is
    a concept key), a UPP alias whose snapshot EXCLUDES the TME id that
    arrives in a later row, and docs with no TME ids at all."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    doc_id = F.col("doc_id")
    cid = F.concat(F.lit(THING_URI_PREFIX), F.md5(doc_id.cast("string")))
    slots = [
        # (slot, row-filter, authority, identifier_value)
        (0, None, UPP_AUTHORITY, F.md5(doc_id.cast("string"))),
        (1, doc_id % 2 == 0, TME_AUTHORITY,
         F.concat(F.lit("tme-"), doc_id.cast("string"), F.lit("-T04="))),
        (2, doc_id % 3 == 0, "http://api.ft.com/system/SMARTLOGIC",
         F.concat(F.lit("sl-"), doc_id.cast("string"))),
        (3, doc_id % 3 == 0, UPP_AUTHORITY,
         F.md5(F.concat(doc_id.cast("string"), F.lit("alias")))),
        # a TME id AFTER the alias row: reaches the concept, NOT the alias
        (4, doc_id % 5 == 0, TME_AUTHORITY,
         F.concat(F.lit("late-"), doc_id.cast("string"))),
    ]
    parts = []
    for j, cond, auth, val in slots:
        part = d.select(
            (doc_id * 5 + j).alias("pos"),
            cid.alias("concept_id"),
            F.lit(auth).alias("authority"),
            val.alias("identifier_value"),
        )
        if cond is not None:
            part = part.filter(cond)
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def concordance_model_sql() -> str:
    """DuckDB replay of concordances_from_documents → concordance_model
    (joined form)."""
    return f"""
WITH conc AS (
  SELECT doc_id*5 + 0 AS pos,
         'http://api.ft.com/things/' || md5(CAST(doc_id AS VARCHAR)) AS concept_id,
         '{UPP_AUTHORITY}' AS authority,
         md5(CAST(doc_id AS VARCHAR)) AS val
  FROM documents
  UNION ALL
  SELECT doc_id*5 + 1,
         'http://api.ft.com/things/' || md5(CAST(doc_id AS VARCHAR)),
         '{TME_AUTHORITY}', 'tme-' || CAST(doc_id AS VARCHAR) || '-T04='
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id*5 + 2,
         'http://api.ft.com/things/' || md5(CAST(doc_id AS VARCHAR)),
         'http://api.ft.com/system/SMARTLOGIC', 'sl-' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id*5 + 3,
         'http://api.ft.com/things/' || md5(CAST(doc_id AS VARCHAR)),
         '{UPP_AUTHORITY}', md5(CAST(doc_id AS VARCHAR) || 'alias')
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id*5 + 4,
         'http://api.ft.com/things/' || md5(CAST(doc_id AS VARCHAR)),
         '{TME_AUTHORITY}', 'late-' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 5 = 0
),
tme AS (SELECT * FROM conc WHERE authority = '{TME_AUTHORITY}'),
base AS (SELECT DISTINCT concept_id FROM conc),
base_model AS (
  SELECT b.concept_id,
         coalesce((SELECT array_to_string(list(val ORDER BY pos), '|')
                   FROM tme WHERE tme.concept_id = b.concept_id), '') AS tme_ids
  FROM base b
),
alias0 AS (
  SELECT 'http://api.ft.com/things/' || val AS alias_id,
         concept_id AS src, pos
  FROM conc
  WHERE authority = '{UPP_AUTHORITY}'
    AND 'http://api.ft.com/things/' || val NOT IN (SELECT concept_id FROM base)
),
alias AS (
  SELECT * FROM alias0
  QUALIFY row_number() OVER (PARTITION BY alias_id ORDER BY pos) = 1
),
alias_model AS (
  SELECT a.alias_id AS concept_id,
         coalesce((SELECT array_to_string(list(val ORDER BY pos), '|')
                   FROM tme WHERE tme.concept_id = a.src AND tme.pos < a.pos),
                  '') AS tme_ids
  FROM alias a
)
SELECT concept_id, tme_ids FROM base_model
UNION ALL
SELECT concept_id, tme_ids FROM alias_model
ORDER BY concept_id
"""


def concordance_model_py(rows: list[tuple[str, str, str]]) -> dict[str, list[str]]:
    """Independent row-at-a-time replica of TransformToConceptModel
    (concordance.go:97-119) used as the test oracle: rows are
    (concept_id, authority, identifier_value) in response order; Go's
    struct-copy alias snapshot is reproduced with an explicit list copy."""
    model: dict[str, list[str]] = {}
    for concept_id, authority, value in rows:
        model.setdefault(concept_id, [])
        if authority == TME_AUTHORITY:
            model[concept_id] = model[concept_id] + [value]
        if authority == UPP_AUTHORITY:
            alias = THING_URI_PREFIX + value
            if alias not in model:
                model[alias] = list(model[concept_id])
    return model
