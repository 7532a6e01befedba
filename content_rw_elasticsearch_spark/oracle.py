"""ANSI-SQL (DuckDB) oracle builders.

Every oracle replays the ENGINE SEMANTICS independently in SQL: same
analyzer (lowercase + split on non-[a-z0-9] + drop empties), same BM25
formula (k1=1.2, b=0.75, Lucene idf), same rounding and tiebreaks. The
driver runs these side-by-side with the Spark plans and value-hashes the
results (CORRECTNESS_r{N}.json); tests also run them via duckdb directly.
"""

from __future__ import annotations

from . import BM25_B, BM25_K1
from .functions.analyzer import analyze_query_py
from .operators.bm25 import ROUND_DECIMALS

# documents.parquet → token arrays, shared CTE prefix
TOKENS_CTE = """
docs AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
dl AS (SELECT doc_id, len(toks)::DOUBLE AS doc_len FROM docs),
corpus AS (SELECT count(*)::DOUBLE AS n, avg(doc_len) AS avgdl FROM dl),
post AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
  GROUP BY doc_id, term
)
"""


def _sql_str_list(terms: list[str]) -> str:
    inner = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"[{inner}]"


def bm25_topk_sql(query: str, k: int = 10, mode: str = "AND",
                  not_terms: list[str] | None = None) -> str:
    """DuckDB SQL computing the same top-k as operators/bm25.bm25_topk."""
    terms = sorted(set(analyze_query_py(query, "simple")))
    if not terms:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE FALSE"
    having = f"HAVING count(*) = {len(terms)}" if mode.upper() == "AND" else ""
    not_clause = ""
    if not_terms:
        lst = _sql_str_list(sorted(set(not_terms)))
        not_clause = (
            "AND doc_id NOT IN (SELECT doc_id FROM post "
            f"WHERE term IN (SELECT unnest({lst})))"
        )
    return f"""
WITH {TOKENS_CTE},
qt AS (SELECT unnest({_sql_str_list(terms)}) AS term),
stats AS (
  SELECT term, count(*)::DOUBLE AS df FROM post
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
scored AS (
  SELECT p.doc_id,
         sum( ln(1 + (c.n - s.df + 0.5)/(s.df + 0.5))
              * p.tf*({BM25_K1}+1)
              / (p.tf + {BM25_K1}*(1-{BM25_B}+{BM25_B}*d.doc_len/c.avgdl)) ) AS raw
  FROM post p
  JOIN stats s USING (term)
  JOIN dl d USING (doc_id)
  CROSS JOIN corpus c
  GROUP BY p.doc_id
  {having}
)
SELECT doc_id, round(raw, {ROUND_DECIMALS}) AS score
FROM scored
WHERE TRUE {not_clause}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def term_postings_sql(term: str) -> str:
    t = term.replace("'", "''")
    return f"""
WITH {TOKENS_CTE}
SELECT doc_id, tf::BIGINT AS tf FROM post WHERE term = '{t}' ORDER BY doc_id
"""


def term_stats_sql(min_df: int = 1) -> str:
    return f"""
WITH {TOKENS_CTE}
SELECT term, count(*)::BIGINT AS df FROM post GROUP BY term
HAVING count(*) >= {min_df} ORDER BY term
"""


# ---------------------------------------------------------------------------
# IndexModel ETL oracles (plans/index_model.py counterparts)
# ---------------------------------------------------------------------------

ENRICHED_CTE = """
enriched AS (
  SELECT doc_id, text,
         md5(CAST(doc_id AS VARCHAR)) AS uuid,
         CASE WHEN doc_id % 53 = 0 THEN 'SYNTHETIC-REQ-MON' || CAST(doc_id AS VARCHAR)
              ELSE 'tid_' || CAST(doc_id AS VARCHAR) END AS tid,
         list_extract(['Article','Video','MediaResource','Audio','ContentPackage','Weird',''],
                      CAST(doc_id % 7 + 1 AS INT)) AS type,
         array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS title,
         CASE WHEN doc_id % 11 = 0 THEN '' ELSE '<p>' || text || '</p>' END AS body,
         CASE WHEN doc_id % 11 = 0
              THEN '<body><script type="x">junk</script>' || text
                   || '&nbsp;[caption id="a"]cap[/caption] embed1</body>'
              ELSE '' END AS body_xml,
         strftime(TIMESTAMP '2024-01-01 00:00:00' + to_minutes(doc_id),
                  '%Y-%m-%dT%H:%M:%S') || '.000Z' AS published_date,
         doc_id % 97 = 0 AS marked_deleted
  FROM documents
)
"""

ANN_CTE = ENRICHED_CTE.rstrip() + """,
ann AS (
  SELECT uuid, pos AS ann_pos,
         list_extract(string_split(text, ' '), pos * 3) AS concept_id,
         list_extract(['about','mentions','isClassifiedBy','hasDisplayTag','majorMentions'],
                      CAST((doc_id + pos) % 5 + 1 AS INT)) AS predicate,
         list_extract(['PERSON','ORGANISATION','LOCATION','TOPIC','GENRE','BRAND'],
                      CAST((doc_id * pos) % 6 + 1 AS INT)) AS concept_type
  FROM enriched, (SELECT unnest([1, 2, 3]) AS pos)
  WHERE list_extract(string_split(text, ' '), pos * 3) IS NOT NULL
    AND list_extract(string_split(text, ' '), pos * 3) <> ''
)
"""


def _html_chain_sql(expr: str) -> str:
    """Replay functions/textfns.html_text_chain in DuckDB SQL, from the
    SAME shared pattern constants (they cannot drift)."""
    from .functions.textfns import CHAIN_REGEX_STAGES, ENTITY_REPLACEMENTS

    stages = {n: (p, r) for n, p, r in CHAIN_REGEX_STAGES}

    def q(s: str) -> str:
        return s.replace("'", "''")

    e = expr
    for name in ("interactive_graphics", "pull_tags"):
        p, r = stages[name]
        e = f"regexp_replace({e}, '{q(p)}', '{q(r)}', 'g')"
    for old, new in ENTITY_REPLACEMENTS:
        e = f"replace({e}, '{q(old)}', '{q(new)}')"
    for name in ("script_tags", "all_tags", "embeds", "captions", "whitespace"):
        p, r = stages[name]
        e = f"regexp_replace({e}, '{q(p)}', '{q(r)}', 'g')"
    return f"trim({e})"


_INDEX_MODEL_BODY = """
SELECT uuid,
       CASE content_type WHEN 'article' THEN 'FTCom' WHEN 'video' THEN 'FTVideos'
            WHEN 'audio' THEN 'FTAudios' END AS collection,
       content_type, title,
       {clean_body} AS clean_body,
       'https://www.ft.com/content/' || uuid AS web_url,
       'http://api.ft.com/content/' || uuid AS api_url,
       published_date,
       '{index_date}' AS index_date
FROM (
  SELECT *,
         CASE type WHEN 'Article' THEN 'article' WHEN 'Video' THEN 'video'
              WHEN 'MediaResource' THEN 'video' WHEN 'Audio' THEN 'audio'
              WHEN 'ContentPackage' THEN 'article' ELSE '' END AS content_type,
         CASE WHEN body = '' THEN body_xml ELSE body END AS body2
  FROM enriched
  WHERE tid NOT LIKE '%SYNTHETIC-REQ-MON%'
    AND NOT marked_deleted
    AND type IN ('Article','Video','MediaResource','Audio','ContentPackage','')
)
WHERE uuid <> '' AND content_type <> ''
"""


def index_model_sql(index_date: str = "2026-01-01T00:00:00.000Z") -> str:
    body = _INDEX_MODEL_BODY.format(
        clean_body=_html_chain_sql("body2"), index_date=index_date
    )
    return f"WITH {ENRICHED_CTE} {body} ORDER BY uuid"


def delete_set_sql() -> str:
    return f"""
WITH {ENRICHED_CTE}
SELECT uuid FROM enriched
WHERE tid NOT LIKE '%SYNTHETIC-REQ-MON%' AND marked_deleted
ORDER BY uuid
"""


def routing_counts_sql() -> str:
    body = _INDEX_MODEL_BODY.format(clean_body="''", index_date="x")
    return f"""
WITH {ENRICHED_CTE}
SELECT collection, count(*)::BIGINT AS n FROM ({body}) GROUP BY collection ORDER BY collection
"""


def annotation_buckets_sql(concept_type: str, out_col: str) -> str:
    return f"""
WITH {ANN_CTE},
fp AS (
  SELECT uuid, concept_id, min(ann_pos) AS p
  FROM ann
  WHERE predicate NOT IN ('mentions','hasDisplayTag')
    AND concept_type = '{concept_type}'
  GROUP BY uuid, concept_id
)
SELECT uuid, list(concept_id ORDER BY p, concept_id) AS {out_col}
FROM fp GROUP BY uuid ORDER BY uuid
"""


def cmr_id_fallback_sql(taxonomy: str = "TOPIC") -> str:
    import base64

    suffix = base64.b64encode(taxonomy.encode()).decode()
    return f"""
WITH {ANN_CTE},
ids2 AS (
  SELECT uuid,
         list(concept_id || CASE WHEN ann_pos % 2 = 0 THEN '{suffix}' ELSE '' END
              ORDER BY ann_pos) AS ids
  FROM ann GROUP BY uuid
)
SELECT uuid,
       CASE WHEN len(list_filter(ids, x -> ends_with(x, '{suffix}'))) > 0
            THEN list_filter(ids, x -> ends_with(x, '{suffix}'))[1]
            ELSE coalesce(ids[2], ids[1]) END AS cmr_id
FROM ids2 ORDER BY uuid
"""


def primary_theme_sql() -> str:
    return f"""
WITH {ANN_CTE}
SELECT uuid, concept_id AS cmr_primarytheme
FROM ann
WHERE predicate = 'about'
QUALIFY row_number() OVER (PARTITION BY uuid ORDER BY ann_pos) = 1
ORDER BY uuid
"""


def phrase_match_sql(phrase: str) -> str:
    """Phrase occurrences per doc: tokens at consecutive positions.
    Parallel unnest (toks + 0-based position range) zips positionally in
    DuckDB, mirroring Spark's posexplode."""
    terms = analyze_query_py(phrase, "simple")
    conds = " AND ".join(
        f"p{i}.term = '{t.replace(chr(39), chr(39) * 2)}'" for i, t in enumerate(terms)
    )
    joins = "".join(
        f"\n  JOIN pos p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.pos = p0.pos + {i}"
        for i in range(1, len(terms))
    )
    return f"""
WITH {TOKENS_CTE},
pos AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(0, len(toks))) AS pos
  FROM docs
)
SELECT p0.doc_id, count(*)::BIGINT AS phrase_tf
FROM pos p0{joins}
WHERE {conds}
GROUP BY p0.doc_id
ORDER BY p0.doc_id
"""


def corpus_stats_sql() -> str:
    return f"""
WITH {TOKENS_CTE}
SELECT count(*)::BIGINT AS n_docs,
       round(avg(doc_len), {ROUND_DECIMALS}) AS avgdl
FROM dl
"""
