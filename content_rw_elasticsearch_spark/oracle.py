"""ANSI-SQL (DuckDB) oracle builders.

Every oracle replays the ENGINE SEMANTICS independently in SQL: same
analyzer (lowercase + split on non-[a-z0-9] + drop empties), same BM25
formula (k1=1.2, b=0.75, Lucene idf), same rounding and tiebreaks. The
driver runs these side-by-side with the Spark plans and value-hashes the
results (CORRECTNESS_r{N}.json); tests also run them via duckdb directly.
"""

from __future__ import annotations

from . import BM25_B, BM25_K1
from .functions.analyzer import analyze_code_py, analyze_query_py
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
                  not_terms: list[str] | None = None,
                  min_should_match: int | None = None,
                  filter_where: str | None = None) -> str:
    """DuckDB SQL computing the same top-k as operators/bm25.bm25_topk.
    ``filter_where`` is the ES bool.filter context (SegmentIndex.search
    filter_ids): a predicate over the documents table restricting the
    match set BEFORE the top-k cut, with no score contribution."""
    terms = sorted(set(analyze_query_py(query, "simple")))
    if not terms:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE FALSE"
    if mode.upper() == "AND":
        having = f"HAVING count(*) = {len(terms)}"
    elif min_should_match is not None and min_should_match > 1:
        having = f"HAVING count(*) >= {int(min_should_match)}"
    else:
        having = ""
    not_clause = ""
    if not_terms:
        lst = _sql_str_list(sorted(set(not_terms)))
        not_clause = (
            "AND doc_id NOT IN (SELECT doc_id FROM post "
            f"WHERE term IN (SELECT unnest({lst})))"
        )
    if filter_where:
        not_clause += (
            " AND doc_id IN (SELECT doc_id FROM documents "
            f"WHERE {filter_where})"
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


def bm25_code_topk_sql(query: str, k: int = 10, mode: str = "AND",
                       sf_dir: str | None = None) -> str:
    """Golden-table oracle for the code-analyzer BM25 path: identifier
    splitting + per-token folding are not expressible in the driver's SQL
    subset, so the oracle is an independent pure-Python BM25 (the same
    pinned analyze_code_py semantics + the engine's Lucene-idf formula)
    over the driver's correctness-scale documents, materialized as a
    VALUES literal. Reads sf0.01 unless sf_dir/SPARK_GRAFT_ORACLE_SF
    overrides."""
    import math
    import os
    from collections import Counter

    import duckdb

    sf = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
    ).fetchall()
    toks = {int(d): analyze_code_py(t or "") for d, t in rows}
    n = len(toks)
    avgdl = (sum(len(v) for v in toks.values()) / n) if n else 0.0
    terms = sorted(set(analyze_code_py(query)))
    counters = {d: Counter(v) for d, v in toks.items()}
    dfreq = {t: sum(1 for c in counters.values() if c[t] > 0) for t in terms}
    scored = []
    for d, c in counters.items():
        present = [t for t in terms if c[t] > 0]
        if not present or (mode.upper() == "AND" and len(present) != len(terms)):
            continue
        dl = float(len(toks[d]))
        s = 0.0
        for t in present:
            tf, dft = float(c[t]), float(dfreq[t])
            idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
            s += idf * tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
            )
        scored.append((d, round(s, ROUND_DECIMALS)))
    top = sorted(scored, key=lambda x: (-x[1], x[0]))[:k]
    if not top:
        return ("SELECT CAST(NULL AS BIGINT) AS doc_id, "
                "CAST(NULL AS DOUBLE) AS score WHERE FALSE")
    vals = ", ".join(f"({d}, {s!r})" for d, s in top)
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(score AS DOUBLE) AS score
FROM (VALUES {vals}) AS t(doc_id, score)
ORDER BY score DESC, doc_id ASC
"""


def term_postings_sql(term: str) -> str:
    t = term.replace("'", "''")
    return f"""
WITH {TOKENS_CTE}
SELECT doc_id, tf::BIGINT AS tf FROM post WHERE term = '{t}' ORDER BY doc_id
"""


def prefix_postings_sql(prefix: str) -> str:
    """Oracle for SegmentIndex.prefix_postings: postings of every term
    starting with ``prefix`` (the ES prefix query's expansion), from a
    full re-tokenize. ``prefix`` must not contain LIKE wildcards."""
    p = prefix.replace("'", "''")
    assert "%" not in p and "_" not in p, "prefix may not contain wildcards"
    return f"""
WITH {TOKENS_CTE}
SELECT term, doc_id, tf::BIGINT AS tf FROM post
WHERE term LIKE '{p}%' ORDER BY term, doc_id
"""


def fuzzy_postings_sql(term: str, max_edits: int = 1) -> str:
    """Oracle for SegmentIndex.fuzzy_postings: postings of every term
    within ``max_edits`` levenshtein edits, from a full re-tokenize.
    No max_expansions cap here — gated configs keep the true expansion
    set below the engine's cap so both sides agree."""
    t = term.replace("'", "''")
    return f"""
WITH {TOKENS_CTE}
SELECT term, doc_id, tf::BIGINT AS tf FROM post
WHERE levenshtein(term, '{t}') <= {int(max_edits)}
ORDER BY term, doc_id
"""


def bool_topk_sql(must: str = "", should: str = "", must_not: str = "",
                  k: int = 10, min_should_match: int | None = None) -> str:
    """Oracle for operators/boolquery: ES bool-query semantics — all
    must terms, no must_not term, >= msm should terms (msm defaults to
    0 with must clauses, else 1); score = BM25 sum over matched
    must + should terms only."""
    m = sorted(set(analyze_query_py(must, "simple")))
    sh = sorted(set(analyze_query_py(should, "simple")) - set(m))
    n = sorted(set(analyze_query_py(must_not, "simple")) - set(m) - set(sh))
    if not m and not sh:
        return ("SELECT CAST(NULL AS BIGINT) AS doc_id, "
                "CAST(NULL AS DOUBLE) AS score WHERE FALSE")
    msm = (0 if m else 1) if min_should_match is None else int(min_should_match)
    all_terms = sorted(set(m) | set(sh) | set(n))
    score_set = _sql_str_list(sorted(set(m) | set(sh)))
    never = "['\x01none']"  # matches no analyzed term
    m_set = _sql_str_list(m) if m else never
    s_set = _sql_str_list(sh) if sh else never
    n_set = _sql_str_list(n) if n else never
    return f"""
WITH {TOKENS_CTE},
qt AS (SELECT unnest({_sql_str_list(all_terms)}) AS term),
stats AS (
  SELECT term, count(*)::DOUBLE AS df FROM post
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
scored AS (
  SELECT p.doc_id,
         sum(CASE WHEN p.term IN (SELECT unnest({score_set}))
             THEN ln(1 + (c.n - s.df + 0.5)/(s.df + 0.5))
                  * p.tf*({BM25_K1}+1)
                  / (p.tf + {BM25_K1}*(1-{BM25_B}+{BM25_B}*d.doc_len/c.avgdl))
             ELSE 0.0 END) AS raw,
         count(CASE WHEN p.term IN (SELECT unnest({m_set})) THEN 1 END) AS n_must,
         count(CASE WHEN p.term IN (SELECT unnest({s_set})) THEN 1 END) AS n_should,
         count(CASE WHEN p.term IN (SELECT unnest({n_set})) THEN 1 END) AS n_not
  FROM post p
  JOIN stats s ON s.term = p.term
  JOIN dl d USING (doc_id)
  CROSS JOIN corpus c
  WHERE p.term IN (SELECT term FROM qt)
  GROUP BY p.doc_id
  HAVING n_must = {len(m)} AND n_not = 0 AND n_should >= {msm}
)
SELECT doc_id, round(raw, {ROUND_DECIMALS}) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def regexp_postings_sql(pattern: str) -> str:
    """Oracle for SegmentIndex.regexp_postings: postings of every term
    FULLY matching ``pattern`` (ES regexp queries are anchored), from a
    full re-tokenize. No max_expansions cap — gated configs keep the
    true expansion set below the engine's cap so both sides agree."""
    pq = pattern.replace("'", "''")
    return f"""
WITH {TOKENS_CTE}
SELECT term, doc_id, tf::BIGINT AS tf FROM post
WHERE regexp_full_match(term, '{pq}')
ORDER BY term, doc_id
"""


def search_facets_sql(query: str, facet_cols: list[str],
                      mode: str = "AND") -> str:
    """Oracle for SegmentIndex.search_facets: bucket counts of the facet
    columns over the ENTIRE match set (AND = all terms, OR = any)."""
    terms = sorted(set(analyze_query_py(query, "simple")))
    lst = _sql_str_list(terms)
    need = len(terms) if mode.upper() == "AND" else 1
    unions = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS facet, CAST(d.{c} AS VARCHAR) AS value, "
        f"count(*)::BIGINT AS n FROM ids JOIN documents d USING (doc_id) "
        f"GROUP BY d.{c}"
        for c in facet_cols
    )
    return f"""
WITH {TOKENS_CTE},
ids AS (
  SELECT doc_id FROM post
  WHERE term IN (SELECT unnest({lst}))
  GROUP BY doc_id
  HAVING count(*) >= {need}
)
SELECT facet, value, n FROM ({unions})
ORDER BY facet ASC, n DESC, value ASC
"""


def _match_ids_cte(query: str, mode: str) -> str:
    """Shared match-set CTE body (AND = all terms, OR = any) for the
    aggregation oracles — mirrors SegmentIndex.match_ids."""
    terms = sorted(set(analyze_query_py(query, "simple")))
    lst = _sql_str_list(terms)
    need = len(terms) if mode.upper() == "AND" else 1
    return (f"SELECT doc_id FROM post WHERE term IN (SELECT unnest({lst})) "
            f"GROUP BY doc_id HAVING count(*) >= {need}")


def search_histogram_sql(query: str, field: str, interval: float,
                         mode: str = "AND") -> str:
    """Oracle for SegmentIndex.search_histogram: fixed-interval buckets
    of ``field`` over the entire match set, key = floor(v/iv)*iv."""
    iv = float(interval)
    return f"""
WITH {TOKENS_CTE},
ids AS ({_match_ids_cte(query, mode)})
SELECT floor(d.{field}::DOUBLE / {iv!r}) * {iv!r} AS bucket,
       count(*)::BIGINT AS n
FROM ids JOIN documents d USING (doc_id)
WHERE d.{field} IS NOT NULL
GROUP BY bucket
ORDER BY bucket
"""


def search_stats_sql(query: str, field: str, mode: str = "AND") -> str:
    """Oracle for SegmentIndex.search_stats: one (count,min,max,sum,avg)
    row over the match set, sum/avg rounded like the engine."""
    return f"""
WITH {TOKENS_CTE},
ids AS ({_match_ids_cte(query, mode)})
SELECT count(*)::BIGINT AS count,
       min(d.{field}::DOUBLE) AS min,
       max(d.{field}::DOUBLE) AS max,
       round(sum(d.{field}::DOUBLE), {ROUND_DECIMALS}) AS sum,
       round(avg(d.{field}::DOUBLE), {ROUND_DECIMALS}) AS avg
FROM ids JOIN documents d USING (doc_id)
WHERE d.{field} IS NOT NULL
"""


def search_cardinality_sql(query: str, field: str,
                           mode: str = "AND") -> str:
    """Oracle for SegmentIndex.search_cardinality(exact=True): true
    distinct count of ``field`` over the match set (the engine's default
    HLL++ sketch is tested against this within its rsd bound)."""
    return f"""
WITH {TOKENS_CTE},
ids AS ({_match_ids_cte(query, mode)})
SELECT count(DISTINCT d.{field})::BIGINT AS value
FROM ids JOIN documents d USING (doc_id)
"""


def _scored_set_sql(query: str, mode: str) -> str:
    """Full rounded (doc_id, score) BM25 match set as a derived-table
    body — the SQL twin of SegmentIndex._scored_match_set."""
    terms = sorted(set(analyze_query_py(query, "simple")))
    having = f"HAVING count(*) = {len(terms)}" if mode.upper() == "AND" \
        else ""
    lst = _sql_str_list(terms)
    return f"""
  SELECT p.doc_id,
         round(sum( ln(1 + (c.n - s.df + 0.5)/(s.df + 0.5))
              * p.tf*({BM25_K1}+1)
              / (p.tf + {BM25_K1}*(1-{BM25_B}+{BM25_B}*d.doc_len/c.avgdl)) ),
              {ROUND_DECIMALS}) AS score
  FROM post p
  JOIN (SELECT term, count(*)::DOUBLE AS df FROM post
        WHERE term IN (SELECT unnest({lst})) GROUP BY term) s USING (term)
  JOIN dl d USING (doc_id)
  CROSS JOIN corpus c
  GROUP BY p.doc_id
  {having}"""


def constant_score_sql(query: str, boost: float = 1.0, k: int = 10,
                       mode: str = "AND") -> str:
    """Oracle for SegmentIndex.constant_score: every match scores
    exactly the boost; top-k = first k doc_ids."""
    return f"""
WITH {TOKENS_CTE},
ids AS ({_match_ids_cte(query, mode)})
SELECT doc_id, round({float(boost)!r}, {ROUND_DECIMALS}) AS score
FROM ids ORDER BY doc_id LIMIT {k}
"""


def boosting_sql(positive: str, negative: str,
                 negative_boost: float = 0.5, k: int = 10,
                 mode: str = "AND") -> str:
    """Oracle for SegmentIndex.boosting: positive BM25, demoted by
    negative_boost where the doc also matches the negative query (OR)."""
    nb = float(negative_boost)
    return f"""
WITH {TOKENS_CTE},
pos AS ({_scored_set_sql(positive, mode)}),
neg AS ({_match_ids_cte(negative, "OR")})
SELECT p.doc_id,
       round(CASE WHEN p.doc_id IN (SELECT doc_id FROM neg)
                  THEN p.score * {nb!r} ELSE p.score END,
             {ROUND_DECIMALS}) AS score
FROM pos p
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def dis_max_sql(queries: list[str], tie_breaker: float = 0.0,
                k: int = 10) -> str:
    """Oracle for SegmentIndex.dis_max: best subquery score +
    tie_breaker * (sum - best), each subquery an OR match."""
    tb = float(tie_breaker)
    unions = "\nUNION ALL\n".join(
        f"SELECT * FROM ({_scored_set_sql(q, 'OR')}\n)" for q in queries
    )
    return f"""
WITH {TOKENS_CTE},
subs AS ({unions})
SELECT doc_id,
       round(max(score) + {tb!r} * (sum(score) - max(score)),
             {ROUND_DECIMALS}) AS score
FROM subs
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def has_child_sql(child_query: str, relations: list[tuple[int, int]],
                  k: int = 10, score_mode: str = "max",
                  mode: str = "AND") -> str:
    """Oracle for SegmentIndex.has_child: parent ids whose children match,
    scored by folding the children's BM25. ``relations`` rows:
    (child_doc_id, parent_id) literals."""
    vals = ", ".join(f"({int(c)}, {int(p)})" for c, p in relations)
    agg = {"max": "max(s.score)", "sum": "sum(s.score)",
           "avg": "avg(s.score)", "none": "0.0"}[score_mode]
    return f"""
WITH {TOKENS_CTE},
scored AS ({_scored_set_sql(child_query, mode)}),
rel AS (SELECT * FROM (VALUES {vals}) AS r(doc_id, parent_id))
SELECT r.parent_id::BIGINT AS parent_id,
       round({agg}, {ROUND_DECIMALS}) AS score
FROM scored s JOIN rel r USING (doc_id)
GROUP BY r.parent_id
ORDER BY score DESC, parent_id ASC
LIMIT {k}
"""


def has_parent_sql(parent_query: str, relations: list[tuple[int, int]],
                   k: int = 10, score: bool = False,
                   mode: str = "AND") -> str:
    """Oracle for SegmentIndex.has_parent: child ids whose parent
    matches; score propagates the parent's BM25 when requested."""
    vals = ", ".join(f"({int(c)}, {int(p)})" for c, p in relations)
    sc = "round(s.score, %d)" % ROUND_DECIMALS if score else "0.0"
    return f"""
WITH {TOKENS_CTE},
scored AS ({_scored_set_sql(parent_query, mode)}),
rel AS (SELECT * FROM (VALUES {vals}) AS r(child_id, doc_id))
SELECT r.child_id::BIGINT AS doc_id, {sc} AS score
FROM scored s JOIN rel r USING (doc_id)
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def significant_terms_sql(query: str, k: int = 10, mode: str = "AND",
                          min_doc_count: int = 1) -> str:
    """Oracle for SegmentIndex.significant_terms: JLH-scored terms of
    the match set vs the corpus background, query terms excluded."""
    qterms = sorted(set(analyze_query_py(query, "simple")))
    lst = _sql_str_list(qterms)
    return f"""
WITH {TOKENS_CTE},
ids AS ({_match_ids_cte(query, mode)}),
nfg AS (SELECT count(*)::DOUBLE AS n FROM ids),
fg AS (
  SELECT term, count(*)::BIGINT AS fg FROM post
  WHERE doc_id IN (SELECT doc_id FROM ids) GROUP BY term
),
bg AS (SELECT term, count(*)::BIGINT AS bg FROM post GROUP BY term)
SELECT f.term, f.fg, b.bg,
       round( (f.fg / nfg.n - b.bg / c.n)
              * (f.fg / nfg.n) / (b.bg / c.n), {ROUND_DECIMALS}) AS score
FROM fg f
JOIN bg b USING (term)
CROSS JOIN nfg
CROSS JOIN corpus c
WHERE f.term NOT IN (SELECT unnest({lst})) AND f.fg >= {int(min_doc_count)}
ORDER BY score DESC, f.term ASC
LIMIT {k}
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

from .plans.index_model import (  # noqa: E402  (shared constants — no drift)
    ALLOWED_TYPES,
    AUTHOR_PREDICATES,
    B64_TAXONOMY,
    CONTENT_METADATA,
    ES_CT_META,
    IMAGE_PLACEHOLDER,
    IMAGE_SERVICE_URL,
    PAC_ORIGIN,
    PRIMARY_SECTION_PREDICATE,
    SECTION_PREDICATES,
    SKIP_PREDICATES,
    THEME_TAXONOMY_BY_TYPE,
    TAXONOMY_FIELDS,
    _CONCEPT_TYPES,
    _PREDICATES10,
)


def _strs(xs) -> str:
    return "[" + ", ".join("'" + x.replace("'", "''") + "'" for x in xs) + "]"


def _in(xs) -> str:
    return "(" + ", ".join("'" + x.replace("'", "''") + "'" for x in xs) + ")"


ENRICHED_CTE = f"""
enriched AS (
  SELECT doc_id, text,
         md5(CAST(doc_id AS VARCHAR)) AS uuid,
         CASE WHEN doc_id % 53 = 0 THEN 'SYNTHETIC-REQ-MON' || CAST(doc_id AS VARCHAR)
              ELSE 'tid_' || CAST(doc_id AS VARCHAR) END AS tid,
         list_extract(['Article','Video','MediaResource','Audio','ContentPackage','Weird',''],
                      CAST(doc_id % 7 + 1 AS INT)) AS type,
         array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS title,
         CASE WHEN doc_id % 41 = 3 THEN ''
              WHEN doc_id % 11 = 0 THEN ''
              ELSE '<p>' || text || '</p>' END AS body,
         CASE WHEN doc_id % 41 = 3 THEN ''
              WHEN doc_id % 11 = 0
              THEN '<body><script type="x">junk</script>' || text
                   || '&nbsp;[caption id="a"]cap[/caption] embed1</body>'
              ELSE '' END AS body_xml,
         CASE WHEN doc_id % 13 = 0 THEN 'application/vnd.ft-upp-audio+json'
              WHEN doc_id % 13 = 1 THEN 'application/vnd.ft-upp-article+json'
              ELSE '' END AS ct_header,
         coalesce(list_extract({_strs([a for a, _, _ in CONTENT_METADATA])},
                               CAST(doc_id % 17 + 1 AS INT)), '') AS authority,
         coalesce(list_extract({_strs([o for _, o, _ in CONTENT_METADATA])},
                               CAST(doc_id % 19 + 1 AS INT)),
                  CASE WHEN doc_id % 19 = 5 THEN '{PAC_ORIGIN}'
                       ELSE 'unknown-origin' END) AS origin,
         CASE WHEN doc_id % 4 = 0 THEN ''
              ELSE 'By <b>Author ' || CAST(doc_id % 50 AS VARCHAR) || '</b> &amp; staff'
              END AS byline,
         CASE WHEN doc_id % 6 = 0 THEN ''
              ELSE 'Standfirst ' || CAST(doc_id % 30 AS VARCHAR) END AS standfirst,
         'Plain description ' || CAST(doc_id AS VARCHAR) AS description,
         doc_id % 9 = 0 AS scoop,
         list_extract(['yes','no','verify'], CAST(doc_id % 4 + 1 AS INT)) AS can_be_syndicated,
         list_extract(['yes','no'], CAST(doc_id % 3 + 1 AS INT)) AS can_be_distributed,
         CASE WHEN doc_id % 23 = 0 THEN ''
              ELSE strftime(TIMESTAMP '2024-01-01 00:00:00' + to_minutes(doc_id),
                            '%Y-%m-%dT%H:%M:%S') || '.000Z' END AS published_date,
         CASE WHEN doc_id % 29 = 0 THEN ''
              ELSE strftime(TIMESTAMP '2023-12-01 00:00:00' + to_minutes(doc_id),
                            '%Y-%m-%dT%H:%M:%S') || '.000Z' END AS first_published_date,
         CASE WHEN doc_id % 5 = 0 THEN ''
              ELSE 'http://api.ft.com/content/' || md5(CAST(doc_id AS VARCHAR) || 'img')
              END AS main_image,
         [struct_pack(
            duration := CAST(doc_id * 37 % 600000 AS INT),
            media_type := list_extract(['video/mp4','audio/mp3','text/html'],
                                       CAST(doc_id % 3 + 1 AS INT)))] AS data_sources,
         doc_id % 97 = 0 AS marked_deleted
  FROM documents
)
"""


def _tme_case(mod: str, eq: int, sfx: str) -> str:
    return (f"CASE WHEN (doc_id + 31*pos) % {mod} = {eq} "
            f"THEN 'tme-' || CAST(doc_id + 31*pos AS VARCHAR) || '{sfx}' END")


ANN_CTE = ENRICHED_CTE.rstrip() + f""",
ann0 AS (
  SELECT uuid, doc_id, pos,
         list_extract(string_split(text, ' '), pos * 3) AS cid,
         list_filter([
           {_tme_case('3', 0, B64_TAXONOMY['PN'])},
           {_tme_case('4', 0, B64_TAXONOMY['Authors'])},
           {_tme_case('5', 0, B64_TAXONOMY['Sections'])},
           {_tme_case('7', 2, B64_TAXONOMY['ON'])},
           {_tme_case('7', 4, B64_TAXONOMY['Topics'])},
           {_tme_case('7', 6, B64_TAXONOMY['GL'])},
           {_tme_case('2', 0, 'xq')}
         ], x -> x IS NOT NULL) AS tme_ids
  FROM enriched, (SELECT unnest([1, 2, 3]) AS pos)
  WHERE list_extract(string_split(text, ' '), pos * 3) IS NOT NULL
    AND list_extract(string_split(text, ' '), pos * 3) <> ''
),
ann AS (
  SELECT uuid, pos AS ann_pos, cid AS concept_id,
         'P-' || cid AS pref_label,
         list_extract({_strs(_PREDICATES10)},
                      CAST((doc_id + 5*pos) % 10 + 1 AS INT)) AS predicate,
         list_extract({_strs(_CONCEPT_TYPES)},
                      CAST((doc_id * pos) % {len(_CONCEPT_TYPES)} + 1 AS INT)) AS concept_type,
         list_concat([cid], tme_ids) AS ann_ids
  FROM ann0
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


def _title_chain_sql(expr: str) -> str:
    """Replay functions/textfns.title_text_chain (the lead_headline/byline
    short chain, mapper.go:183-193) in DuckDB SQL."""
    from .functions.textfns import CHAIN_REGEX_STAGES, ENTITY_REPLACEMENTS

    stages = {n: (p, r) for n, p, r in CHAIN_REGEX_STAGES}

    def q(s: str) -> str:
        return s.replace("'", "''")

    e = expr
    for old, new in ENTITY_REPLACEMENTS:
        e = f"replace({e}, '{q(old)}', '{q(new)}')"
    for name in ("all_tags", "whitespace"):
        p, r = stages[name]
        e = f"regexp_replace({e}, '{q(p)}', '{q(r)}', 'g')"
    return f"trim({e})"


def _content_type_case() -> str:
    """B4 3-stage inference (message_handler.go:137-160) as one CASE."""
    lines = [
        "CASE WHEN contains(ct_header, 'ft-upp-audio') THEN 'audio'",
        "     WHEN contains(ct_header, 'ft-upp-article') THEN 'article'",
    ]
    for auth, _, ct in CONTENT_METADATA:
        lines.append(f"     WHEN contains(authority, '{auth}') THEN '{ct}'")
    for _, origin, ct in CONTENT_METADATA:
        lines.append(f"     WHEN contains(origin, '{origin}') THEN '{ct}'")
    lines.append("     ELSE '' END")
    return "\n".join(lines)


def _es_meta_case(idx: int) -> str:
    whens = " ".join(
        f"WHEN '{ct}' THEN '{meta[idx]}'" for ct, meta in ES_CT_META.items()
    )
    return f"CASE content_type {whens} END"


# B1→B5 gates shared by write + delete paths (message_handler.go:69-110)
def _gated_cte() -> str:
    return f"""
g AS (
  SELECT *
  FROM (
    SELECT *, {_content_type_case()} AS content_type,
           CASE WHEN body = '' THEN body_xml ELSE body END AS body2
    FROM enriched
    WHERE tid NOT LIKE '%SYNTHETIC-REQ-MON%'
      AND type IN {_in(ALLOWED_TYPES)}
  )
  WHERE content_type <> '' OR origin = '{PAC_ORIGIN}'
)
"""


def index_model_sql(index_date: str = "2026-01-01T00:00:00.000Z") -> str:
    img = IMAGE_SERVICE_URL
    return f"""
WITH {ENRICHED_CTE}, {_gated_cte()}
SELECT uuid AS uid,
       {_es_meta_case(0)} AS collection,
       content_type,
       content_type AS internal_content_type,
       {_es_meta_case(2)} AS category,
       {_es_meta_case(1)} AS format,
       {_title_chain_sql('title')} AS lead_headline,
       {_title_chain_sql('byline')} AS byline,
       CASE WHEN body2 <> '' THEN {_html_chain_sql('body2')}
            ELSE description END AS body,
       scoop, can_be_syndicated, can_be_distributed,
       nullif(published_date, '') AS last_publish,
       nullif(first_published_date, '') AS initial_publish,
       standfirst AS short_description,
       CASE WHEN content_type <> 'blog' AND main_image <> ''
            THEN replace('{img}', '{IMAGE_PLACEHOLDER}',
                         string_split(main_image, '/')[-1]) END AS thumbnail_url,
       CAST(coalesce(
            CASE WHEN content_type = 'video'
                 THEN list_filter(data_sources,
                                  x -> starts_with(x.media_type, 'video'))[1].duration
                 WHEN content_type = 'audio' THEN data_sources[1].duration
                 END, 0) AS INT) AS length_millis,
       'https://www.ft.com/content/' || uuid AS url,
       'https://api.ft.com/content/' || uuid AS model_api_url,
       tid AS publish_reference,
       '{index_date}' AS index_date,
       FALSE AS mark_deleted, FALSE AS best_story, FALSE AS lookup_failure,
       CAST(NULL AS INT) AS story_id, CAST(NULL AS INT) AS storymodel_id
FROM g
WHERE NOT marked_deleted AND uuid <> '' AND content_type <> ''
ORDER BY uuid
"""


def delete_set_sql() -> str:
    return f"""
WITH {ENRICHED_CTE}, {_gated_cte()}
SELECT uuid, coalesce({_es_meta_case(0)}, '') AS collection
FROM g WHERE marked_deleted
ORDER BY uuid
"""


def routing_counts_sql() -> str:
    return f"""
WITH {ENRICHED_CTE}, {_gated_cte()}
SELECT {_es_meta_case(0)} AS collection, count(*)::BIGINT AS n
FROM g
WHERE NOT marked_deleted AND uuid <> '' AND content_type <> ''
GROUP BY collection ORDER BY collection
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
SELECT uuid,
       array_to_string(list(concept_id ORDER BY p, concept_id), '|') AS {out_col}
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
    tax_whens = " ".join(
        f"WHEN '{ct}' THEN '{B64_TAXONOMY[tax]}'"
        for ct, tax in THEME_TAXONOMY_BY_TYPE.items()
    )
    return f"""
WITH {ANN_CTE}
SELECT uuid, pref_label AS cmr_primarytheme,
       coalesce(list_filter(ann_ids, x -> ends_with(x, sfx))[1],
                ann_ids[2], ann_ids[1]) AS cmr_primarytheme_id
FROM (
  SELECT *, CASE concept_type {tax_whens} END AS sfx
  FROM ann
  WHERE predicate = 'about'
    AND concept_type IN {_in(list(THEME_TAXONOMY_BY_TYPE))}
)
QUALIFY row_number() OVER (PARTITION BY uuid ORDER BY ann_pos) = 1
ORDER BY uuid
"""


def sections_sql() -> str:
    """E4 handleSectionMapping oracle (mapper.go:272-291)."""
    sfx = B64_TAXONOMY["Sections"]
    preds = _in(SECTION_PREDICATES + [PRIMARY_SECTION_PREDICATE])
    return f"""
WITH {ANN_CTE},
sec AS (SELECT * FROM ann WHERE predicate IN {preds}),
labels AS (
  SELECT uuid, array_to_string(list(e ORDER BY o, e), '|') AS cmr_sections
  FROM (SELECT uuid, pref_label AS e, min(ann_pos) AS o
        FROM sec GROUP BY uuid, pref_label)
  GROUP BY uuid
),
idsx AS (
  SELECT uuid, ann_pos * 100 + i AS o, id
  FROM (SELECT uuid, ann_pos,
               unnest(ann_ids) AS id,
               unnest(range(len(ann_ids))) AS i
        FROM sec)
),
ids AS (
  SELECT uuid, array_to_string(list(e ORDER BY o, e), '|') AS cmr_sections_ids
  FROM (SELECT uuid, id AS e, min(o) AS o FROM idsx GROUP BY uuid, id)
  GROUP BY uuid
),
prim AS (
  SELECT uuid, pref_label AS cmr_primarysection,
         coalesce(list_filter(ann_ids, x -> ends_with(x, '{sfx}'))[1],
                  ann_ids[2], ann_ids[1]) AS cmr_primarysection_id
  FROM sec WHERE predicate = '{PRIMARY_SECTION_PREDICATE}'
  QUALIFY row_number() OVER (PARTITION BY uuid ORDER BY ann_pos DESC) = 1
)
SELECT uuid, cmr_sections, cmr_sections_ids, cmr_primarysection, cmr_primarysection_id
FROM labels JOIN ids USING (uuid) LEFT JOIN prim USING (uuid)
ORDER BY uuid
"""


def authors_sql() -> str:
    """E6 author-gating oracle (mapper.go:107-124)."""
    psfx, asfx = B64_TAXONOMY["PN"], B64_TAXONOMY["Authors"]
    return f"""
WITH {ANN_CTE},
per AS (
  SELECT *,
         list_filter(ann_ids, x -> ends_with(x, '{asfx}'))[1] AS author_id,
         len(list_filter(ann_ids, x -> ends_with(x, '{psfx}'))) > 0 AS person_found
  FROM ann
  WHERE concept_type = 'PERSON' AND predicate NOT IN {_in(SKIP_PREDICATES)}
),
ppl_rows AS (SELECT * FROM per WHERE person_found OR author_id IS NULL),
ppl AS (
  SELECT uuid, array_to_string(list(e ORDER BY o, e), '|') AS cmr_people
  FROM (SELECT uuid, pref_label AS e, min(ann_pos) AS o
        FROM ppl_rows GROUP BY uuid, pref_label)
  GROUP BY uuid
),
ppl_ids AS (
  SELECT uuid, array_to_string(list(e ORDER BY o, e), '|') AS cmr_people_ids
  FROM (SELECT uuid, id AS e, min(o) AS o
        FROM (SELECT uuid, ann_pos * 100 + i AS o, id
              FROM (SELECT uuid, ann_pos, unnest(ann_ids) AS id,
                           unnest(range(len(ann_ids))) AS i
                    FROM ppl_rows))
        GROUP BY uuid, id)
  GROUP BY uuid
),
auth_rows AS (
  SELECT * FROM per
  WHERE predicate IN {_in(AUTHOR_PREDICATES)} AND author_id IS NOT NULL
),
auth AS (
  SELECT uuid, array_to_string(list(e ORDER BY o, e), '|') AS cmr_authors
  FROM (SELECT uuid, pref_label AS e, min(ann_pos) AS o
        FROM auth_rows GROUP BY uuid, pref_label)
  GROUP BY uuid
),
auth_ids AS (
  SELECT uuid, array_to_string(list(e ORDER BY o, e), '|') AS cmr_authors_ids
  FROM (SELECT uuid, id AS e, min(o) AS o
        FROM (SELECT uuid, ann_pos * 10 + i AS o, id
              FROM (SELECT uuid, ann_pos,
                           unnest([author_id, concept_id]) AS id,
                           unnest([0, 1]) AS i
                    FROM auth_rows))
        GROUP BY uuid, id)
  GROUP BY uuid
)
SELECT b.uuid,
       coalesce(cmr_people, '') AS cmr_people,
       coalesce(cmr_people_ids, '') AS cmr_people_ids,
       coalesce(cmr_authors, '') AS cmr_authors,
       coalesce(cmr_authors_ids, '') AS cmr_authors_ids
FROM (SELECT DISTINCT uuid FROM per) b
LEFT JOIN ppl USING (uuid)
LEFT JOIN ppl_ids USING (uuid)
LEFT JOIN auth USING (uuid)
LEFT JOIN auth_ids USING (uuid)
ORDER BY uuid
"""


def _bucket_pair_ctes(ct: str, label_col: str, ids_col: str) -> str:
    """Label + ids bucket CTEs for one taxonomy branch (appendIfNotExists /
    prepareElasticField replay — same shape as annotation_buckets_sql and
    the sections_sql ids chain)."""
    return f"""
t_{label_col} AS (
  SELECT uuid, array_to_string(list(e ORDER BY o, e), '|') AS {label_col}
  FROM (SELECT uuid, pref_label AS e, min(ann_pos) AS o
        FROM flt WHERE concept_type = '{ct}' GROUP BY uuid, pref_label)
  GROUP BY uuid
),
t_{ids_col} AS (
  SELECT uuid, array_to_string(list(e ORDER BY o, e), '|') AS {ids_col}
  FROM (SELECT uuid, id AS e, min(o) AS o
        FROM (SELECT uuid, ann_pos * 100 + i AS o, id
              FROM (SELECT uuid, ann_pos, unnest(ann_ids) AS id,
                           unnest(range(len(ann_ids))) AS i
                    FROM flt WHERE concept_type = '{ct}'))
        GROUP BY uuid, id)
  GROUP BY uuid
)"""


def full_document_sql(index_date: str = "2026-01-01T00:00:00.000Z") -> str:
    """Oracle for the assembled IndexModel document
    (plans/index_model.full_index_model): the scalar projection CTE joined
    with every bucket CTE, primary theme and primary section, on uuid."""
    from .plans.index_model import TAXONOMY_FIELDS as TF

    img = IMAGE_SERVICE_URL
    sfx_sec = B64_TAXONOMY["Sections"]
    psfx, asfx = B64_TAXONOMY["PN"], B64_TAXONOMY["Authors"]
    tax_whens = " ".join(
        f"WHEN '{ct}' THEN '{B64_TAXONOMY[tax]}'"
        for ct, tax in THEME_TAXONOMY_BY_TYPE.items()
    )
    sec_preds = _in(SECTION_PREDICATES + [PRIMARY_SECTION_PREDICATE])
    bucket_ctes = ",".join(
        _bucket_pair_ctes(ct, lc, ic) for ct, (lc, ic) in TF.items()
    )
    bucket_cols = [c for pair in TF.values() for c in pair]
    all_buckets = bucket_cols + [
        "cmr_people", "cmr_people_ids", "cmr_authors", "cmr_authors_ids",
        "cmr_sections", "cmr_sections_ids",
    ]
    joins = "\n".join(
        f"LEFT JOIN t_{c} ON t_{c}.uuid = base.uid" for c in all_buckets
    )
    sel_buckets = ",\n       ".join(
        f"coalesce(t_{c}.{c}, '') AS {c}" for c in all_buckets
    )
    return f"""
WITH {ANN_CTE}, {_gated_cte()},
base AS (
  SELECT uuid AS uid,
         {_es_meta_case(0)} AS collection,
         content_type,
         content_type AS internal_content_type,
         {_es_meta_case(2)} AS category,
         {_es_meta_case(1)} AS format,
         {_title_chain_sql('title')} AS lead_headline,
         {_title_chain_sql('byline')} AS byline,
         CASE WHEN body2 <> '' THEN {_html_chain_sql('body2')}
              ELSE description END AS body,
         scoop, can_be_syndicated, can_be_distributed,
         nullif(published_date, '') AS last_publish,
         nullif(first_published_date, '') AS initial_publish,
         standfirst AS short_description,
         CASE WHEN content_type <> 'blog' AND main_image <> ''
              THEN replace('{img}', '{IMAGE_PLACEHOLDER}',
                           string_split(main_image, '/')[-1]) END AS thumbnail_url,
         CAST(coalesce(
              CASE WHEN content_type = 'video'
                   THEN list_filter(data_sources,
                                    x -> starts_with(x.media_type, 'video'))[1].duration
                   WHEN content_type = 'audio' THEN data_sources[1].duration
                   END, 0) AS INT) AS length_millis,
         'https://www.ft.com/content/' || uuid AS url,
         'https://api.ft.com/content/' || uuid AS model_api_url,
         tid AS publish_reference,
         '{index_date}' AS index_date,
         FALSE AS mark_deleted, FALSE AS best_story, FALSE AS lookup_failure,
         CAST(NULL AS INT) AS story_id, CAST(NULL AS INT) AS storymodel_id
  FROM g
  WHERE NOT marked_deleted AND uuid <> '' AND content_type <> ''
),
flt AS (SELECT * FROM ann WHERE predicate NOT IN {_in(SKIP_PREDICATES)}),
{bucket_ctes},
per AS (
  SELECT *,
         list_filter(ann_ids, x -> ends_with(x, '{asfx}'))[1] AS author_id,
         len(list_filter(ann_ids, x -> ends_with(x, '{psfx}'))) > 0 AS person_found
  FROM flt WHERE concept_type = 'PERSON'
),
ppl_rows AS (SELECT * FROM per WHERE person_found OR author_id IS NULL),
t_cmr_people AS (
  SELECT uuid, array_to_string(list(e ORDER BY o, e), '|') AS cmr_people
  FROM (SELECT uuid, pref_label AS e, min(ann_pos) AS o
        FROM ppl_rows GROUP BY uuid, pref_label)
  GROUP BY uuid
),
t_cmr_people_ids AS (
  SELECT uuid, array_to_string(list(e ORDER BY o, e), '|') AS cmr_people_ids
  FROM (SELECT uuid, id AS e, min(o) AS o
        FROM (SELECT uuid, ann_pos * 100 + i AS o, id
              FROM (SELECT uuid, ann_pos, unnest(ann_ids) AS id,
                           unnest(range(len(ann_ids))) AS i
                    FROM ppl_rows))
        GROUP BY uuid, id)
  GROUP BY uuid
),
auth_rows AS (
  SELECT * FROM per
  WHERE predicate IN {_in(AUTHOR_PREDICATES)} AND author_id IS NOT NULL
),
t_cmr_authors AS (
  SELECT uuid, array_to_string(list(e ORDER BY o, e), '|') AS cmr_authors
  FROM (SELECT uuid, pref_label AS e, min(ann_pos) AS o
        FROM auth_rows GROUP BY uuid, pref_label)
  GROUP BY uuid
),
t_cmr_authors_ids AS (
  SELECT uuid, array_to_string(list(e ORDER BY o, e), '|') AS cmr_authors_ids
  FROM (SELECT uuid, id AS e, min(o) AS o
        FROM (SELECT uuid, ann_pos * 10 + i AS o, id
              FROM (SELECT uuid, ann_pos,
                           unnest([author_id, concept_id]) AS id,
                           unnest([0, 1]) AS i
                    FROM auth_rows))
        GROUP BY uuid, id)
  GROUP BY uuid
),
sec AS (SELECT * FROM flt WHERE predicate IN {sec_preds}),
t_cmr_sections AS (
  SELECT uuid, array_to_string(list(e ORDER BY o, e), '|') AS cmr_sections
  FROM (SELECT uuid, pref_label AS e, min(ann_pos) AS o
        FROM sec GROUP BY uuid, pref_label)
  GROUP BY uuid
),
t_cmr_sections_ids AS (
  SELECT uuid, array_to_string(list(e ORDER BY o, e), '|') AS cmr_sections_ids
  FROM (SELECT uuid, id AS e, min(o) AS o
        FROM (SELECT uuid, ann_pos * 100 + i AS o, id
              FROM (SELECT uuid, ann_pos, unnest(ann_ids) AS id,
                           unnest(range(len(ann_ids))) AS i
                    FROM sec))
        GROUP BY uuid, id)
  GROUP BY uuid
),
prim_theme AS (
  SELECT uuid, pref_label AS cmr_primarytheme,
         coalesce(list_filter(ann_ids, x -> ends_with(x, sfx))[1],
                  ann_ids[2], ann_ids[1]) AS cmr_primarytheme_id
  FROM (
    SELECT *, CASE concept_type {tax_whens} END AS sfx
    FROM flt
    WHERE predicate = 'about'
      AND concept_type IN {_in(list(THEME_TAXONOMY_BY_TYPE))}
  )
  QUALIFY row_number() OVER (PARTITION BY uuid ORDER BY ann_pos) = 1
),
prim_sec AS (
  SELECT uuid, pref_label AS cmr_primarysection,
         coalesce(list_filter(ann_ids, x -> ends_with(x, '{sfx_sec}'))[1],
                  ann_ids[2], ann_ids[1]) AS cmr_primarysection_id
  FROM sec WHERE predicate = '{PRIMARY_SECTION_PREDICATE}'
  QUALIFY row_number() OVER (PARTITION BY uuid ORDER BY ann_pos DESC) = 1
)
SELECT base.*,
       {sel_buckets},
       prim_theme.cmr_primarytheme, prim_theme.cmr_primarytheme_id,
       prim_sec.cmr_primarysection, prim_sec.cmr_primarysection_id
FROM base
{joins}
LEFT JOIN prim_theme ON prim_theme.uuid = base.uid
LEFT JOIN prim_sec ON prim_sec.uuid = base.uid
ORDER BY uid
"""


def phrase_match_sql(phrase: str, slop: int = 0) -> str:
    """Phrase occurrences per doc: tokens at consecutive positions.
    Parallel unnest (toks + 0-based position range) zips positionally in
    DuckDB, mirroring Spark's posexplode. ``slop`` > 0 is the ordered
    proximity form (same tuple semantics as SegmentIndex.phrase_search):
    strictly increasing positions, each bounded by p0 + i + slop."""
    terms = analyze_query_py(phrase, "simple")
    conds = " AND ".join(
        f"p{i}.term = '{t.replace(chr(39), chr(39) * 2)}'" for i, t in enumerate(terms)
    )
    if slop <= 0:
        joins = "".join(
            f"\n  JOIN pos p{i} ON p{i}.doc_id = p0.doc_id AND p{i}.pos = p0.pos + {i}"
            for i in range(1, len(terms))
        )
    else:
        joins = "".join(
            f"\n  JOIN pos p{i} ON p{i}.doc_id = p0.doc_id"
            f" AND p{i}.pos > p{i - 1}.pos"
            f" AND p{i}.pos <= p0.pos + {i} + {int(slop)}"
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


def rescore_sql(query: str, phrase: str, k: int = 10,
                window_size: int = 50, query_weight: float = 1.0,
                rescore_weight: float = 1.0, mode: str = "AND",
                slop: int = 0) -> str:
    """DuckDB replay of SegmentIndex.rescore: BM25 top ``window_size``
    window re-ranked by query_weight*bm25 + rescore_weight*phrase_score,
    phrase_score = Lucene PhraseQuery (idf summed over the phrase's term
    LIST incl. duplicates, tf = phrase frequency, same k1/b saturation).
    Window docs without the phrase keep phrase_score = 0; docs outside
    the window never enter."""
    qterms = sorted(set(analyze_query_py(query, "simple")))
    pterms = analyze_query_py(phrase, "simple")
    having = f"HAVING count(*) = {len(qterms)}" if mode.upper() == "AND" else ""
    qw, rw = float(query_weight), float(rescore_weight)
    if not qterms:
        return ("SELECT CAST(NULL AS BIGINT) AS doc_id, "
                "CAST(NULL AS DOUBLE) AS score WHERE FALSE")
    if not pterms:
        base = bm25_topk_sql(query, k=window_size, mode=mode)
        return (f"SELECT doc_id, round({qw!r} * score, {ROUND_DECIMALS}) "
                f"AS score FROM ({base}) "
                f"ORDER BY score DESC, doc_id ASC LIMIT {k}")
    conds = " AND ".join(
        f"p{i}.term = '{t.replace(chr(39), chr(39) * 2)}'"
        for i, t in enumerate(pterms)
    )
    if slop <= 0:
        joins = "".join(
            f"\n  JOIN pos p{i} ON p{i}.doc_id = p0.doc_id"
            f" AND p{i}.pos = p0.pos + {i}"
            for i in range(1, len(pterms))
        )
    else:
        joins = "".join(
            f"\n  JOIN pos p{i} ON p{i}.doc_id = p0.doc_id"
            f" AND p{i}.pos > p{i - 1}.pos"
            f" AND p{i}.pos <= p0.pos + {i} + {int(slop)}"
            for i in range(1, len(pterms))
        )
    return f"""
WITH {TOKENS_CTE},
qt AS (SELECT unnest({_sql_str_list(qterms)}) AS term),
stats AS (
  SELECT term, count(*)::DOUBLE AS df FROM post
  WHERE term IN (SELECT term FROM qt) GROUP BY term
),
winraw AS (
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
),
win AS (
  SELECT doc_id, round(raw, {ROUND_DECIMALS}) AS score
  FROM winraw ORDER BY score DESC, doc_id ASC LIMIT {window_size}
),
pos AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(0, len(toks))) AS pos
  FROM docs
  WHERE doc_id IN (SELECT doc_id FROM win)
),
ph AS (
  SELECT p0.doc_id, count(*)::DOUBLE AS phrase_tf
  FROM pos p0{joins}
  WHERE {conds}
  GROUP BY p0.doc_id
),
pidf AS (
  SELECT sum(ln(1 + (c.n - s.df + 0.5)/(s.df + 0.5))) AS idfsum
  FROM (SELECT unnest({_sql_str_list(list(pterms))}) AS term) q
  JOIN (SELECT term, count(*)::DOUBLE AS df FROM post GROUP BY term) s
    USING (term)
  CROSS JOIN corpus c
)
SELECT w.doc_id,
       round({qw!r} * w.score + {rw!r} * coalesce(
         i.idfsum * p.phrase_tf*({BM25_K1}+1)
         / (p.phrase_tf + {BM25_K1}*(1-{BM25_B}+{BM25_B}*d.doc_len/c.avgdl)),
         0.0), {ROUND_DECIMALS}) AS score
FROM win w
LEFT JOIN ph p USING (doc_id)
JOIN dl d USING (doc_id)
CROSS JOIN corpus c
CROSS JOIN pidf i
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def function_score_sql(query: str, k: int = 10, mode: str = "AND",
                       factor: float = 1.0, modifier: str = "log1p",
                       boost_mode: str = "multiply",
                       factor_col: str = "n_chars") -> str:
    """DuckDB replay of SegmentIndex.function_score: BM25 over the FULL
    match set (no window — per-doc multipliers void top-k pruning),
    combined with modifier(factor * documents.factor_col) per boost_mode,
    rounded like the engine (round the bm25 first, then the combination)."""
    terms = sorted(set(analyze_query_py(query, "simple")))
    if not terms:
        return ("SELECT CAST(NULL AS BIGINT) AS doc_id, "
                "CAST(NULL AS DOUBLE) AS score WHERE FALSE")
    having = f"HAVING count(*) = {len(terms)}" if mode.upper() == "AND" else ""
    fac = f"({factor!r} * m.{factor_col}::DOUBLE)"
    boost = {"log1p": f"ln(1 + {fac})", "sqrt": f"sqrt({fac})",
             "none": fac}[modifier]
    op = "*" if boost_mode == "multiply" else "+"
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
SELECT s.doc_id,
       round(round(s.raw, {ROUND_DECIMALS}) {op} {boost},
             {ROUND_DECIMALS}) AS score
FROM scored s
JOIN documents m ON m.doc_id = s.doc_id
ORDER BY score DESC, s.doc_id ASC
LIMIT {k}
"""


def synonym_topk_sql(query: str, synonyms: dict[str, list[str]],
                     k: int = 10, mode: str = "AND") -> str:
    """DuckDB replay of SegmentIndex.search_synonyms: each query term's
    synonym set scores as ONE pseudo-term (tf summed per doc, df = max
    member df, one idf per set — Lucene SynonymQuery). AND requires
    every set matched by any member; a fully-absent set empties an AND
    query via the HAVING count."""
    base = analyze_query_py(query, "simple")
    groups: list[set[str]] = []
    seen: set[str] = set()
    for t in base:
        if t in seen:
            continue
        seen.add(t)
        members = {t}
        for s in synonyms.get(t, []):
            members.update(analyze_query_py(s, "simple"))
        groups.append(members)
    if not groups:
        return ("SELECT CAST(NULL AS BIGINT) AS doc_id, "
                "CAST(NULL AS DOUBLE) AS score WHERE FALSE")
    vals = ", ".join(
        f"('{m.replace(chr(39), chr(39) * 2)}', {gid})"
        for gid, g in enumerate(groups) for m in sorted(g)
    )
    having = f"HAVING count(*) = {len(groups)}" if mode.upper() == "AND" \
        else ""
    return f"""
WITH {TOKENS_CTE},
map AS (SELECT * FROM (VALUES {vals}) AS m(term, gid)),
stats AS (
  SELECT term, count(*)::DOUBLE AS df FROM post
  WHERE term IN (SELECT term FROM map) GROUP BY term
),
gstats AS (
  SELECT m.gid, max(s.df) AS df
  FROM map m JOIN stats s USING (term) GROUP BY m.gid
),
gpost AS (
  SELECT p.doc_id, m.gid, sum(p.tf) AS tf
  FROM post p JOIN map m USING (term) GROUP BY p.doc_id, m.gid
),
scored AS (
  SELECT g.doc_id,
         sum( ln(1 + (c.n - gs.df + 0.5)/(gs.df + 0.5))
              * g.tf*({BM25_K1}+1)
              / (g.tf + {BM25_K1}*(1-{BM25_B}+{BM25_B}*d.doc_len/c.avgdl)) ) AS raw
  FROM gpost g
  JOIN gstats gs USING (gid)
  JOIN dl d USING (doc_id)
  CROSS JOIN corpus c
  GROUP BY g.doc_id
  {having}
)
SELECT doc_id, round(raw, {ROUND_DECIMALS}) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def percolate_sql(queries: list[tuple[int, str, str]]) -> str:
    """DuckDB replay of operators/percolate.percolate: (doc_id, query_id)
    pairs where the doc's term SET satisfies the stored query — AND =
    containment of the query's distinct terms, OR = non-empty
    intersection. ``queries`` rows: (query_id, query_text, mode)."""
    rows = []
    for qid, q, mode in queries:
        for t in sorted(set(analyze_query_py(q, "simple"))):
            rows.append(
                f"({int(qid)}, '{t.replace(chr(39), chr(39) * 2)}', "
                f"'{mode.upper()}')"
            )
    if not rows:
        return ("SELECT CAST(NULL AS BIGINT) AS doc_id, "
                "CAST(NULL AS BIGINT) AS query_id WHERE FALSE")
    return f"""
WITH {TOKENS_CTE},
q AS (SELECT * FROM (VALUES {", ".join(rows)}) AS q(query_id, term, mode)),
qsize AS (SELECT query_id, mode, count(*) AS n_terms FROM q
          GROUP BY query_id, mode),
dterm AS (
  SELECT DISTINCT doc_id, unnest(toks) AS term FROM docs
),
hit AS (
  SELECT d.doc_id, q.query_id, count(*) AS n_hit
  FROM dterm d JOIN q USING (term)
  GROUP BY d.doc_id, q.query_id
)
SELECT h.doc_id, h.query_id::BIGINT AS query_id
FROM hit h JOIN qsize s USING (query_id)
WHERE s.mode = 'OR' OR h.n_hit = s.n_terms
ORDER BY h.doc_id, h.query_id
"""


def phrase_prefix_sql(phrase: str, max_expansions: int = 50) -> str:
    """Oracle for SegmentIndex.phrase_prefix_search: exact chain over all
    but the last term; the last slot matches any of the first
    ``max_expansions`` lexicographic dictionary terms with the prefix."""
    toks = analyze_query_py(phrase, "simple")
    if not toks:
        return ("SELECT CAST(NULL AS BIGINT) AS doc_id, "
                "CAST(NULL AS BIGINT) AS phrase_tf WHERE FALSE")
    exact = toks[:-1]
    pfx = toks[-1].replace("'", "''")
    exp_cte = (f"SELECT DISTINCT term FROM post WHERE term LIKE '{pfx}%' "
               f"ORDER BY term LIMIT {int(max_expansions)}")
    n = len(toks)
    if n == 1:
        return f"""
WITH {TOKENS_CTE},
exp AS ({exp_cte}),
pos AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(0, len(toks))) AS pos
  FROM docs
)
SELECT doc_id, count(*)::BIGINT AS phrase_tf
FROM pos WHERE term IN (SELECT term FROM exp)
GROUP BY doc_id ORDER BY doc_id
"""
    conds = " AND ".join(
        f"p{i}.term = '{t.replace(chr(39), chr(39) * 2)}'"
        for i, t in enumerate(exact)
    )
    joins = "".join(
        f"\n  JOIN pos p{i} ON p{i}.doc_id = p0.doc_id"
        f" AND p{i}.pos = p0.pos + {i}"
        for i in range(1, n - 1)
    )
    i = n - 1
    joins += (f"\n  JOIN pos p{i} ON p{i}.doc_id = p0.doc_id"
              f" AND p{i}.pos = p0.pos + {i}"
              f" AND p{i}.term IN (SELECT term FROM exp)")
    return f"""
WITH {TOKENS_CTE},
exp AS ({exp_cte}),
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


def highlight_sql(query: str, k: int = 10, mode: str = "AND",
                  window: int = 8) -> str:
    """DuckDB replay of SegmentIndex.highlight / operators/highlight.py:
    BM25 top-k + per-hit best ``window``-token span (most distinct query
    terms, leftmost tie-break), snippet = analyzed tokens space-joined."""
    terms = sorted(set(analyze_query_py(query, "simple")))
    lst = _sql_str_list(terms)
    topk = bm25_topk_sql(query, k=k, mode=mode)
    return f"""
WITH {TOKENS_CTE},
topk AS ({topk}),
pos AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(0, len(toks))) AS pos
  FROM docs
  WHERE doc_id IN (SELECT doc_id FROM topk)
),
qpos AS (
  SELECT * FROM pos WHERE term IN (SELECT unnest({lst}))
),
wins AS (
  SELECT a.doc_id, a.pos AS start, count(DISTINCT b.term) AS n_window_terms
  FROM qpos a
  JOIN qpos b ON b.doc_id = a.doc_id
            AND b.pos BETWEEN a.pos AND a.pos + {window} - 1
  GROUP BY a.doc_id, a.pos
),
best AS (
  SELECT doc_id, start, n_window_terms FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY n_window_terms DESC, start ASC) AS rn
    FROM wins
  ) WHERE rn = 1
)
SELECT t.doc_id, t.score,
       array_to_string(list_slice(d.toks, b.start + 1, b.start + {window}), ' ')
         AS snippet,
       b.n_window_terms::BIGINT AS n_window_terms
FROM topk t
JOIN best b USING (doc_id)
JOIN docs d USING (doc_id)
ORDER BY t.score DESC, t.doc_id ASC
"""


def corpus_stats_sql() -> str:
    return f"""
WITH {TOKENS_CTE}
SELECT count(*)::BIGINT AS n_docs,
       round(avg(doc_len), {ROUND_DECIMALS}) AS avgdl
FROM dl
"""


def suggest_sql(prefix: str, k: int = 10) -> str:
    """Oracle for SegmentIndex.suggest: top-k dictionary terms with the
    prefix, by df desc then term asc (valid against a fold-clean index,
    where block-count df == true df)."""
    p = prefix.replace("'", "''")
    return f"""
WITH {TOKENS_CTE}
SELECT term, count(*)::BIGINT AS df
FROM post
WHERE term LIKE '{p}%'
GROUP BY term
ORDER BY df DESC, term ASC
LIMIT {int(k)}
"""


def more_like_this_sql(doc_id: int, k: int = 10, max_query_terms: int = 25,
                       min_term_freq: int = 1, min_doc_freq: int = 1) -> str:
    """Oracle for operators/search_ext.more_like_this: tf·idf term
    selection from the source doc (weights rounded to 6 dp, term-asc
    tie-break — identical to the Spark plan), then OR-mode BM25 over the
    selected terms with the source doc excluded."""
    return f"""
WITH {TOKENS_CTE},
src AS (SELECT term, tf FROM post WHERE doc_id = {int(doc_id)}),
sdf AS (
  SELECT term, count(*)::DOUBLE AS df FROM post
  WHERE term IN (SELECT term FROM src) GROUP BY term
),
sel AS (
  SELECT s.term
  FROM src s JOIN sdf USING (term) CROSS JOIN corpus c
  WHERE s.tf >= {int(min_term_freq)} AND sdf.df >= {int(min_doc_freq)}
  ORDER BY round(s.tf * ln(1 + (c.n - sdf.df + 0.5)/(sdf.df + 0.5)), 6) DESC,
           s.term ASC
  LIMIT {int(max_query_terms)}
),
stats AS (
  SELECT term, count(*)::DOUBLE AS df FROM post
  WHERE term IN (SELECT term FROM sel) GROUP BY term
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
)
SELECT doc_id, round(raw, {ROUND_DECIMALS}) AS score
FROM scored
WHERE doc_id <> {int(doc_id)}
ORDER BY score DESC, doc_id ASC
LIMIT {int(k)}
"""


def collapse_topk_sql(query: str, group_col: str, k: int = 10) -> str:
    """Oracle for operators/search_ext.collapse_topk: OR-mode BM25 hits,
    best hit per documents.{group_col} (rounded score desc, doc_id asc
    within a group — the same tie-break the Spark struct-argmax uses),
    groups ranked by that best score."""
    terms = sorted(set(analyze_query_py(query, "simple")))
    if not terms:
        return ("SELECT CAST(NULL AS VARCHAR) AS group_key, "
                "CAST(NULL AS BIGINT) AS doc_id, "
                "CAST(NULL AS DOUBLE) AS score WHERE FALSE")
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
),
hits AS (
  SELECT dd.{group_col}::VARCHAR AS group_key, s.doc_id,
         round(s.raw, {ROUND_DECIMALS}) AS score
  FROM scored s JOIN documents dd USING (doc_id)
),
best AS (
  SELECT group_key, doc_id, score,
         row_number() OVER (PARTITION BY group_key
                            ORDER BY score DESC, doc_id ASC) AS rn
  FROM hits
)
SELECT group_key, doc_id, score FROM best WHERE rn = 1
ORDER BY score DESC, doc_id ASC
LIMIT {int(k)}
"""
