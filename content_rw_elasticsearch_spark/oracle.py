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


def bm25_topk_sql(query: str, k: int = 10, mode: str = "AND") -> str:
    """DuckDB SQL computing the same top-k as operators/bm25.bm25_topk."""
    terms = sorted(set(analyze_query_py(query, "simple")))
    if not terms:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE FALSE"
    having = f"HAVING count(*) = {len(terms)}" if mode.upper() == "AND" else ""
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


def corpus_stats_sql() -> str:
    return f"""
WITH {TOKENS_CTE}
SELECT count(*)::BIGINT AS n_docs,
       round(avg(doc_len), {ROUND_DECIMALS}) AS avgdl
FROM dl
"""
