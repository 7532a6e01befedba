"""Tokenization / analysis — the from-scratch analog of the reference's
delegated Elasticsearch analyzer.

Reference contract being reproduced (see /root/reference/configs/
referenceSchema.json:7-22): default analyzer = `standard` tokenizer +
`lowercase` filter + `my_ascii_folding` (asciifolding with
preserve_original: true). The reference never tokenizes itself — ES does —
so this module is a from-scratch design, not a port.

Two analyzers, both with a PINNED stage order (the reference's text chain is
order-sensitive, see /root/reference/pkg/html/transformer_test.go:10-51 and
pkg/mapper/mapper.go:202-211; same hazard applies here):

* ``tokens_simple`` — lowercase → split on non-[a-z0-9] → drop empties.
  100% JVM-side (built-in higher-order functions, whole-stage codegen, zero
  Python). This is the engine's default document/query analyzer; its
  semantics are deliberately expressible in ANSI SQL so the DuckDB oracle
  can replay it exactly.

* ``tokens_code`` — the code-aware analyzer for source-code corpora
  (BASELINE.json input_hint): ASCII-fold (preserve original), split on
  non-alphanumerics, additionally split camelCase / snake_case identifiers
  (preserving the joined original, the analog of asciifolding's
  preserve_original), lowercase. Implemented as a vectorized Arrow
  ``pandas_udf`` (the ONLY place raw text meets Python; no per-row Python).

Both analyzers MUST be applied identically to documents and queries.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

#: split pattern shared verbatim with the DuckDB oracle SQL
SIMPLE_SPLIT_PATTERN = "[^a-z0-9]+"


def tokens_simple(col: Column | str) -> Column:
    """lowercase → regex split → drop empty tokens; pure JVM expression.

    Equivalent DuckDB SQL (the oracle):
        list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                    x -> x <> '')
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), SIMPLE_SPLIT_PATTERN), lambda t: t != F.lit("")
    )


# ---------------------------------------------------------------------------
# code-aware analyzer (vectorized pandas UDF)
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"\w+", re.UNICODE)
# [^\W_A-Z] = unicode word char that is not '_' nor an ASCII uppercase —
# the "lowercase-ish" run used for camelCase boundaries
_CAMEL_RE = re.compile(
    r"[A-Z]+(?=[A-Z][^\W_A-Z])|[A-Z]?[^\W_A-Z]+|[A-Z]+|[0-9]+", re.UNICODE
)


def _fold_ascii(s: str) -> str:
    """ASCII-fold: NFKD-decompose and drop combining marks (café → cafe)."""
    return "".join(
        ch for ch in unicodedata.normalize("NFKD", s) if not unicodedata.combining(ch)
    )


def analyze_code_py(text: str) -> list[str]:
    """Pure-Python single-string code analyzer (stage order is PINNED):

    1. Extract word chars ([A-Za-z0-9_]+) — the `standard`-tokenizer analog
       for code.
    2. For each word: emit lowercase(word) with '_' stripped as the whole
       token, then camelCase/snake_case sub-tokens (lowercased) when the
       word actually splits.
    3. Per emitted token, ASCII-fold with preserve_original semantics:
       append the folded form ONLY when folding changes that token
       (reference analog: referenceSchema.json:16-21 ``preserve_original:
       true`` — ES's asciifolding filter operates at token granularity,
       so one accented token must not duplicate the whole document's
       stream or skew every token's tf).
    4. No stemming, no stopword removal (matches the ES schema: none
       configured).

    This function defines the semantics; the vectorized UDF below and the
    independent test oracle must agree with it.
    """
    if not text:
        return []
    out: list[str] = []

    def emit(t: str) -> None:
        out.append(t)
        folded = _fold_ascii(t)
        if folded != t:
            out.append(folded)

    for word in _WORD_RE.findall(text):
        whole = word.replace("_", "").lower()
        parts = [p.lower() for seg in word.split("_") if seg for p in _CAMEL_RE.findall(seg)]
        if whole:
            emit(whole)
        if len(parts) > 1 or (parts and parts[0] != whole):
            for p in parts:
                emit(p)
    return out


@F.pandas_udf(ArrayType(StringType()))
def tokens_code(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized code-aware analyzer (batched; no per-row Python at
    the Spark API surface — one Python call per Arrow batch)."""
    return texts.map(lambda t: analyze_code_py(t) if isinstance(t, str) else [])


def analyzer_column(col: Column | str, analyzer: str = "simple") -> Column:
    if analyzer == "simple":
        return tokens_simple(col)
    if analyzer == "code":
        c = F.col(col) if isinstance(col, str) else col
        return tokens_code(c)
    raise ValueError(f"unknown analyzer: {analyzer!r}")


def analyze_query_py(query: str, analyzer: str = "simple") -> list[str]:
    """Driver-side query analysis (queries are tiny — plain Python is the
    right tool; documents always go through the vectorized column path).
    Must mirror the column analyzers exactly."""
    if analyzer == "simple":
        return [t for t in re.split(SIMPLE_SPLIT_PATTERN, query.lower()) if t]
    if analyzer == "code":
        return analyze_code_py(query)
    raise ValueError(f"unknown analyzer: {analyzer!r}")
