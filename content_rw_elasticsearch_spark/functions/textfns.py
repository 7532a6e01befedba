"""Scalar text-normalization chain — the reference's HTML transformer set
re-expressed as native columnar expressions (whole-stage codegen; no UDF).

Reference: /root/reference/pkg/html/transformer.go:12-67 — nine pure
string→string transformers folded in a PINNED order by TransformText
(transformer.go:24-30; composition for body at pkg/mapper/mapper.go:202-211).
Applying TagsRemover before PullTagTransformer would leave pull-quote text
behind — the order is a correctness contract pinned by the reference's
composite golden test (pkg/html/transformer_test.go:10-51) and by ours.

Every pattern below is valid in BOTH Java regex (Spark) and RE2 (DuckDB) —
no lookarounds, no backreferences — so the DuckDB oracle replays the chain
verbatim. The pattern constants are shared with oracle.py; they cannot
drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) in the PINNED application order.
# C1 transformer.go:12,32-34 | C2 :13,36-38 | C4 :15,45-47 | C5 :16,49-51
# C7 :17,57-59 | C8 :18,61-63 | C9 :19,65-67
CHAIN_REGEX_STAGES: list[tuple[str, str, str]] = [
    ("interactive_graphics", r'(?is)<div[^>]*class="interactive-comp"[^>]*>.*?</div>', ""),
    ("pull_tags", r"(?is)<pull-quote[^>]*>.*?</pull-quote>", ""),
    ("script_tags", r"(?is)<script[^>]*>.*?</script>", ""),
    ("all_tags", r"<[^>]*>", ""),
    ("embeds", r"embed\d+", ""),
    ("captions", r"(?i)\[/?caption[^\]]*\]", ""),
    ("whitespace", r"\s+", " "),
]

# C3 (transformer.go:14,40-43): &nbsp; → space, then entity unescape.
# Single-pass ordered literal replacements (amp last, matching one-pass
# html-unescape behavior for strings like '&amp;lt;').
ENTITY_REPLACEMENTS: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def unescape_entities(col: Column) -> Column:
    for old, new in ENTITY_REPLACEMENTS:
        col = F.replace(col, F.lit(old), F.lit(new))
    return col


def html_text_chain(col: Column | str) -> Column:
    """The full pinned chain: C1 → C2 → C3 → C4 → C5 → C7 → C8 → C9 → C6.

    Deliberate divergence from the reference's composition
    (mapper.go:202-211 applies OuterSpaceTrimmer BEFORE Embed1Replacer /
    SquaredCaptionReplacer / DuplicateWhiteSpaceRemover, so its output can
    retain one leading/trailing space when the later stages re-expose
    whitespace): we move the trim LAST so clean text never carries outer
    whitespace. Pinned by our composite golden and replayed identically in
    the DuckDB oracle."""
    c = F.col(col) if isinstance(col, str) else col
    stages = dict((n, (p, r)) for n, p, r in CHAIN_REGEX_STAGES)
    for name in ("interactive_graphics", "pull_tags"):
        p, r = stages[name]
        c = F.regexp_replace(c, p, r)
    c = unescape_entities(c)
    for name in ("script_tags", "all_tags", "embeds", "captions", "whitespace"):
        p, r = stages[name]
        c = F.regexp_replace(c, p, r)
    return F.trim(c)


def title_text_chain(col: Column | str) -> Column:
    """The SHORT chain used for lead_headline and byline
    (mapper.go:183-193): EntityTransformer → TagsRemover →
    OuterSpaceTrimmer → DuplicateWhiteSpaceRemover. Trim/dedupe order is
    commutative here (TrimSpace strips all outer whitespace), so the
    composition below is exactly the reference's result."""
    c = F.col(col) if isinstance(col, str) else col
    stages = dict((n, (p, r)) for n, p, r in CHAIN_REGEX_STAGES)
    c = unescape_entities(c)
    p, r = stages["all_tags"]
    c = F.regexp_replace(c, p, r)
    p, r = stages["whitespace"]
    return F.trim(F.regexp_replace(c, p, r))


def web_url(uuid_col: Column, prefix: str = "https://www.ft.com/content/") -> Column:
    """URL templating — reference pkg/mapper/mapper.go:20-23,258-261."""
    return F.concat(F.lit(prefix), uuid_col)


def api_url(uuid_col: Column, base: str = "https://api.ft.com") -> Column:
    """model_api_url — the reference upgrades an http:// BaseAPIURL to
    https before templating (mapper.go:57-59, :261)."""
    return F.concat(F.lit(base + "/content/"), uuid_col)
