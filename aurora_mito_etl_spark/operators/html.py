"""HTML main-content extraction (beyond-reference; r12 VERDICT ask #4).

The reference's only HTML handling is an inline-tag strip over PubMed
abstracts (reference scripts/process_pubmed.sh:117 → `text.py:37`). A
100 TB web-corpus pipeline needs the step BEFORE any quality gate:
boilerplate-aware main-content extraction — drop scripts/styles/
chrome, keep the text-dense blocks (the trafilatura/jusText heuristic
family, reduced to a deterministic, engine-portable core).

Everything here is pure Catalyst expression work — regex strips, a
block split, higher-order `transform`/`filter` over the block array,
one `array_join` — so the whole extraction fuses into whole-stage
codegen with zero Python in the hot path, and every step has an exact
DuckDB twin (same RE2-compatible patterns, same lambda shapes) for the
oracle gate.

Portability notes (CLAUDE.md invariants):
- regexes avoid backreferences (DuckDB is RE2) — script and style get
  separate patterns instead of ``</\\1>``;
- whitespace squeeze uses the explicit ASCII class, trim is the
  ASCII-space form on both engines;
- ``&nbsp;`` decodes to a PLAIN space (U+00A0 would be invisible
  unicode whitespace downstream — the r10 divergence class);
- entity decode runs AFTER tag stripping, so ``&lt;script&gt;`` in
  text stays literal text and is never re-parsed as markup;
- ``&amp;`` decodes LAST (standard order: ``&amp;lt;`` → ``&lt;``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Non-content containers removed wholesale (tags AND their payload).
# (?s) lets .*? cross newlines; non-greedy stops at the first closer.
_SCRIPT_RE = r"(?si)<script\b[^>]*>.*?</script\s*>"
_STYLE_RE = r"(?si)<style\b[^>]*>.*?</style\s*>"
_HEAD_RE = r"(?si)<head\b[^>]*>.*?</head\s*>"
_COMMENT_RE = r"(?s)<!--.*?-->"

# Block-level boundaries: splitting on these turns a page into the
# candidate text blocks the density rule scores. Inline tags (<a>,
# <span>, <b>, …) deliberately survive the split — anchors are what
# the link-density rule counts.
_BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|tr|td|th|table|thead|tbody|"
    r"section|article|header|footer|nav|aside|blockquote|br|hr|form|"
    r"figure|figcaption|pre|dl|dt|dd|main|body|html)\b[^>]*>"
)

_ANY_TAG_RE = r"<[^>]+>"
_ASCII_WS_RE = r"[ \t\n\x0b\f\r]+"

# Keep a block when it has at least MIN_BLOCK_CHARS of clean text AND
# is not link-dominated: every anchor must be "paid for" by
# LINK_TEXT_CHARS characters of text (nav bars / footers are short
# runs of anchors and fail; paragraphs citing a link or two pass).
MIN_BLOCK_CHARS = 25
LINK_TEXT_CHARS = 40


def strip_noise(col: Column) -> Column:
    """Remove script/style/head payloads and comments (order matters:
    comments last, so commented-out scripts disappear either way)."""
    c = F.regexp_replace(col, _SCRIPT_RE, " ")
    c = F.regexp_replace(c, _STYLE_RE, " ")
    c = F.regexp_replace(c, _HEAD_RE, " ")
    return F.regexp_replace(c, _COMMENT_RE, " ")


def _decode_entities(c: Column) -> Column:
    c = F.replace(c, F.lit("&nbsp;"), F.lit(" "))
    c = F.replace(c, F.lit("&quot;"), F.lit('"'))
    c = F.replace(c, F.lit("&#39;"), F.lit("'"))
    c = F.replace(c, F.lit("&apos;"), F.lit("'"))
    c = F.replace(c, F.lit("&lt;"), F.lit("<"))
    c = F.replace(c, F.lit("&gt;"), F.lit(">"))
    return F.replace(c, F.lit("&amp;"), F.lit("&"))


def _clean_block(x: Column) -> Column:
    """Strip remaining (inline) tags, decode entities, squeeze ASCII
    whitespace, ASCII-trim — the per-block text view."""
    t = F.regexp_replace(x, _ANY_TAG_RE, " ")
    t = _decode_entities(t)
    t = F.regexp_replace(t, _ASCII_WS_RE, " ")
    return F.trim(t)


def _anchor_count(x: Column) -> Column:
    """Number of '<a ' openings in the RAW block — each removal drops
    exactly 3 chars, so the length delta / 3 is the count (no regex
    extraction needed; stays in codegen)."""
    return (
        (F.length(x) - F.length(F.replace(x, F.lit("<a "), F.lit("")))) / 3
    ).cast("long")


def extract_main_text(
    df: DataFrame,
    html_col: str,
    out_col: str = "main_text",
    min_block_chars: int = MIN_BLOCK_CHARS,
    link_text_chars: int = LINK_TEXT_CHARS,
    kept_col: str | None = "n_blocks_kept",
) -> DataFrame:
    """Add `out_col` = newline-joined text of the kept blocks of
    `html_col` (and `kept_col` = how many blocks survived).

    Per row: strip noise containers → split on block tags → per block
    compute (clean text, anchor count) → keep text-dense blocks →
    join. One projection, no shuffle, no Python."""
    stripped = strip_noise(F.col(html_col))
    scored = F.transform(
        F.split(stripped, _BLOCK_TAG_RE),
        lambda x: F.struct(
            _clean_block(x).alias("t"), _anchor_count(x).alias("na")
        ),
    )
    kept = F.filter(
        scored,
        lambda s: (F.length(s["t"]) >= min_block_chars)
        & (
            (s["na"] == 0)
            | (F.length(s["t"]) >= F.lit(link_text_chars) * s["na"])
        ),
    )
    out = df.withColumn(
        out_col, F.array_join(F.transform(kept, lambda s: s["t"]), "\n")
    )
    if kept_col is not None:
        out = out.withColumn(kept_col, F.size(kept).cast("long"))
    return out


def main_text_sql(
    html_expr: str,
    min_block_chars: int = MIN_BLOCK_CHARS,
    link_text_chars: int = LINK_TEXT_CHARS,
) -> tuple[str, str]:
    """The DuckDB twin: (main_text_expr, n_blocks_kept_expr) over an
    arbitrary HTML SQL expression — the SAME patterns and the SAME
    lambda pipeline, so oracle parity is by construction. Backslashes
    reach DuckDB verbatim (CLAUDE.md: never double-escape)."""
    stripped = (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"{html_expr}, "
        r"'(?si)<script\b[^>]*>.*?</script\s*>', ' ', 'g'), "
        r"'(?si)<style\b[^>]*>.*?</style\s*>', ' ', 'g'), "
        r"'(?si)<head\b[^>]*>.*?</head\s*>', ' ', 'g'), "
        r"'(?s)<!--.*?-->', ' ', 'g')"
    )
    block_re = (
        r"'(?i)</?(?:p|div|h[1-6]|li|ul|ol|tr|td|th|table|thead|tbody|"
        r"section|article|header|footer|nav|aside|blockquote|br|hr|form|"
        r"figure|figcaption|pre|dl|dt|dd|main|body|html)\b[^>]*>'"
    )
    clean = (
        "trim(regexp_replace("
        "replace(replace(replace(replace(replace(replace(replace("
        r"regexp_replace(x, '<[^>]+>', ' ', 'g'), "
        "'&nbsp;', ' '), '&quot;', '\"'), '&#39;', chr(39)), "
        "'&apos;', chr(39)), '&lt;', '<'), '&gt;', '>'), '&amp;', '&'), "
        r"'[ \t\n\x0b\f\r]+', ' ', 'g'), ' ')"
    )
    na = "CAST((length(x) - length(replace(x, '<a ', ''))) / 3 AS BIGINT)"
    scored = (
        f"list_transform(string_split_regex({stripped}, {block_re}), "
        f"x -> struct_pack(t := {clean}, na := {na}))"
    )
    kept = (
        f"list_filter({scored}, s -> length(s.t) >= {min_block_chars} "
        f"AND (s.na = 0 OR length(s.t) >= {link_text_chars} * s.na))"
    )
    # string_agg over an EMPTY list is NULL in DuckDB while Spark's
    # array_join gives '' — coalesce to '' exactly when the input was
    # non-NULL (NULL html stays NULL on both engines).
    main = (
        f"coalesce(list_aggregate(list_transform({kept}, s -> s.t), "
        f"'string_agg', chr(10)), "
        f"CASE WHEN ({html_expr}) IS NULL THEN NULL ELSE '' END)"
    )
    n_kept = f"CAST(len({kept}) AS BIGINT)"
    return main, n_kept
