"""Published quality-filter rule batteries for LLM training data.

Beyond-reference surface (the reference pipeline filters documents
with ad-hoc regex/dictionary predicates — merge_filter.sh:21-43; a
training-data pipeline at 100 TB runs the published rule sets):

* :func:`gopher_signals` — the Gopher repetition-free quality rules
  (Rae et al. 2021, appendix A1.1): word-count band, mean-word-length
  band, symbol-to-word ratio, bullet/ellipsis line ratios,
  alphabetic-word fraction, required-stopword count.
* :func:`c4_signals` — C4-style line/document rules (Raffel et al.
  2020 §2.2): keep lines that end in terminal punctuation and have
  enough words, require a minimum sentence count, drop brace /
  lorem-ipsum documents.

Both are ONE narrow projection per document — pure Catalyst column
expressions (whole-stage codegen, no shuffle, no Python), so they
scan at parquet-read speed and scale embarrassingly: the 100 TB cost
is the scan itself. Every regex is written in the Java∩RE2 common
subset (explicit ASCII whitespace classes, no lookaround) so the
DuckDB oracles run the identical patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aurora_mito_etl_spark.functions.numeric import fixed6

# Explicit ASCII-whitespace class == Java regex \s; RE2's \s lacks
# \x0b, so every portable pattern spells the class out.
WS = r"[ \t\n\x0b\f\r]"

#: Gopher rule thresholds (Rae et al. 2021 A1.1). The word-count
#: floor is the one knob commonly retuned per corpus; pass overrides
#: to :func:`gopher_signals` rather than editing these.
GOPHER_DEFAULTS: dict[str, float] = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "min_alpha_word_frac": 0.8,
    "min_stop_hits": 2,
}

#: Gopher's required-stopword panel: a document passing the filter
#: must contain at least `min_stop_hits` DISTINCT words of these.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _ws_normalized(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, WS + "+", " "))


def gopher_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
    **overrides: float,
) -> DataFrame:
    """Per-document Gopher quality signals + per-rule booleans + the
    conjunctive `gopher_keep` verdict.

    Signal definitions (all over the ASCII-whitespace-normalized
    text; fractions fixed-point-rounded to 6 digits with the
    floor-based engine-portable form so DuckDB oracle hashes match):

    * ``n_words`` — whitespace token count.
    * ``mean_word_len`` — non-whitespace chars / words.
    * ``symbol_ratio`` — (count of ``#`` + count of ``...``/``…``)
      per word (Gopher's symbol-to-word ratio).
    * ``alpha_word_frac`` — fraction of words containing >=1 ASCII
      letter (counted with one non-overlapping regex scan, not a
      per-word lambda).
    * ``n_stop_hits`` — DISTINCT required-stopword presence count.
    * ``bullet_line_frac`` / ``ellipsis_line_frac`` — fraction of
      newline-split non-blank lines starting with a bullet / ending
      with an ellipsis. Documents with no newline are one line.

    Empty/blank documents: every count is 0, fractions 0.0, and the
    word-count floor fails them — `gopher_keep` is deterministic
    false, never NULL.
    """
    cfg = {**GOPHER_DEFAULTS, **overrides}
    raw = F.coalesce(F.col(text_col), F.lit(""))
    s = _ws_normalized(raw)
    low = F.lower(s)
    n_words = F.when(s == "", F.lit(0)).otherwise(F.size(F.split(s, " ")))
    # sum of word lengths == length with the single spaces removed
    word_chars = F.length(F.replace(s, F.lit(" "), F.lit("")))
    n_symbols = (
        F.length(s) - F.length(F.replace(s, F.lit("#"), F.lit("")))
        + F.size(F.regexp_extract_all(s, F.lit(r"(\.\.\.|…)"), 1))
    )
    alpha_words = F.size(
        F.regexp_extract_all(s, F.lit("([^ ]*[A-Za-z][^ ]*)"), 1)
    )
    stop_hits = None
    for w in GOPHER_STOPWORDS:
        hit = low.rlike(rf"\b{w}\b").cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    # split on \r?\n and allow \r in the end anchors: Java $ matches
    # before a trailing \r but RE2 $ does not — CRLF text would
    # otherwise diverge from the oracle
    lines = F.filter(F.split(raw, r"\r?\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    bullet_lines = F.size(F.filter(lines, lambda l: l.rlike(r"^[ \t]*[-*•]")))
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)[ \t\r]*$"))
    )

    def frac(num: Column, den: Column) -> Column:
        return fixed6(
            F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))
        )

    out = df.select(
        F.col(id_col),
        *[F.col(k) for k in keep_cols],
        n_words.alias("n_words"),
        frac(word_chars, n_words).alias("mean_word_len"),
        frac(n_symbols, n_words).alias("symbol_ratio"),
        frac(alpha_words, n_words).alias("alpha_word_frac"),
        stop_hits.alias("n_stop_hits"),
        frac(bullet_lines, n_lines).alias("bullet_line_frac"),
        frac(ellipsis_lines, n_lines).alias("ellipsis_line_frac"),
    )
    rules = {
        "r_word_count": (F.col("n_words") >= cfg["min_words"])
        & (F.col("n_words") <= cfg["max_words"]),
        "r_word_len": (F.col("mean_word_len") >= cfg["min_mean_word_len"])
        & (F.col("mean_word_len") <= cfg["max_mean_word_len"]),
        "r_symbols": F.col("symbol_ratio") <= cfg["max_symbol_ratio"],
        "r_bullets": F.col("bullet_line_frac") <= cfg["max_bullet_line_frac"],
        "r_ellipsis": F.col("ellipsis_line_frac")
        <= cfg["max_ellipsis_line_frac"],
        "r_alpha": F.col("alpha_word_frac") >= cfg["min_alpha_word_frac"],
        "r_stopwords": F.col("n_stop_hits") >= cfg["min_stop_hits"],
    }
    keep = None
    for name, rule in rules.items():
        out = out.withColumn(name, rule)
        keep = rule if keep is None else keep & rule
    return out.withColumn("gopher_keep", keep)


def c4_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_sentences: int = 3,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """C4-style document cleaning + keep verdict.

    Line rule: keep newline-split lines that end in a terminal
    punctuation mark (``. ! ? "``) and contain at least
    `min_line_words` whitespace words; ``clean_text`` is the kept
    lines re-joined with newlines (empty string when nothing
    survives, never NULL). Document rules: at least `min_sentences`
    terminal-punctuation sentences in the cleaned text, and no ``{``
    or ``lorem ipsum`` anywhere (the C4 code/boilerplate tells).
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    kept = F.filter(
        F.split(raw, r"\r?\n"),
        lambda l: l.rlike(r'[.!?"][ \t\r]*$')
        & (
            F.size(F.filter(F.split(F.trim(l), WS + "+"), lambda w: w != ""))
            >= min_line_words
        ),
    )
    clean = F.concat_ws("\n", kept)
    n_sentences = F.size(F.regexp_extract_all(clean, F.lit(r"([.!?])"), 1))
    has_brace = raw.contains("{")
    has_lorem = F.lower(raw).contains("lorem ipsum")
    return df.select(
        F.col(id_col),
        *[F.col(k) for k in keep_cols],
        F.size(kept).alias("n_kept_lines"),
        clean.alias("clean_text"),
        n_sentences.alias("n_sentences"),
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
        (
            (n_sentences >= min_sentences) & ~has_brace & ~has_lorem
        ).alias("c4_keep"),
    )
