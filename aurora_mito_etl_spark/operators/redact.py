"""PII redaction for training-data pipelines.

Regex-scrub of the classic structured-PII families (email, IPv4,
SSN-shaped ids, phone numbers) with typed placeholders plus
per-document match counts — the standard pre-training privacy pass
(C4 and The Pile both ship variants; production systems add NER on
top, which would slot in as a mapInPandas stage).

Pure Catalyst: one projection of chained `regexp_replace` /
`regexp_extract_all`, whole-stage codegen, no shuffle, no Python.
Every pattern is written in the Java∩RE2 common subset (no
lookaround, no backreferences) so the DuckDB oracle runs the
identical patterns. Beyond-reference surface: the reference has no
privacy pass at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (family, pattern, placeholder), applied IN ORDER: email first (its
#: local part can contain digits that later families would chew on),
#: then IPv4 before the shorter numeric shapes, SSN before phone so
#: ddd-dd-dddd is never half-eaten as a phone prefix.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "ssn",
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        r"(?:\+[0-9]{1,2}[ .-]?)?\(?[0-9]{3}\)?[ .-][0-9]{3}[ .-][0-9]{4}\b",
        "<PHONE>",
    ),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "redacted_text",
) -> DataFrame:
    """Per-document typed PII redaction.

    Output: `id_col`, one ``n_<family>`` count per pattern family,
    ``n_pii_total``, and `out_col` with every match replaced by its
    placeholder. Families apply sequentially and each family's count
    is taken on the text as already redacted by earlier families —
    counts therefore sum to exactly the number of replacements made
    (an email's digits can never double-count as a phone). NULL text
    redacts to '' with zero counts, never NULL.
    """
    cur: Column = F.coalesce(F.col(text_col), F.lit(""))
    counts: list[Column] = []
    total: Column | None = None
    for family, pat, placeholder in PII_PATTERNS:
        c = F.size(F.regexp_extract_all(cur, F.lit(f"({pat})"), 1))
        counts.append(c.alias(f"n_{family}"))
        total = c if total is None else total + c
        cur = F.regexp_replace(cur, pat, placeholder)
    return df.select(
        F.col(id_col),
        *counts,
        total.alias("n_pii_total"),
        cur.alias(out_col),
    )
