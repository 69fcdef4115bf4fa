"""Unicode operators that genuinely need Python (SURVEY §2.2 P13/P15).

The reference shells out to `uconv -x Any-NFC` and `iconv -t
ASCII//TRANSLIT` (reference scripts/process_pubmed.sh:120,135).
Spark has no NFC/transliteration builtin, so these are the engine's
two sanctioned Python hot-path functions — Arrow-batched pandas UDFs
(vectorized transfer, ~10-100× row-at-a-time UDFs; see
/opt/skills/guides/pyspark_guide.md).

Documented divergence (SURVEY §7): glibc's //TRANSLIT uses locale
tables (e.g. 'ö'→'"o' in some locales); our transliteration is
NFKD + combining-mark strip, which is deterministic and
locale-independent — the better engine semantic.
"""

from __future__ import annotations

import unicodedata
from functools import cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# The pandas_udf wrappers are created lazily (first call) because
# decorating at import time requires an active SparkContext.
@cache
def _nfc_udf():
    @pandas_udf(T.StringType())
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: unicodedata.normalize("NFC", v) if v is not None else None
        )

    return nfc


@cache
def _ascii_udf():
    def tr(v: str | None) -> str | None:
        if v is None:
            return None
        decomposed = unicodedata.normalize("NFKD", v)
        stripped = "".join(c for c in decomposed if not unicodedata.combining(c))
        return stripped.encode("ascii", "ignore").decode("ascii")

    @pandas_udf(T.StringType())
    def ascii_(s: pd.Series) -> pd.Series:
        return s.map(tr)

    return ascii_


def nfc_normalize(col: Column) -> Column:
    """P13 — Unicode NFC normalization (composed form)."""
    return _nfc_udf()(col)


def ascii_transliterate(col: Column) -> Column:
    """P15 — best-effort ASCII transliteration: NFKD-decompose, drop
    combining marks, then drop any remaining non-ASCII."""
    return _ascii_udf()(col)


def normalize_text_full(col: Column) -> Column:
    """P13 + P15 composed: NFC first (canonical compose), then ASCII
    fold — mirrors the reference's uconv→iconv order."""
    return ascii_transliterate(nfc_normalize(col))


def normalize_compound_name(col: Column) -> Column:
    """D1 — the reference's compound-name normalization as a pure
    column expression (no UDF needed): lowercase, canonicalize
    dashes, strip spaces and hyphens, de-pluralize a trailing 's'
    unless the word ends in us/is/os/gas (reference
    scripts/finalize_realease.py:517-525).

    Divergence (documented per SURVEY §7): the reference strips ASCII
    dashes BEFORE converting unicode dashes, so '–' survives in its
    keys; we canonicalize first then strip — the intended semantics.
    """
    c = F.lower(F.trim(col))
    c = F.translate(c, "–—−", "---")
    c = F.regexp_replace(c, r"[\s\-]+", "")
    keep_s = (
        c.endswith("us") | c.endswith("is") | c.endswith("os") | c.endswith("gas")
    )
    return F.when(
        c.endswith("s") & ~keep_s & (F.length(c) > 4),
        F.substring(c, 1, F.length(c) - 1).cast("string"),
    ).otherwise(c)
