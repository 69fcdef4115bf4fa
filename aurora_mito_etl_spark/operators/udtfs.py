"""Python user-defined table functions (SURVEY §2.10 — D6 was
'UDTF-shaped' and solved with explode; these are the real UDTF
surface for fan-out logic that explode can't express).

Spark 4 UDTFs emit any number of rows per input row from Python.
The rule of thumb stands: if the fan-out is expressible with
split/explode/posexplode, use those (JVM-side); reach for a UDTF
only when the row-generation logic is genuinely imperative —
e.g. sentence segmentation with abbreviation handling, or windowed
text chunking with overlap (the LLM-ingestion chunker below).
"""

from __future__ import annotations

from functools import cache

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokens whose trailing '.' does not end a sentence (the token is
# whatever sits between the last whitespace and the dot, so 'e.g'
# covers the second dot of 'e.g.' and single letters cover the first).
_ABBREVS = frozenset(
    {"e.g", "i.e", "eg", "ie", "al", "etc", "fig", "dr", "mr", "mrs",
     "vs", "approx", "no"}
)


def split_sentences(text: str) -> list[str]:
    """Imperative sentence segmentation: '.'/'!'/'?' terminate a
    sentence unless the '.' follows a known abbreviation token, a
    single letter (initials), or sits between digits (3.5)."""
    text = text or ""
    out, start, n = [], 0, len(text)

    def emit(end: int) -> None:
        nonlocal start
        seg = text[start:end].strip()
        if seg:
            out.append(seg)
        start = end

    for i, ch in enumerate(text):
        if ch in "!?":
            emit(i + 1)
        elif ch == ".":
            if 0 < i < n - 1 and text[i - 1].isdigit() and text[i + 1].isdigit():
                continue  # decimal point
            j = i - 1
            while j >= 0 and not text[j].isspace():
                j -= 1
            token = text[j + 1 : i].lower()
            if token in _ABBREVS or (len(token) == 1 and token.isalpha()):
                continue
            emit(i + 1)
    emit(n)
    return out


def chunk_tokens(
    tokens: list[str], chunk_size: int, overlap: int
) -> list[tuple[int, str, int]]:
    """Overlapping token windows (stride = chunk_size − overlap).
    Yields (idx, text, n_tokens).

    DEMO PATH: this exists to exercise the Python-UDTF surface
    (lateral join over a table function, §2.10) end-to-end. Pipelines
    should use :func:`aurora_mito_etl_spark.operators.text.chunk_windows`
    — the expression-only production chunker (no Python in the hot
    path, gap-free tail tiling). See COVERAGE.md 'Chunking'."""
    if overlap >= chunk_size:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_size ({chunk_size}) — "
            "stride would collapse to 1 and fan out one chunk per token"
        )
    stride = chunk_size - overlap
    out = []
    idx = 0
    for start in range(0, max(len(tokens) - overlap, 1), stride):
        window = tokens[start : start + chunk_size]
        if not window:
            break
        out.append((idx, " ".join(window), len(window)))
        idx += 1
        if start + chunk_size >= len(tokens):
            break
    return out


@cache
def _sentences_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string", useArrow=True)
    class Sentences:
        def eval(self, text: str):  # noqa: D401
            for i, s in enumerate(split_sentences(text or "")):
                yield i, s

    return Sentences


@cache
def _chunks_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string, n_tokens int", useArrow=True)
    class Chunks:
        def eval(self, text: str, chunk_size: int, overlap: int):
            # repo-wide explicit ASCII whitespace class, NOT bare
            # str.split(): Python's split() also breaks on Unicode
            # whitespace (NBSP, thin space), which the DuckDB oracle's
            # squeeze+split never does — tokens must match exactly
            import re

            tokens = [
                t for t in re.split(r"[ \t\n\x0b\f\r]+", text or "") if t
            ]
            for idx, chunk, n in chunk_tokens(tokens, chunk_size, overlap):
                yield idx, chunk, n

    return Chunks


def sentences(text: Column):
    """Lateral-join-able sentence table: one row per sentence with
    its index. Usage: df.lateralJoin(sentences(F.col('text')))."""
    return _sentences_udtf()(text)


def chunks(text: Column, chunk_size: int = 128, overlap: int = 32):
    """Overlapping token chunks per document — the fan-out step of an
    embedding-ingestion pipeline."""
    return _chunks_udtf()(text, F.lit(chunk_size), F.lit(overlap))
