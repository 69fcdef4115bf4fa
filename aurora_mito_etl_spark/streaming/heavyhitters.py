"""Streaming token heavy hitters: bucketed Misra-Gries state
(applyInPandasWithState).

The batch tier (operators/textstats.py heavy_hitter_tokens) answers
"what are the corpus's top tokens" with a bounded candidate pass plus
an exact recount; a 100 TB INGEST pipeline also wants the streaming
form — "what is trending across everything seen SO FAR" — without
re-scanning history per micro-batch. Tokens route to `buckets` state
groups by a portable md5 key; each bucket folds its token stream into
a batched Misra-Gries summary capped at `counters` entries, the same
reduction (and therefore the same survivor guarantee) as the batch
tier's candidate pass:

    any token whose true count within its bucket exceeds
    n_bucket/(counters + 1) is guaranteed present in that bucket's
    summary after any prefix of the stream.

State per bucket is <= `counters` (token, lower_bound) entries —
total state is buckets · counters regardless of vocabulary or stream
length. Each micro-batch, every UPDATED bucket emits its current
top-`emit_k` summary rows (count-descending, token-ascending);
downstream monitoring keeps the latest emission per bucket. Stored
counts are Misra-Gries LOWER BOUNDS (undercounted by at most the
bucket's reduction depth), not exact counts — the batch tier's
recount is the exactness path; this stream is the always-on trend
monitor.

Tokenization is the shared ascii_ws_tokens chain, so a token counts
identically here, in the batch tier, and in every SQL oracle.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from aurora_mito_etl_spark.operators.textstats import ascii_ws_tokens

OUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("lower_bound", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("toks", T.ArrayType(T.StringType())),
        T.StructField("cnts", T.ArrayType(T.LongType())),
    ]
)


def _bucket_of(token: str, buckets: int) -> int:
    """Portable md5 bucket key — stable across restarts, engines and
    the batch twin (no Python hash randomization, no JVM hashCode)."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:15], 16) % buckets


def _mg_fold(
    counts: dict[str, int], batch_counts: "pd.Series", counters: int
) -> dict[str, int]:
    """Merge one batch's exact token counts into a Misra-Gries summary
    and restore the size bound: subtract the order statistic that
    leaves <= `counters` positive entries, drop the rest. Identical
    reduction to the batch tier's candidate pass (textstats.py)."""
    import numpy as np

    for tok, c in batch_counts.items():
        counts[tok] = counts.get(tok, 0) + int(c)
    over = len(counts) - counters
    if over > 0:
        vals = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
        d = int(np.partition(vals, over - 1)[over - 1])
        counts = {t: v - d for t, v in counts.items() if v > d}
    return counts


def _tokenize_bucketed(df: DataFrame, text_col: str, buckets: int) -> DataFrame:
    """(bucket, tok): one row per token occurrence — projections +
    explode only, legal on a streaming DataFrame. The Arrow tokenizer
    emits the same strings as ascii_ws_tokens / tokens_expr."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.StringType()))
    def tokens_udf(s: pd.Series) -> pd.Series:
        return s.map(ascii_ws_tokens)

    @pandas_udf(T.IntegerType())
    def bucket_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda t: _bucket_of(t, buckets)).astype("int32")

    toks = df.select(
        F.explode(tokens_udf(F.col(text_col))).alias("tok")
    ).where(F.col("tok") != "")
    return toks.select(bucket_udf(F.col("tok")).alias("bucket"), "tok")


def heavy_hitter_stream(
    df: DataFrame,
    text_col: str = "text",
    buckets: int = 16,
    counters: int = 1024,
    emit_k: int = 20,
) -> DataFrame:
    """Streaming heavy-hitter monitor: per micro-batch, each updated
    bucket emits its current top-`emit_k` (token, lower_bound) rows.
    See the module docstring for the state bound and the survivor
    guarantee."""

    def update(key, pdfs, state: GroupState):
        (bucket,) = key
        if state.exists:
            toks, cnts = state.get
            counts = {t: int(c) for t, c in zip(toks, cnts)}
        else:
            counts = {}
        for pdf in pdfs:
            counts = _mg_fold(counts, pdf["tok"].value_counts(), counters)
        # plain Python types: state pickles through the JVM store
        state.update((list(counts), [int(v) for v in counts.values()]))
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:emit_k]
        if top:
            yield pd.DataFrame(
                [(int(bucket), t, int(c)) for t, c in top],
                columns=["bucket", "token", "lower_bound"],
            )

    return (
        _tokenize_bucketed(df, text_col, buckets)
        .groupBy("bucket")
        .applyInPandasWithState(
            update,
            outputStructType=OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def heavy_hitter_batch(
    df: DataFrame,
    text_col: str = "text",
    buckets: int = 16,
    counters: int = 1024,
    emit_k: int = 20,
) -> DataFrame:
    """Batch twin: identical bucketing, identical Misra-Gries fold,
    one pass over a static DataFrame — for tests, backfills, and
    parity with the streaming summaries. (For EXACT corpus top-k use
    textstats.heavy_hitter_tokens, which recounts candidates.)"""

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        counts = _mg_fold({}, pdf["tok"].value_counts(), counters)
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:emit_k]
        bucket = int(pdf["bucket"].iloc[0]) if len(pdf) else -1
        return pd.DataFrame(
            [(bucket, t, int(c)) for t, c in top],
            columns=["bucket", "token", "lower_bound"],
        )

    return (
        _tokenize_bucketed(df, text_col, buckets)
        .groupBy("bucket")
        .applyInPandas(summarize, OUT_SCHEMA)
    )
