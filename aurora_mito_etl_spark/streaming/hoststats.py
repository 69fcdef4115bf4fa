"""Streaming per-host distinct-content monitor (applyInPandasWithState).

The batch tier (`operators/sketches.kmv_distinct`, registered as
`docs_host_distinct_kmv`) answers "how much distinct content has each
host contributed"; a crawl pipeline also wants the always-on form —
per-host doc counts and distinct-content estimates as fetches arrive —
without re-scanning history per micro-batch.

State per host is the KMV bottom-k sketch: the k smallest 48-bit md5
prefixes of the content, as a sorted list, plus the running doc count.
BOUNDED forever (k+1 numbers per host) and ORDER-FREE (merge = set
union, keep k smallest), so after any sequence of micro-batches the
emitted estimate equals the batch operator on the same rows EXACTLY,
regardless of arrival order or batch boundaries — the same
strongest-parity class as the quantile/PSI/centroid monitors (a
mergeable-by-union state is precisely what makes the sketch
streamable).

Each micro-batch, every updated host emits
``(host, n_docs, k_used, distinct_est)`` with the batch twin's exact
arithmetic: below saturation the estimate IS the count of hashes
held; at saturation it is (k-1)·2^48 / h_k — one exact IEEE multiply
(the (k-1)·2^48 significand fits 53 bits) and one correctly-rounded
divide, fixed6'd — identical in Spark SQL, DuckDB and here.

NULL content rows count toward n_docs but contribute no hash (the
batch contract); a NULL host is a real group. Pinned by
tests/test_streaming_hoststats.py.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.numeric import fixed6_py
from ..operators.sketches import KMV_PREFIX_BITS

OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), True),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("k_used", T.LongType(), False),
        T.StructField("distinct_est", T.DoubleType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_docs", T.LongType()),
        T.StructField("bottom", T.ArrayType(T.LongType())),
    ]
)


def _hash48(text: str) -> int:
    """The engine twin of conv(substr(md5(x),1,12),16,10): md5 of the
    UTF-8 bytes, first 12 hex chars as an int — 48 bits, exact as a
    double."""
    return int(hashlib.md5(text.encode("utf-8")).hexdigest()[:12], 16)


def _estimate(n_held: int, h_k: int | None, k: int) -> float:
    if n_held == 0:
        return 0.0
    if n_held < k:
        return fixed6_py(float(n_held))
    # same op sequence as the Spark/DuckDB twins: exact product, one
    # correctly-rounded divide
    return fixed6_py(float(k - 1) * float(1 << KMV_PREFIX_BITS) / h_k)


def host_stats_stream(
    df: DataFrame,
    host_col: str = "host",
    value_col: str = "text",
    k: int = 64,
) -> DataFrame:
    """Always-on per-host content monitor: per micro-batch, each
    updated host emits (host, n_docs, k_used, distinct_est). State is
    the bounded KMV sketch per host — order-free, so the final
    emission equals the batch twin on the same rows exactly."""

    def update(key, pdfs, state: GroupState):
        (host,) = key
        if state.exists:
            n_docs, bottom = state.get
            held = set(bottom)
        else:
            n_docs, held = 0, set()
        new_rows = 0
        for pdf in pdfs:
            new_rows += len(pdf)
            for v in pdf[value_col].dropna():
                held.add(_hash48(v))
        if new_rows == 0:
            return
        n_docs += new_rows
        bottom = sorted(held)[:k]
        state.update((n_docs, bottom))
        h_k = bottom[-1] if bottom else None
        yield pd.DataFrame(
            [
                {
                    "host": host,
                    "n_docs": n_docs,
                    "k_used": len(bottom),
                    "distinct_est": _estimate(len(bottom), h_k, k),
                }
            ]
        ).astype({"n_docs": "int64", "k_used": "int64", "distinct_est": "float64"})

    return (
        df.select(
            F.col(host_col).cast("string").alias("host"), F.col(value_col)
        )
        .groupBy("host")
        .applyInPandasWithState(
            update,
            outputStructType=OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def host_stats_batch(
    df: DataFrame,
    host_col: str = "host",
    value_col: str = "text",
    k: int = 64,
) -> DataFrame:
    """Batch twin — the REGISTERED Catalyst operator, shaped like the
    stream's emissions: the parity anchor (order-free set state makes
    the equality exact)."""
    from aurora_mito_etl_spark.operators.sketches import kmv_distinct

    base = df.select(
        F.col(host_col).cast("string").alias("host"), F.col(value_col)
    )
    out = kmv_distinct(base, "host", value_col, k=k)
    return out.select(
        "host",
        F.col("n_rows").alias("n_docs"),
        "k_used",
        "distinct_est",
    )
