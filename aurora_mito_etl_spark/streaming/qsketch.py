"""Streaming per-group quantile sketch (applyInPandasWithState).

The batch tier (`operators/quantiles.grouped_quantile_sketch`)
answers "what are the per-group quantiles of everything we ingested";
a training-data pipeline also wants the always-on form — live
percentile monitoring of arriving scores/lengths/prices — without
re-scanning history per micro-batch.

State per group is the deterministic sig-digit bucket histogram:
bucket ids (sig-floored 1e-6-grid micros) and their counts — BOUNDED
forever (~47k buckets worst case at sig=3, independent of row count)
and ORDER-FREE (pure counting), so after any sequence of micro-batches
the emitted quantiles equal the batch operator on the same rows
EXACTLY, regardless of arrival order or batch boundaries (the same
strongest-parity class as the PSI drift monitor; mergeable-by-addition
is precisely what makes the sketch streamable).

Each micro-batch, every updated group emits
``(group, quantile, value, n)`` using the SAME integer ceil(p·n)
thresholds and bucket-min selection as the batch twin — pinned in
tests/test_streaming_qsketch.py.

NULL values are dropped (the batch contract); a NULL group key is a
real group. The value fold runs on the micros6 python twin + the
shared :func:`~aurora_mito_etl_spark.operators.quantiles.sig_floor_py`
— the same grid, the same overflow behavior.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.numeric import micros6_py
from ..operators.quantiles import DEFAULT_QUANTILES, sig_floor_py

OUT_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType(), True),
        T.StructField("quantile", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ]
)


def _fold_values(values: np.ndarray, sig: int, acc: dict[int, int]) -> None:
    """Accumulate sig-floored grid buckets; python-int micros via the
    micros6 twin per UNIQUE value (buckets are few; values may not be)."""
    uniq, cnt = np.unique(values, return_counts=True)
    for x, c in zip(uniq, cnt):
        w = sig_floor_py(micros6_py(float(x)), sig)
        acc[w] = acc.get(w, 0) + int(c)


def _select(acc: dict[int, int], quantiles) -> list[tuple[str, float, int]]:
    """Integer-threshold discrete quantile selection over the sorted
    bucket histogram — the batch operator's selection, in python."""
    n = sum(acc.values())
    if n == 0:
        return []
    items = sorted(acc.items())
    out = []
    for name, qnum, qden in quantiles:
        thresh = (n * qnum + qden - 1) // qden
        cum = 0
        for w, c in items:
            cum += c
            if cum >= thresh:
                out.append((name, w / 1_000_000.0, n))
                break
        else:  # thresh == 0 (p=0): smallest bucket
            out.append((name, items[0][0] / 1_000_000.0, n))
    return out


def quantile_sketch_stream(
    df: DataFrame,
    group_col: str = "group",
    value_col: str = "value",
    quantiles: tuple[tuple[str, int, int], ...] = DEFAULT_QUANTILES,
    sig_digits: int = 3,
) -> DataFrame:
    """Always-on per-group quantile monitor: per micro-batch, each
    updated group emits its current (quantile, value, n) rows. State
    is the bounded bucket histogram per group — order-free, so the
    final emission equals the batch twin on the same rows exactly."""

    def update(key, pdfs, state: GroupState):
        (g,) = key
        if state.exists:
            b, c = state.get
            acc = dict(zip(b, c))
        else:
            acc = {}
        n_before = sum(acc.values())
        for pdf in pdfs:
            vals = pdf[value_col].dropna().to_numpy(dtype=np.float64)
            if len(vals):
                _fold_values(vals, sig_digits, acc)
        # counts only grow, so an unchanged total means this batch
        # contributed nothing (all-NULL) — skip the state write and the
        # emission: append mode must not re-emit unchanged quantiles.
        if not acc or sum(acc.values()) == n_before:
            return
        state.update((list(acc.keys()), [int(v) for v in acc.values()]))
        rows = [(g, name, v, n) for name, v, n in _select(acc, quantiles)]
        yield pd.DataFrame(
            rows, columns=["group", "quantile", "value", "n"]
        ).astype({"value": np.float64, "n": np.int64})

    return (
        df.select(
            F.col(group_col).cast("string").alias("group"), F.col(value_col)
        )
        .groupBy("group")
        .applyInPandasWithState(
            update,
            outputStructType=OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def quantile_sketch_batch(
    df: DataFrame,
    group_col: str = "group",
    value_col: str = "value",
    quantiles: tuple[tuple[str, int, int], ...] = DEFAULT_QUANTILES,
    sig_digits: int = 3,
) -> DataFrame:
    """Batch twin — the REGISTERED Catalyst operator plus the per-group
    non-NULL count, shaped like the stream's emissions: the parity
    anchor (order-free counts make the equality exact)."""
    from ..operators.quantiles import grouped_quantile_sketch

    base = df.select(
        F.col(group_col).cast("string").alias("group"), F.col(value_col)
    )
    qs = grouped_quantile_sketch(base, "group", value_col, quantiles, sig_digits)
    n = (
        base.where(F.col(value_col).isNotNull())
        .groupBy("group")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return qs.join(n, qs["group"].eqNullSafe(n["group"])).select(
        qs["group"], "quantile", "value", "n"
    )
