"""Custom stateful streaming operators (SURVEY §2.9 stretch:
applyInPandasWithState).

The reference's resumable LLM stage keeps a per-PMID done-set
(reference scripts/run_gpt_filter.py:81-95); its streaming
generalization is arbitrary per-key state. Two operators:

* running_totals_stream — per-key running count/sum maintained in the
  state store across micro-batches (the canonical GroupState shape).
* first_seen_stream — per-key first-sighting filter: emits a key's
  row only in the batch where it first appears (exactly-once-per-key
  with explicit state, the applyInPandasWithState twin of
  dropDuplicates).

Both also run on batch DataFrames (groupBy.applyInPandas fallback)
so semantics are testable without a streaming harness.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_totals_stream(
    df: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Streaming: per-key running (count, sum) across micro-batches.

    State is one (n, total) tuple per key — O(keys) store, no
    timeline kept. Emits the updated running totals for every key
    seen in the current batch.
    """

    def update(key, pdfs, state: GroupState):
        n, total = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"key": [str(key[0])], "n_events": [n], "total_value": [total]}
        )

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def first_seen_stream(
    df: DataFrame, key_col: str = "user_id", value_cols: list[str] | None = None
) -> DataFrame:
    """Streaming per-key first-sighting filter: a key's (first) row is
    emitted only in the micro-batch where the key first appears —
    exactly-once-per-key with explicit state, the
    applyInPandasWithState twin of dropDuplicates([key]) over an
    unbounded stream (reference done-set semantics,
    scripts/run_gpt_filter.py:81-95, generalized to any key).

    State is one boolean per key — O(distinct keys) store. Which row
    of the first batch is emitted is not defined when several arrive
    at once (same contract as dropDuplicates).
    """
    value_cols = value_cols or [c for c in df.columns if c != key_col]
    out_schema = T.StructType(
        [df.schema[key_col]] + [df.schema[c] for c in value_cols]
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            return
        state.update((True,))
        for pdf in pdfs:
            if len(pdf):
                yield pdf[[key_col, *value_cols]].iloc[[0]]
                return

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=T.StructType([T.StructField("seen", T.BooleanType())]),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def first_seen_batch(
    df: DataFrame, key_col: str = "user_id", value_cols: list[str] | None = None
) -> DataFrame:
    """Batch twin of :func:`first_seen_stream` (same output schema)."""
    value_cols = value_cols or [c for c in df.columns if c != key_col]
    out_schema = T.StructType(
        [df.schema[key_col]] + [df.schema[c] for c in value_cols]
    )

    def first(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf[[key_col, *value_cols]].iloc[[0]]

    return df.groupBy(key_col).applyInPandas(first, out_schema)


def running_totals_batch(
    df: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Batch twin of :func:`running_totals_stream` (same output
    schema) for tests and backfills."""

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": [str(pdf[key_col].iloc[0])],
                "n_events": [len(pdf)],
                "total_value": [float(pdf[value_col].sum())],
            }
        )

    return df.groupBy(key_col).applyInPandas(agg, TOTALS_SCHEMA)
