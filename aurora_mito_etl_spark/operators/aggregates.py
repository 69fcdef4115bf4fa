"""Aggregation operators (SURVEY.md §2.4 A1-A8).

All hash-based partial+final aggregation — Spark's groupBy gives the
map-side combine the reference gets from `sort -u` / pandas for free,
and it stays one shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_collect_sorted(
    df: DataFrame,
    group_expr: Column,
    group_alias: str,
    id_col: str,
    display_col: str,
    sep: str = ";",
) -> DataFrame:
    """A1 — the reference's flagship aggregation: group by normalized
    key; count distinct ids; pick a deterministic display value;
    `sep`-join the sorted distinct ids (string sort — the reference
    sorts PMIDs lexicographically: sorted(set(str)) at
    scripts/finalize_realease.py:591-602).

    The reference's `first(compound)` is file-order dependent; we pin
    `min(display_col)` for determinism (SURVEY §7 gotchas).
    """
    return df.groupBy(group_expr.alias(group_alias)).agg(
        F.countDistinct(id_col).alias(f"n_{id_col}"),
        F.min(display_col).alias(display_col),
        F.concat_ws(sep, F.sort_array(F.collect_set(id_col))).alias(f"{id_col}s"),
    )


def keep_first_per_key(
    df: DataFrame, key: Column, order: list[Column], key_alias: str = "__norm"
) -> DataFrame:
    """A3 — dedup by normalized key keeping one deterministic winner.

    Reference keeps first-in-file-order (scripts/
    finalize_realease.py:517-536); a distributed engine must pin an
    explicit order, so callers pass `order` (SURVEY §7 gotchas).
    Window row_number is one shuffle on the key — the same cost
    profile as groupBy, and skew-safe under AQE.
    """
    w = Window.partitionBy(key_alias).orderBy(*order)
    return (
        df.withColumn(key_alias, key)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", key_alias)
    )


def bin_right_closed(
    col: Column, edges: list[float], labels: list[str]
) -> Column:
    """A5 — pd.cut-style right-closed binning: value <= edges[i] →
    labels[i], else labels[-1]. len(labels) == len(edges)+1.

    Reference: pd.cut(bins=(-inf,1,2,4,inf)) → very-low/low/medium/high,
    scripts/finalize_realease.py:618-623.
    """
    if len(labels) != len(edges) + 1:
        raise ValueError("need len(labels) == len(edges) + 1")
    expr = F.when(col <= edges[0], labels[0])
    for e, lab in zip(edges[1:], labels[1:-1]):
        expr = expr.when(col <= e, lab)
    return expr.otherwise(labels[-1])


def topk_mean(values: Column, k: int = 3) -> Column:
    """A6/D7 — mean of the k largest elements of an array column.

    Pure builtin expression (no UDAF): sort desc, slice, aggregate.
    Reference: scripts/finalize_realease.py:169-173,217.
    """
    top = F.slice(F.sort_array(values, asc=False), 1, k)
    return F.when(
        F.size(top) > 0,
        F.aggregate(top, F.lit(0.0), lambda acc, x: acc + x) / F.size(top),
    )


def argmax_struct(score: Column, payload: Column) -> Column:
    """A7 — value of `payload` at the max `score` (max_by).

    Reference: index-of-max over the similarity panel,
    scripts/finalize_realease.py:215-218,410-413.
    """
    return F.max_by(payload, score)


def threshold_label(
    value: Column, thresholds: list[tuple[float, str]], default: str
) -> Column:
    """A8 — ordered >=-threshold labelling.

    Reference: confidence_similarity bins (≥.70 high, ≥.50 medium,
    ≥.30 low), scripts/finalize_realease.py:175-182,224.
    """
    expr = None
    for t, lab in thresholds:
        expr = F.when(value >= t, lab) if expr is None else expr.when(value >= t, lab)
    return expr.otherwise(default) if expr is not None else F.lit(default)
