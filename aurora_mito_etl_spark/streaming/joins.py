"""Stream-stream joins with watermark-bounded state (SURVEY §2.9
surface extension — the reference has no streaming joins at all; its
nearest analogue is the batch two-file `join -t` in merge_filter.sh).

The canonical shape is event attribution: a left stream of causes
(impressions, requests, uploads) joined to a right stream of effects
(clicks, responses, completions) on a key, with the effect required
to land within a bounded interval after its cause. Both sides carry
watermarks and the join condition bounds event time in BOTH
directions, which is exactly what lets Spark expire per-key state —
without the time bound the state store grows forever, the classic
stream-join mistake this module exists to encode once, correctly.

State size is O(keys active inside the interval + watermark delay),
independent of stream length — the property that survives a month-long
run at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "10 minutes",
    watermark_delay: str = "2 minutes",
    extra_cond: Column | None = None,
) -> DataFrame:
    """Inner-join two STREAMING DataFrames on `on` keys where the
    right event lands in ``[left_ts, left_ts + max_delay]``.

    Both sides are watermarked with `watermark_delay` (how late data
    may arrive) and the interval bound is part of the join condition
    (how long a cause waits for its effect) — both are required for
    bounded state; this function refuses to build the unbounded
    variant. Column name collisions outside `on` must be resolved by
    the caller (standard Spark join rules).
    """
    if not on:
        raise ValueError("stream-stream join needs at least one equality key")
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    cond = None
    for k in on:
        eq = lw[k] == rw[k]
        cond = eq if cond is None else cond & eq
    bound = (rw[right_ts] >= lw[left_ts]) & (
        rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}")
    )
    cond = cond & bound
    if extra_cond is not None:
        cond = cond & extra_cond
    joined = lw.join(rw, cond, "inner")
    # drop the duplicated key columns from the right side
    for k in on:
        joined = joined.drop(rw[k])
    return joined


def attribute_effects(
    causes: DataFrame,
    effects: DataFrame,
    key: str,
    cause_ts: str,
    effect_ts: str,
    max_delay: str = "10 minutes",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Attribution projection over :func:`interval_join_streams`:
    one row per (cause, effect) pair within the window, with the
    cause→effect latency in seconds."""
    joined = interval_join_streams(
        causes,
        effects,
        on=[key],
        left_ts=cause_ts,
        right_ts=effect_ts,
        max_delay=max_delay,
        watermark_delay=watermark_delay,
    )
    return joined.withColumn(
        "latency_s",
        F.col(effect_ts).cast("double") - F.col(cause_ts).cast("double"),
    )
