"""Incremental / streaming ingestion (SURVEY §2.9 I1-I3).

The reference's incremental structure is (a) baseline + updatefiles
landing dirs consumed with wget -c -N (reference
scripts/download_raw.sh:30-31) and (b) at-most-once-per-PMID resume
by replaying the output file (scripts/run_gpt_filter.py:81-95).
Structured Streaming generalizes both: a file source discovers new
landed files per micro-batch, `dropDuplicates` keeps exactly-once
per key across batches (state store), and the checkpoint replaces
the replay. `availableNow` triggers give the batch-like "drain what
has landed, then stop" mode the reference's cron-style runs imply.

Batch fallbacks (`read_files_modified_after`, `resume_anti_join`)
cover engines/stores where streaming is not wanted — same semantics,
caller-managed state.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from aurora_mito_etl_spark.operators.joins import anti_join


# ---------------------------------------------------------------------------
# I1 — landing-dir sources
# ---------------------------------------------------------------------------


def stream_landing_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Streaming scan of a landing directory; new files become new
    micro-batch input. maxFilesPerTrigger bounds batch size at scale."""
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_files_modified_after(
    spark: SparkSession,
    path: str,
    since: _dt.datetime | str,
    schema: T.StructType | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Batch-incremental scan: only files with mtime > `since`
    (Spark's modifiedAfter pushdown — no listing diff needed)."""
    stamp = since if isinstance(since, str) else since.strftime("%Y-%m-%dT%H:%M:%S")
    reader = spark.read.format(fmt).option("modifiedAfter", stamp)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


# ---------------------------------------------------------------------------
# I2 — exactly-once-per-key processing
# ---------------------------------------------------------------------------


def dedup_stream(df: DataFrame, keys: list[str], watermark: tuple[str, str] | None = None) -> DataFrame:
    """Streaming dropDuplicates: state-backed at-most-once per key.

    With a (ts_col, delay) watermark the key state is bounded —
    REQUIRED at 100 TB; without one, state grows with distinct keys
    (acceptable only for bounded key domains like PMIDs).
    """
    if watermark:
        col, delay = watermark
        df = df.withWatermark(col, delay)
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def resume_anti_join(todo: DataFrame, done: DataFrame, key: str) -> DataFrame:
    """Batch resume: the reference's replay-the-output skip
    (run_gpt_filter.py:81-95) as one anti join."""
    return anti_join(todo, done.select(key).distinct(), key)


# ---------------------------------------------------------------------------
# Windowed / sessionized event aggregation (engine surface beyond the
# reference — the `events` table path)
# ---------------------------------------------------------------------------


def windowed_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time window counts with late-data
    watermark. Works identically on batch and streaming frames."""
    win = (
        F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    )
    g = df
    if isinstance(g.isStreaming, bool) and g.isStreaming:
        g = g.withWatermark(ts_col, watermark)
    return g.groupBy(win.alias("w"), *(group_cols or [])).agg(
        F.count("*").alias("n_events")
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(group_cols or []),
        "n_events",
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows (gap-based) per key — the streaming twin of
    the batch sessionization query (plans/queries.py
    events_sessionize)."""
    g = df
    if isinstance(g.isStreaming, bool) and g.isStreaming:
        g = g.withWatermark(ts_col, watermark)
    return g.groupBy(
        F.session_window(F.col(ts_col), gap).alias("s"), F.col(key_col)
    ).agg(F.count("*").alias("n_events")).select(
        key_col,
        F.col("s.start").alias("session_start"),
        F.col("s.end").alias("session_end"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# I3 — idempotent sinks
# ---------------------------------------------------------------------------


def run_available_now(
    df: DataFrame,
    checkpoint: str,
    batch_fn: Callable[[DataFrame, int], None],
) -> StreamingQuery:
    """Drain everything currently landed through `batch_fn`
    (foreachBatch), then stop — the reference's cron-run semantics
    with streaming bookkeeping. Caller awaits termination."""
    return (
        df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def overwrite_date_partition(df: DataFrame, base_path: str, date: str) -> None:
    """I3 — rewrite exactly one date partition (dynamic partition
    overwrite, so other dates survive — unlike mode('overwrite') on
    the root)."""
    (
        df.withColumn("date", F.lit(date))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("date")
        .parquet(base_path)
    )
