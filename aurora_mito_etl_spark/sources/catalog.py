"""Catalog over the driver-provided parquet tables (TESTDATA.md).

The reference reads raw gzipped XML/TSV and stages to flat files
(reference scripts/download_raw.sh:22-39); the Spark engine's staged
form is Parquet. These helpers are the single entry point every
query uses so that scans share one code path (explicit format,
column pruning left to Catalyst).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast, at any SF: their
# cardinality is fixed (region=5, nation=25) or grows sub-linearly.
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table from `sf_dir` as a DataFrame.

    Parquet INT64 TIMESTAMP(NANOS) columns arrive as long (see
    session.py nanosAsLong) and are truncated to microsecond
    timestamps — the same truncation DuckDB applies, so oracles agree.
    """
    # Defensive: the harness may hand us a session built without this
    # conf; it is runtime-settable and required to read the events
    # table's INT64 TIMESTAMP(NANOS) column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        meta = field.metadata or {}
        if (
            isinstance(field.dataType, T.LongType)
            and meta.get("__is_timestamp_ntz_nanos", False)
        ) or (name == "events" and field.name == "ts"):
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"`{field.name}` div 1000")),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in (names or TABLES))
