"""Edge-format readers (SURVEY §2.1 S4/S5).

The engine's staged format is Parquet; TSV appears only at the edges
(the reference's staging tables are header-optional TSV — reference
scripts/process_pubmed.sh:34, run_gpt_filter.py:205-215). Readers
take explicit schemas — inferSchema is banned in the engine (SURVEY
§1.3): at 100 TB an inference pass is a full extra scan, and drifting
inferred types break downstream plans silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from aurora_mito_etl_spark.schema.registry import schema_for


def read_tsv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    null_value: str = "",
) -> DataFrame:
    """S5 — TSV with explicit schema. Gzipped files decompress
    transparently; one task per (splittable) file chunk."""
    return (
        spark.read.option("sep", "\t")
        .option("header", header)
        .option("nullValue", null_value)
        .option("emptyValue", "")
        .schema(schema)
        .csv(path)
    )


def read_staging_table(spark: SparkSession, path: str, table: str) -> DataFrame:
    """S5 over the schema registry: read one of the canonical staging
    tables (pubmed, mesh_bioactive, pubmed_gpt, …) by name with its
    registered StructType."""
    return read_tsv(spark, path, schema_for(table).struct)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSON-lines source with explicit schema — the lingua franca of
    LLM training corpora. Schema-first for the same reasons as TSV;
    corrupt records land in the permissive-mode NULL row rather than
    failing the scan."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table (SURVEY §4): both sides of a recurring
    equi-join written with the same (cols, num_buckets) join WITHOUT
    a shuffle — the bucketing IS the exchange, paid once at write
    time. The lever for repeated fact-fact joins at 100 TB.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def na_to_null(df: DataFrame, columns: list[str], sentinel: str = "NA") -> DataFrame:
    """§1.2 — translate the reference's 'NA' sentinel to real NULLs at
    ingest (run_gpt_filter.py:184-188); sinks translate back."""
    from pyspark.sql import functions as F

    for c in columns:
        df = df.withColumn(c, F.when(F.col(c) == sentinel, None).otherwise(F.col(c)))
    return df
