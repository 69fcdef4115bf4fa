"""SparkSession factory with scale-oriented defaults.

The reference pipeline hand-tunes parallelism (GNU parallel nproc-1,
`sort -S1G --parallel` — reference scripts/process_pubmed.sh:26-28,71,
scripts/process_pubtator.sh:31). In Spark those knobs map to AQE +
shuffle-partition sizing, set once here.

Defaults are chosen so the same code runs on local[N] for tests and on
a 1000-executor cluster unchanged: AQE coalesces small shuffles at low
SF and splits skewed partitions at high SF; the broadcast threshold
keeps every `data/reference/*`-sized dimension on the map side.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "aurora-mito-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Env overrides: SPARK_GRAFT_CPUS (local core count),
    SPARK_GRAFT_SHUFFLE_PARTITIONS.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing, broadcast conversion, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas UDF / toPandas path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Dimension tables (reference lists, tag sets) stay map-side.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Let the planner use shuffled hash join when its size
        # conditions hold (guide §3.1/§9): no sort on either side, a
        # per-partition hash build instead — SMJ remains the fallback
        # whenever the build side estimate is too large to hash.
        # Adopted r14 after a full plan-audit (0 cartesian, SMJ->SHJ
        # only where the build side is bounded) + full oracle gate +
        # bench neutral-or-better.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # Stable session timezone for deterministic timestamp semantics.
        .config("spark.sql.session.timeZone", "UTC")
        # Read INT64 TIMESTAMP(NANOS) parquet columns as long (Spark has
        # no nanos timestamp); the catalog converts them to micros.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Parquet scan sizing: 128 MiB splits hold at 100 TB (≈800k tasks,
        # fine for a 1000-executor cluster with external shuffle).
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Ship the package to executor Python workers so pandas-UDF
    # closures import regardless of the driver's cwd.
    from aurora_mito_etl_spark.sources.catalog import ensure_workers_can_import

    ensure_workers_can_import(spark)
    return spark
