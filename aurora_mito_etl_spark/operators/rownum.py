"""Contiguous global sequence assignment without a global sort.

`row_number() OVER (ORDER BY key)` is the textbook way to hand every
row a dense 0..n-1 id (epoch shuffling, shard addressing, sample
bookkeeping all want one) — and on a cluster it is a single-partition
sort: every row shuffles to ONE task. The scalable shape is the
two-phase partition-offset pattern:

1. range-partition + sort WITHIN partitions by the key (one shuffle,
   fully parallel — this is what a distributed ORDER BY does anyway);
2. count rows per partition (a few hundred longs to the driver);
3. broadcast the exclusive prefix sums back and add each row's
   within-partition position.

Output is bit-identical to the window form whenever the key order is
total (enforce with a unique key), which keeps the operator
DuckDB-oracle-checkable while the plan stays straggler-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_contiguous_ids(
    df: DataFrame,
    order_col: str,
    out_col: str = "seq",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add `out_col` = dense 0-based rank of `order_col` (which must be
    unique — ties would make the assignment partition-dependent).

    Plan: repartitionByRange(order_col) → sortWithinPartitions →
    one count-per-partition pass (collects P longs, the documented
    bounded driver op) → mapInPandas adds offset + local position.
    No single-partition stage anywhere; the range exchange is the
    same shuffle a global ORDER BY pays, minus its final merge.
    """
    import pandas as pd
    from pyspark.sql import types as T

    if num_partitions is not None and num_partitions < 1:
        raise ValueError(f"num_partitions must be >= 1, got {num_partitions}")
    parts = (
        num_partitions
        if num_partitions is not None
        else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = df.repartitionByRange(int(parts), F.col(order_col)).sortWithinPartitions(
        order_col
    )
    # materialize once: the count pass and the assignment pass must see
    # the SAME partitioning (repartitionByRange samples its boundaries;
    # re-executing it twice would also double the shuffle work)
    ranged = ranged.localCheckpoint()
    counts = (
        ranged.select(F.spark_partition_id().alias("p"), F.col(order_col))
        .groupBy("p")
        .agg(F.count("*").alias("n"), F.count(order_col).alias("nn"))
        .collect()
    )
    # Contract guard (free in the existing count pass): NULL keys would
    # sort NULLS FIRST in Spark but NULLS LAST in a DuckDB oracle's
    # row_number() — fail fast instead of silently diverging.
    n_null = sum(r["n"] - r["nn"] for r in counts)
    if n_null:
        raise ValueError(
            f"assign_contiguous_ids: order_col {order_col!r} has {n_null} "
            "NULL values; the assignment would be engine-dependent"
        )
    sizes = {r["p"]: r["n"] for r in counts}
    offsets = {}
    acc = 0
    for p in sorted(sizes):
        offsets[p] = acc
        acc += sizes[p]

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType(), False)]
    )

    def add_seq(batches):
        # partition id is constant per task; read it lazily from the
        # TaskContext (mapInPandas keeps partitioning)
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        prev_last = None
        for pdf in batches:
            pdf = pdf.copy()
            # Uniqueness guard: range partitioning co-locates equal
            # keys and each partition is sorted, so any duplicate is
            # adjacent — within a batch or across the batch boundary.
            if len(pdf):
                vals = pdf[order_col]
                dup_in_batch = bool((vals.values[1:] == vals.values[:-1]).any())
                dup_at_seam = prev_last is not None and vals.iloc[0] == prev_last
                if dup_in_batch or dup_at_seam:
                    raise ValueError(
                        f"assign_contiguous_ids: order_col {order_col!r} has "
                        "duplicate values; the assignment would be "
                        "partition-dependent"
                    )
                prev_last = vals.iloc[-1]
            pdf[out_col] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    return ranged.mapInPandas(add_seq, out_schema)


def prefix_sum(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add `out_col` = exact running SUM of `weight_col` (a BIGINT)
    over ascending `order_col` — the distributed prefix sum behind
    ECDFs and exact rank selection.

    `SUM(w) OVER (ORDER BY key)` is the textbook form and, like the
    row_number it generalizes, a single-partition window at scale:
    every row funnels through ONE task. This is the same two-phase
    partition-offset pattern as :func:`assign_contiguous_ids`:
    range-partition + sort within partitions, collect one long per
    partition (the per-partition weight total), broadcast the
    exclusive prefix offsets back, and add each row's within-partition
    running total. Counts merge by addition, so the summary is
    MERGEABLE across shards; everything is int64-exact, so the output
    is bit-identical to the window form (and to a DuckDB cumulative
    window) whenever `order_col` is unique and non-NULL — both
    enforced loudly, since duplicates would make the running total
    partition-dependent and NULLs order differently across engines.
    """
    import pandas as pd  # noqa: F401  (mapInPandas ships pandas frames)
    from pyspark.sql import types as T

    if num_partitions is not None and num_partitions < 1:
        raise ValueError(f"num_partitions must be >= 1, got {num_partitions}")
    parts = (
        num_partitions
        if num_partitions is not None
        else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = df.repartitionByRange(int(parts), F.col(order_col)).sortWithinPartitions(
        order_col
    )
    ranged = ranged.localCheckpoint()
    totals = (
        ranged.select(
            F.spark_partition_id().alias("p"),
            F.col(order_col),
            F.col(weight_col),
        )
        .groupBy("p")
        .agg(
            F.count("*").alias("n"),
            F.count(order_col).alias("nn"),
            F.count(F.when(F.col(weight_col).isNull(), 1)).alias("wnull"),
            F.sum(F.col(weight_col).cast("decimal(38,0)")).alias("t"),
        )
        .collect()
    )
    n_null = sum(r["n"] - r["nn"] for r in totals)
    if n_null:
        raise ValueError(
            f"prefix_sum: order_col {order_col!r} has {n_null} NULL "
            "values; the running total would be engine-dependent"
        )
    if sum(r["wnull"] for r in totals):
        raise ValueError(
            f"prefix_sum: weight_col {weight_col!r} has NULL values"
        )
    grand = sum(int(r["t"]) for r in totals if r["t"] is not None)
    if not (-(2**63) <= grand <= 2**63 - 1):
        raise ValueError(f"prefix_sum overflow: total {grand} leaves int64")
    sizes = {r["p"]: int(r["t"]) for r in totals if r["t"] is not None}
    offsets = {}
    acc = 0
    for p in sorted(sizes):
        offsets[p] = acc
        acc += sizes[p]

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType(), False)]
    )

    def add_cum(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        running = offsets.get(pid, 0)
        prev_last = None
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf):
                vals = pdf[order_col]
                dup_in_batch = bool((vals.values[1:] == vals.values[:-1]).any())
                dup_at_seam = prev_last is not None and vals.iloc[0] == prev_last
                if dup_in_batch or dup_at_seam:
                    raise ValueError(
                        f"prefix_sum: order_col {order_col!r} has duplicate "
                        "values; the running total would be partition-dependent"
                    )
                prev_last = vals.iloc[-1]
                csum = pdf[weight_col].astype("int64").cumsum() + running
                running = int(csum.iloc[-1])
                pdf[out_col] = csum.astype("int64")
            else:
                pdf[out_col] = pdf[weight_col].astype("int64")
            yield pdf

    return ranged.mapInPandas(add_cum, out_schema)
