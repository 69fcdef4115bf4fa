"""Multi-dimensional clustering (z-order) for data-skipping layouts.

Parquet keeps min/max statistics per row group; Spark's scan pushes
predicates into those stats and skips row groups whose range can't
match. How much skipping a predicate gets is decided entirely by the
WRITE layout: a linear sort clusters one column (predicates on it
prune almost everything, predicates on any other column prune
nothing), while a z-order — interleaving the bits of several
rank-bucketed columns into one sort key — gives every participating
column partial locality, so range predicates on ANY of them skip most
row groups. This is the standard lakehouse layout lever (Delta/
Iceberg `OPTIMIZE ZORDER BY`), rebuilt here as plain Catalyst
expressions + `repartitionByRange`, usable on vanilla Parquet.

At 100 TB the win is directly proportional to data skipped: a
two-column z-order at 16 bits/dim typically turns a selective 2-D
predicate from a full scan into reading a few percent of row groups.
The column bounds used for bucketing are one scalar aggregate per
write (the same pass every OPTIMIZE implementation pays).

Beyond-reference surface: the reference's only layout control is
`sort` before `join -t` (`scripts/merge_filter.sh`) — single-node,
single-key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_bucket(col: Column, lo: Column | float, hi: Column | float, bits: int) -> Column:
    """Scale `col` into [0, 2^bits) by its [lo, hi] bounds — the
    rank normalization feeding the interleave. Double math then
    floor, identical in DuckDB for the oracle. NULLs map to bucket 0
    (they sort first, matching a NULLS FIRST linear sort)."""
    lo_c = lo if isinstance(lo, Column) else F.lit(float(lo))
    hi_c = hi if isinstance(hi, Column) else F.lit(float(hi))
    span = hi_c.cast("double") - lo_c.cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo_c.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    # coalesce BEFORE the clamp: Spark's least/greatest skip NULLs, so
    # a NULL reaching least(NULL, max) would land in the top bucket.
    scaled = F.coalesce(F.floor(frac * F.lit(float((1 << bits) - 1))), F.lit(0))
    return F.greatest(
        F.lit(0), F.least(scaled, F.lit((1 << bits) - 1))
    ).cast("long")


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton/z-value: bit i of column j lands at position
    ``len(cols)*i + j``. Inputs must already be non-negative ints
    below 2^bits (see :func:`minmax_bucket`). Pure bitwise Catalyst
    expression — whole-stage-codegen'd, and every shift amount is a
    literal so the same formula is writable in oracle SQL."""
    if not cols:
        raise ValueError("interleave_bits needs at least one column")
    d = len(cols)
    if d * bits > 63:
        raise ValueError(f"{d} cols x {bits} bits exceeds a signed long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, d * i + j))
    return z


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, dict[str, tuple[float, float]]]:
    """Attach a ``_zorder`` column over `cols`. Bounds come from one
    scalar min/max aggregate (a driver-side row — constant size at
    any SF) and are returned so callers can record them in a
    manifest / reuse them for later incremental writes."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    # an all-NULL (or empty) column has no bounds: every value buckets
    # to 0 via the degenerate-span rule rather than crashing
    bounds = {
        c: (
            row[f"_lo_{c}"] if row[f"_lo_{c}"] is not None else 0.0,
            row[f"_hi_{c}"] if row[f"_hi_{c}"] is not None else 0.0,
        )
        for c in cols
    }
    bucketed = [
        minmax_bucket(F.col(c), float(bounds[c][0]), float(bounds[c][1]), bits)
        for c in cols
    ]
    return df.withColumn("_zorder", interleave_bits(bucketed, bits)), bounds


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int = 8,
    rows_per_rowgroup: int | None = None,
) -> dict[str, tuple[float, float]]:
    """Write `df` as Parquet z-ordered on `cols`: range-partition by
    the z-value (so files tile disjoint z-ranges), sort within each
    partition (so row groups tile sub-ranges), drop the key, write.
    Returns the bucketing bounds for the caller's manifest.

    `rows_per_rowgroup` shrinks parquet row groups (via
    `parquet.block.size`) — smaller groups = finer skipping
    granularity at slightly worse compression; leave None for the
    Parquet default at production block sizes."""
    keyed, bounds = zorder_key(df, cols, bits)
    out = (
        keyed.repartitionByRange(num_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
    )
    w = out.write.mode("overwrite")
    if rows_per_rowgroup is not None:
        # parquet-mr sizes row groups in bytes; approximate via page
        # size floor. Tests use this to force many groups on small data.
        w = w.option("parquet.block.size", max(64 * 1024, rows_per_rowgroup))
    w.parquet(path)
    return bounds


def rowgroup_skip_fraction(
    path: str, col: str, lo, hi
) -> tuple[int, int]:
    """(skippable, total) parquet row groups for predicate
    ``col BETWEEN lo AND hi``, judged from footer min/max stats — the
    same decision Spark's parquet reader makes. Driver-side metadata
    scan (footers only, no data pages); used by tests/tools to
    MEASURE how much a layout lets the engine skip."""
    import pyarrow.parquet as pq
    from pathlib import Path

    total = skippable = 0
    for f in Path(path).glob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        idx = md.schema.names.index(col)
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            total += 1
            if st is not None and st.has_min_max and (st.min > hi or st.max < lo):
                skippable += 1
    return skippable, total
