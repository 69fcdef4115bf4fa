"""One-pass column profiling: the data-quality EDA surface.

(col_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
max_str) in long format for any set of numeric and string columns —
the table-health report a pipeline runs before and after every stage
(complements schema/validate.py, which checks declared constraints;
this measures the distribution facts you didn't declare).

Scale shape: ONE aggregate pass over the table produces a single row
holding every statistic, which is then exploded into long format via
an array-of-structs projection — no per-column scan, no N-way
self-union re-running the aggregate, nothing to the driver. The
exact-distinct mode costs Spark's multi-count-distinct Expand (rows
x N_cols before partial aggregation) — that is the portability tax
that lets a DuckDB oracle check every cell (`plans/queries.py`
lineitem_profile). At 100 TB run ``exact=False``: a single
Expand-free pass where n_distinct is HyperLogLog++
(`approx_count_distinct`, default 5% rsd) — same plan otherwise,
pytest-pinned against the exact path on fixtures (the
portable-vs-prod twin discipline of dedup.py's `portable_hash`).

Numeric values are normalized through ``CAST(c AS DOUBLE) + 0.0``
before min/max/distinct: the +0.0 collapses IEEE -0.0 into +0.0 so
distinct counts and extrema cannot diverge between engines on
signed-zero inputs (adversarial-data lesson of tools/fuzz_gate.py);
integers up to 2^53 and epoch-microsecond timestamps stay exact.

Beyond-reference surface: the reference validates records one by one
(`validate.py` jsonschema row loop); it has no distribution profiler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str],
    exact: bool = True,
) -> DataFrame:
    """Long-format profile of `numeric_cols` + `string_cols`; one row
    per column, in the given order. min_num/max_num are NULL for
    string columns, min_str/max_str for numeric ones; n_distinct
    ignores NULLs (COUNT DISTINCT semantics on both engines)."""
    if not numeric_cols and not string_cols:
        raise ValueError("profile_table needs at least one column")
    nd = F.count_distinct if exact else F.approx_count_distinct

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in numeric_cols:
        x = F.col(c).cast("double") + F.lit(0.0)
        aggs += [
            F.count(x).alias(f"_nn_{c}"),
            nd(x).alias(f"_nd_{c}"),
            F.min(x).alias(f"_mn_{c}"),
            F.max(x).alias(f"_mx_{c}"),
        ]
    for c in string_cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            nd(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).alias(f"_mn_{c}"),
            F.max(F.col(c)).alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs)

    def entry(c: str, numeric: bool):
        return F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n").cast("long").alias("n_rows"),
            (F.col("_n") - F.col(f"_nn_{c}")).cast("long").alias("n_nulls"),
            F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
            (F.col(f"_mn_{c}") if numeric else F.lit(None).cast("double")).alias(
                "min_num"
            ),
            (F.col(f"_mx_{c}") if numeric else F.lit(None).cast("double")).alias(
                "max_num"
            ),
            (F.lit(None).cast("string") if numeric else F.col(f"_mn_{c}")).alias(
                "min_str"
            ),
            (F.lit(None).cast("string") if numeric else F.col(f"_mx_{c}")).alias(
                "max_str"
            ),
        )

    entries = F.array(
        *[entry(c, True) for c in numeric_cols],
        *[entry(c, False) for c in string_cols],
    )
    return row.select(F.explode(entries).alias("e")).select("e.*")
