"""Embedding quantization — the storage/bandwidth lever for 100 TB
vector tables (beyond-reference surface, BASELINE.json north star).

Symmetric per-vector int8: 4× smaller than float32 on disk and over
the shuffle, with recall typically unchanged for cosine retrieval.
Everything is Catalyst expressions; rounding is floor(x + 0.5)
(half-away-from-zero via floor — identical in every engine, unlike
round()'s half-even/half-up split), so quantized codes are
bit-reproducible and DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale(vec: Column) -> Column:
    """Per-vector scale max(|x|)/127; zero vectors get scale 1.0 so
    codes are all-zero instead of NULL/NaN."""
    mx = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    return F.when(mx > 0, mx / F.lit(127.0)).otherwise(F.lit(1.0))


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Add (int8-code array, scale) columns: q_i = floor(x_i/scale + 0.5),
    always in [-127, 127] by construction of the scale.

    The scale is materialized as its own column FIRST and the code
    lambda references it — embedding the array_max expression inside
    the per-element lambda would re-evaluate it per element (O(dim²)
    interpreted ops per row)."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = df.withColumn(scale_col, _scale(vec))
    codes = F.transform(
        vec, lambda x: F.floor(x / F.col(scale_col) + F.lit(0.5)).cast("int")
    )
    return out.withColumn(out_col, codes)


def dequantize(
    df: DataFrame,
    code_col: str = "q",
    scale_col: str = "q_scale",
    out_col: str = "deq",
) -> DataFrame:
    """Reconstruct float vectors: x̂_i = q_i · scale."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(code_col), lambda q: q.cast("double") * F.col(scale_col)
        ),
    )


def quantization_error(
    df: DataFrame,
    vec_col: str = "embedding",
    code_col: str = "q",
    scale_col: str = "q_scale",
    out_col: str = "max_abs_err",
) -> DataFrame:
    """Per-vector max |x − q·scale|; bounded by scale/2 (≈ max|x|/254)
    — the invariant tests pin."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    err = F.zip_with(
        vec,
        F.col(code_col),
        lambda x, q: F.abs(x - q.cast("double") * F.col(scale_col)),
    )
    return df.withColumn(out_col, F.array_max(err))
