from __future__ import annotations

import math
import random

from aurora_mito_etl_spark.operators import moments as mo


def _np_moments(vals):
    """Reference skew/kurtosis on the same 1e-3 grid the operator
    quantizes to (so the comparison isolates arithmetic, not grid)."""
    import numpy as np

    u = np.floor(np.asarray(vals) * 1_000_000 + 0.5)
    mu = math.floor((u.sum() / 1e6 / len(u)) * 1_000_000 + 0.5) / 1_000_000
    m = np.floor((u - math.floor(mu * 1_000_000 + 0.5) + 500) / 1000.0)
    m2c = (m**2).mean() - m.mean() ** 2
    m3c = (m**3).mean() - 3 * m.mean() * (m**2).mean() + 2 * m.mean() ** 3
    m4c = (
        (m**4).mean()
        - 4 * m.mean() * (m**3).mean()
        + 6 * m.mean() ** 2 * (m**2).mean()
        - 3 * m.mean() ** 4
    )
    return (
        math.sqrt(m2c) * 1e-3,
        m3c / m2c**1.5,
        m4c / m2c**2 - 3.0,
    )


def test_moments_match_numpy(spark):
    rng = random.Random(42)
    rows = [("g", rng.uniform(-500.0, 2000.0)) for _ in range(400)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = mo.grouped_moments(df, "v", "k").collect()[0]
    std, skew, kurt = _np_moments([v for _, v in rows])
    assert out["n_rows"] == 400
    assert abs(out["stddev_val"] - std) < 1e-5
    assert abs(out["skewness"] - skew) < 1e-5
    assert abs(out["kurtosis"] - kurt) < 1e-5


def test_moments_known_asymmetric(spark):
    # strongly right-skewed: skewness must be positive, and a uniform
    # block is platykurtic (negative excess kurtosis).
    vals = [1.0] * 50 + [100.0] * 2
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v double")
    out = mo.grouped_moments(df, "v", "k").collect()[0]
    assert out["skewness"] > 2.0
    uni = spark.createDataFrame(
        [("u", float(i)) for i in range(1, 101)], "k string, v double"
    )
    out_u = mo.grouped_moments(uni, "v", "k").collect()[0]
    assert out_u["kurtosis"] < -1.0  # uniform excess kurtosis = -1.2


def test_moments_degenerate_groups(spark):
    df = spark.createDataFrame(
        [
            ("const", 7.25),
            ("const", 7.25),
            ("const", 7.25),
            ("single", 3.0),
            ("allnull", None),
            ("mixed", 1.0),
            ("mixed", None),
            ("mixed", 2.0),
        ],
        "k string, v double",
    )
    got = {r["k"]: r for r in mo.grouped_moments(df, "v", "k").collect()}
    assert got["const"]["stddev_val"] == 0.0
    assert got["const"]["skewness"] is None
    assert got["const"]["kurtosis"] is None
    assert got["single"]["n_rows"] == 1
    assert got["single"]["stddev_val"] == 0.0
    assert got["single"]["skewness"] is None
    assert got["allnull"]["n_rows"] == 0
    assert got["allnull"]["mean_val"] is None
    assert got["allnull"]["stddev_val"] is None
    assert got["mixed"]["n_rows"] == 2  # NULLs excluded from n


def test_moments_partition_invariance(spark):
    rng = random.Random(7)
    rows = [("g", rng.uniform(0, 100.0)) for _ in range(200)]
    df1 = spark.createDataFrame(rows, "k string, v double").repartition(1)
    df8 = spark.createDataFrame(rows, "k string, v double").repartition(8)
    r1 = mo.grouped_moments(df1, "v", "k").collect()[0]
    r8 = mo.grouped_moments(df8, "v", "k").collect()[0]
    assert (r1["stddev_val"], r1["skewness"], r1["kurtosis"]) == (
        r8["stddev_val"],
        r8["skewness"],
        r8["kurtosis"],
    )


def test_moments_null_group_key(spark):
    # r10 ADVICE: NULL group keys must form a group (standard groupBy
    # semantics) — the means join is null-safe on both engines.
    import duckdb

    df = spark.createDataFrame(
        [(None, 1.0), (None, 3.0), ("g", 2.0)], "k string, v double"
    )
    got = {r["k"]: r for r in mo.grouped_moments(df, "v", "k").collect()}
    assert None in got
    assert got[None]["n_rows"] == 2
    assert got[None]["mean_val"] == 2.0
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES"
        " (NULL, 1.0), (NULL, 3.0), ('g', 2.0)) v(k, val)"
    )
    ora = {
        r[0]: r for r in con.execute(
            mo.grouped_moments_oracle("t", "val", "k")
        ).fetchall()
    }
    assert None in ora and ora[None][1] == 2 and ora[None][2] == 2.0


def test_moments_overflow_guard_raises_both_engines(spark):
    # r10 ADVICE m4 width gap: deviations past ~1e6 value units (|m|
    # >= 1e9 milli-units) must fail LOUDLY and identically, never
    # raise on one engine while the other computes.
    import duckdb
    import pytest

    df = spark.createDataFrame(
        [("g", 0.0), ("g", 2.5e6)], "k string, v double"
    )
    with pytest.raises(Exception, match="deviation overflow"):
        mo.grouped_moments(df, "v", "k").collect()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES"
        " ('g', 0.0), ('g', 2500000.0)) v(k, val)"
    )
    with pytest.raises(Exception, match="deviation overflow"):
        con.execute(mo.grouped_moments_oracle("t", "val", "k")).fetchall()
