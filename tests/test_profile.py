"""operators/profile.py: one-pass column profiler."""

from __future__ import annotations

import pytest

from aurora_mito_etl_spark.operators import profile as pf


def _rows(df):
    return {
        r["col_name"]: (
            r["n_rows"],
            r["n_nulls"],
            r["n_distinct"],
            r["min_num"],
            r["max_num"],
            r["min_str"],
            r["max_str"],
        )
        for r in df.collect()
    }


def test_profile_semantics(spark):
    data = [
        (1, 2.5, "b"),
        (2, None, "a"),
        (3, -0.0, None),
        (4, 0.0, "c"),
        (5, 2.5, "a"),
    ]
    df = spark.createDataFrame(data, "k long, v double, s string")
    out = _rows(pf.profile_table(df, ["k", "v"], ["s"]))
    assert out["k"] == (5, 0, 5, 1.0, 5.0, None, None)
    # -0.0 and 0.0 collapse (the +0.0 normalization): distinct {0.0, 2.5}
    assert out["v"] == (5, 1, 2, 0.0, 2.5, None, None)
    assert out["s"] == (5, 1, 3, None, None, "a", "c")
    # long format preserves the requested column order
    order = [r["col_name"] for r in pf.profile_table(df, ["k", "v"], ["s"]).collect()]
    assert order == ["k", "v", "s"]


def test_profile_approx_twin_same_plan_shape(spark):
    """exact=False is the 100 TB path: identical output schema, no
    Expand in the plan, and n_distinct within HLL++ tolerance of the
    exact answer on fixture-scale cardinalities."""
    data = [(i, float(i % 17), chr(97 + i % 7)) for i in range(200)]
    df = spark.createDataFrame(data, "k long, v double, s string")
    exact = _rows(pf.profile_table(df, ["k", "v"], ["s"]))
    approx = _rows(pf.profile_table(df, ["k", "v"], ["s"], exact=False))
    assert set(exact) == set(approx)
    for c in exact:
        e, a = exact[c], approx[c]
        assert a[0:2] == e[0:2]  # counts/nulls identical
        assert a[3:] == e[3:]  # extrema identical
        assert abs(a[2] - e[2]) <= max(1, 0.1 * e[2])  # distinct within 10%
    plan_exact = pf.profile_table(df, ["k", "v"], ["s"])._jdf.queryExecution().executedPlan().toString()
    plan_approx = pf.profile_table(df, ["k", "v"], ["s"], exact=False)._jdf.queryExecution().executedPlan().toString()
    # NEITHER path may plan the multi-count-distinct Expand: it drags
    # the whole table through SortAggregate (string min/max buffers
    # are immutable, so HashAggregate can't hold them) — measured 21s
    # on sf0.1 lineitem vs ~2s for the two-level unpivot pipeline.
    assert "Expand" not in plan_exact
    assert "Expand" not in plan_approx
    # and the exact path's row-scale aggregation (the distinct-value
    # collapse) must be hash-based; only the vocab-sized final agg may
    # sort. The first aggregate in the plan is the deepest... so just
    # pin that SOME HashAggregate exists and Generate replaced Expand.
    assert "HashAggregate" in plan_exact
    assert "Generate" in plan_exact


def test_profile_empty_and_errors(spark):
    df = spark.createDataFrame([], "k long, s string")
    out = _rows(pf.profile_table(df, ["k"], ["s"]))
    assert out["k"] == (0, 0, 0, None, None, None, None)
    assert out["s"] == (0, 0, 0, None, None, None, None)
    with pytest.raises(ValueError):
        pf.profile_table(df, [], [])
