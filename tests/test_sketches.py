"""Mergeable cardinality sketches (operators/sketches.py)."""

from __future__ import annotations

from aurora_mito_etl_spark.operators import sketches as sk


def _docs(spark):
    rows = [
        # src0: vocabulary w0..w99 spread over 10 docs
        *[(i, " ".join(f"w{(i * 10 + j) % 100}" for j in range(30)), "src0")
          for i in range(10)],
        # src1: disjoint vocabulary v0..v49
        *[(100 + i, " ".join(f"v{(i * 7 + j) % 50}" for j in range(20)), "src1")
          for i in range(8)],
        # degenerate rows
        (200, None, "src2"),
        (201, "   ", "src2"),
        (202, "only", "src2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _report(spark):
    out = sk.distinct_token_report(_docs(spark))
    return {r["source"]: r for r in out.collect()}


def test_exact_counts_and_total(spark):
    got = _report(spark)
    assert got["src0"]["n_distinct_exact"] == 100
    assert got["src1"]["n_distinct_exact"] == 50
    assert got["src2"]["n_distinct_exact"] == 1  # NULL and blank yield nothing
    assert got[sk.TOTAL_LABEL]["n_distinct_exact"] == 151  # disjoint vocabularies


def test_sketch_gates_hold(spark):
    got = _report(spark)
    for r in got.values():
        assert r["hllpp_within_tol"] is True
        assert r["ds_hll_within_tol"] is True


def test_deterministic(spark):
    a = sorted(map(tuple, sk.distinct_token_report(_docs(spark)).collect()))
    b = sorted(map(tuple, sk.distinct_token_report(_docs(spark)).collect()))
    assert a == b


def test_schema(spark):
    out = sk.distinct_token_report(_docs(spark))
    assert out.columns == [
        "source", "n_distinct_exact", "hllpp_within_tol", "ds_hll_within_tol",
    ]
