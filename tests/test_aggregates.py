from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aurora_mito_etl_spark.operators import aggregates as agg


def test_bin_right_closed_boundaries(spark):
    # reference pd.cut bins (-inf,1,2,4,inf) are right-closed (SURVEY A5)
    df = spark.createDataFrame([(0,), (1,), (2,), (3,), (4,), (5,)], "v int")
    out = df.select(
        "v",
        agg.bin_right_closed(
            F.col("v"), [1, 2, 4], ["very-low", "low", "medium", "high"]
        ).alias("b"),
    )
    got = {r["v"]: r["b"] for r in out.collect()}
    assert got == {
        0: "very-low",
        1: "very-low",
        2: "low",
        3: "medium",
        4: "medium",
        5: "high",
    }


def test_bin_right_closed_validates():
    with pytest.raises(ValueError):
        agg.bin_right_closed(F.lit(1), [1, 2], ["a", "b"])


def test_keep_first_per_key(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("A", 2, 20.0), ("b", 3, 5.0)], "name string, id int, score double"
    )
    out = agg.keep_first_per_key(
        df, F.lower(F.col("name")), [F.desc("score"), F.asc("id")]
    )
    got = sorted((r["name"], r["id"]) for r in out.collect())
    assert got == [("A", 2), ("b", 3)]


def test_topk_mean(spark):
    df = spark.createDataFrame([([5.0, 1.0, 3.0, 4.0],), ([2.0],), ([],)], "v array<double>")
    out = [r["m"] for r in df.select(agg.topk_mean(F.col("v"), 3).alias("m")).collect()]
    assert out[0] == pytest.approx((5 + 4 + 3) / 3)
    assert out[1] == pytest.approx(2.0)
    assert out[2] is None


def test_threshold_label(spark):
    df = spark.createDataFrame([(0.75,), (0.5,), (0.31,), (0.1,), (None,)], "v double")
    lab = agg.threshold_label(
        F.col("v"), [(0.70, "high"), (0.50, "medium"), (0.30, "low")], "very-low"
    )
    got = [r["l"] for r in df.select(lab.alias("l")).collect()]
    assert got == ["high", "medium", "low", "very-low", "very-low"]


def test_group_collect_sorted_string_sort(spark):
    # PMIDs sort lexicographically as strings: '10' < '9' (SURVEY A1)
    df = spark.createDataFrame(
        [("Metformin", "9"), ("metformin", "10"), ("metformin", "9")],
        "compound string, pmid string",
    )
    out = agg.group_collect_sorted(
        df, F.lower(F.col("compound")), "key", "pmid", "compound"
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_pmid"] == 2
    assert row["pmids"] == "10;9"
    assert row["compound"] == "Metformin"


def test_argmax_struct(spark):
    df = spark.createDataFrame(
        [("x", 1.0, "refA"), ("x", 3.0, "refB"), ("x", 2.0, "refC")],
        "k string, score double, name string",
    )
    out = df.groupBy("k").agg(
        agg.argmax_struct(F.col("score"), F.col("name")).alias("best")
    )
    assert out.collect()[0]["best"] == "refB"
