"""Hard-negative mining (similarity.hard_negative_topk)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aurora_mito_etl_spark.operators import similarity as sim


def _vectors(spark):
    # Two clusters on axes: label 0 near e0, label 1 near e1; vec 99
    # is an unlabeled (NULL) outlier sitting closest of all to q0.
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.8, 0.05, 0.0], 0),
        (10, [0.0, 1.0, 0.0], 1),
        (11, [0.1, 0.9, 0.0], 1),
        (12, [0.7, 0.7, 0.0], 1),   # the hard negative for label-0 queries
        (99, [0.95, 0.05, 0.0], None),
        (50, [0.0, 0.0, 0.0], 1),   # zero vector: guarded, scores 0
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _queries(df):
    return df.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("query_vec"),
    )


def test_negatives_exclude_same_label_and_self(spark):
    v = _vectors(spark)
    out = sim.hard_negative_topk(v, _queries(v), k=3).collect()
    ids = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # label-0 rows (1, 2) and self (0) are ineligible; NULL label 99
    # IS a negative (null-safe DISTINCT FROM) and is the closest.
    assert ids[0] == 99
    assert set(ids) <= {10, 11, 12, 50, 99}
    labels = {r["vec_id"]: r["neg_label"] for r in out}
    assert labels[99] is None


def test_hardest_negative_ranks_first_among_labeled(spark):
    """Within label-1 negatives, the boundary row (12) outranks the
    cluster cores (10, 11)."""
    v = _vectors(spark).where(F.col("vec_id") != 99)
    out = sorted(
        sim.hard_negative_topk(v, _queries(_vectors(spark)), k=3).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["vec_id"] for r in out][0] == 12
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_all_same_label_yields_empty(spark):
    rows = [(i, [1.0, float(i)], 7) for i in range(4)]
    v = _vectors(spark).sparkSession.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    q = v.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("query_vec"),
    )
    assert sim.hard_negative_topk(v, q, k=3).count() == 0
