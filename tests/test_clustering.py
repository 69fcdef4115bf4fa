"""Bit-portable Lloyd K-Means (operators/clustering.py)."""

from __future__ import annotations

import math

import pytest

from aurora_mito_etl_spark.operators import clustering as cl


def _f6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _toy(spark):
    pts = [(i, [10.0 + (i % 5) * 0.1, 0.0]) for i in range(20)] + [
        (100 + i, [0.0, 5.0 + (i % 4) * 0.1]) for i in range(20)
    ]
    return spark.createDataFrame(pts, "vec_id long, embedding array<double>")


INIT = [[_f6(1.0), _f6(0.0)], [_f6(0.0), _f6(1.0)]]


def test_converges_to_cluster_means(spark):
    cents = cl.kmeans_fit(_toy(spark), INIT, iterations=3)
    # exact means of the two separated clusters (values on the fixed6 grid)
    assert cents[0] == [10.2, 0.0]
    assert cents[1] == [0.0, 5.15]


def test_assignments_separate_clusters(spark):
    out = {
        r["vec_id"]: r["cell"]
        for r in cl.kmeans_assignments(_toy(spark), INIT, iterations=3).collect()
    }
    assert {out[i] for i in range(20)} == {0}
    assert {out[100 + i] for i in range(20)} == {1}


def test_partition_invariant(spark):
    df = _toy(spark)
    a = cl.kmeans_fit(df, INIT, iterations=3)
    b = cl.kmeans_fit(df.repartition(7), INIT, iterations=3)
    assert a == b


def test_empty_cell_keeps_centroid(spark):
    # all points near centroid 0 -> centroid 1 never assigned, stays put
    df = spark.createDataFrame(
        [(i, [10.0, 0.0]) for i in range(5)], "vec_id long, embedding array<double>"
    )
    far = [[_f6(10.0), _f6(0.0)], [_f6(-99.0), _f6(-99.0)]]
    cents = cl.kmeans_fit(df, far, iterations=2)
    assert cents[0] == [10.0, 0.0]
    assert cents[1] == far[1]


def test_tie_prefers_larger_cell(spark):
    # identical centroids -> every score ties -> cell 1 wins everywhere
    df = _toy(spark)
    same = [[_f6(1.0), _f6(1.0)], [_f6(1.0), _f6(1.0)]]
    out = cl.assign_cells(df, same).select("cell").distinct().collect()
    assert [r["cell"] for r in out] == [1]


def test_validation(spark):
    with pytest.raises(ValueError):
        cl.kmeans_fit(_toy(spark), INIT, iterations=0)


def test_trained_centroids_drive_ivf(spark):
    """Integration: kmeans_fit output plugs into similarity.ivf_topk's
    centroids parameter — the trained-quantizer path for the ANN tier."""
    import pyspark.sql.functions as F

    from aurora_mito_etl_spark.operators import similarity as sim
    from aurora_mito_etl_spark.sources.catalog import load_table

    vecs = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    init = [
        [_f6(x) for x in c] for c in sim.ivf_centroids(64, 4, seed=7)
    ]
    trained = cl.kmeans_fit(vecs, init, iterations=1)
    assert trained != init  # training moved the centroids
    queries = vecs.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = sim.ivf_topk(vecs, queries, k=3, n_cells=4, n_probe=4, centroids=trained)
    rows = out.collect()
    # probing ALL cells with a valid quantizer must return each query's
    # own vector as its top hit (cosine 1.0)
    top = {r["query_id"]: r["vec_id"] for r in rows if r["rank"] == 1}
    assert all(q == v for q, v in top.items())


def test_assign_cells_arrow_matches_expression(spark):
    """r13: the Arrow integer-dot kernel + unchanged Catalyst argmax
    equals the pure-expression assignment on every adversarial shape
    the fuzz tier generates: exact-duplicate rows, the zero vector,
    negated copies, in-contract huge magnitude, NULL vector, NULL
    element, short and long vectors."""
    import math
    import random

    from aurora_mito_etl_spark.operators import clustering as cu
    from aurora_mito_etl_spark.operators.similarity import ivf_centroids

    rng = random.Random(23)
    dim, k = 16, 8
    init = [
        [math.floor(x * 1e6 + 0.5) / 1e6 for x in c]
        for c in ivf_centroids(dim, k, seed=7)
    ]
    rows = []
    for i in range(30):
        rows.append((i, [rng.gauss(0, 1) for _ in range(dim)]))
    rows.append((100, rows[2][1]))                    # exact duplicate
    rows.append((101, [0.0] * dim))                   # zero vector
    rows.append((102, [-x for x in rows[2][1]]))      # negation
    rows.append((103, [x * 300.0 for x in rows[2][1]]))  # huge, in-contract
    rows.append((104, None))                          # NULL vector
    v105 = list(rows[3][1])
    v105[5] = None                                    # NULL element
    rows.append((105, v105))
    rows.append((106, [1.0] * (dim - 4)))             # shorter than dim
    rows.append((107, [1.0] * (dim + 8)))             # longer than dim
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got_a = {
        r["vec_id"]: r["cell"]
        for r in cu.assign_cells(df, init).select("vec_id", "cell").collect()
    }
    got_e = {
        r["vec_id"]: r["cell"]
        for r in cu.assign_cells_expr(df, init)
        .select("vec_id", "cell")
        .collect()
    }
    assert got_a == got_e


def test_assign_cells_arrow_overflow_is_loud(spark):
    """Magnitude far outside the fixed6-grid contract must raise
    loudly from the Arrow kernel, as the expression fold does via
    Spark's ANSI long overflow (the fuzz tier's 1e6-magnitude arm)."""
    import math

    import pytest

    from aurora_mito_etl_spark.operators import clustering as cu
    from aurora_mito_etl_spark.operators.similarity import ivf_centroids

    dim, k = 16, 8
    init = [
        [math.floor(x * 1e6 + 0.5) / 1e6 for x in c]
        for c in ivf_centroids(dim, k, seed=7)
    ]
    df = spark.createDataFrame(
        [(0, [1.0e6] * dim)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="overflow|int64"):
        cu.assign_cells(df, init).collect()


def test_assign_cells_nonfinite_behavior_pinned(spark):
    """r13 ADVICE #3 closure: non-finite vector elements are OUTSIDE
    the fixed6-grid data contract, and the two assignment paths
    genuinely diverge there — pin the current behavior of each so a
    silent change is caught. Expression path: floor(NaN·1e6+0.5) is a
    LONG 0 (Spark's saturating floor), so a NaN element scores as if
    it were 0.0; an Inf element saturates to long-max and the ANSI
    multiply RAISES. Arrow path: any non-finite element NULLs the
    row's dots array (the documented NaN->NULL convention), which the
    unchanged Catalyst argmax turns into the same cell a NULL vector
    gets."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from aurora_mito_etl_spark.operators import clustering as cu
    from aurora_mito_etl_spark.operators.similarity import ivf_centroids

    dim, k = 16, 4
    init = [
        [math.floor(x * 1e6 + 0.5) / 1e6 for x in c]
        for c in ivf_centroids(dim, k, seed=7)
    ]
    vnan = [1.0] * dim
    vnan[3] = float("nan")
    vinf = [1.0] * dim
    vinf[3] = float("inf")
    vzero_at_3 = [1.0] * dim
    vzero_at_3[3] = 0.0
    df = spark.createDataFrame(
        [(1, vnan), (2, vinf), (3, vzero_at_3), (4, None)],
        "vec_id long, embedding array<double>",
    )
    # expression: NaN quantizes to 0 — same cell as the 0.0-element row
    expr_out = {
        r["vec_id"]: r["cell"]
        for r in cu.assign_cells_expr(
            df.where(F.col("vec_id").isin(1, 3)), init
        ).collect()
    }
    assert expr_out[1] == expr_out[3]
    # expression: Inf saturates and the ANSI multiply raises loudly
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        cu.assign_cells_expr(df.where(F.col("vec_id") == 2), init).collect()
    # Arrow: both non-finite rows behave exactly like a NULL vector
    arrow_out = {
        r["vec_id"]: r["cell"]
        for r in cu.assign_cells(df, init).collect()
    }
    assert arrow_out[1] == arrow_out[4]
    assert arrow_out[2] == arrow_out[4]
