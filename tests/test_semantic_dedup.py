"""SemDeDup semantic near-dup pruning (similarity.semantic_dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aurora_mito_etl_spark.operators import similarity as sim

# two orthogonal 4-d cluster directions
CENTS = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]


def test_semantic_dedup_prunes_within_cluster(spark):
    rows = [
        (0, [1.0, 0.01, 0.0, 0.0]),   # cluster 0, survivor (min id)
        (1, [0.99, 0.02, 0.0, 0.0]),  # near-dup of 0 → dropped
        (2, [0.0, 1.0, 0.01, 0.0]),   # cluster 1, survivor
        (3, [0.0, 0.0, 1.0, 1.0]),    # cluster 1 (diagonal), not a near-dup
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in sim.semantic_dedup(
            vecs, threshold=0.95, dim=4, centroids=CENTS
        ).collect()
    }
    assert out[0]["kept"] is True and out[1]["kept"] is False
    assert out[0]["cell"] == 0 and out[1]["cell"] == 0
    assert out[2]["kept"] is True and out[3]["kept"] is True


def test_cross_cell_near_dups_not_pruned(spark):
    # identical vectors forced into different cells never pair — the
    # documented SemDeDup recall trade
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.51, 0.49, 0.0, 0.0]),  # cell 0 (barely)
        (2, [0.49, 0.51, 0.0, 0.0]),  # cell 1, cos≈1 to vec 1
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in sim.semantic_dedup(
            vecs, threshold=0.9, dim=4, centroids=CENTS
        ).collect()
    }
    assert out[1]["cell"] != out[2]["cell"]
    assert out[1]["kept"] is True and out[2]["kept"] is True


def test_malformed_vectors_excluded(spark):
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, None), (2, [1.0, 0.0])]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sim.semantic_dedup(vecs, threshold=0.9, dim=4, centroids=CENTS)
    assert [r["vec_id"] for r in out.collect()] == [0]


def test_nearest_cell_arrow_matches_python_fold(spark):
    # the Arrow assignment must equal the argmax of left-to-right
    # python-float folds (the exact IEEE sequence the SQL oracle and
    # Catalyst expression produce), ties to the LARGEST cell id
    cents = sim.ivf_centroids(8, 4)
    vecs = [[float(i + j) / 7.0 - 0.5 for j in range(8)] for i in range(50)]
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["cell"]
        for r in df.select(
            "vec_id", sim.nearest_cell_arrow(F.col("embedding"), cents).alias("cell")
        ).collect()
    }

    def fold_dot(v, c):
        acc = 0.0
        for x, y in zip(v, c):
            acc += x * y
        return acc

    for i, v in enumerate(vecs):
        scores = [fold_dot(v, c) - sum(x * x for x in c) / 2.0 for c in cents]
        best = max(range(len(cents)), key=lambda k: (scores[k], k))
        assert got[i] == best, f"vec {i}: {got[i]} != {best}"


def test_tie_breaks_to_largest_cell(spark):
    # equidistant from two identical centroids → larger id wins
    cents = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
    df = spark.createDataFrame([(0, [2.0, 0.0])], "vec_id long, embedding array<double>")
    r = df.select(sim.nearest_cell_arrow(F.col("embedding"), cents).alias("c")).collect()
    assert r[0]["c"] == 1


def test_zero_norm_vector_never_dropped(spark):
    # cosine against a zero vector is NaN: the verify emits no pair,
    # so zero-norm rows survive — and the oracle pins the same rule
    # with explicit nrm > 0 guards
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 1e-9, 0.0, 0.0]),   # near-dup of 0 → dropped
        (2, [0.0, 0.0, 0.0, 0.0]),    # zero vector, same cell space
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["kept"]
        for r in sim.semantic_dedup(
            vecs, threshold=0.95, dim=4, centroids=CENTS
        ).collect()
    }
    assert out[0] is True and out[1] is False
    assert out[2] is True
