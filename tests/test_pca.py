"""Bit-portable PCA (operators/pca.py): covariance pass, driver-twin
power iteration, and grid-int projection."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aurora_mito_etl_spark.operators import pca

_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _vec_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], _SCHEMA
    )


def _np_cov(mat: np.ndarray) -> np.ndarray:
    x6 = np.floor(mat.astype(np.float64) * 1e6 + 0.5) / 1e6
    return np.cov(x6, rowvar=False, bias=True)


def test_covariance_matches_numpy(spark):
    rng = np.random.RandomState(3)
    mat = rng.randn(200, 4).astype(np.float32)
    df = _vec_df(spark, [(i, mat[i]) for i in range(200)])
    ent = pca.covariance_entries(pca.covariance_stats(df, 4), 4).collect()
    want = _np_cov(np.array([[float(np.float32(x)) for x in r] for r in mat]))
    assert len(ent) == 10
    for r in ent:
        assert r["n_rows"] == 200
        assert r["cov"] == pytest.approx(want[r["i"]][r["j"]], abs=5e-6)


def test_power_iteration_finds_dominant_eigenvector():
    rng = np.random.RandomState(7)
    a = rng.randn(6, 6)
    c = a @ a.T  # PSD with a clear dominant direction
    c_ints = [
        [math.floor(c[i][j] * 1e6 + 0.5) for j in range(6)] for i in range(6)
    ]
    v_ints = pca.power_iteration(c_ints, pca.pinned_init(6), iterations=12)
    v = np.array([x / 1e6 for x in v_ints])
    _, vecs = np.linalg.eigh(c)
    top = vecs[:, -1]
    cos = abs(float(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top)))
    assert cos > 0.999


def test_fit_and_project_matches_numpy_replay(spark):
    rng = np.random.RandomState(11)
    mat = rng.randn(150, 4).astype(np.float32)
    df = _vec_df(spark, [(i, mat[i]) for i in range(150)])
    stats = pca.covariance_stats(df, 4).collect()[0]
    comp, means = pca.fit_pc1(stats, 4, iterations=3)
    out = {
        r["vec_id"]: r["pc1"]
        for r in pca.project_component(df, 4, comp, means).collect()
    }
    assert len(out) == 150
    # replay: fixed6( sum_i v_i * (xq_i - m_i) / 1e12 ) on the grid
    for i in [0, 7, 149]:
        raw = 0
        for k in range(4):
            xq = math.floor(float(np.float32(mat[i][k])) * 1e6 + 0.5)
            raw += comp[k] * (xq - means[k])
        want = math.floor(raw / 1e6 + 0.5) / 1e6
        assert out[i] == want
    # the projection must carry real variance (component not degenerate)
    vals = np.array(list(out.values()))
    assert vals.std() > 0.1


def test_empty_and_degenerate_corpora(spark):
    empty = _vec_df(spark, [])
    stats = pca.covariance_stats(empty, 3).collect()[0]
    assert stats["n_rows"] == 0
    assert pca.fit_pc1(stats, 3) is None

    single = _vec_df(spark, [(1, [0.5, -0.25, 3.0])])
    s1 = pca.covariance_stats(single, 3).collect()[0]
    comp, means = pca.fit_pc1(s1, 3)
    # all-zero covariance: every round is degenerate, init survives
    assert comp == pca.pinned_init(3)
    rows = pca.project_component(single, 3, comp, means).collect()
    assert rows[0]["pc1"] == 0.0  # x == mean for the only row


def test_null_element_scores_null(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, None]), (3, [0.0, 1.0]), (4, None)],
        _SCHEMA,
    )
    nn = df.filter(F.col("embedding").isNotNull())
    stats = pca.covariance_stats(nn, 2).collect()[0]
    comp, means = pca.fit_pc1(stats, 2)
    out = {r["vec_id"]: r["pc1"] for r in pca.project_component(nn, 2, comp, means).collect()}
    assert out[2] is None  # NULL element poisons the whole term chain
    assert out[1] is not None and out[3] is not None


def test_short_vector_scores_null(spark):
    df = _vec_df(spark, [(1, [1.0, 2.0, 3.0]), (2, [4.0, 5.0, 6.0])])
    short = spark.createDataFrame([(3, [7.0])], _SCHEMA)
    stats = pca.covariance_stats(df, 3).collect()[0]
    comp, means = pca.fit_pc1(stats, 3)
    out = pca.project_component(df.unionByName(short), 3, comp, means).collect()
    by_id = {r["vec_id"]: r["pc1"] for r in out}
    assert by_id[3] is None


def test_pc2_deflation_recovers_second_eigenvector():
    rng = np.random.RandomState(19)
    # spectrum with clear gaps so 12 rounds converge crisply
    q, _ = np.linalg.qr(rng.randn(6, 6))
    c = q @ np.diag([100.0, 40.0, 5.0, 2.0, 1.0, 0.5]) @ q.T
    c_ints = [
        [math.floor(c[i][j] * 1e6 + 0.5) for j in range(6)] for i in range(6)
    ]
    v1 = pca.power_iteration(c_ints, pca.pinned_init(6, 11), iterations=12)
    v2 = pca.power_iteration(
        pca.deflate(c_ints, v1), pca.pinned_init(6, 13), iterations=12
    )
    a1 = np.array([x / 1e6 for x in v1])
    a2 = np.array([x / 1e6 for x in v2])
    _, vecs = np.linalg.eigh(c)
    cos1 = abs(a1 @ vecs[:, -1]) / np.linalg.norm(a1)
    cos2 = abs(a2 @ vecs[:, -2]) / np.linalg.norm(a2)
    assert cos1 > 0.999 and cos2 > 0.999
    # orthogonality is deflation-exact to the grid
    ortho = abs(a1 @ a2) / (np.linalg.norm(a1) * np.linalg.norm(a2))
    assert ortho < 1e-3


def test_large_covariance_no_norm_overflow():
    # fuzz seed 71 regression: covariance magnitudes ~2400 (one
    # 300-magnitude row in the corpus) overflowed the old integer
    # Σq² norm (~2e22 >= 2^63) while the matvec was fine; the
    # left-to-right double-chain norm handles any such corpus and
    # still normalizes to the unit grid
    c = [[5000.0 if i == j else 100.0 for j in range(4)] for i in range(4)]
    c_ints = [[math.floor(x * 1e6 + 0.5) for x in row] for row in c]
    v = pca.power_iteration(c_ints, pca.pinned_init(4), iterations=3)
    assert all(x is not None for x in v)
    assert max(abs(x) for x in v) <= 1_000_000


def test_overflow_guard_raises():
    big = [[float(2**62)] * 2] * 2
    with pytest.raises(ValueError, match="overflow"):
        pca.power_iteration(
            [[_m(x) for x in row] for row in big], pca.pinned_init(2), 1
        )


def _m(x: float) -> int:
    return math.floor(x * 1e6 + 0.5)
