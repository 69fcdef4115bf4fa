"""BLAS production twins of the embedding verify engine (VERDICT r04
ask #2).

The registered `emb_lsh_near_dup` / `emb_semantic_dedup` queries run
`_same_bucket_pairs` with the ordered oracle-parity gram fold; the
`_prod` bench variants run the same bucketed plan with one dgemm per
chunk (`blas=True`). These tests pin twin equality on the REAL
embeddings table at the registered queries' exact parameters: same
pair set / same keep-drop roster, cosines within BLAS summation
tolerance (the callers' 1e-6 threshold margin dwarfs the O(dim·eps)
pairwise-summation divergence).
"""

from __future__ import annotations

import os

from aurora_mito_etl_spark.operators import similarity as sim
from aurora_mito_etl_spark.sources.catalog import load_table

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def test_ordered_gram_bit_parity():
    """The cache-blocked oracle gram must be BIT-identical to the
    naive dimension-order fold — only the schedule across independent
    elements may differ, never a per-element summation order."""
    import numpy as np

    rng = np.random.default_rng(7)
    # sizes straddling the 256 block edges, incl. dim > block
    for n, m, dim in [(1, 1, 3), (300, 257, 64), (513, 100, 17)]:
        A = rng.standard_normal((n, dim))
        B = rng.standard_normal((m, dim))
        naive = np.zeros((n, m))
        for j in range(dim):
            naive += A[:, j : j + 1] * B[:, j]
        blocked = sim._ordered_gram(A, B)
        assert (naive == blocked).all(), (n, m, dim)


def test_lsh_near_dup_blas_twin_matches(spark):
    e = load_table(spark, SF, "embeddings")
    kw = dict(threshold=0.4, n_planes=4, dim=64, multi_probe=2)
    portable = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in sim.embedding_near_dup_pairs(e, **kw).collect()
    }
    blas = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in sim.embedding_near_dup_pairs(e, blas=True, **kw).collect()
    }
    assert portable, "registered query must find pairs at sf0.01"
    assert set(portable) == set(blas)
    for pair, cos in portable.items():
        # both sides round(·, 6); dgemm vs ordered-fold divergence is
        # ~1e-13 relative, so post-round values differ by ≤1 ulp of
        # the 6th decimal only when sitting exactly on a rounding edge
        assert abs(cos - blas[pair]) <= 1e-6, (pair, cos, blas[pair])


def test_semantic_dedup_blas_twin_matches(spark):
    e = load_table(spark, SF, "embeddings")
    kw = dict(
        threshold=0.4, dim=64, n_cells=16, centroids=sim.ivf_centroids(64, 16)
    )
    portable = {
        r["vec_id"]: (r["cell"], r["kept"])
        for r in sim.semantic_dedup(e, **kw).collect()
    }
    blas = {
        r["vec_id"]: (r["cell"], r["kept"])
        for r in sim.semantic_dedup(e, blas=True, **kw).collect()
    }
    assert portable == blas
    assert any(not kept for _cell, kept in portable.values())  # real drops
