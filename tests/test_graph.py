"""Weighted PageRank (operators/graph.py)."""

from __future__ import annotations

import math

import pytest

from aurora_mito_etl_spark.operators import graph as g


def _f6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _replica(edges, damping=0.85, iters=8):
    """Plain-python replay of the operator's exact arithmetic."""
    from collections import Counter

    w = Counter(edges)
    out_w = Counter()
    for (s, _), c in w.items():
        out_w[s] += c
    p = {(s, d): _f6(c / out_w[s]) for (s, d), c in w.items()}
    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    r = {v: 1.0 / n for v in verts}
    for _ in range(iters):
        dang = sum(_f6(r[v]) for v in verts if v not in out_w)
        base = (1.0 - damping) / n
        r = {
            v: _f6(
                base
                + damping
                * (
                    sum(_f6(r[s] * pv) for (s, d), pv in p.items() if d == v)
                    + dang / n
                )
            )
            for v in verts
        }
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["vertex"]: r["rank"] for r in g.pagerank(df, **kw).collect()}


def test_cycle_with_dangling_matches_replica(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]
    got = _run(spark, edges, iterations=8)
    want = _replica(edges, iters=8)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)


def test_parallel_edges_weight_transitions(spark):
    # a->b twice, a->c once: b receives 2/3 of a's rank
    edges = [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")]
    got = _run(spark, edges, iterations=10)
    assert got["b"] > got["c"]
    want = _replica(edges, iters=10)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6)


def test_star_ranks(spark):
    edges = [(s, "hub") for s in ("a", "b", "c", "d")] + [("hub", "a")]
    got = _run(spark, edges, iterations=8)
    # hub collects from every leaf — it beats the pure leaves b/c/d;
    # "a" beats hub because the hub funnels its ENTIRE rank to a.
    assert got["hub"] > got["b"] == got["c"] == got["d"]
    assert got["a"] == max(got.values())


def test_deterministic(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("d", "b")]
    assert _run(spark, edges) == _run(spark, edges)


def test_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        g.pagerank(df, damping=1.5)
    with pytest.raises(ValueError):
        g.pagerank(df, iterations=0)


# ---------------------------- HITS ------------------------------- #


def _hits_replica(edges, iters=4):
    """Plain-python replay of hits()'s exact grid arithmetic."""
    from collections import Counter

    w = Counter(edges)
    verts = sorted({v for e in edges for v in e})
    h = {v: 1_000_000 for v in verts}
    a = {}

    def norm(raw):
        full = {v: raw.get(v, 0) for v in verts}
        mx = max(full.values()) if full else 0
        if mx <= 0:
            return {v: 0 for v in verts}
        return {v: math.floor(r / mx * 1e6 + 0.5) for v, r in full.items()}

    for _ in range(iters):
        araw = Counter()
        for (s, d), c in w.items():
            araw[d] += c * h[s]
        a = norm(araw)
        hraw = Counter()
        for (s, d), c in w.items():
            hraw[s] += c * a[d]
        h = norm(hraw)
    return h, a


def test_hits_matches_replica(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("a", "c"), ("d", "c"),
        ("b", "c"), ("c", "e"), ("d", "b"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["vertex"]: (r["hub"], r["auth"]) for r in g.hits(df).collect()}
    h, a = _hits_replica(edges)
    want = {v: (h[v] / 1e6, a[v] / 1e6) for v in h}
    assert got == want
    # 'a' fans out to the strongest authorities -> top hub;
    # 'c' receives from every hub -> top authority
    assert max(got, key=lambda v: got[v][0]) == "a"
    assert max(got, key=lambda v: got[v][1]) == "c"


def test_hits_empty_and_validation(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    assert g.hits(empty).collect() == []
    with pytest.raises(ValueError):
        g.hits(empty, iterations=0)


def _tri_rows(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["vertex"]: (r["degree"], r["n_triangles"], r["clustering_coeff"])
        for r in g.triangle_stats(df).collect()
    }


def test_triangle_k4(spark):
    # K4: every vertex deg 3, in C(3,2)=3 triangles, coefficient 1.0
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _tri_rows(spark, k4)
    assert got == {v: (3, 3, 1.0) for v in range(4)}


def test_triangle_path_and_star(spark):
    # path 0-1-2-3: no triangles; middle vertices coeff 0.0, ends NULL
    got = _tri_rows(spark, [(0, 1), (1, 2), (2, 3)])
    assert got[1] == (2, 0, 0.0) and got[2] == (2, 0, 0.0)
    assert got[0] == (1, 0, None) and got[3] == (1, 0, None)
    # star hub (the LSH false-positive shape): hub coeff 0.0
    star = [(0, i) for i in range(1, 6)]
    got = _tri_rows(spark, star)
    assert got[0] == (5, 0, 0.0)


def test_triangle_hub_with_one_closure(spark):
    # hub 0 with leaves 1..5 plus the single closing edge (1,2):
    # exactly one triangle (0,1,2); hub coeff = 2*1/(6*5)
    edges = [(0, i) for i in range(1, 7)] + [(1, 2)]
    got = _tri_rows(spark, edges)
    from aurora_mito_etl_spark.functions.numeric import fixed6_py

    assert got[0] == (6, 1, fixed6_py(2 * 1 / (6 * 5)))
    assert got[1] == (2, 1, 1.0) and got[2] == (2, 1, 1.0)
    assert got[3] == (1, 0, None)


def test_triangle_input_hygiene(spark):
    # duplicate edges, reversed order and self-loops must not
    # inflate counts: only (a < b) distinct edges participate
    edges = [(1, 2), (1, 2), (2, 1), (1, 1), (2, 3), (1, 3)]
    got = _tri_rows(spark, edges)
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (2, 1, 1.0)
    assert got[3] == (2, 1, 1.0)


def _kcore_rows(spark, edges, k=2, rounds=4):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["vertex"]: (r["core_degree"], r["converged"])
        for r in g.kcore_peel(df, k=k, rounds=rounds).collect()
    }


def test_kcore_clique_with_tendril(spark):
    # K4 plus a path tendril 3-4-5: the 2-core is exactly the K4;
    # tendril vertices peel away, core degrees are the clique's.
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _kcore_rows(spark, k4 + [(3, 4), (4, 5)])
    assert set(got) == {0, 1, 2, 3}
    assert all(got[v] == (3, True) for v in range(4))


def test_kcore_cycle_and_bare_path(spark):
    # a cycle IS its own 2-core
    cycle = [(0, 1), (1, 2), (2, 3), (0, 3)]
    got = _kcore_rows(spark, cycle)
    assert got == {v: (2, True) for v in range(4)}
    # a bare path has NO 2-core: everything peels within 2 rounds
    assert _kcore_rows(spark, [(0, 1), (1, 2), (2, 3)]) == {}


def test_kcore_bounded_rounds_not_converged(spark):
    # a 9-vertex path peels 2 endpoints per round; 1 round is not
    # enough, and the flag says so on every surviving row
    path = [(i, i + 1) for i in range(8)]
    got = _kcore_rows(spark, path, k=2, rounds=1)
    assert set(got) == set(range(1, 8))
    assert all(conv is False for _, conv in got.values())
    # endpoints of the residual path have induced degree 1
    assert got[1][0] == 1 and got[7][0] == 1


def test_kcore_validates(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    with pytest.raises(ValueError):
        g.kcore_peel(df, k=0)
    with pytest.raises(ValueError):
        g.kcore_peel(df, rounds=0)
    assert g.kcore_peel(df).collect() == []
