from __future__ import annotations

import random

from aurora_mito_etl_spark.operators import rproj as rp


def test_jl_signs_pinned_and_balanced():
    s1 = rp.jl_signs(64, 16)
    assert s1 == rp.jl_signs(64, 16)  # pure function of the seed
    assert rp.jl_signs(64, 16, seed="other") != s1
    flat = [v for row in s1 for v in row]
    assert set(flat) == {-1, 1}
    # md5 bit is fair: the 1024-entry matrix can't be near-constant
    assert 0.35 < flat.count(1) / len(flat) < 0.65


def test_jl_project_matches_python_twin(spark):
    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-5, 5) for _ in range(64)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: [r[f"y{k}"] for k in range(16)]
        for r in rp.jl_project(df, "embedding").collect()
    }
    for i, vec in rows:
        assert got[i] == rp.jl_project_py(vec), f"row {i}"


def test_jl_null_and_short_vectors(spark):
    rows = [
        (1, [1.0] * 64),
        (2, [1.0] * 63 + [None]),  # NULL element -> NULL projection
        # short vector -> NULL (zip_with NULL-pads past slice end,
        # poisoning the fold — same semantics as F.get out of bounds)
        (3, [1.0] * 10),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: [r[f"y{k}"] for k in range(16)]
        for r in rp.jl_project(df, "embedding").collect()
    }
    assert all(v is not None for v in got[1])
    assert all(v is None for v in got[2])
    assert all(v is None for v in got[3])


def test_jl_distortion_concentrates(spark):
    # E[||proj(a)-proj(b)||^2] = ||a-b||^2 for +/-1 JL; wider sketches
    # concentrate harder. Check the mean ratio lands near 1 and the
    # 64-dim (identity-width) sketch beats the 4-dim one.
    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def mean_ratio(out_dim):
        p = rp.jl_project(df, "embedding", out_dim=out_dim)
        import pyspark.sql.functions as F

        ycols = [f"y{k}" for k in range(out_dim)]
        q = p.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qe"),
            *[F.col(y).alias(f"q{y}") for y in ycols],
        )
        num = rp.sqdist_named_col([f"q{y}" for y in ycols], ycols)
        den = rp.sqdist_col("qe", "embedding", 64)
        pairs = (
            p.crossJoin(F.broadcast(q))
            .where(F.col("vec_id") != F.col("qid"))
            .select((num / den).alias("ratio"))
        )
        vals = [r["ratio"] for r in pairs.collect()]
        return sum(vals) / len(vals), max(abs(v - 1) for v in vals)

    m16, worst16 = mean_ratio(16)
    m64, worst64 = mean_ratio(64)
    assert 0.7 < m16 < 1.3
    assert 0.85 < m64 < 1.15
    assert worst64 < worst16  # wider sketch, tighter concentration


def test_sqdist_arrow_matches_expression(spark):
    """r13: the Arrow pair-distance twin is bit-identical to the
    expression fold — including the OOB/NULL contract (short vector →
    NULL, extra dims ignored, NULL element → NULL, NULL vector →
    NULL)."""
    import math
    import random

    import pyspark.sql.functions as F

    rng = random.Random(17)
    rows = []
    for i in range(40):
        v = [rng.gauss(0, 1) * (10 ** rng.randint(-3, 3)) for _ in range(64)]
        rows.append((i, v))
    rows.append((100, None))                      # NULL vector
    rows.append((101, [1.0] * 32))                # shorter than dim
    rows.append((102, [1.0] * 80))                # longer than dim
    v103 = [1.0] * 64
    v103[7] = None                                # NULL element
    rows.append((103, v103))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    pairs = df.crossJoin(F.broadcast(q))
    expr = pairs.select(
        "vec_id", "qid", rp.sqdist_col("qe", "embedding", 64).alias("d")
    )
    arrow = pairs.select(
        "vec_id",
        "qid",
        rp.sqdist_arrow(F.col("qe"), F.col("embedding"), 64).alias("d"),
    )
    e = {(r["vec_id"], r["qid"]): r["d"] for r in expr.collect()}
    a = {(r["vec_id"], r["qid"]): r["d"] for r in arrow.collect()}
    assert set(e) == set(a)
    for k in e:
        if e[k] is None:
            assert a[k] is None, k
        else:
            assert a[k] is not None and math.isclose(a[k], e[k], rel_tol=0.0, abs_tol=0.0), (
                k, e[k], a[k])


def test_jl_project_arrow_matches_expression(spark):
    """r14: the Arrow projection twin must equal the expression fold
    EXACTLY on every input class — dense randoms (huge magnitudes
    included), NULL vector, short vector, long vector, NULL element,
    and the non-finite values the r13 ADVICE flagged (NaN / ±Inf
    elements, -0.0): mapInArrow keeps element validity, so NaN stays
    a VALUE (the fold's NaN) while a NULL element NULLs the row."""
    import math

    rng = random.Random(17)
    rows = [
        (i, [rng.uniform(-5, 5) for _ in range(64)]) for i in range(30)
    ] + [
        (100, [rng.uniform(-1e12, 1e12) for _ in range(64)]),
        (101, None),                      # NULL vector
        (102, [1.0] * 63),                # short -> NULL
        (103, [1.0] * 70),                # long -> extra dims ignored
        (104, [1.0] * 30 + [None] + [1.0] * 33),  # NULL element -> NULL
        (105, [1.0] * 30 + [float("nan")] + [1.0] * 33),  # NaN VALUE
        (106, [float("inf")] + [1.0] * 63),
        (107, [float("inf"), float("-inf")] + [1.0] * 62),  # Inf-Inf -> NaN
        (108, [-0.0] * 64),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def grab(frame):
        return {
            r["vec_id"]: [r[f"y{k}"] for k in range(16)]
            for r in frame.collect()
        }

    want = grab(rp.jl_project(df, "embedding").select(
        "vec_id", *[f"y{k}" for k in range(16)]
    ))
    got = grab(rp.jl_project_arrow(df, "embedding").select(
        "vec_id", *[f"y{k}" for k in range(16)]
    ))
    assert set(got) == set(want)
    for vid in want:
        for k, (g, w) in enumerate(zip(got[vid], want[vid])):
            if w is None or g is None:
                assert g is None and w is None, (vid, k, g, w)
            elif isinstance(w, float) and math.isnan(w):
                assert isinstance(g, float) and math.isnan(g), (vid, k, g, w)
            else:
                assert g == w, (vid, k, g, w)
    # sanity on the edge classes (not just mutual agreement)
    assert all(v is None for v in got[101])
    assert all(v is None for v in got[102])
    assert all(v is None for v in got[104])
    assert all(isinstance(v, float) and math.isnan(v) for v in got[105])
    assert all(v is not None for v in got[103])


def test_sqdist_nonfinite_divergence_pinned(spark):
    """r13 ADVICE #1 closure: non-finite elements are OUTSIDE the
    embeddings data contract (no generator/fuzz tier produces them),
    and the two sqdist twins genuinely diverge there — the expression
    fold propagates NaN as a VALUE while the Arrow kernel's pandas
    Series conversion maps NaN to NULL. Pin both behaviors so a
    silent change in either path is caught; callers that could see
    non-finite input must normalize first (jl_project_arrow shows
    the mapInArrow shape that avoids the divergence entirely)."""
    import math

    import pyspark.sql.functions as F

    v = [1.0] * 64
    w = [1.0] * 64
    w[5] = float("nan")
    df = spark.createDataFrame(
        [(1, v, w)], "i long, a array<double>, b array<double>"
    )
    e = df.select(rp.sqdist_col("a", "b", 64).alias("d")).collect()[0]["d"]
    assert isinstance(e, float) and math.isnan(e)  # expression: NaN value
    a = df.select(
        rp.sqdist_arrow(F.col("a"), F.col("b"), 64).alias("d")
    ).collect()[0]["d"]
    assert a is None  # Arrow: NaN -> NULL through the Series path
