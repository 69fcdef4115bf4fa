from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aurora_mito_etl_spark.operators import joins as j
from aurora_mito_etl_spark.operators import similarity as sim


def _ts(m):
    return dt.datetime(2026, 1, 1, 12, m, 0)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [("u1", _ts(10), "L1"), ("u1", _ts(30), "L2"), ("u2", _ts(5), "L3")],
        "user_id string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [("u1", _ts(9), 1.0), ("u1", _ts(10), 2.0), ("u1", _ts(20), 3.0),
         ("u2", _ts(6), 9.0)],
        "user_id string, ts timestamp, v double",
    )
    out = j.asof_join(left, right, "user_id", "ts", "ts", ["v"])
    got = {r["tag"]: r["v"] for r in out.collect()}
    # ts == left ts is visible (<=); later right rows are not
    assert got == {"L1": 2.0, "L2": 3.0, "L3": None}


def test_asof_join_null_payload_not_torn(spark):
    # The latest matching right row has v=NULL: the join must carry
    # (E2, NULL) — NOT resurrect v=1.0 from the older row while taking
    # event_id from the newer one (per-column last(ignorenulls) tearing).
    left = spark.createDataFrame(
        [("u1", _ts(30), "L")], "user_id string, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [("u1", _ts(10), "E1", 1.0), ("u1", _ts(20), "E2", None)],
        "user_id string, ts timestamp, eid string, v double",
    )
    out = j.asof_join(left, right, "user_id", "ts", "ts", ["eid", "v"]).collect()[0]
    assert out["eid"] == "E2"
    assert out["v"] is None


def test_asof_join_null_ts_semantics(spark):
    # ADVICE r8: a NULL-ts right row must match NOTHING (`r.ts <= l.ts`
    # is never true), not sort NULLS-FIRST into the carry window and
    # shadow-match every left row; a NULL-ts left row matches nothing.
    left = spark.createDataFrame(
        [("u1", _ts(10), "L1"), ("u1", None, "Lnull")],
        "user_id string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [("u1", None, 99.0), ("u1", _ts(5), 1.0)],
        "user_id string, ts timestamp, v double",
    )
    out = j.asof_join(left, right, "user_id", "ts", "ts", ["v"])
    got = {r["tag"]: r["v"] for r in out.collect()}
    # L1 matches the ts=5 row (NOT the NULL-ts 99.0); Lnull matches nothing
    assert got == {"L1": 1.0, "Lnull": None}
    # with ONLY a NULL-ts right row, nobody matches
    right_only_null = spark.createDataFrame(
        [("u1", None, 99.0)], "user_id string, ts timestamp, v double"
    )
    out2 = j.asof_join(left, right_only_null, "user_id", "ts", "ts", ["v"])
    assert {r["v"] for r in out2.collect()} == {None}


def test_asof_join_tolerance_subsecond_precision(spark):
    # gap = tolerance + 1ms must be excluded (whole-second truncation
    # would admit it); gap = exactly tolerance must be included
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [("u1", base + dt.timedelta(seconds=60, milliseconds=1), "over"),
         ("u2", base + dt.timedelta(seconds=60), "exact")],
        "user_id string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [("u1", base, 1.0), ("u2", base, 2.0)],
        "user_id string, ts timestamp, v double",
    )
    out = j.asof_join(left, right, "user_id", "ts", "ts", ["v"], tolerance_s=60)
    got = {r["tag"]: r["v"] for r in out.collect()}
    assert got == {"over": None, "exact": 2.0}


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [("u1", _ts(30), "L")], "user_id string, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [("u1", _ts(0), 1.0)], "user_id string, ts timestamp, v double"
    )
    wide = j.asof_join(left, right, "user_id", "ts", "ts", ["v"], tolerance_s=3600)
    tight = j.asof_join(left, right, "user_id", "ts", "ts", ["v"], tolerance_s=60)
    assert wide.collect()[0]["v"] == 1.0
    assert tight.collect()[0]["v"] is None  # 30 min > 60 s tolerance


def test_salt_skewed_join_values(spark):
    # one hot key (k=1) dominating the fact side
    fact = spark.createDataFrame(
        [(1, i) for i in range(50)] + [(2, 99)], "k int, payload int"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold")], "k int, lab string")
    out = j.salt_skewed_join(fact, dim, "k", salt_buckets=4)
    got = [(r["k"], r["payload"], r["lab"]) for r in out.collect()]
    assert len(got) == 51  # no dup, no loss
    assert all(lab == ("hot" if k == 1 else "cold") for k, _p, lab in got)


def test_multi_probe_lsh_improves_recall(spark):
    import math

    rows = []
    for i in range(60):
        v = [math.sin(i * 1.3 + jj) for jj in range(16)]
        rows.append((i, v))
        # a near-identical twin for every 10th vector
        if i % 10 == 0:
            rows.append((1000 + i, [x + 1e-5 for x in v]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = sim.embedding_near_dup_pairs(
        vecs, threshold=0.999, n_planes=6, dim=16, multi_probe=0
    ).count()
    probed_df = sim.embedding_near_dup_pairs(
        vecs, threshold=0.999, n_planes=6, dim=16, multi_probe=1
    )
    probed_rows = probed_df.collect()
    probed_keys = [(r["id_a"], r["id_b"]) for r in probed_rows]
    assert len(probed_keys) == len(set(probed_keys))  # deduped pairs
    assert len(probed_keys) >= base  # probing never loses candidates
    # identical twins always share every sign bit → all 6 planted
    # pairs found even without probing; with probing still all there
    planted = {(i, 1000 + i) for i in range(0, 60, 10)}
    assert planted <= set(probed_keys)


def test_candidate_budget_keeps_planted_pairs(spark):
    import math

    rows = []
    for i in range(60):
        v = [math.sin(i * 1.3 + jj) for jj in range(16)]
        rows.append((i, v))
        if i % 10 == 0:
            rows.append((1000 + i, [x + 1e-5 for x in v]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    full = sim.embedding_near_dup_pairs(
        vecs, threshold=0.999, n_planes=6, dim=16, multi_probe=1
    )
    budgeted = sim.embedding_near_dup_pairs(
        vecs, threshold=0.999, n_planes=6, dim=16, multi_probe=1,
        candidate_budget=5,
    )
    full_keys = {(r["id_a"], r["id_b"]) for r in full.collect()}
    budg_keys = {(r["id_a"], r["id_b"]) for r in budgeted.collect()}
    # identical twins share every sign bit → found via the self bucket,
    # which the budget can never cut (first probe always survives)
    planted = {(i, 1000 + i) for i in range(0, 60, 10)}
    assert planted <= budg_keys
    assert budg_keys <= full_keys  # budget only removes candidates


def test_ivf_topk_recall_vs_brute_force(spark):
    import math

    rows = [
        (i, [math.sin(i * 0.9 + j) for j in range(8)]) for i in range(80)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = vecs.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = sim.brute_force_topk(vecs, q, k=3).collect()
    approx = sim.ivf_topk(vecs, q, k=3, n_cells=8, n_probe=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hit = total = 0
    for r in approx:
        total += 1
        hit += r["vec_id"] in exact_sets.get(r["query_id"], set())
    assert total > 0
    assert hit / total >= 0.5  # probing half the cells recovers most
    # rank-1 must always be the query itself (it lives in its own cell)
    firsts = {r["query_id"]: r["vec_id"] for r in approx if r["rank"] == 1}
    assert all(qid == vid for qid, vid in firsts.items())
