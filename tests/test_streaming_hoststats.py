"""Streaming per-host KMV monitor: cross-batch order-free
accumulation and EXACT batch/stream parity against the registered
Catalyst operator (set-union state merges losslessly — anything ever
discarded was above the kept k-th smallest and can never re-enter)."""

from __future__ import annotations

from aurora_mito_etl_spark.streaming import hoststats as hs
from aurora_mito_etl_spark.streaming import incremental as inc

SCHEMA = "host string, text string"
K = 8  # small k so saturation happens inside the test


def _drain(spark, landing, ckpt, sink):
    stream = hs.host_stats_stream(
        inc.stream_landing_dir(spark, landing, SCHEMA), k=K
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_accumulates_and_matches_batch_twin(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    emissions: list[tuple] = []

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    def sink(bdf, _bid):
        emissions.extend(
            (r["host"], r["n_docs"], r["k_used"], r["distinct_est"])
            for r in bdf.collect()
        )

    # batch 1: host a far past saturation (k=8), host b tiny, a NULL
    # host, a NULL text (counts, no hash), and a duplicate text
    batch1 = (
        [("a", f"page {i}") for i in range(30)]
        + [("a", "page 0"), ("a", None), ("b", "x"), (None, "nullhost")]
    )
    # batch 2: more of a (dedups against batch 1's state), b grows
    batch2 = [("a", f"page {i}") for i in range(25, 40)] + [
        ("b", "y"),
        (None, "nullhost"),
    ]
    write(batch1)
    _drain(spark, landing, ckpt, sink)
    assert len(emissions) == 3  # hosts a, b, NULL
    write(batch2)
    _drain(spark, landing, ckpt, sink)

    final: dict = {}
    for host, n, ku, est in emissions:
        final[host] = (n, ku, est)
    twin = {
        r["host"]: (r["n_docs"], r["k_used"], r["distinct_est"])
        for r in hs.host_stats_batch(
            spark.createDataFrame(batch1 + batch2, SCHEMA), k=K
        ).collect()
    }
    assert set(final) == set(twin) == {"a", "b", None}
    for h in twin:
        assert final[h] == twin[h], h
    # semantics: a is saturated (k_used == K, estimate from h_k), b is
    # exact-below-saturation, the NULL host deduped its repeated text
    assert twin["a"][0] == 47 and twin["a"][1] == K
    assert twin["b"] == (2, 2, 2.0)
    assert twin[None] == (2, 1, 1.0)
    assert twin["a"][2] > 0


def test_estimate_arithmetic_matches_operator_branches():
    """Saturation rule + exact product/divide twin arithmetic."""
    assert hs._estimate(0, None, 8) == 0.0
    assert hs._estimate(3, 12345, 8) == 3.0  # below saturation: exact
    from aurora_mito_etl_spark.functions.numeric import fixed6_py

    h_k = 2**40
    want = float(7) * float(2**48) / h_k
    got = hs._estimate(8, h_k, 8)
    assert got == fixed6_py(want) and abs(got - want) < 1e-6
