"""Streaming quantile sketch: cross-batch order-free accumulation and
EXACT batch/stream parity against the registered Catalyst operator
(mergeable-by-addition is what makes the sketch streamable)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from aurora_mito_etl_spark.streaming import incremental as inc
from aurora_mito_etl_spark.streaming import qsketch

SCHEMA = "group string, value double"


def _drain(spark, landing, ckpt, sink):
    stream = qsketch.quantile_sketch_stream(
        inc.stream_landing_dir(spark, landing, SCHEMA)
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
    rng = random.Random(53)
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    emissions: list[tuple] = []

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    def sink(bdf, _bid):
        emissions.extend(
            (r["group"], r["quantile"], r["value"], r["n"])
            for r in bdf.collect()
        )

    batch1 = [("a", round(rng.uniform(0, 5000), 3)) for _ in range(120)] + [
        ("b", 7.25),
        (None, 1.5),
        ("a", None),  # NULL value dropped
    ]
    batch2 = [("a", round(rng.uniform(-100, 100), 3)) for _ in range(80)] + [
        (None, 9.0),
        ("b", 7.25),
    ]
    write(batch1)
    _drain(spark, landing, ckpt, sink)
    n_first = len(emissions)
    assert n_first  # groups a, b and the NULL group all emitted
    write(batch2)
    _drain(spark, landing, ckpt, sink)

    # final emission per (group, quantile) == one batch pass over ALL
    # rows through the REGISTERED operator — exact, order-free
    final: dict[tuple, tuple] = {}
    for g, q, v, n in emissions:
        final[(g, q)] = (v, n)
    twin = {
        (r["group"], r["quantile"]): (r["value"], r["n"])
        for r in qsketch.quantile_sketch_batch(
            spark.createDataFrame(batch1 + batch2, SCHEMA)
        ).collect()
    }
    # every twin row must be matched exactly by the stream's final state
    assert set(twin) <= set(final)
    for key in twin:
        assert final[key] == twin[key], key
    # groups: a, b, NULL — 6 quantiles each
    assert len(twin) == 18
    assert ("b", "p50") in twin and twin[("b", "p50")] == (7.25, 2)


def test_all_null_batch_emits_nothing_for_existing_group(spark, tmp_path):
    """A micro-batch whose rows for an existing group are all NULL
    leaves that group's state untouched and must NOT re-emit its
    unchanged quantiles (append-mode contract; ADVICE r12)."""
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    emissions: list[tuple] = []

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    def sink(bdf, _bid):
        emissions.extend(
            (r["group"], r["quantile"], r["value"], r["n"])
            for r in bdf.collect()
        )

    write([("a", 1.0), ("a", 2.0), ("b", 5.0)])
    _drain(spark, landing, ckpt, sink)
    n_first = len(emissions)
    assert n_first == 12  # groups a, b x 6 quantiles
    # second batch: group a all-NULL (state unchanged), group c new
    write([("a", None), ("a", None), ("c", 3.0)])
    _drain(spark, landing, ckpt, sink)
    second = emissions[n_first:]
    assert {g for g, *_ in second} == {"c"}  # no duplicate 'a' rows
    assert len(second) == 6


def test_selection_matches_operator_semantics():
    """The python selection is the integer-threshold bucket-min rule."""
    acc = {100_000_000: 3, 200_000_000: 1}  # values 100.0 x3, 200.0 x1
    rows = {name: (v, n) for name, v, n in qsketch._select(
        acc, (("p50", 1, 2), ("p99", 99, 100), ("p0", 0, 1))
    )}
    # n=4: p50 thresh=2 -> 100.0; p99 thresh=4 -> 200.0; p0 thresh=0 -> min
    assert rows["p50"] == (100.0, 4)
    assert rows["p99"] == (200.0, 4)
    assert rows["p0"] == (100.0, 4)
