"""Streaming heavy-hitter monitor: cross-batch state accumulation,
the Misra-Gries bound, and batch/stream parity in the exact regime."""

from __future__ import annotations

from pyspark.sql import functions as F

from aurora_mito_etl_spark.streaming import heavyhitters as hh
from aurora_mito_etl_spark.streaming import incremental as inc

SCHEMA = "doc_id long, text string"


def _drain(spark, landing, ckpt, sink, **kw):
    stream = hh.heavy_hitter_stream(
        inc.stream_landing_dir(spark, landing, SCHEMA), **kw
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_batch_twin_exact_when_unreduced(spark):
    df = spark.createDataFrame(
        [(1, "hot hot hot warm"), (2, "hot warm cold")], SCHEMA
    )
    out = {
        r["token"]: r["lower_bound"]
        for r in hh.heavy_hitter_batch(df, counters=1024).collect()
    }
    assert out == {"hot": 4, "warm": 2, "cold": 1}


def test_stream_accumulates_across_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    emissions: list[tuple] = []

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    def sink(bdf, _bid):
        emissions.extend(
            (r["token"], r["lower_bound"]) for r in bdf.collect()
        )

    write([(1, "hot hot hot filler")])
    _drain(spark, landing, ckpt, sink, counters=1024)
    assert ("hot", 3) in emissions

    emissions.clear()
    write([(2, "hot hot other words")])
    _drain(spark, landing, ckpt, sink, counters=1024)
    # state remembered the first batch: 3 + 2
    assert ("hot", 5) in emissions


def test_mg_guarantee_and_state_bound(spark):
    # one bucket, tiny summary: the heavy token must survive the
    # reductions and the summary must respect the size bound
    text = "hot " * 300 + " ".join(f"u{i}" for i in range(200))
    df = spark.createDataFrame([(1, text)], SCHEMA)
    out = hh.heavy_hitter_batch(
        df, buckets=1, counters=8, emit_k=8
    ).collect()
    assert len(out) <= 8
    hot = {r["token"]: r["lower_bound"] for r in out}["hot"]
    # lower bound: undercount is at most n_bucket/(counters+1)
    assert 300 >= hot >= 300 - (500 // 9)


def test_batch_stream_parity_exact_regime(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        (1, "alpha beta beta gamma gamma gamma"),
        (2, "alpha delta delta"),
        (3, "epsilon alpha beta"),
    ]
    final: dict[int, set] = {}

    def sink(bdf, _bid):
        for r in bdf.collect():
            final.setdefault(r["bucket"], set()).add(
                (r["token"], r["lower_bound"])
            )

    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    _drain(spark, landing, ckpt, sink, counters=1024)

    batch = hh.heavy_hitter_batch(
        spark.createDataFrame(rows, SCHEMA), counters=1024
    ).collect()
    expected: dict[int, set] = {}
    for r in batch:
        expected.setdefault(r["bucket"], set()).add(
            (r["token"], r["lower_bound"])
        )
    # unreduced regime: both sides hold exact counts -> identical
    assert final == expected
