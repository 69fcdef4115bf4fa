from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from aurora_mito_etl_spark.streaming import stateful


def test_running_totals_batch(spark):
    df = spark.createDataFrame(
        [("u1", 1.0), ("u1", 2.5), ("u2", 4.0)], "user_id string, value double"
    )
    out = {r["key"]: (r["n_events"], r["total_value"])
           for r in stateful.running_totals_batch(df).collect()}
    assert out == {"u1": (2, 3.5), "u2": (1, 4.0)}


def test_first_seen_batch(spark):
    df = spark.createDataFrame(
        [("u1", 1.0), ("u1", 2.5), ("u2", 4.0)], "user_id string, value double"
    )
    out = stateful.first_seen_batch(df).collect()
    assert sorted(r["user_id"] for r in out) == ["u1", "u2"]
    assert {r["user_id"]: r["value"] for r in out}["u2"] == 4.0


def test_first_seen_stream_exactly_once_per_key(spark, tmp_path):
    """A key emits only in the batch where it FIRST appears; reappearing
    keys are suppressed by the checkpointed state."""
    schema = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(landing)

    collected: list[tuple] = []

    def sink(bdf, _bid):
        collected.extend((r["user_id"], r["value"]) for r in bdf.collect())

    def run_batch():
        q = (
            stateful.first_seen_stream(
                spark.readStream.schema(schema).parquet(landing)
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write([("u1", 1.0), ("u2", 5.0)])
    run_batch()
    assert sorted(collected) == [("u1", 1.0), ("u2", 5.0)]

    collected.clear()
    write([("u1", 99.0), ("u3", 7.0)])  # u1 reappears: must NOT emit
    run_batch()
    assert collected == [("u3", 7.0)]


def test_running_totals_stream_accumulates(spark, tmp_path):
    """State carries across micro-batches: totals keep growing."""
    schema = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(landing)

    collected: list[tuple] = []

    def sink(bdf, _bid):
        collected.extend(
            (r["key"], r["n_events"], r["total_value"]) for r in bdf.collect()
        )

    write([("u1", 1.0), ("u1", 2.0), ("u2", 5.0)])
    stream = stateful.running_totals_stream(
        spark.readStream.schema(schema).parquet(landing)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert set(collected) == {("u1", 2, 3.0), ("u2", 1, 5.0)}

    # batch 2: state resumes from the checkpoint
    collected.clear()
    write([("u1", 10.0), ("u3", 7.0)])
    stream2 = stateful.running_totals_stream(
        spark.readStream.schema(schema).parquet(landing)
    )
    q2 = (
        stream2.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert set(collected) == {("u1", 3, 13.0), ("u3", 1, 7.0)}
