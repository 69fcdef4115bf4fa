"""Streaming/incremental semantics (SURVEY §2.9 I1-I3)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from aurora_mito_etl_spark.streaming import incremental as inc

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("pmid", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _write_batch(spark, path, rows, n):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_dedup_across_batches(spark, tmp_path):
    """New files land → micro-batches → dropDuplicates keeps the
    first sighting of each pmid across batches (I1 + I2)."""
    import datetime as dt

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out = []

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    _write_batch(spark, landing, [("1", t0, "a"), ("2", t0, "b")], 1)

    stream = inc.dedup_stream(
        inc.stream_landing_dir(spark, landing, EVENT_SCHEMA), ["pmid"]
    )

    def collect_batch(bdf, _bid):
        out.extend((r["pmid"], r["payload"]) for r in bdf.collect())

    q = inc.run_available_now(stream, ckpt, collect_batch)
    q.awaitTermination(120)
    assert sorted(out) == [("1", "a"), ("2", "b")]

    # second landing: one duplicate pmid, one new
    _write_batch(spark, landing, [("1", t0, "a-dup"), ("3", t0, "c")], 2)
    out.clear()
    stream2 = inc.dedup_stream(
        inc.stream_landing_dir(spark, landing, EVENT_SCHEMA), ["pmid"]
    )
    q2 = inc.run_available_now(stream2, ckpt, collect_batch)
    q2.awaitTermination(120)
    # checkpointed state: pmid 1 already seen in batch 1 → only 3 new
    assert sorted(out) == [("3", "c")]


def test_read_files_modified_after(spark, tmp_path):
    import datetime as dt
    import time

    p = str(tmp_path / "inc")
    t0 = dt.datetime(2026, 1, 1)
    _write_batch(spark, p, [("1", t0, "old")], 1)
    time.sleep(1.1)
    cut = dt.datetime.now()
    time.sleep(1.1)
    _write_batch(spark, p, [("2", t0, "new")], 2)
    got = inc.read_files_modified_after(spark, p, cut, EVENT_SCHEMA).collect()
    assert [r["pmid"] for r in got] == ["2"]


def test_windowed_and_session_counts_batch(spark):
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        ("u1", base),
        ("u1", base + dt.timedelta(minutes=10)),
        ("u1", base + dt.timedelta(hours=2)),  # new session, new window
        ("u2", base + dt.timedelta(minutes=61)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")

    wins = inc.windowed_counts(df, window="1 hour", group_cols=["user_id"]).collect()
    got = {(r["user_id"], r["window_start"].hour): r["n_events"] for r in wins}
    assert got == {("u1", 10): 2, ("u1", 12): 1, ("u2", 11): 1}

    sess = inc.session_counts(df, gap="30 minutes").collect()
    per_user = sorted((r["user_id"], r["n_events"]) for r in sess)
    assert per_user == [("u1", 1), ("u1", 2), ("u2", 1)]


def test_overwrite_date_partition_idempotent(spark, tmp_path):
    base = str(tmp_path / "release")
    df1 = spark.createDataFrame([("a", 1)], "k string, v int")
    df2 = spark.createDataFrame([("b", 2)], "k string, v int")
    inc.overwrite_date_partition(df1, base, "2026-01-01")
    inc.overwrite_date_partition(df2, base, "2026-01-02")
    # rewriting day 2 must not clobber day 1
    inc.overwrite_date_partition(df2.withColumn("v", F.lit(99)), base, "2026-01-02")
    got = spark.read.parquet(base)
    # partition values are type-inferred (string → date) on read
    rows = {(str(r["date"]), r["k"], r["v"]) for r in got.collect()}
    assert rows == {("2026-01-01", "a", 1), ("2026-01-02", "b", 99)}


def test_resume_anti_join(spark):
    todo = spark.createDataFrame([("1", "x"), ("2", "y")], "pmid string, t string")
    done = spark.createDataFrame([("1",)], "pmid string")
    out = inc.resume_anti_join(todo, done, "pmid").collect()
    assert [r["pmid"] for r in out] == ["2"]
