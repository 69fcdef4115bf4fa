"""Stream-stream interval join (streaming/joins.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from aurora_mito_etl_spark.streaming import incremental as inc
from aurora_mito_etl_spark.streaming import joins as sj

CAUSE_SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("cts", T.TimestampType()),
    T.StructField("campaign", T.StringType()),
])
EFFECT_SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("ets", T.TimestampType()),
    T.StructField("action", T.StringType()),
])

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _sec(s):
    return T0 + dt.timedelta(seconds=s)


def test_interval_join_attributes_within_window(spark, tmp_path):
    cdir, edir, ckpt = (str(tmp_path / d) for d in ("c", "e", "ck"))
    spark.createDataFrame(
        [("u1", _sec(0), "camp-a"), ("u2", _sec(5), "camp-b"),
         ("u3", _sec(10), "camp-c")],
        CAUSE_SCHEMA,
    ).coalesce(1).write.parquet(cdir)
    spark.createDataFrame(
        [
            ("u1", _sec(30), "click"),     # within 10 min -> attributed
            ("u2", _sec(3), "click"),      # BEFORE its cause -> dropped
            ("u3", _sec(11 * 60), "click"),  # 11 min later -> outside window
            ("u9", _sec(40), "click"),     # no matching cause
        ],
        EFFECT_SCHEMA,
    ).coalesce(1).write.parquet(edir)

    causes = inc.stream_landing_dir(spark, cdir, CAUSE_SCHEMA)
    effects = inc.stream_landing_dir(spark, edir, EFFECT_SCHEMA)
    joined = sj.attribute_effects(
        causes, effects, key="k", cause_ts="cts", effect_ts="ets",
        max_delay="10 minutes",
    )

    out = []

    def collect_batch(bdf, _bid):
        out.extend(
            (r["k"], r["campaign"], r["action"], r["latency_s"])
            for r in bdf.collect()
        )

    q = inc.run_available_now(joined, ckpt, collect_batch)
    q.awaitTermination(120)
    assert sorted(out) == [("u1", "camp-a", "click", 30.0)]


def test_unkeyed_join_refused(spark, tmp_path):
    (tmp_path / "x").mkdir()
    (tmp_path / "y").mkdir()
    causes = inc.stream_landing_dir(spark, str(tmp_path / "x"), CAUSE_SCHEMA)
    effects = inc.stream_landing_dir(spark, str(tmp_path / "y"), EFFECT_SCHEMA)
    with pytest.raises(ValueError, match="equality key"):
        sj.interval_join_streams(causes, effects, on=[])


def test_state_bounds_are_declared(spark, tmp_path):
    (tmp_path / "x").mkdir()
    (tmp_path / "y").mkdir()
    causes = inc.stream_landing_dir(spark, str(tmp_path / "x"), CAUSE_SCHEMA)
    effects = inc.stream_landing_dir(spark, str(tmp_path / "y"), EFFECT_SCHEMA)
    joined = sj.interval_join_streams(
        causes, effects, on=["k"], left_ts="cts", right_ts="ets"
    )
    plan = joined._jdf.queryExecution().logical().toString()
    # both sides watermarked (state expiry) and the interval bound in
    # the join condition (the unbounded variant must not sneak in)
    assert plan.count("EventTimeWatermark") == 2
    assert "INTERVAL" in plan or "interval" in plan