"""Streaming label-centroid drift monitor: cross-batch order-free
accumulation and EXACT batch/stream parity against the registered
centroid builder (integer micros sums merge by addition — the same
property that makes the batch aggregate one map-side pass)."""

from __future__ import annotations

import random

from aurora_mito_etl_spark.streaming import centroid as cd
from aurora_mito_etl_spark.streaming import incremental as inc

DIM = 8
SCHEMA = "label string, embedding array<double>"


def _drain(spark, landing, ckpt, sink, reference):
    stream = cd.centroid_drift_stream(
        inc.stream_landing_dir(spark, landing, SCHEMA),
        reference,
        dim=DIM,
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
    rng = random.Random(67)
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    reference = {
        "a": [1.0] + [0.0] * (DIM - 1),
        "b": [0.0, 1.0] + [0.0] * (DIM - 2),
        # label "c" has NO reference -> cos_ref NULL
    }
    emissions: list[tuple] = []

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    def sink(bdf, _bid):
        emissions.extend(
            (r["label"], r["n"], r["centroid_norm"], r["cos_ref"])
            for r in bdf.collect()
        )

    def vec(center):
        return [
            round(center[d] + rng.uniform(-0.5, 0.5), 3) for d in range(DIM)
        ]

    batch1 = (
        [("a", vec(reference["a"])) for _ in range(40)]
        + [("b", vec(reference["b"])) for _ in range(25)]
        + [("c", vec([5.0] * DIM))]
        + [(None, vec([9.0] * DIM))]       # NULL label: excluded
        + [("a", None)]                     # NULL vector: excluded
        + [("a", [1.0, 2.0])]               # short vector: excluded
        + [("a", [None] + [1.0] * (DIM - 1))]  # NULL element: excluded
    )
    batch2 = [("a", vec(reference["b"])) for _ in range(30)] + [
        ("b", vec(reference["b"])) for _ in range(10)
    ]
    write(batch1)
    _drain(spark, landing, ckpt, sink, reference)
    first = {r[0]: r for r in emissions}
    assert set(first) == {"a", "b", "c"}
    assert first["a"][1] == 40 and first["c"][3] is None
    write(batch2)
    _drain(spark, landing, ckpt, sink, reference)

    final: dict[str, tuple] = {}
    for label, n, norm, cos in emissions:
        final[label] = (n, norm, cos)
    twin = {
        r["label"]: (r["n"], r["centroid_norm"], r["cos_ref"])
        for r in cd.centroid_drift_batch(
            spark.createDataFrame(batch1 + batch2, SCHEMA), reference, dim=DIM
        ).collect()
    }
    assert set(twin) == {"a", "b", "c"}
    # EXACT parity — same integer sums, same fold orders, same fixed6
    for label in twin:
        assert final[label] == twin[label], (label, final[label], twin[label])
    assert twin["a"][0] == 70  # both batches accumulated, exclusions held
    # drift is visible: batch2 pulled label a toward b's reference
    assert first["a"][3] is not None and twin["a"][2] is not None
    assert twin["a"][2] < first["a"][3]


def test_zero_norm_reference_and_centroid_guard(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    reference = {
        "z": [0.0] * DIM,   # zero reference -> cos_ref NULL
        "y": [1.0, 2.0],    # wrong-length reference -> cos_ref NULL
    }
    emissions: list[tuple] = []

    def sink(bdf, _bid):
        emissions.extend(
            (r["label"], r["n"], r["centroid_norm"], r["cos_ref"])
            for r in bdf.collect()
        )

    rows = [
        ("z", [1.0] * DIM),
        ("y", [2.0] * DIM),  # nonzero centroid, wrong-length reference
        ("w", [0.0] * DIM),  # zero centroid, no reference
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        landing
    )
    _drain(spark, landing, ckpt, sink, reference)
    got = {r[0]: r for r in emissions}
    assert got["z"][3] is None          # zero-norm reference
    assert got["y"][3] is None          # wrong-length reference
    assert got["w"][2] == 0.0 and got["w"][3] is None
    twin = {
        r["label"]: (r["n"], r["centroid_norm"], r["cos_ref"])
        for r in cd.centroid_drift_batch(
            spark.createDataFrame(rows, SCHEMA), reference, dim=DIM
        ).collect()
    }
    for label in twin:
        assert (got[label][1], got[label][2], got[label][3]) == twin[label]
