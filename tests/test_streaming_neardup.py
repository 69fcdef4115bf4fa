"""Streaming MinHash near-dup filter (streaming/neardup.py)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from aurora_mito_etl_spark.operators import dedup as dd
from aurora_mito_etl_spark.streaming import incremental as inc
from aurora_mito_etl_spark.streaming import neardup as nd

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
NEAR = BASE + " extra"          # high shingle overlap with BASE
OTHER = "one two three four five six seven eight nine ten"


def test_batch_twin_finds_near_pair(spark):
    df = spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER)], SCHEMA
    )
    pairs = nd.minhash_near_dup_batch(df, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert all(r["est_jaccard"] >= 0.5 for r in pairs)


def test_short_docs_never_pair(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "ab"), (3, None)], SCHEMA)
    assert nd.minhash_near_dup_batch(df).collect() == []


def test_signature_matches_batch_tier_portable_mode(spark):
    # the streaming signature must be the batch tier's portable-mode
    # signature (md5 base + _perm_params), so either path fingerprints
    # a document identically
    df = spark.createDataFrame([(1, BASE), (2, OTHER)], SCHEMA)
    got = {
        r["doc_id"]: list(r["s"])
        for r in df.select(
            "doc_id", nd._signature_udf(3, 8)(F.col("text")).alias("s")
        ).collect()
    }
    from aurora_mito_etl_spark.functions.hashing import md5_prefix60

    expected = (
        df.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    __import__(
                        "aurora_mito_etl_spark.operators.textstats",
                        fromlist=["shingles_arrow"],
                    ).shingles_arrow(F.col("text"), 3)
                )
            ).alias("s"),
        )
        .select(
            "doc_id", F.pmod(md5_prefix60(F.col("s")), F.lit(dd._MERSENNE_P)).alias("hm")
        )
        .groupBy("doc_id")
        .agg(
            *[
                F.min(
                    F.pmod(F.lit(a) * F.col("hm") + F.lit(b), F.lit(dd._MERSENNE_P))
                ).alias(f"m{i}")
                for i, (a, b) in enumerate(dd._perm_params(8))
            ]
        )
        .collect()
    )
    for row in expected:
        assert got[row["doc_id"]] == [row[f"m{i}"] for i in range(8)]


def test_streaming_cross_batch_memory(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    seen: list[tuple] = []

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    def sink(bdf, _bid):
        seen.extend((r["id_a"], r["id_b"]) for r in bdf.collect())

    def drain():
        stream = nd.minhash_near_dup_stream(
            inc.stream_landing_dir(spark, landing, SCHEMA), threshold=0.5
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write([(1, BASE), (3, OTHER)])
    drain()
    assert seen == []  # nothing near-dup yet

    # the near-dup of doc 1 arrives TWO batches later: state remembers
    write([(4, "unrelated filler words appear in this row only")])
    drain()
    seen.clear()
    write([(2, NEAR)])
    drain()
    assert set(seen) == {(1, 2)}


def test_redelivered_doc_not_readmitted(spark, tmp_path):
    # an at-least-once source re-delivers doc 1: state must not stack
    # a second copy, so the eventual near-dup pair emits once per band
    # collision against ONE stored copy, not two
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    seen: list[tuple] = []

    def sink(bdf, _bid):
        seen.extend(
            (r["id_a"], r["id_b"]) for r in bdf.collect()
        )

    def drain():
        stream = nd.minhash_near_dup_stream(
            inc.stream_landing_dir(spark, landing, SCHEMA), threshold=0.5
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    write([(1, BASE)])
    drain()
    write([(1, BASE)])  # re-delivery
    drain()
    seen.clear()
    write([(2, NEAR)])
    drain()
    # exactly one stored copy of doc 1 → the pair count equals the
    # number of colliding bands, which for identical signatures would
    # double if doc 1 were stored twice; distinct check is the robust
    # assertion either way
    assert set(seen) == {(1, 2)}
    n_bands_colliding = len(seen)
    assert n_bands_colliding <= 4  # bands=4 → at most one emit per band
