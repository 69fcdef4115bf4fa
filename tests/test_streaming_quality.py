"""Composition: streaming ingest + quality gate + PII redaction +
decontamination (I1/I2 + the round-2 training-data tier).

The batch operators are stateless per-document projections and
broadcast probes, so they compose unchanged into a foreachBatch
micro-batch pipeline: new documents land → cross-batch dedup by id →
Gopher gate → PII scrub → benchmark decontamination → append. A doc
arriving twice is processed once; a contaminated or low-quality doc
never reaches the sink.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from aurora_mito_etl_spark.operators import decontaminate as dc
from aurora_mito_etl_spark.operators import quality as ql
from aurora_mito_etl_spark.operators import redact as rd
from aurora_mito_etl_spark.streaming import incremental as inc

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

GOOD = (
    "The quick brown fox jumps over the lazy dog and runs far away. "
    "It is a fine day to be out in the field with good friends of mine. "
    "Every word here is a normal word and that should pass every rule. "
    "More plain text follows so the word count clears the fifty floor now."
)
BENCH_SPAN = "unique benchmark marker span alpha beta gamma delta"


def test_streaming_quality_pipeline(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    bench = spark.createDataFrame([(0, BENCH_SPAN)], SCHEMA)
    sunk: list[tuple] = []

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
            landing
        )

    def process_batch(bdf, _bid):
        keep = (
            ql.gopher_signals(bdf, min_stop_hits=1)
            .filter(F.col("gopher_keep"))
            .select("doc_id")
        )
        gated = bdf.join(keep, "doc_id", "left_semi")
        clean = dc.drop_contaminated(gated, bench, n=4)
        out = rd.redact_pii(clean.withColumn(
            "text", F.concat(F.col("text"), F.lit(" contact a@b.co"))
        ))
        sunk.extend(
            (r["doc_id"], r["n_email"], "<EMAIL>" in r["redacted_text"])
            for r in out.collect()
        )

    def drain():
        stream = inc.dedup_stream(
            inc.stream_landing_dir(spark, landing, SCHEMA), ["doc_id"]
        )
        q = inc.run_available_now(stream, ckpt, process_batch)
        q.awaitTermination(120)

    write(
        [
            (1, GOOD),                                   # passes everything
            (2, "too short"),                            # fails word floor
            (3, GOOD + " " + BENCH_SPAN),                # contaminated
        ]
    )
    drain()
    assert sorted(sunk) == [(1, 1, True)]

    sunk.clear()
    write([(1, GOOD), (4, GOOD)])  # 1 is a cross-batch duplicate
    drain()
    assert sorted(sunk) == [(4, 1, True)]
