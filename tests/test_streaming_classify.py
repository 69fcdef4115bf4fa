"""Composition: streaming ingest + dedup + LLM classify (I1+I2+D5).

The reference's incremental LLM stage as one streaming program:
new abstracts land → cross-batch dedup by pmid → stub classifier →
append sink; a PMID arriving twice is classified once.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from aurora_mito_etl_spark.operators import llm, multimodal as mm
from aurora_mito_etl_spark.streaming import incremental as inc

SCHEMA = T.StructType(
    [
        T.StructField("pmid", T.StringType()),
        T.StructField("title_abstract", T.StringType()),
    ]
)


def test_streaming_classify_at_most_once(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    results: list[tuple] = []

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
            landing
        )

    def classify_batch(bdf, _bid):
        out = llm.classify_documents(bdf, llm.stub_classifier)
        results.extend((r["pmid"], r["confidence"]) for r in out.collect())

    def drain():
        stream = inc.dedup_stream(
            inc.stream_landing_dir(spark, landing, SCHEMA), ["pmid"]
        )
        q = inc.run_available_now(stream, ckpt, classify_batch)
        q.awaitTermination(120)

    write([("1", "rotenone inhibits complex i"), ("2", "plain text")])
    drain()
    assert sorted(results) == [("1", "YES"), ("2", "NO")]

    results.clear()
    write([("1", "rotenone inhibits complex i"), ("3", "nadh decrease observed")])
    drain()
    # pmid 1 already classified in batch 1 → only 3 processed
    assert sorted(results) == [("3", "probablyYES")]


def test_phash_near_dup_pairs(spark):
    rows = [
        (1, b"payload-one", None),
        (2, b"payload-one", None),   # identical bytes → identical phash
        (3, b"payload-other", None),
    ]
    media = spark.createDataFrame(rows, mm.media_table_schema())
    feats = mm.image_features(media, mm.fake_media_backend)
    pairs = mm.phash_near_dup_pairs(feats, max_hamming=0).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(1, 2, 0)]
