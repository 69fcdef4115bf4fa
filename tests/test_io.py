from __future__ import annotations

from aurora_mito_etl_spark.sources import io as eio


def test_read_staging_table_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("123", "YES", "metformin"), ("456", "NO", None)],
        "pmid string, confidence string, compound string",
    )
    p = str(tmp_path / "pubmed_gpt_tsv")
    (
        df.coalesce(1)
        .write.option("sep", "\t")
        .option("header", True)
        .csv(p)
    )
    back = eio.read_staging_table(spark, p, "pubmed_gpt")
    assert back.schema["pmid"].dataType.simpleString() == "string"
    got = sorted((r["pmid"], r["confidence"], r["compound"]) for r in back.collect())
    assert got == [("123", "YES", "metformin"), ("456", "NO", None)]


def test_na_to_null(spark):
    df = spark.createDataFrame([("NA",), ("x",)], "compound string")
    out = [r["compound"] for r in eio.na_to_null(df, ["compound"]).collect()]
    assert out == [None, "x"]
