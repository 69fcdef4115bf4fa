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


# ---------------------------------------------------------------------------
# Schema evolution (align_to_schema / read_evolving_parquet)
# ---------------------------------------------------------------------------

def _canonical():
    from pyspark.sql import types as T

    return T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_tokens", T.LongType()),
    ])


def test_read_evolving_parquet(spark, tmp_path):
    from aurora_mito_etl_spark.sources.io import read_evolving_parquet

    # v1 batch: no lang column, n_tokens written as int
    spark.createDataFrame(
        [(1, "old doc", 3)], "doc_id long, text string, n_tokens int"
    ).write.parquet(str(tmp_path / "landing" / "batch=1"))
    # v2 batch: adds lang and an extra column the contract doesn't know
    spark.createDataFrame(
        [(2, "new doc", "en", 4, "junk")],
        "doc_id long, text string, lang string, n_tokens long, extra string",
    ).write.parquet(str(tmp_path / "landing" / "batch=2"))

    got = read_evolving_parquet(
        spark, str(tmp_path / "landing"), _canonical()
    )
    assert got.columns == ["doc_id", "text", "lang", "n_tokens"]
    assert dict(got.dtypes)["n_tokens"] == "bigint"
    rows = {r["doc_id"]: r for r in got.collect()}
    assert rows[1]["lang"] is None and rows[1]["n_tokens"] == 3
    assert rows[2]["lang"] == "en" and rows[2]["n_tokens"] == 4


def test_align_refuses_narrowing(spark):
    import pytest
    from pyspark.sql import types as T

    from aurora_mito_etl_spark.sources.io import align_to_schema

    df = spark.createDataFrame([(1,)], "doc_id long")
    narrow = T.StructType([T.StructField("doc_id", T.IntegerType())])
    with pytest.raises(TypeError, match="non-widening"):
        align_to_schema(df, narrow)


def test_align_keep_extra(spark):
    from aurora_mito_etl_spark.sources.io import align_to_schema

    df = spark.createDataFrame(
        [(1, "t", "x")], "doc_id long, text string, extra string"
    )
    got = align_to_schema(df, _canonical(), keep_extra=True)
    assert got.columns == ["doc_id", "text", "lang", "n_tokens", "extra"]
