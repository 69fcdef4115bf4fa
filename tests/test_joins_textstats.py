from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aurora_mito_etl_spark.operators import joins as j
from aurora_mito_etl_spark.operators import textstats as ts


def test_semi_anti_join(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    keys = spark.createDataFrame([(1,), (3,)], "k int")
    assert sorted(r["k"] for r in j.semi_join(df, keys, "k").collect()) == [1, 3]
    assert [r["k"] for r in j.anti_join(df, keys, "k").collect()] == [2]


def test_two_tier_lookup_prefers_exact(spark):
    df = spark.createDataFrame([("Metformin",), ("METFORMIN",), ("unknown",)], "name string")
    lk = spark.createDataFrame(
        [("Metformin", "CN(C)C(=N)NC(=N)N"), ("metformin", "lowercase-entry")],
        "k string, v string",
    )
    out = j.lookup_join_two_tier(df, lk, "name", "k", "v", "smiles", default="")
    got = {r["name"]: r["smiles"] for r in out.collect()}
    assert got["Metformin"] == "CN(C)C(=N)NC(=N)N"  # exact tier wins
    assert got["METFORMIN"] == "CN(C)C(=N)NC(=N)N"  # falls to lowercase tier, min() winner
    assert got["unknown"] == ""


def test_tag_semi_join_distinct(spark):
    fact = spark.createDataFrame(
        [("p1", "MESH:D1"), ("p1", "MESH:D1"), ("p2", "MESH:D9"), ("p3", "MESH:D2")],
        "pmid string, tag string",
    )
    tags = spark.createDataFrame([("MESH:D1",), ("MESH:D2",)], "tag string")
    out = j.tag_semi_join_distinct(fact, tags, "tag", "pmid")
    assert sorted(r["pmid"] for r in out.collect()) == ["p1", "p3"]


def test_range_join(spark):
    vals = spark.createDataFrame([(5,), (15,), (25,)], "v int")
    bins = spark.createDataFrame(
        [(0, 10, "low"), (10, 20, "mid"), (20, 30, "high")], "lo int, hi int, lab string"
    )
    out = j.range_join(vals, bins, "v", "lo", "hi")
    got = {r["v"]: r["lab"] for r in out.collect()}
    assert got == {5: "low", 15: "mid", 25: "high"}


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog sat in the sun",),
            ("el perro y el gato en la casa por la noche",),
            ("der hund und die katze ist nicht da",),
            ("zzz qqq xxx",),
        ],
        "text string",
    )
    got = [r["l"] for r in df.select(ts.lang_id(F.col("text")).alias("l")).collect()]
    assert got == ["en", "es", "de", "und"]


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world! x2",)], "text string")
    row = df.select(
        ts.token_count_ws(F.col("text")).alias("ws"),
        ts.token_count_bpe(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert row["ws"] == 3
    # Hello , world ! x 2 → 6 BPE-ish tokens
    assert row["bpe"] == 6


def test_quality_score_range(spark):
    df = spark.createDataFrame(
        [("A clean readable sentence with normal words here.",), ("!!!!",)],
        "text string",
    )
    got = [r["q"] for r in df.select(ts.quality_score(F.col("text")).alias("q")).collect()]
    assert 0.0 <= got[1] < got[0] <= 1.0


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("one two",), ("one two three four",)], "text string")
    got = [r["s"] for r in df.select(ts.shingles(F.col("text"), 3).alias("s")).collect()]
    assert got[0] == []
    assert got[1] == ["one two three", "two three four"]


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame([("A  B\tC",), ("a b c",)], "text string")
    got = [r["f"] for r in df.select(ts.fingerprint_md5(F.col("text")).alias("f")).collect()]
    assert got[0] == got[1]
