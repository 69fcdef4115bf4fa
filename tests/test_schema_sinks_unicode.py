from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from aurora_mito_etl_spark.operators import unicode_udfs as uu
from aurora_mito_etl_spark.schema import CheckViolation, validate
from aurora_mito_etl_spark.schema.validate import violations_df
from aurora_mito_etl_spark.sources import sinks


def test_validate_clean_table(spark):
    df = spark.createDataFrame(
        [("123", "YES", "metformin"), ("456", "probablyYES", None)],
        "pmid string, confidence string, compound string",
    )
    rep = validate(df, "pubmed_gpt")
    assert rep.ok and rep.total_rows == 2


def test_validate_reports_violations(spark):
    df = spark.createDataFrame(
        [("abc", "YES", "x"), ("123", "maybe", "y")],
        "pmid string, confidence string, compound string",
    )
    rep = validate(df, "pubmed_gpt")
    assert rep.violations["pmid_digits"] == 1
    assert rep.violations["confidence_enum"] == 1
    assert rep.violations["not_null_pmid"] == 0  # implicit NOT NULL check
    with pytest.raises(CheckViolation):
        validate(df, "pubmed_gpt", strict=True)
    bad = violations_df(df, "pubmed_gpt").collect()
    assert sorted(r["pmid"] for r in bad) == ["123", "abc"]


def test_validate_null_rows_are_violations(spark):
    # NULL predicate results (rlike(NULL)) must count as failures,
    # and non-nullable schema fields get implicit NOT NULL checks.
    df = spark.createDataFrame(
        [(None, "YES", "x")], "pmid string, confidence string, compound string"
    )
    rep = validate(df, "pubmed_gpt")
    assert rep.violations["pmid_digits"] == 1
    assert rep.violations["not_null_pmid"] == 1
    assert not rep.ok


def test_validate_missing_columns_reported_not_raised(spark):
    df = spark.createDataFrame([("1",)], "pmid string")
    rep = validate(df, "pubmed_gpt")
    assert rep.missing_columns == ["confidence", "compound"]
    assert not rep.ok
    with pytest.raises(CheckViolation):
        validate(df, "pubmed_gpt", strict=True)


def test_nfc_and_ascii_transliterate(spark):
    # e + combining acute (decomposed) vs precomposed é
    df = spark.createDataFrame([("Café – naïve",), (None,)], "s string")
    out = df.select(
        uu.nfc_normalize(F.col("s")).alias("nfc"),
        uu.ascii_transliterate(F.col("s")).alias("ascii"),
        uu.normalize_text_full(F.col("s")).alias("full"),
    ).collect()
    assert out[0]["nfc"] == "Café – naïve"
    assert out[0]["ascii"] == "Cafe  naive"
    assert out[0]["full"] == "Cafe  naive"
    assert out[1]["nfc"] is None and out[1]["ascii"] is None


def test_normalize_compound_name(spark):
    df = spark.createDataFrame(
        [("Metformin analogs",), (" IACS-010759 ",), ("Rotenones",), ("Citrus",), ("gas",)],
        "s string",
    )
    got = [
        r["n"]
        for r in df.select(uu.normalize_compound_name(F.col("s")).alias("n")).collect()
    ]
    assert got == ["metforminanalog", "iacs010759", "rotenone", "citrus", "gas"]


def test_tsv_sink_and_provenance(spark, tmp_path):
    df = spark.createDataFrame([("1", 2.5), ("3", 4.0)], "pmid string, v double")
    base = str(tmp_path / "release")
    path = sinks.overwrite_release(df, base, "table.tsv", date="2026-01-15")
    assert "date=2026-01-15" in path
    files = [f for f in os.listdir(path) if f.endswith(".csv")]
    assert len(files) == 1
    body = open(os.path.join(path, files[0])).read()
    assert body.splitlines()[0] == "pmid\tv"

    prov = str(tmp_path / "release_info.jsonl")
    rec = sinks.write_provenance(
        prov, path, step="finalize", sources=["pubmed_gpt"], parameters={"k": 1},
        date="2026-01-15",
    )
    assert rec["sha256"] == sinks.sha256_of_dir(path)
    lines = [json.loads(line) for line in open(prov)]
    assert lines[0]["step"] == "finalize"
    # idempotent re-release: same content → same hash
    sinks.overwrite_release(df, base, "table.tsv", date="2026-01-15")
    assert sinks.sha256_of_dir(path) == rec["sha256"]


def test_add_link_column(spark):
    df = spark.createDataFrame([("42",)], "pmid string")
    out = sinks.add_link_column(df, "pmid").collect()[0]["link"]
    assert out == "https://pubmed.ncbi.nlm.nih.gov/?term=42"


def test_upsert_parquet_by_key(spark, tmp_path):
    path = str(tmp_path / "smiles_cache")
    v1 = spark.createDataFrame(
        [("Metformin", "OLD"), ("Rotenone", "R1")], "key string, value string"
    )
    sinks.upsert_parquet_by_key(spark, path, v1, "key")
    v2 = spark.createDataFrame(
        [("Metformin", "NEW"), ("Piericidin", "P1")], "key string, value string"
    )
    sinks.upsert_parquet_by_key(spark, path, v2, "key")
    got = {r["key"]: r["value"] for r in spark.read.parquet(path).collect()}
    assert got == {"Metformin": "NEW", "Rotenone": "R1", "Piericidin": "P1"}


def test_write_training_shards(spark, tmp_path):
    from aurora_mito_etl_spark.sources import sinks

    df = spark.createDataFrame(
        [(i, f"src{i % 3}", f"doc {i}") for i in range(30)],
        "doc_id long, source string, text string",
    )
    out = str(tmp_path / "corpus")
    prov = str(tmp_path / "provenance.jsonl")
    manifest = sinks.write_training_shards(
        df, out, provenance_path=prov, sources=["unit-test"], date="2026-08-13"
    )
    assert manifest == {"src0": 10, "src1": 10, "src2": 10}
    # layout is shard-partitioned and re-readable
    back = spark.read.parquet(out)
    assert back.count() == 30
    assert sorted(r["source"] for r in back.select("source").distinct().collect()) == [
        "src0", "src1", "src2"
    ]
    import json as j

    with open(out + "/_manifest.json", encoding="utf-8") as f:
        m = j.load(f)
    assert m["total_rows"] == 30 and m["shards"]["src1"] == 10
    with open(prov, encoding="utf-8") as f:
        rec = j.loads(f.readlines()[-1])
    assert rec["step"] == "write_training_shards" and rec["sha256"]
    # idempotent rerun (K3): same manifest, no duplicated rows
    manifest2 = sinks.write_training_shards(df, out)
    assert manifest2 == manifest
    assert spark.read.parquet(out).count() == 30


def test_write_training_shards_null_shard(spark, tmp_path):
    from aurora_mito_etl_spark.sources import sinks

    df = spark.createDataFrame(
        [(1, "srcA", "x"), (2, None, "y"), (3, None, "z")],
        "doc_id long, source string, text string",
    )
    out = str(tmp_path / "c2")
    manifest = sinks.write_training_shards(df, out)
    # NULL shard keys as the writer's own on-disk partition name and
    # never collides with a literal 'None' shard
    assert manifest == {"srcA": 1, "__HIVE_DEFAULT_PARTITION__": 2}
    # a literal 'None' shard no longer collides with NULL
    ok = spark.createDataFrame(
        [(1, "None", "x"), (2, None, "y")],
        "doc_id long, source string, text string",
    )
    m2 = sinks.write_training_shards(ok, str(tmp_path / "c3"))
    assert m2 == {"None": 1, "__HIVE_DEFAULT_PARTITION__": 1}
    # ...but a literal shard named like the writer's NULL directory does
    import pytest

    clash = spark.createDataFrame(
        [(1, "__HIVE_DEFAULT_PARTITION__", "x"), (2, None, "y")],
        "doc_id long, source string, text string",
    )
    with pytest.raises(ValueError):
        sinks.write_training_shards(clash, str(tmp_path / "c4"))
