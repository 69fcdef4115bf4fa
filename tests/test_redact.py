"""PII redaction (operators/redact.py)."""

from __future__ import annotations

from aurora_mito_etl_spark.operators import redact as rd


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return rd.redact_pii(df).collect()[0]


def test_each_family_redacts(spark):
    r = _one(
        spark,
        "mail a.user+tag@sub.example.org from 192.168.1.100, "
        "ssn 123-45-6789, call +1 (415) 555-0199 now",
    )
    assert r["n_email"] == 1 and "<EMAIL>" in r["redacted_text"]
    assert r["n_ipv4"] == 1 and "<IP>" in r["redacted_text"]
    assert r["n_ssn"] == 1 and "<SSN>" in r["redacted_text"]
    assert r["n_phone"] == 1 and "<PHONE>" in r["redacted_text"]
    assert r["n_pii_total"] == 4
    for leak in ("example.org", "192.168", "6789", "0199"):
        assert leak not in r["redacted_text"]


def test_ssn_not_eaten_by_phone(spark):
    r = _one(spark, "id 123-45-6789 and phone 555-123-4567")
    assert r["n_ssn"] == 1 and r["n_phone"] == 1
    assert "<SSN>" in r["redacted_text"] and "<PHONE>" in r["redacted_text"]


def test_email_digits_not_double_counted(spark):
    # counts are taken on the progressively redacted text: the
    # address's digit runs must not also count as phone/ip
    r = _one(spark, "reach 555.123.4567.name@example.com please")
    assert r["n_email"] == 1
    assert r["n_ipv4"] == 0 and r["n_phone"] == 0
    assert r["n_pii_total"] == 1


def test_clean_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, "no pii here at all"), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in rd.redact_pii(df).collect()}
    assert out[1]["n_pii_total"] == 0
    assert out[1]["redacted_text"] == "no pii here at all"
    assert out[2]["n_pii_total"] == 0 and out[2]["redacted_text"] == ""


def test_multiple_occurrences_counted(spark):
    r = _one(spark, "a@b.co then c@d.org then 10.0.0.1 and 10.0.0.2")
    assert r["n_email"] == 2 and r["n_ipv4"] == 2 and r["n_pii_total"] == 4


def test_redaction_is_single_projection(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = rd.redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
