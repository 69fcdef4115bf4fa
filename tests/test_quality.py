"""Gopher / C4 quality-filter rule batteries (operators/quality.py)."""

from __future__ import annotations

from aurora_mito_etl_spark.operators import quality as ql

GOOD = (
    "The quick brown fox jumps over the lazy dog and runs far away. "
    "It is a fine day to be out in the field with good friends of mine. "
    "Every word here is a normal word and that should pass every rule. "
    "More plain text follows so the word count clears the fifty floor easily now."
)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_gopher_keeps_normal_prose(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    r = _one(ql.gopher_signals(df))
    assert r["gopher_keep"] is True
    assert r["n_words"] >= 50
    assert 3.0 <= r["mean_word_len"] <= 10.0
    assert r["n_stop_hits"] >= 2


def test_gopher_word_count_floor(spark):
    df = spark.createDataFrame([(1, "too short to keep")], "doc_id long, text string")
    r = _one(ql.gopher_signals(df))
    assert r["r_word_count"] is False and r["gopher_keep"] is False


def test_gopher_symbol_ratio(spark):
    text = " ".join(["word#tag"] * 30 + ["plain"] * 30)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = _one(ql.gopher_signals(df))
    assert r["symbol_ratio"] == 0.5 and r["r_symbols"] is False


def test_gopher_bullet_and_ellipsis_lines(spark):
    text = "\n".join(["- bullet item"] * 9 + ["trailing thought..."])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = _one(ql.gopher_signals(df))
    assert r["bullet_line_frac"] == 0.9
    assert r["ellipsis_line_frac"] == 0.1
    assert r["r_bullets"] is True  # <= 0.9 boundary is inclusive


def test_gopher_alpha_word_frac(spark):
    text = " ".join(["123456"] * 30 + ["abc"] * 10)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = _one(ql.gopher_signals(df))
    assert r["alpha_word_frac"] == 0.25 and r["r_alpha"] is False


def test_gopher_empty_and_null_text(spark):
    df = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in ql.gopher_signals(df).collect()}
    for i in (1, 2):
        assert out[i]["n_words"] == 0
        assert out[i]["mean_word_len"] == 0.0
        assert out[i]["gopher_keep"] is False  # false, never NULL


def test_gopher_threshold_overrides(spark):
    df = spark.createDataFrame(
        [(1, "the fox and that dog have fun with all of it to be sure")],
        "doc_id long, text string",
    )
    r = _one(ql.gopher_signals(df, min_words=5))
    assert r["r_word_count"] is True and r["gopher_keep"] is True


def test_c4_line_and_doc_rules(spark):
    text = "\n".join(
        [
            "This line has enough words and ends with a period.",
            "short.",  # < 5 words → dropped
            "no terminal punctuation on this long enough line",  # dropped
            "Another proper sentence with plenty of words right here.",
            "A third full sentence keeps the document over the bar.",
        ]
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = _one(ql.c4_signals(df))
    assert r["n_kept_lines"] == 3
    assert "short." not in r["clean_text"]
    assert r["n_sentences"] == 3 and r["c4_keep"] is True


def test_c4_brace_and_lorem_drop(spark):
    base = "A full sentence with plenty of words sits right here. " * 3
    df = spark.createDataFrame(
        [
            (1, base.replace(". ", ".\n") + "function() { return 1; }"),
            (2, base.replace(". ", ".\n") + "Lorem Ipsum dolor sit amet."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ql.c4_signals(df).collect()}
    assert out[1]["has_brace"] is True and out[1]["c4_keep"] is False
    assert out[2]["has_lorem"] is True and out[2]["c4_keep"] is False


def test_c4_nothing_kept_is_empty_not_null(spark):
    df = spark.createDataFrame([(1, "word salad only here")], "doc_id long, text string")
    r = _one(ql.c4_signals(df))
    assert r["clean_text"] == "" and r["n_kept_lines"] == 0
    assert r["c4_keep"] is False


def test_quality_plans_have_no_shuffle(spark):
    # Both batteries must stay one codegen projection — the 100 TB
    # posture is scan-speed; an Exchange here would be a regression.
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    for out in (ql.gopher_signals(df), ql.c4_signals(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_c4_crlf_lines_kept(spark):
    # Java $ matches before a trailing \r, RE2 $ does not — the
    # operator splits on \r?\n and anchors with [ \t\r]*$ so CRLF
    # corpora behave identically in Spark and the oracle
    text = (
        "This line has enough words and ends with a period.\r\n"
        "Another proper sentence with plenty of words right here.\r\n"
        "A third full sentence keeps the document over the bar.\r\n"
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = ql.c4_signals(df).collect()[0]
    assert r["n_kept_lines"] == 3 and r["c4_keep"] is True
    assert "\r" not in r["clean_text"]


def test_gopher_crlf_ellipsis_lines(spark):
    text = "- bullet one\r\ntrailing thought...\r\n"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = ql.gopher_signals(df).collect()[0]
    assert r["bullet_line_frac"] == 0.5
    assert r["ellipsis_line_frac"] == 0.5


def test_quality_funnel_monotone_and_consistent(spark):
    """The funnel is sequential: each stage's survivor count is <= the
    previous stage's, pass_all/n_docs is the fixed6 yield, and the
    per-source n_docs totals reconcile with the raw table."""
    from aurora_mito_etl_spark.plans.queries import (
        docs_quality_ensemble,
        docs_quality_funnel,
    )

    sf = "/root/testdata/sf0.001"
    rows = docs_quality_funnel(spark, sf).collect()
    assert rows, "funnel must emit one row per source"
    for r in rows:
        assert (
            r["n_docs"]
            >= r["pass_gopher"]
            >= r["pass_c4"]
            >= r["pass_lm"]
            >= r["pass_all"]
            >= 0
        ), r
    # reconciles with the per-doc ensemble verdicts it aggregates
    ens = docs_quality_ensemble(spark, sf)
    n_keep = ens.where("keep").count()
    assert sum(r["pass_all"] for r in rows) == n_keep
