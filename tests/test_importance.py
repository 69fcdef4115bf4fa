"""DSIR importance weighting (operators/importance.py)."""

from __future__ import annotations

from aurora_mito_etl_spark.operators import importance as imp


def test_target_like_docs_score_higher(spark):
    # docs 1-2 share the target's vocabulary; docs 3-4 don't — the
    # log-importance ordering is the operator's entire purpose
    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta alpha beta"),
            (2, "beta alpha beta alpha"),
            (3, "xray yankee zulu xray yankee zulu"),
            (4, "zulu xray zulu xray"),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, "alpha beta alpha beta gamma alpha beta")],
        "doc_id long, text string",
    )
    w = {
        r["doc_id"]: r["dsir_logw"]
        for r in imp.dsir_weights(docs, target, n=2, num_buckets=256).collect()
    }
    assert min(w[1], w[2]) > max(w[3], w[4])


def test_short_docs_have_zero_weight(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, None), (4, "two words")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame([(9, "two words here")], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in imp.dsir_weights(docs, target, n=2, num_buckets=64).collect()
    }
    for i in (1, 2, 3):  # < 2 words → no bigrams
        assert out[i]["n_grams"] == 0 and out[i]["dsir_logw"] == 0.0
    assert out[4]["n_grams"] == 1 and out[4]["dsir_logw"] != 0.0


def test_weights_deterministic_across_partitionings(spark):
    rows = [(i, f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 7} common tail") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter("doc_id < 10")
    a = imp.dsir_weights(docs, target, n=2, num_buckets=128)
    b = imp.dsir_weights(docs.repartition(13), target.coalesce(1), n=2, num_buckets=128)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_predicate_path_matches_two_dataframe_path(spark):
    from pyspark.sql import functions as F

    rows = [(i, ("tgt " if i < 20 else "raw ") + f"w{i % 5} w{(i + 2) % 5} filler") for i in range(80)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = imp.dsir_weights(docs, docs.filter("doc_id < 20"), n=2, num_buckets=128)
    b = imp.dsir_weights(
        docs, n=2, num_buckets=128, target_predicate=F.col("doc_id") < 20
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_exactly_one_target_required(spark):
    import pytest
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        imp.dsir_weights(docs)
    with pytest.raises(ValueError):
        imp.dsir_weights(docs, docs, target_predicate=F.lit(True))
