"""Count-min sketch (operators/cms.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aurora_mito_etl_spark.operators import cms


def _docs(spark):
    rows = [
        # heavy token 'alpha' (60×), medium 'beta' (12×), tail words
        *[(i, "alpha " * 6 + "beta", None, None, None) for i in range(10)],
        *[(10 + i, f"tail{i} beta gamma", None, None, None) for i in range(2)],
        (20, None, None, None, None),
        (21, "   ", None, None, None),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _probes(spark, toks):
    return spark.createDataFrame([(t,) for t in toks], "token string")


def _est_map(df):
    return {r["token"]: r for r in df.collect()}


def test_wide_sketch_is_exact(spark):
    """With width >> vocabulary, no collisions on this fixed corpus:
    every estimate equals the exact count (deterministic for fixed
    data + fixed hash)."""
    d = _docs(spark)
    out = cms.cms_token_estimates(
        d, _probes(spark, ["alpha", "beta", "gamma", "tail0", "absent"]),
        width=1 << 20, depth=3,
    )
    got = _est_map(out)
    assert got["alpha"]["est"] == got["alpha"]["exact_cnt"] == 60
    assert got["beta"]["est"] == got["beta"]["exact_cnt"] == 12
    assert got["gamma"]["est"] == got["gamma"]["exact_cnt"] == 2
    assert got["tail0"]["est"] == got["tail0"]["exact_cnt"] == 1
    assert not any(r["overestimate"] for r in got.values())


def test_absent_probe_estimates(spark):
    """A token absent from the corpus reports exact_cnt 0; its
    estimate is whatever its buckets collected — never negative, and
    0 when its buckets are untouched (wide sketch)."""
    d = _docs(spark)
    out = cms.cms_token_estimates(
        d, _probes(spark, ["absent"]), width=1 << 20, depth=3
    )
    got = _est_map(out)["absent"]
    assert got["exact_cnt"] == 0
    assert got["est"] == 0
    assert got["overestimate"] is False


def test_overestimate_invariant_narrow_sketch(spark):
    """THE CMS guarantee: est >= exact for every probe, even at
    width=2 where every bucket collides massively."""
    d = _docs(spark)
    toks = ["alpha", "beta", "gamma", "tail0", "tail1", "absent"]
    out = cms.cms_token_estimates(d, _probes(spark, toks), width=2, depth=3)
    for tok, r in _est_map(out).items():
        assert r["est"] >= r["exact_cnt"], tok
        assert r["overestimate"] == (r["est"] > r["exact_cnt"])


def test_width_one_degenerates_to_total(spark):
    """width=1: every row's single counter holds the total token
    count, so every estimate is exactly n_tokens."""
    d = _docs(spark)
    n_tokens = 60 + 12 + 2 + 2  # alpha + beta + gamma + tail0/1
    out = cms.cms_token_estimates(
        d, _probes(spark, ["alpha", "tail0"]), width=1, depth=2
    )
    got = _est_map(out)
    assert got["alpha"]["est"] == n_tokens
    assert got["tail0"]["est"] == n_tokens


def test_partition_invariance(spark):
    """Sketch counters are sums — partitioning cannot change them."""
    d = _docs(spark)
    toks = ["alpha", "beta", "gamma"]
    a = sorted(
        map(tuple, cms.cms_token_estimates(
            d.coalesce(1), _probes(spark, toks), width=64, depth=3
        ).collect())
    )
    b = sorted(
        map(tuple, cms.cms_token_estimates(
            d.repartition(7), _probes(spark, toks), width=64, depth=3
        ).collect())
    )
    assert a == b


def test_sketch_size_bound(spark):
    """The sketch never exceeds depth × width rows."""
    sk = cms.cms_build(_docs(spark), width=4, depth=3)
    assert sk.count() <= 12
    assert sk.agg(F.min("bucket")).first()[0] >= 0
    assert sk.agg(F.max("bucket")).first()[0] < 4
