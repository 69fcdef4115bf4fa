"""Property-based checks (hypothesis): the Catalyst column
expressions agree with their specification twins on arbitrary input.
Each example batches into one small Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aurora_mito_etl_spark.operators import text as tx
from aurora_mito_etl_spark.operators.aggregates import bin_right_closed
from aurora_mito_etl_spark.operators.unicode_udfs import normalize_compound_name
from aurora_mito_etl_spark.pipeline.finalize import normalize_name_key

_SETTINGS = settings(
    max_examples=15, deadline=None, suppress_health_check=list(HealthCheck)
)

names = st.lists(
    st.text(
        alphabet="abcdefgXYZ -–—−0123456789us is os gas",
        min_size=1,
        max_size=24,
    ),
    min_size=1,
    max_size=8,
)


@_SETTINGS
@given(names)
def test_normalize_compound_name_matches_python_twin(spark, batch):
    df = spark.createDataFrame([(s,) for s in batch], "s string")
    got = [
        r["n"]
        for r in df.select(normalize_compound_name(F.col("s")).alias("n")).collect()
    ]
    assert got == [normalize_name_key(s) for s in batch]


@_SETTINGS
@given(
    st.lists(st.integers(min_value=-10, max_value=10), min_size=1, max_size=12)
)
def test_bin_right_closed_matches_pandas_cut(spark, values):
    import numpy as np
    import pandas as pd

    df = spark.createDataFrame([(v,) for v in values], "v int")
    got = [
        r["b"]
        for r in df.select(
            bin_right_closed(
                F.col("v"), [1, 2, 4], ["very-low", "low", "medium", "high"]
            ).alias("b")
        ).collect()
    ]
    expect = list(
        pd.cut(
            values,
            bins=[-np.inf, 1, 2, 4, np.inf],
            labels=["very-low", "low", "medium", "high"],
        ).astype(str)
    )
    assert got == expect


@_SETTINGS
@given(
    st.lists(st.text(alphabet="abcxyz ", min_size=1, max_size=12), min_size=1, max_size=5),
    st.lists(st.text(alphabet="abcxyz ", min_size=3, max_size=6), min_size=1, max_size=6),
)
def test_ac_automaton_equals_regex(docs, terms):
    import re

    ac = tx.AhoCorasick(terms)
    rx = re.compile("|".join(re.escape(t) for t in terms))
    for d in docs:
        assert ac.matches(d) == bool(rx.search(d)), (d, terms)


@_SETTINGS
# ASCII only: Java \s and Python str.strip() disagree on unicode
# whitespace (NBSP etc.), which squeeze_ws handles separately (P14).
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=40,
        ).map(lambda s: s + " \t x"),
        min_size=1,
        max_size=6,
    )
)
def test_squeeze_ws_idempotent_and_trimmed(spark, batch):
    df = spark.createDataFrame([(s,) for s in batch], "s string")
    once = [
        r["a"] for r in df.select(tx.squeeze_ws(F.col("s")).alias("a")).collect()
    ]
    df2 = spark.createDataFrame([(s,) for s in once], "s string")
    twice = [
        r["a"] for r in df2.select(tx.squeeze_ws(F.col("s")).alias("a")).collect()
    ]
    assert once == twice
    for s in once:
        assert s == s.strip()
        assert "  " not in s


@_SETTINGS
@given(
    st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=6),
    st.integers(min_value=1, max_value=12),
    st.data(),
)
def test_chunk_windows_tiles_every_document(spark, n_tokens, window, data):
    # stride > window is rejected (gap-free tiling contract)
    stride = data.draw(st.integers(min_value=1, max_value=window))
    docs = [(i, " ".join(f"t{i}x{j}" for j in range(n))) for i, n in enumerate(n_tokens)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = tx.chunk_windows(df, "text", "doc_id", window_tokens=window, stride=stride)
    got: dict[int, list] = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate(n_tokens):
        if n == 0:
            assert i not in got  # empty docs produce no chunks
            continue
        chunks = sorted(got[i], key=lambda r: r["chunk_id"])
        # spec: 1 + ceil(max(n - window, 0) / stride) chunks
        expect_c = 1 + -(-max(n - window, 0) // stride)
        assert len(chunks) == expect_c
        # chunk k reproduces tokens [k*stride, k*stride + window)
        all_tokens = [f"t{i}x{j}" for j in range(n)]
        for k, r in enumerate(chunks):
            expect = all_tokens[k * stride : k * stride + window]
            assert r["chunk_text"].split() == expect
            assert r["n_chunk_tokens"] == len(expect)
        # union of chunks covers the document exactly
        covered = set()
        for r in chunks:
            covered.update(r["chunk_text"].split())
        assert covered == set(all_tokens)


# ---------------------------------------------------------------------------
# Fuzzy-join lossless blocking (operators/fuzzy.py): the prefix-filter
# + fallback-bucket candidate set must reproduce the cartesian answer
# on arbitrary strings — including repetitive, short, and empty ones.
# ---------------------------------------------------------------------------

fuzzy_strings = st.lists(
    st.text(alphabet="abcx", min_size=0, max_size=8),
    min_size=2,
    max_size=10,
)


@given(fuzzy_strings)
@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_fuzzy_pairs_match_bruteforce(spark, strings):
    import functools
    import itertools

    from aurora_mito_etl_spark.operators import fuzzy as fz

    def lev(a: str, b: str) -> int:
        @functools.lru_cache(maxsize=None)
        def d(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(
                d(i - 1, j) + 1,
                d(i, j - 1) + 1,
                d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            )

        return d(len(a), len(b))

    rows = list(enumerate(strings))
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fz.fuzzy_self_pairs(df, "id", "s").collect()
    }
    want = {
        (ia, ib, lev(sa, sb))
        for (ia, sa), (ib, sb) in itertools.combinations(rows, 2)
        if lev(sa, sb) <= 1
    }
    assert got == want
