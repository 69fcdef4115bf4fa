"""Fuzzy edit-distance joins (operators/fuzzy.py)."""

from __future__ import annotations

import functools
import itertools

import pytest

from aurora_mito_etl_spark.operators import fuzzy as fz

NAMES = [
    (1, "abcd"), (2, "abXd"), (3, "abc"), (4, "ab"), (5, "b"), (6, ""),
    (7, "xyz"), (8, "xz"), (9, "abcde"), (10, "zzzz"), (11, None),
    (12, "abcd"),  # duplicate value of id 1 -> dist 0 pair
    (13, "prefix-shared-long-name-A"), (14, "prefix-shared-long-name-B"),
]


def _lev(a: str, b: str) -> int:
    @functools.lru_cache(maxsize=None)
    def d(i: int, j: int) -> int:
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


def _brute(max_edit: int) -> set[tuple[int, int, int]]:
    return {
        (ia, ib, _lev(sa, sb))
        for (ia, sa), (ib, sb) in itertools.combinations(NAMES, 2)
        if sa is not None and sb is not None and _lev(sa, sb) <= max_edit
    }


def _df(spark):
    return spark.createDataFrame(NAMES, "id long, s string")


def test_self_pairs_equal_bruteforce_k1(spark):
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fz.fuzzy_self_pairs(_df(spark), "id", "s").collect()
    }
    assert got == _brute(1)


def test_self_pairs_equal_bruteforce_k2_q1(spark):
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fz.fuzzy_self_pairs(_df(spark), "id", "s", max_edit=2, q=1).collect()
    }
    assert got == _brute(2)


def test_self_pairs_equal_bruteforce_k2_q2(spark):
    # prefix filtering is lossless for any (q, k): the low-gram and
    # short buckets cover the vacuous-count-bound cases
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fz.fuzzy_self_pairs(_df(spark), "id", "s", max_edit=2, q=2).collect()
    }
    assert got == _brute(2)


def test_repetitive_low_gram_strings(spark):
    # "ababab…" has 2 distinct bigrams — the count-bound is vacuous,
    # the low-gram bucket must catch these pairs
    rows = [(1, "ababababab"), (2, "abababa"), (3, "ababababX"),
            (4, "cdcdcdcdcd"), (5, "zzzzzzzzzz"), (6, "zzzzzzzzz")]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fz.fuzzy_self_pairs(df, "id", "s").collect()
    }
    want = {
        (ia, ib, _lev(sa, sb))
        for (ia, sa), (ib, sb) in itertools.combinations(rows, 2)
        if _lev(sa, sb) <= 1
    }
    assert got == want


def test_validation():
    with pytest.raises(ValueError):
        fz.fuzzy_join(None, None, "a", "b", "x", "y", max_edit=-1)
    with pytest.raises(ValueError):
        fz.fuzzy_join(None, None, "a", "b", "x", "y", q=0)


def test_two_table_join(spark):
    left = spark.createDataFrame([(1, "alpha"), (2, "beta")], "id long, s string")
    right = spark.createDataFrame(
        [(10, "alphA"), (11, "gamma"), (12, "beta")], "rid long, name string"
    )
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fz.fuzzy_join(left, right, "id", "rid", "s", "name").collect()
    }
    assert got == {(1, 10, 1), (2, 12, 0)}


def test_each_pair_verified_once(spark):
    out = fz.fuzzy_self_pairs(_df(spark), "id", "s")
    rows = [(r["id_a"], r["id_b"]) for r in out.collect()]
    assert len(rows) == len(set(rows))  # distinct() before verify


def test_no_cartesian_in_plan(spark):
    plan = (
        fz.fuzzy_self_pairs(_df(spark), "id", "s")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
