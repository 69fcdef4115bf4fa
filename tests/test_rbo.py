from __future__ import annotations

import pytest

from aurora_mito_etl_spark.functions.numeric import fixed6_py
from aurora_mito_etl_spark.plans.queries import _rbo_weight_table


def test_rbo_weights_closed_form():
    p, depth = 0.9, 10
    ws = _rbo_weight_table(p=p, depth=depth)
    assert list(ws) == list(range(1, depth + 1))
    # strictly decreasing in match depth: later agreement is worth less
    vals = [ws[m] for m in range(1, depth + 1)]
    assert all(a > b for a, b in zip(vals, vals[1:]))
    # deepest match contributes exactly the single d=10 term
    assert ws[depth] == fixed6_py((1 - p) * p ** (depth - 1) / depth)
    # identical rankings (every item matched at mx=d) telescope to
    # 1 - p^depth, up to the per-entry fixed6 grid
    assert sum(vals) == pytest.approx(1 - p**depth, abs=1e-5)
    # every weight sits on the 1e-6 grid (the portability contract)
    assert all(fixed6_py(w) == w for w in vals)
