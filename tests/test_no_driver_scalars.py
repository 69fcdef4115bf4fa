"""Pin the broadcast-scalar convention (VERDICT r6 ask #4): corpus
constants (N docs, avg doclen, corpus token total) enter plans as
broadcast 1-row aggregates (the lm_score.py pattern), never as
driver-side `.collect()` / `.count()` round-trips.

A driver scalar pull is an extra full-scan job and a plan break: at
100 TB each `.count()` is its own stage DAG, and the final plan the
optimizer sees no longer contains the scan it duplicates. The
sanctioned exceptions (bounded one-row pulls in schema/validate,
layout, clustering centroids, merge file-lists, the release smoke)
are enumerated in tools/plan_audit.py's posture notes — NOT in the
modules pinned here.
"""

from __future__ import annotations

import inspect
import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "aurora_mito_etl_spark"

# Operator modules that must stay single-plan: every scalar they need
# is a broadcast 1-row aggregate inside the returned DataFrame's plan.
SINGLE_PLAN_MODULES = ["operators/tfidf.py", "operators/lm_score.py"]

# An action call on an object: `x.collect(` / `x.count()` (argless —
# F.count("*") is the aggregate FUNCTION and stays plan-side) /
# `x.toPandas(` / `x.first(` / `x.head(`. Requires an identifier or
# closing bracket before the dot so prose mentions don't trip it.
_PULL = re.compile(
    r"[\w)\]]\.(collect|toPandas|first|head)\s*\(|[\w)\]]\.count\(\s*\)"
)


def _hits(text: str, label: str) -> list[str]:
    out = []
    for i, line in enumerate(text.splitlines(), 1):
        code = line.split("#", 1)[0]
        if _PULL.search(code):
            out.append(f"{label}:{i}: {line.strip()}")
    return out


def test_single_plan_operator_modules_have_no_driver_pulls():
    hits = []
    for rel in SINGLE_PLAN_MODULES:
        hits += _hits((PKG / rel).read_text(), rel)
    assert not hits, "driver-side scalar pull in single-plan module:\n" + "\n".join(
        hits
    )


def test_source_divergence_query_is_single_plan():
    """docs_source_divergence's corpus token total must be the
    broadcast 1-row aggregate, not a collect()[0][0] scalar."""
    from aurora_mito_etl_spark.plans import queries as q

    src = inspect.getsource(q.docs_source_divergence)
    hits = _hits(src, "docs_source_divergence")
    assert not hits, "driver-side scalar pull:\n" + "\n".join(hits)
