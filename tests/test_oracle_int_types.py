"""Pin: no oracle may emit a DuckDB HUGEINT (or width-38 decimal) column.

DuckDB widens SUM over integer columns to HUGEINT (int128); the driver
compares results through Arrow, where HUGEINT surfaces as decimal128 and
hash-mismatches Spark's int64 even when every value is identical. This
bit `docs_source_report`/`_counts` in rounds 6-7 (CORRECTNESS_r0{6,7}:
rows/schema green, hash red; bisection `_counts` red vs `_quality`
green localized it to the only uncast integer SUMs in the sample).
`tools/verify_local.py` can NOT catch this class — it fetches Python
ints, where int128 and int64 stringify identically.

The fix convention: every integer aggregate that can widen must be
wrapped `CAST(... AS BIGINT)` in the oracle SQL. This test binds every
oracle in DuckDB (bind only — no execution) and fails on any output
column whose declared type is HUGEINT/UHUGEINT or a precision-38
decimal, so a new uncast SUM never reaches the driver gate again.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from verify_local import connect_views  # noqa: E402

from aurora_mito_etl_spark.plans.queries import ORACLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL(38")


@pytest.fixture(scope="module")
def con():
    return connect_views(SF_DIR)


def test_no_hugeint_oracle_outputs(con):
    flagged = []
    errors = []
    for name, sql in ORACLES.items():
        try:
            rel = con.sql(sql)  # binds + type-resolves; does not execute
        except Exception as e:  # noqa: BLE001 — report per-oracle, keep scanning
            errors.append((name, str(e)[:120]))
            continue
        for col, typ in zip(rel.columns, (str(t).upper() for t in rel.types)):
            if any(b in typ for b in BANNED):
                flagged.append((name, col, typ))
    assert not errors, f"oracle bind failures: {errors}"
    assert not flagged, (
        "oracle columns widen to HUGEINT/DECIMAL38 in DuckDB — wrap the "
        f"aggregate in CAST(... AS BIGINT): {flagged}"
    )
