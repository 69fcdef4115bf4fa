"""Physical-plan audit over the whole query registry.

For every registered query, builds the DataFrame (analysis only — no
execution) and summarizes the formatted physical plan: number of
shuffles (Exchange), broadcasts, whole-stage-codegen spans, parquet
scans with/without pushed filters, and any pathological join
(CartesianProduct). The per-query table is the 100 TB posture at a
glance; a CartesianProduct anywhere is an error (exit 1).

Exception: queries in EXEC_ON_BUILD run their pipeline at
BUILD time by design (release_sink_smoke materializes a release dir
and reads it back to return verification rows), so "building the
DataFrame" is not analysis-only for them — they are skipped here.

BroadcastNestedLoopJoin is reported but not fatal: the registry's only
BNLJs are single-row aggregate cross-joins (corpus totals riding along
with a count), which are constant-size broadcasts at any SF.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import json
import sys

sys.path.insert(0, "/root/repo")


# Queries whose builder executes side effects (materialize + read-back
# smoke queries). plan_audit skips them unless explicitly requested.
EXEC_ON_BUILD = {"release_sink_smoke"}


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


import re


def _nodes(plan: str, name: str) -> set[str]:
    """Distinct node ids for `name` — the formatted plan repeats each
    node in the tree AND in the details section, so raw substring
    counts double-count; node ids are unique."""
    return set(re.findall(rf"\((\d+)\) {name}\b", plan))


def audit_one(plan: str) -> dict:
    return {
        "exchanges": len(_nodes(plan, "Exchange")),
        "broadcasts": len(_nodes(plan, "BroadcastExchange")),
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "scans": len(_nodes(plan, "Scan parquet")),
        "pushed_filter_scans": plan.count("PushedFilters: [")
        - plan.count("PushedFilters: []"),
        "cartesian": len(_nodes(plan, "CartesianProduct")),
        "bnlj": len(_nodes(plan, "BroadcastNestedLoopJoin")),
        "python_stages": sum(
            len(_nodes(plan, n))
            for n in (
                "ArrowEvalPython",
                "FlatMapGroupsInPandas",
                "MapInPandas",
                "FlatMapGroupsInPandasWithState",
            )
        ),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from aurora_mito_etl_spark.plans.queries import QUERIES
    from aurora_mito_etl_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    # static audit: AQE wraps un-executed plans in AdaptiveSparkPlan
    # (isFinalPlan=false) which hides codegen ids; runtime behavior is
    # unchanged — every real session keeps AQE on (session.py).
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    rows = []
    n_cartesian = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        if name in EXEC_ON_BUILD and name not in only:
            continue  # building it would execute a release pipeline
        try:
            a = audit_one(formatted_plan(fn(spark, sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            return 1
        n_cartesian += a["cartesian"]
        rows.append({"query": name, **a})

    hdr = ["query", "exchanges", "broadcasts", "codegen_spans", "scans",
           "pushed_filter_scans", "cartesian", "bnlj", "python_stages"]
    w = max(len(r["query"]) for r in rows)
    print(" ".join(h.rjust(12) if h != "query" else h.ljust(w) for h in hdr))
    for r in sorted(rows, key=lambda r: (-r["exchanges"], r["query"])):
        print(
            r["query"].ljust(w)
            + " ".join(str(r[h]).rjust(12) for h in hdr[1:])
        )
    print(json.dumps({
        "n_queries": len(rows),
        "total_exchanges": sum(r["exchanges"] for r in rows),
        "cartesian_products": n_cartesian,
    }))
    spark.stop()
    return 1 if n_cartesian else 0


if __name__ == "__main__":
    raise SystemExit(main())
