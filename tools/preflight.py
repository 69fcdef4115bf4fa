#!/usr/bin/env python3
"""Round-start preflight: re-check the driver-generated parquet schemas.

The driver REGENERATES /root/testdata between rounds, and table schemas
have drifted before (events.ts shipped both as INT64 TIMESTAMP(NANOS)
and as native timestamp[us] — the round-3 incident). This script reads
every table's parquet schema with pyarrow at every SF and verifies it
is one of the known-good forms that `sources/catalog.load_table`'s
type-conditional repair handles. Run it before anything else each round:

    python tools/preflight.py            # checks /root/testdata/sf*
    python tools/preflight.py /path/sfX  # check specific dirs

Exit 0 = all schemas are known forms; exit 1 = a drift that needs a
catalog.py look before any query runs.
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow.parquet as pq

# Known-good type sets per column.  A column may legitimately ship in
# any of the listed forms; anything else is drift worth investigating.
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {
        "r_regionkey": {"int64", "int32"},
        "r_name": {"string", "large_string"},
    },
    "nation": {
        "n_nationkey": {"int64", "int32"},
        "n_name": {"string", "large_string"},
        "n_regionkey": {"int64", "int32"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_acctbal": {"double", "decimal128(15, 2)"},
        "c_mktsegment": {"string", "large_string"},
        "c_nationkey": {"int64", "int32"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_nationkey": {"int64", "int32"},
        "s_acctbal": {"double", "decimal128(15, 2)"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_retailprice": {"double", "decimal128(15, 2)"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_totalprice": {"double", "decimal128(15, 2)"},
        "o_orderdate": {"date32[day]", "timestamp[us]", "string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_quantity": {"double", "decimal128(15, 2)", "int64"},
        "l_extendedprice": {"double", "decimal128(15, 2)"},
        "l_shipdate": {"date32[day]", "timestamp[us]", "string"},
    },
    "events": {
        "event_id": {"int64"},
        # Both shipped forms (round-3 incident): INT64 nanos and us.
        "ts": {"timestamp[ns]", "timestamp[us]", "int64"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64", "int32"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {
            "list<element: float>",
            "list<item: float>",
            "large_list<element: float>",
            "fixed_size_list<element: float>",
        },
        "label": {"int32", "int64"},
    },
}


def check_dir(sf_dir: str) -> list[str]:
    problems: list[str] = []
    for table, cols in EXPECTED.items():
        path = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(path):
            problems.append(f"{sf_dir}: MISSING table {table}")
            continue
        schema = pq.read_schema(path)
        actual = {f.name: str(f.type) for f in schema}
        for col, ok_types in cols.items():
            if col not in actual:
                problems.append(f"{sf_dir}/{table}: MISSING column {col}")
            elif not any(actual[col].startswith(t.split("<")[0]) and actual[col] in ok_types
                         or actual[col] == t for t in ok_types):
                if actual[col] not in ok_types:
                    problems.append(
                        f"{sf_dir}/{table}.{col}: type {actual[col]!r} "
                        f"not in known forms {sorted(ok_types)}"
                    )
    return problems


def main(argv: list[str]) -> int:
    dirs = argv or sorted(glob.glob("/root/testdata/sf*"))
    if not dirs:
        print("preflight: no testdata dirs found", file=sys.stderr)
        return 1
    all_problems: list[str] = []
    for d in dirs:
        probs = check_dir(d)
        status = "OK" if not probs else f"{len(probs)} problem(s)"
        print(f"preflight {d}: {status}")
        all_problems.extend(probs)
    for p in all_problems:
        print(f"  !! {p}")
    if all_problems:
        print("preflight: SCHEMA DRIFT — review sources/catalog.py repairs "
              "before running queries", file=sys.stderr)
        return 1
    print("preflight: all schemas in known-good forms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
