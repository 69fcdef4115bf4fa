"""Arrow-level type parity scan: Spark result schema vs DuckDB oracle.

The driver's correctness gate compares results through Arrow, where
engine-side type widening that is invisible to Python fetchall()
(DuckDB HUGEINT -> decimal128 was the r6-r7 `docs_source_report` red)
changes the hashed representation. This scan runs every oracle's BIND
step in DuckDB (no oracle execution) and builds the Spark DataFrame to
read df.schema — note that CONSTRUCTING a query can itself run Spark
jobs for the iterative operators (pagerank/kmeans/CC localCheckpoint
per round), so a failure here can also be a runtime error from those,
not only a type mismatch. Both sides map to a coarse comparable type;
any column whose types land in different classes is printed.

Known-benign differences are normalized away:
- string vs large_string (Arrow flavor, same values)
- int8/16/32 vs int64 (the gate compares values, and small ints
  hash identically once converted; only the int-vs-decimal and
  int-vs-float boundaries are dangerous)
- timestamp unit (us/ns). Timezone is NOT normalized: tz-aware vs
  naive timestamps hash differently at the gate, so they compare as
  distinct classes here.

Usage: python tools/arrow_types_scan.py [sf_dir] [query ...]
Unknown query names in the filter are an error (exit 2), never an
empty-scan success. Exit 1 if any non-benign mismatch is found.
"""

from __future__ import annotations

import sys


def coarse(t: str) -> str:
    t = t.lower()
    if "decimal" in t or "hugeint" in t:
        return "decimal"
    if "interval" in t:  # must precede the "int" substring check
        return "interval"
    if "timestamp" in t:
        # Keep the aware/naive boundary visible, normalize only the
        # unit. Spark's plain "timestamp" (session-tz semantics) is
        # classed with DuckDB's naive TIMESTAMP because every shipped
        # timestamp query compares green at the driver under that
        # pairing; an explicit WITH TIME ZONE oracle column against it
        # would hash differently and must flag.
        aware = "with time zone" in t or "tz=" in t
        return "timestamp_tz" if aware else "timestamp"
    if any(x in t for x in ("int", "long", "short", "byte")):
        return "int"
    if any(x in t for x in ("double", "float", "real")):
        return "float"
    if any(x in t for x in ("varchar", "string", "char", "text")):
        return "string"
    if "bool" in t:
        return "bool"
    if "date" in t:
        return "date"
    if any(x in t for x in ("list", "array")):
        return "list"
    if "struct" in t:
        return "struct"
    if "map" in t:
        return "map"
    return t


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:]) or None

    from pyspark.sql import SparkSession

    sys.path.insert(0, ".")
    sys.path.insert(0, "tools")
    from verify_local import connect_views

    from aurora_mito_etl_spark.plans.queries import ORACLES, QUERIES

    if only:
        unknown = only - set(ORACLES)
        if unknown:
            print(f"unknown oracle name(s): {sorted(unknown)}")
            return 2

    con = connect_views(sf_dir)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .appName("arrow_types_scan")
        .getOrCreate()
    )

    n_bad = n_ok = 0
    for name, sql in ORACLES.items():
        if only and name not in only:
            continue
        try:
            rel = con.sql(sql)
            d_types = dict(zip(rel.columns, (str(t) for t in rel.types)))
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: duckdb bind: {e}")
            n_bad += 1
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            s_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: spark build: {e}")
            n_bad += 1
            continue
        diffs = []
        for c in s_types:
            if c not in d_types:
                diffs.append(f"{c}: missing in oracle")
                continue
            cs, cd = coarse(s_types[c]), coarse(d_types[c])
            if cs != cd:
                diffs.append(f"{c}: spark {s_types[c]} vs duckdb {d_types[c]}")
        for c in d_types:
            if c not in s_types:
                diffs.append(f"{c}: missing in spark")
        if diffs:
            n_bad += 1
            print(f"DIFF {name}: " + "; ".join(diffs))
        else:
            n_ok += 1
    print(f"{n_ok} matched, {n_bad} mismatched")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
