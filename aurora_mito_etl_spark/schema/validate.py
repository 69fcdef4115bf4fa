"""Distributed schema/CHECK validation (SURVEY §5 item 1).

The reference validates row-by-row in Python against JSON Schemas
(reference etl/schema/validate.py:39-48). The Spark form is a single
pass computing, per named check, the count of violating rows — one
aggregate job, no collect of the data itself. `strict` raises on any
violation (the reference exits non-zero); otherwise you get a report.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aurora_mito_etl_spark.schema.registry import schema_for


class CheckViolation(Exception):
    def __init__(self, table: str, counts: dict[str, int]):
        self.table = table
        self.counts = counts
        super().__init__(f"{table}: CHECK violations {counts}")


@dataclass(frozen=True)
class ValidationReport:
    table: str
    total_rows: int
    violations: dict[str, int]
    missing_columns: list[str]

    @property
    def ok(self) -> bool:
        return not self.missing_columns and all(
            v == 0 for v in self.violations.values()
        )


def validate(df: DataFrame, schema_name: str, strict: bool = False) -> ValidationReport:
    """Validate `df` against the registered schema's columns + CHECKs.

    One aggregation job: count(*) plus one conditional count per
    check — identical cost profile at any scale (map-side partial).
    """
    ts = schema_for(schema_name)
    expected = [f.name for f in ts.struct.fields]
    missing = [c for c in expected if c not in df.columns]
    if missing:
        # structural failure: don't attempt CHECKs (their columns may
        # be among the missing — Column exprs can't be introspected)
        report = ValidationReport(
            table=schema_name, total_rows=-1, violations={}, missing_columns=missing
        )
        if strict:
            raise CheckViolation(
                schema_name, {f"__missing_column:{c}": 1 for c in missing}
            )
        return report
    runnable = {name: factory() for name, factory in ts.checks.items()}
    # declared-non-nullable columns get implicit NOT NULL checks
    for field in ts.struct.fields:
        if not field.nullable:
            runnable.setdefault(
                f"not_null_{field.name}", F.col(field.name).isNotNull()
            )
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        # NULL predicate results count as VIOLATIONS (a CHECK that
        # cannot evaluate true has not passed)
        F.count(F.when(~F.coalesce(pred, F.lit(False)), 1)).alias(name)
        for name, pred in runnable.items()
    ]
    row = df.agg(*aggs).collect()[0]
    violations = {name: row[name] for name in runnable}
    report = ValidationReport(
        table=schema_name,
        total_rows=row["__total"],
        violations=violations,
        missing_columns=missing,
    )
    if strict and not report.ok:
        raise CheckViolation(schema_name, dict(violations))
    return report


def validate_path(
    spark, path: str, schema_name: str, fmt: str = "parquet"
) -> ValidationReport:
    """Validate a staged file/dir against a registered schema — the
    engine twin of the reference's standalone CLI
    (etl/schema/validate.py:5-7). `fmt`: parquet | tsv."""
    if fmt == "tsv":
        from aurora_mito_etl_spark.sources.io import read_tsv

        df = read_tsv(spark, path, schema_for(schema_name).struct)
    else:
        df = spark.read.parquet(path)
    return validate(df, schema_name)


def _cli() -> int:
    """python -m aurora_mito_etl_spark.schema.validate <schema> <path> [fmt]"""
    import sys

    from aurora_mito_etl_spark.session import get_spark

    if len(sys.argv) < 3:
        print(__doc__)
        print("usage: ... <schema_name> <path> [parquet|tsv]")
        return 2
    schema_name, path = sys.argv[1], sys.argv[2]
    fmt = sys.argv[3] if len(sys.argv) > 3 else "parquet"
    spark = get_spark(app_name="schema-validate")
    spark.sparkContext.setLogLevel("ERROR")
    report = validate_path(spark, path, schema_name, fmt)
    print(report)
    spark.stop()
    return 0 if report.ok else 1


def violations_df(df: DataFrame, schema_name: str) -> DataFrame:
    """The violating rows themselves, tagged by failed check — the
    debugging companion to :func:`validate`. Mirrors validate()'s
    semantics exactly: NULL predicate results are violations, and
    declared-non-nullable fields carry implicit NOT NULL checks."""
    ts = schema_for(schema_name)
    checks = {name: factory() for name, factory in ts.checks.items()}
    for field in ts.struct.fields:
        if not field.nullable and field.name in df.columns:
            checks.setdefault(f"not_null_{field.name}", F.col(field.name).isNotNull())
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(pred, F.lit(False)), F.lit(name)).otherwise(
                    F.lit(None)
                )
                for name, pred in checks.items()
            ]
        )
    )
    return (
        df.withColumn("__failed_checks", failed)
        .filter(F.size("__failed_checks") > 0)
    )


if __name__ == "__main__":  # pragma: no cover — thin CLI shim
    raise SystemExit(_cli())
