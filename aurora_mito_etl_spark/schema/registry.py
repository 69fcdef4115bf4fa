"""Canonical table schemas + CHECK constraints (SURVEY §1.3-§1.4).

The reference declares every staging/processed table three redundant
ways — JSON Schema (reference etl/schema/*.schema.json), SQL DDL with
CHECKs (etl/schema/schemas.sql:4-33), and prose (DATA_DICTIONARY.md).
Here each table is ONE StructType plus a list of named CHECK
predicates; :mod:`aurora_mito_etl_spark.schema.validate` enforces
them as a distributed filter instead of the reference's row-by-row
Python loop (etl/schema/validate.py:39-48).

PMIDs stay strings: the reference schemas pin `pattern ^[0-9]+$`
(etl/schema/pubmed_gpt.schema.json; DATA_DICTIONARY.md:9).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Checks are zero-arg factories returning a boolean Column, so the
# registry imports without an active SparkContext (Column exprs need
# the JVM).
CheckFactory = Callable[[], Column]


@dataclass(frozen=True)
class TableSchema:
    name: str
    struct: T.StructType
    # name -> factory of a boolean Column that must hold for every row
    checks: dict[str, CheckFactory] = field(default_factory=dict)


def _s(name: str, nullable: bool = True) -> T.StructField:
    return T.StructField(name, T.StringType(), nullable)


def _PMID_OK() -> Column:
    return F.col("pmid").rlike(r"^[0-9]+$")


def _CONFIDENCE_OK() -> Column:
    return F.col("confidence").isin("YES", "probablyYES", "NO")

SCHEMAS: dict[str, TableSchema] = {}


def _register(ts: TableSchema) -> TableSchema:
    SCHEMAS[ts.name] = ts
    return ts


# staging: pubmed (pmid, year, title_abstract) — process_pubmed.sh:6,113
_register(
    TableSchema(
        "pubmed",
        T.StructType(
            [
                _s("pmid", False),
                T.StructField("year", T.IntegerType(), True),
                _s("title_abstract"),
            ]
        ),
        {
            "pmid_digits": _PMID_OK,
            "year_range": lambda: F.col("year").isNull()
            | F.col("year").between(1800, 2100),
        },
    )
)

# mesh_bioactive (Type, MeSH_UI, Name, OneTreeNumber) — process_mesh.py:167
_register(
    TableSchema(
        "mesh_bioactive",
        T.StructType(
            [_s("Type", False), _s("MeSH_UI", False), _s("Name", False), _s("OneTreeNumber")]
        ),
        {
            # 'D' = Descriptor, 'C' = Supplemental Concept Record
            "type_enum": lambda: F.col("Type").isin("D", "C"),
            "ui_shape": lambda: F.col("MeSH_UI").rlike(r"^[CD][0-9]+$"),
        },
    )
)

# pubtator_filtered (pmid, mention, normalized_id) — etl/schema/pubtator_filtered.schema.json
_register(
    TableSchema(
        "pubtator_filtered",
        T.StructType([_s("pmid", False), _s("mention"), _s("normalized_id", False)]),
        {
            "pmid_digits": _PMID_OK,
            "normalized_nonempty": lambda: F.col("normalized_id") != "",
        },
    )
)

# pubmed_gpt (pmid, confidence, compound) — run_gpt_filter.py:8-9; schemas.sql:4-8
_register(
    TableSchema(
        "pubmed_gpt",
        T.StructType([_s("pmid", False), _s("confidence", False), _s("compound")]),
        {"pmid_digits": _PMID_OK, "confidence_enum": _CONFIDENCE_OK},
    )
)

# processed_new — finalize_realease.py:574-582; schemas.sql:10-14
_register(
    TableSchema(
        "processed_new",
        T.StructType([_s("pmid", False), _s("confidence", False), _s("compound")]),
        {"pmid_digits": _PMID_OK, "confidence_enum": _CONFIDENCE_OK},
    )
)

# processed_all (18 cols) — DATA_DICTIONARY.md:31-49; schemas.sql:16-33
_register(
    TableSchema(
        "processed_all",
        # column order per reference etl/schema/DATA_DICTIONARY.md:31-49
        T.StructType(
            [
                _s("compound", False),
                T.StructField("pubmed_references", T.IntegerType(), False),
                _s("known_status", False),
                _s("confidence_pubmed", False),
                _s("pubmed_ids"),
                T.StructField("MaxSim_all", T.DoubleType(), True),
                T.StructField("TopKMean_all", T.DoubleType(), True),
                _s("BestRef_name"),
                _s("confidence_similarity"),
                T.StructField("has_biguanide_core", T.BooleanType(), True),
                T.StructField("has_biguanide_motif", T.BooleanType(), True),
                T.StructField("sim_biguanide_tversky", T.DoubleType(), True),
                T.StructField("sim_biguanide_dice", T.DoubleType(), True),
                T.StructField("best_biguanide_like_tversky", T.DoubleType(), True),
                _s("best_ref_name_tversky"),
                T.StructField("best_biguanide_like_dice", T.DoubleType(), True),
                _s("best_ref_name_dice"),
                _s("SMILES"),
            ]
        ),
        {
            "refs_nonneg": lambda: F.col("pubmed_references") >= 0,
            "known_enum": lambda: F.col("known_status").isin("known", "new"),
            "conf_pubmed_enum": lambda: F.col("confidence_pubmed").isin(
                "very-low", "low", "medium", "high"
            ),
        },
    )
)


def schema_for(name: str) -> TableSchema:
    if name not in SCHEMAS:
        raise KeyError(f"unknown schema {name!r}; have {sorted(SCHEMAS)}")
    return SCHEMAS[name]
