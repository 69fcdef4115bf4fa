"""MeSH descriptor/SCR ingestion + bioactive keep-logic (SURVEY S3,
D9; reference scripts/process_mesh.py).

The reference walks both XML trees with ElementTree and applies
keep-rules in Python dicts. Spark form: two XML scans with explicit
schemas, the keep-rules as pure column expressions over exploded
tree-number/mapping arrays, one broadcast join for the SCR-to-kept-
descriptor rule — no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Keep-rule regexes (process_mesh.py:30-47), Java-regex dialect.
ORGANIC_TREE_RE = r"^D0[2-6]\."
PHARMA_TREE_RE = r"^D27\."
CAS_RE = r"^\d{2,7}-\d{2}-\d$"
CODE_NAME_RE = (
    r"(?i)^([A-Z]{2,5}[A-Z0-9]*(?:[-\s]?\d{2,6}[A-Z0-9]*)+)$"
)

DESC_SCHEMA = T.StructType(
    [
        T.StructField("DescriptorUI", T.StringType()),
        T.StructField(
            "DescriptorName", T.StructType([T.StructField("String", T.StringType())])
        ),
        T.StructField(
            "TreeNumberList",
            T.StructType([T.StructField("TreeNumber", T.ArrayType(T.StringType()))]),
        ),
    ]
)

SCR_SCHEMA = T.StructType(
    [
        T.StructField("_SCRClass", T.StringType()),
        T.StructField("SupplementalRecordUI", T.StringType()),
        T.StructField(
            "SupplementalRecordName",
            T.StructType([T.StructField("String", T.StringType())]),
        ),
        T.StructField("RegistryNumber", T.StringType()),
        T.StructField(
            "HeadingMappedToList",
            T.StructType(
                [
                    T.StructField(
                        "HeadingMappedTo",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(
                                        "DescriptorReferredTo",
                                        T.StructType(
                                            [T.StructField("DescriptorUI", T.StringType())]
                                        ),
                                    )
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)


def read_descriptors(spark: SparkSession, path: str) -> DataFrame:
    """(dui, name, trees) — one row per DescriptorRecord."""
    raw = (
        spark.read.format("xml")
        .option("rowTag", "DescriptorRecord")
        .schema(DESC_SCHEMA)
        .load(path)
    )
    return raw.select(
        F.col("DescriptorUI").alias("dui"),
        F.col("DescriptorName.String").alias("name"),
        F.coalesce(
            F.col("TreeNumberList.TreeNumber"), F.array().cast("array<string>")
        ).alias("trees"),
    ).filter(F.col("dui").isNotNull())


def read_scrs(spark: SparkSession, path: str) -> DataFrame:
    """(cui, name, registry_number, scr_class, mapped_duis) per
    SupplementalRecord; the leading '*' major-topic marker is
    stripped from mapped descriptor UIs (process_mesh.py:106)."""
    raw = (
        spark.read.format("xml")
        .option("rowTag", "SupplementalRecord")
        .schema(SCR_SCHEMA)
        .load(path)
    )
    mapped = F.transform(
        F.coalesce(
            F.col("HeadingMappedToList.HeadingMappedTo"),
            F.array().cast("array<struct<DescriptorReferredTo:struct<DescriptorUI:string>>>"),
        ),
        lambda h: F.regexp_replace(
            h["DescriptorReferredTo"]["DescriptorUI"], r"^[*\s]+", ""
        ),
    )
    return raw.select(
        F.col("SupplementalRecordUI").alias("cui"),
        F.col("SupplementalRecordName.String").alias("name"),
        F.coalesce(F.col("RegistryNumber"), F.lit("")).alias("registry_number"),
        F.coalesce(F.col("_SCRClass"), F.lit("")).alias("scr_class"),
        F.array_compact(mapped).alias("mapped_duis"),
    ).filter(F.col("cui").isNotNull())


def organic_descriptors(desc: DataFrame) -> DataFrame:
    """D9 — descriptors on the D02-D06 small-molecule branches."""
    return desc.filter(
        F.exists(F.col("trees"), lambda t: t.rlike(ORGANIC_TREE_RE))
    )


def mapping_eligible_descriptors(desc: DataFrame) -> DataFrame:
    """D9 — organic OR pharmacologic-action (D27) branches; used only
    to widen SCR mapping."""
    return desc.filter(
        F.exists(
            F.col("trees"),
            lambda t: t.rlike(ORGANIC_TREE_RE) | t.rlike(PHARMA_TREE_RE),
        )
    )


def kept_scrs(scr: DataFrame, desc: DataFrame) -> DataFrame:
    """D9 SCR keep rule: maps to a kept/pharma descriptor ∨ CAS
    registry number ∨ (SCRClass=1 ∧ code-name shape ∧ RN ∈ {'',0}).

    The mapping test is an exploded semi-join against the (small)
    eligible-descriptor dimension — broadcast, no full shuffle; the
    display tree is the first mapped eligible descriptor's first tree
    (process_mesh.py:153-161).
    """
    eligible = mapping_eligible_descriptors(desc).select(
        F.col("dui").alias("mdui"), F.element_at("trees", 1).alias("one_tree")
    )
    exploded = scr.select(
        "cui", F.posexplode_outer("mapped_duis").alias("pos", "mdui")
    )
    hits = (
        exploded.join(F.broadcast(eligible), "mdui")
        .groupBy("cui")
        .agg(F.min_by("one_tree", "pos").alias("one_tree"))
    )
    joined = scr.join(F.broadcast(hits), "cui", "left")
    keep = (
        F.col("one_tree").isNotNull()
        | F.col("registry_number").rlike(CAS_RE)
        | (
            (F.col("scr_class") == "1")
            & F.col("name").rlike(CODE_NAME_RE)
            & F.col("registry_number").isin("", "0")
        )
    )
    return joined.filter(keep).select(
        "cui", "name", F.coalesce("one_tree", F.lit("")).alias("one_tree")
    )


def build_bioactive(desc: DataFrame, scr: DataFrame) -> DataFrame:
    """The `mesh_bioactive` staging table: Type/MeSH_UI/Name/
    OneTreeNumber, descriptors first then SCRs, deduped by (Type, UI)
    (process_mesh.py:120-173)."""
    d_rows = organic_descriptors(desc).select(
        F.lit("D").alias("Type"),
        F.col("dui").alias("MeSH_UI"),
        F.col("name").alias("Name"),
        F.coalesce(F.element_at("trees", 1), F.lit("")).alias("OneTreeNumber"),
    )
    c_rows = kept_scrs(scr, desc).select(
        F.lit("C").alias("Type"),
        F.col("cui").alias("MeSH_UI"),
        F.col("name").alias("Name"),
        F.col("one_tree").alias("OneTreeNumber"),
    )
    return d_rows.unionByName(c_rows).dropDuplicates(["Type", "MeSH_UI"])


def build_tags(bioactive: DataFrame) -> DataFrame:
    """`mesh_bioactive_tags`: one `MESH:<UI>` per distinct UI,
    sorted (process_mesh.py:176-179)."""
    return (
        bioactive.select(F.concat(F.lit("MESH:"), F.col("MeSH_UI")).alias("tag"))
        .distinct()
        .orderBy("tag")
    )


def process_mesh(
    spark: SparkSession, desc_path: str, supp_path: str
) -> tuple[DataFrame, DataFrame]:
    desc = read_descriptors(spark, desc_path)
    scr = read_scrs(spark, supp_path)
    bio = build_bioactive(desc, scr)
    return bio, build_tags(bio)
