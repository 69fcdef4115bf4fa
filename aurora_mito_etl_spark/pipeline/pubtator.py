"""PubTator chemical-annotation stage (SURVEY S4, J1; reference
scripts/process_pubtator.sh:29-34).

Reference plan: zcat → awk project (tag, pmid) → 1 GB external sort →
sort-merge join with the tag list → cut → sort -u. Spark plan: TSV
scan (gzip transparent) → filter → broadcast semi join (the tag list
is dimension-sized) → distinct — no external sort, no shuffle of the
fact side for the join itself, one shuffle for the distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aurora_mito_etl_spark.operators.joins import tag_semi_join_distinct

# chemical2pubtator3 layout: pmid, type, normalized id (mesh tag),
# mention, resource (process_pubtator.sh:29-30 uses cols 1 and 3).
PUBTATOR_SCHEMA = T.StructType(
    [
        T.StructField("pmid", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("mesh_tag", T.StringType()),
        T.StructField("mention", T.StringType()),
        T.StructField("resource", T.StringType()),
    ]
)


def read_pubtator(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.option("sep", "\t")
        .schema(PUBTATOR_SCHEMA)
        .csv(path)
    )


def filtered_annotations(df: DataFrame) -> DataFrame:
    """P2 — rows with a normalized id; the `pubtator_filtered`
    staging shape (pmid, mention, normalized_id)."""
    return df.filter(
        F.col("mesh_tag").isNotNull() & (F.col("mesh_tag") != "")
    ).select("pmid", "mention", F.col("mesh_tag").alias("normalized_id"))


def bioactive_pmids(df: DataFrame, tags: DataFrame) -> DataFrame:
    """J1 — distinct PMIDs annotated with any bioactive MeSH tag."""
    fact = filtered_annotations(df).select(
        F.col("normalized_id").alias("tag"), "pmid"
    )
    return tag_semi_join_distinct(fact, tags, "tag", "pmid")


def process_pubtator(spark: SparkSession, path: str, tags: DataFrame) -> DataFrame:
    return bioactive_pmids(read_pubtator(spark, path), tags)
