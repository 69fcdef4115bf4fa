"""PubMed corpus ingestion + topical filter (SURVEY §3.2, S1/S2,
P1-P15).

The reference runs an 8-process Unix pipeline per .xml.gz file
(xmlstarlet → awk → sed → uconv → sed → tr → iconv, reference
scripts/process_pubmed.sh:84-135). Here the same semantics are ONE
declarative select/filter chain over Spark's native XML source —
whole-stage codegen fuses the string work, the scheduler gives
per-file parallelism, and the two genuinely-Python steps (NFC/ASCII)
are Arrow pandas UDFs at the end of the chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aurora_mito_etl_spark.operators import text as tx
from aurora_mito_etl_spark.operators.unicode_udfs import normalize_text_full

# Explicit read schema — only the nodes we project (spark XML prunes
# to this, mirroring the reference's 4-field XPath extraction at
# process_pubmed.sh:85-91; PMID stays a digit-string per
# DATA_DICTIONARY.md:9).
PUBMED_XML_SCHEMA = T.StructType(
    [
        T.StructField(
            "MedlineCitation",
            T.StructType(
                [
                    T.StructField(
                        "PMID",
                        T.StructType(
                            [
                                T.StructField("_VALUE", T.StringType()),
                                T.StructField("_Version", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField(
                        "Article",
                        T.StructType(
                            [
                                T.StructField("ArticleTitle", T.StringType()),
                                T.StructField(
                                    "Abstract",
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "AbstractText",
                                                T.ArrayType(T.StringType()),
                                            )
                                        ]
                                    ),
                                ),
                            ]
                        ),
                    ),
                    T.StructField(
                        "DateCompleted",
                        T.StructType([T.StructField("Year", T.StringType())]),
                    ),
                    T.StructField(
                        "DateRevised",
                        T.StructType([T.StructField("Year", T.StringType())]),
                    ),
                ]
            ),
        ),
        T.StructField(
            "PubmedData",
            T.StructType(
                [
                    T.StructField(
                        "History",
                        T.StructType(
                            [
                                T.StructField(
                                    "PubMedPubDate",
                                    T.ArrayType(
                                        T.StructType(
                                            [
                                                T.StructField(
                                                    "_PubStatus", T.StringType()
                                                ),
                                                T.StructField("Year", T.StringType()),
                                            ]
                                        )
                                    ),
                                )
                            ]
                        ),
                    )
                ]
            ),
        ),
    ]
)

# Topical regexes — POSIX classes recast as Java regex, semantics
# preserved from process_pubmed.sh:60-66.
RX_INHIBIT = r"(inhibit|antagoni|block|down[ -]?regulat|impair|repress)"
RX_COMPLEX = r"(mitochond\S*.*complex|complex\S*.*mitochond)"
RX_NADH = (
    r"(NADH([\s\p{Punct}]+\S+){0,8}[\s\p{Punct}]+(dehydrogenase|oxidoreductase)"
    r"|(dehydrogenase|oxidoreductase)([\s\p{Punct}]+\S+){0,8}[\s\p{Punct}]+NADH)"
)


def read_pubmed_xml(spark: SparkSession, path: str) -> DataFrame:
    """S1 — one DataFrame over any number of (gzipped) PubMed XML
    files; Spark decompresses transparently and schedules per file,
    replacing GNU parallel (process_pubmed.sh:70-71)."""
    return (
        spark.read.format("xml")
        .option("rowTag", "PubmedArticle")
        .schema(PUBMED_XML_SCHEMA)
        .load(path)
    )


def extract_fields(df: DataFrame) -> DataFrame:
    """S2 — project (pmid, raw_year, title, abstract) with the
    reference's 3-node year fallback and multi-paragraph abstract
    concat.

    The reference's XPath union `(A|B|C)[1]` (process_pubmed.sh:50-55)
    picks the first match in DOCUMENT order, which is DateCompleted →
    DateRevised → History (DateRevised lives inside MedlineCitation,
    BEFORE PubmedData/History) — so the coalesce order here is
    DateCompleted, DateRevised, history_year."""
    cit = F.col("MedlineCitation")
    # F.get (0-based) is null-safe on empty arrays — element_at would
    # throw under ANSI mode when no history entry has PubStatus=pubmed.
    history_year = F.get(
        F.filter(
            F.col("PubmedData.History.PubMedPubDate"),
            lambda d: d["_PubStatus"] == "pubmed",
        ),
        0,
    )["Year"]
    return df.select(
        cit["PMID"]["_VALUE"].alias("pmid"),
        F.coalesce(
            cit["DateCompleted"]["Year"], cit["DateRevised"]["Year"], history_year
        ).alias("raw_year"),
        cit["Article"]["ArticleTitle"].alias("title"),
        F.concat_ws(" ", cit["Article"]["Abstract"]["AbstractText"]).alias("abstract"),
    )


def clean_and_filter(
    df: DataFrame, year_min: int = 2000, ascii_fold: bool = True
) -> DataFrame:
    """P2-P15 + the topical filter, as one fused chain.

    Output: (pmid, year, title_abstract) — the `pubmed` staging
    schema (DATA_DICTIONARY.md:4-9).
    """
    title = tx.squeeze_ws(F.col("title"))
    abstract = tx.squeeze_ws(F.col("abstract"))
    out = (
        df.withColumn("title", title)
        .withColumn("abstract", abstract)
        # P2/P3: non-empty, not a '['-prefixed foreign-language title
        .filter(tx.non_empty(F.col("title")) & tx.non_empty(F.col("abstract")))
        .filter(tx.not_bracket_prefixed(F.col("title")))
        # P4: regex year + range
        .withColumn("year", tx.extract_year(F.col("raw_year")))
        .filter(F.col("year") >= year_min)
        # P11: title terminator + concat
        .withColumn(
            "title_abstract",
            F.concat_ws(" ", tx.fix_title_terminator(F.col("title")), F.col("abstract")),
        )
        # P5: the 3-regex topical filter
        .filter(
            tx.topical_filter(F.col("title_abstract"), RX_INHIBIT, RX_COMPLEX, RX_NADH)
        )
        # P12/P14/F6/P10 fused cleaning
        .withColumn("title_abstract", tx.clean_text(F.col("title_abstract")))
    )
    if ascii_fold:
        # P13+P15 (pandas UDF) — last, so it sees minimal data
        out = out.withColumn(
            "title_abstract", normalize_text_full(F.col("title_abstract"))
        )
    return out.select("pmid", "year", "title_abstract")


def process_pubmed(
    spark: SparkSession, path: str, year_min: int = 2000, ascii_fold: bool = True
) -> DataFrame:
    """The full stage: S1 → S2 → P-chain."""
    return clean_and_filter(
        extract_fields(read_pubmed_xml(spark, path)), year_min, ascii_fold
    )
