"""DSIR-style importance weighting for data selection.

Hashed n-gram importance weights (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling"): score every raw
document by log p_target(doc) − log p_raw(doc) under bag-of-hashed-
n-gram unigram models of a small target corpus vs. the raw corpus
itself. High-weight documents look like the target distribution;
selection then keeps the top slice or samples proportionally.
Beyond-reference surface — the reference selects by regex topicality
only (merge_filter.sh:21-43).

Scale shape: both models are BOUNDED by `num_buckets` (the hash
vocabulary), so the model tables are tiny however large the corpus
is; they broadcast, the per-gram join is map-side, and the only
corpus-sized shuffle is the per-document weight aggregation on
`id_col`. Per-bucket log-ratios are fixed-point-rounded and summed
as exact decimals (functions/numeric.py convention) so the weight is
bit-identical across engines, partitionings, and AQE decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aurora_mito_etl_spark.functions.hashing import md5_prefix60
from aurora_mito_etl_spark.functions.numeric import dec, dec_to_double
from aurora_mito_etl_spark.operators.dedup import _spread
from aurora_mito_etl_spark.operators.textstats import shingles_arrow


def _gram_buckets(
    df: DataFrame, text_col: str, n: int, num_buckets: int, keep: list[str]
) -> DataFrame:
    """One row per n-gram OCCURRENCE (counts matter for the language
    model — no array_distinct here, unlike dedup/decontamination),
    hashed to its model bucket."""
    return (
        _spread(df)
        .select(*keep, F.explode(shingles_arrow(F.col(text_col), n)).alias("s"))
        .select(*keep, (md5_prefix60(F.col("s")) % num_buckets).alias("b"))
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame | None = None,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_text_col: str = "text",
    num_buckets: int = 10_000,
    target_predicate=None,
) -> DataFrame:
    """Per-document DSIR log-importance weight.

    ``dsir_logw`` = Σ over the document's n-gram occurrences of
    ln p̂_target(bucket) − ln p̂_raw(bucket), with add-one smoothing
    over the `num_buckets` hash vocabulary:
    ln((c_t+1)/(T+B)) − ln((c_r+1)/(R+B)). Documents with fewer than
    `n` words have no grams and weight 0.0 (never NULL). Also emits
    ``n_grams`` so callers can length-normalize.

    Determinism contract: each bucket's log-ratio is rounded once
    with the portable floor-based fixed-point form, then summed as
    exact DECIMAL(18,6) — the one floating-sum in the operator is
    order-independent by construction.
    """
    if (target is None) == (target_predicate is None):
        raise ValueError("pass exactly one of target / target_predicate")
    if target_predicate is not None:
        # target ⊆ docs: BOTH models come out of one shingle pass and
        # ONE conditional aggregate over the flagged gram stream — no
        # separate target scan, no second shuffle, no full_outer join.
        # (A filter-based tcnt branch would NOT achieve this: filters
        # push below the explode, so each model branch re-shingles.)
        fg = _gram_buckets(
            docs.withColumn("__is_t", target_predicate),
            text_col, n, num_buckets, keep=[id_col, "__is_t"],
        )
        model = fg.groupBy("b").agg(
            F.count("*").alias("cr"),
            F.sum(
                F.when(F.col("__is_t"), F.lit(1)).otherwise(F.lit(0))
            ).alias("ct"),
        )
        rg = fg.drop("__is_t")
    else:
        tg = _gram_buckets(target, target_text_col, n, num_buckets, keep=[])
        rg = _gram_buckets(docs, text_col, n, num_buckets, keep=[id_col])
        tcnt = tg.groupBy("b").agg(F.count("*").alias("ct"))
        rcnt = rg.groupBy("b").agg(F.count("*").alias("cr"))
        model = tcnt.join(rcnt, "b", "full_outer").select(
            "b",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    w_all = Window.partitionBy()
    # the model table is ≤ num_buckets rows — the unpartitioned total
    # windows and the broadcast below are bounded by B, not the corpus
    ratio = (
        model
        .withColumn("tt", F.sum("ct").over(w_all))
        .withColumn("tr", F.sum("cr").over(w_all))
        .select(
            "b",
            (
                F.floor(
                    (
                        F.log(F.col("ct") + 1.0)
                        - F.log(F.col("tt") + F.lit(float(num_buckets)))
                        - F.log(F.col("cr") + 1.0)
                        + F.log(F.col("tr") + F.lit(float(num_buckets)))
                    )
                    * 1_000_000
                    + F.lit(0.5)
                )
                / 1_000_000
            ).alias("lr"),
        )
    )
    per_doc = (
        rg.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(
            dec_to_double(F.sum(dec(F.col("lr")))).alias("__w"),
            F.count("*").alias("__n"),
        )
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("__n", F.lit(0)).alias("n_grams"),
        F.coalesce("__w", F.lit(0.0)).alias("dsir_logw"),
    )
