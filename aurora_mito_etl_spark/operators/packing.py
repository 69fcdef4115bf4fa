"""Sequence packing and mixture sampling for LLM training pipelines.

Beyond-reference surface: after filtering/dedup, a training pipeline
(a) packs documents into fixed-size context windows (GPT-style
concat-and-chunk) and (b) re-weights the source mixture to target
proportions. Both are deterministic, shuffle-light, and fully
SQL-expressible, so they carry DuckDB oracles like every other
operator.

Scale posture: packing needs a prefix sum over a total order — a
GLOBAL order would serialize 100 TB through one window partition, so
the operator packs WITHIN SHARDS (`shard_col`, e.g. source or a
path-derived shard id): one shuffle on the shard key, each shard's
prefix sum runs independently, and pack ids are (shard, local_id)
composites. That is also how production packing actually ships —
readers consume shard-local streams. Mixture sampling is two passes:
a tiny per-source aggregate (broadcast back) and a stateless
hash-bucket filter — nothing large ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aurora_mito_etl_spark.operators.sampling import _hash_bucket
from aurora_mito_etl_spark.operators.textstats import token_count_ws


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
    capacity: int = 2048,
) -> DataFrame:
    """Concat-and-chunk packing plan: documents are laid end-to-end in
    `id_col` order within each shard and cut into `capacity`-token
    context windows.

    Output, one row per document: ``n_tokens`` (whitespace tokens),
    ``start_offset`` (position of the document's first token in its
    shard's concatenated stream), ``pack_id`` (shard-local window
    index containing that first token), ``offset_in_pack``, and
    ``n_packs_spanned`` (how many windows the document crosses —
    training loaders use it to decide split vs. discard). Empty
    documents occupy zero tokens: they sit at their neighbor's
    boundary with n_packs_spanned = 0.

    This emits the packing PLAN (assignments), not materialized
    packs — at 100 TB the plan is what you shuffle-write
    (partitionBy(shard, pack_id)); gluing token buffers happens in
    the per-pack writer.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = F.when(
        F.trim(F.coalesce(F.col(text_col), F.lit(""))) == "", F.lit(0)
    ).otherwise(token_count_ws(F.col(text_col)))
    toks = df.select(
        F.col(id_col), F.col(shard_col), n_tok.alias("n_tokens")
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset")
    out = toks.select(id_col, shard_col, "n_tokens", start)
    return out.select(
        F.col(id_col),
        F.col(shard_col),
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / capacity).alias("pack_id"),
        (F.col("start_offset") % capacity).alias("offset_in_pack"),
        F.when(F.col("n_tokens") == 0, F.lit(0))
        .otherwise(
            F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / capacity)
            - F.floor(F.col("start_offset") / capacity)
            + 1
        )
        .alias("n_packs_spanned"),
    )


def mixture_sample(
    df: DataFrame,
    targets: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str | None = None,
    salt: str = "mixture",
) -> DataFrame:
    """Deterministic source-mixture resampling: keep a hash-selected
    subset of each source so the kept corpus approaches the `targets`
    proportions (shares of total `weight_col` — default row count).

    The feasible total is T = min_s(available_s / t_s) (the scarcest
    source pins the mixture; no source is upsampled). Each source
    then keeps rate_s = t_s·T / available_s of its rows via the
    engine's portable md5 hash bucket — rerun-stable, join-free
    membership, the same contract as `sampling.hash_sample`. Sources
    absent from `targets` are dropped (target share 0).

    Output: the kept rows of `df` plus ``mix_rate`` (the source's
    keep rate, rounded to 6 for the oracle hash).
    """
    t_lit = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in kv]
    )
    wexpr = F.lit(1.0) if weight_col is None else F.col(weight_col).cast("double")
    avail = (
        df.groupBy(source_col)
        .agg(F.sum(wexpr).alias("__avail"))
        .withColumn("__t", t_lit[F.col(source_col)])
        .filter(F.col("__t").isNotNull() & (F.col("__t") > 0))
    )
    # T = min over sources of avail/t — an unpartitioned window over
    # the per-source aggregate (rows = number of sources, so the
    # single-partition window is trivially small; a crossJoin with a
    # scalar agg would be a self-join on the same lineage and trip
    # Spark's ambiguous-reference resolution)
    w_all = Window.partitionBy()
    rates = avail.select(
        source_col,
        F.floor(
            F.col("__t")
            * F.min(F.col("__avail") / F.col("__t")).over(w_all)
            / F.col("__avail")
            * 1_000_000
            + F.lit(0.5)
        ).alias("__cutoff"),
    )
    bucket = _hash_bucket(F.col(id_col), salt)
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(bucket < F.col("__cutoff"))
        .withColumn(
            "mix_rate", F.col("__cutoff").cast("double") / 1_000_000
        )
        .drop("__cutoff")
    )
