"""Corpus-trained bigram language-model scoring — the CCNet-style
perplexity quality filter (Wenzek et al. 2020: documents are ranked by
LM score and the worst tail dropped; beyond-reference surface per the
BASELINE.json north star — the reference has no LM filtering at all).

Instead of an external KenLM binary, the model is trained ON the
corpus itself inside the same plan: unigram/bigram occurrence counts
with add-one (Laplace) smoothing over the corpus vocabulary,

    P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)

and a document's score is the mean log-probability over its bigram
occurrences. Self-scoring flags exactly what a perplexity filter
flags: repeated boilerplate scores high, random token soup scores
low. A model trained on a held-out reference corpus is the same plan
with the count tables built from a second DataFrame.

Portability contract (CLAUDE.md): ln() is transcendental — the JVM
and libm can disagree in the last ulp — so every per-bigram
contribution is fixed6-rounded (the DSIR log convention) and summed
exactly in DECIMAL(18,6); the per-document mean is ONE final IEEE
division then fixed6. Result values are engine-identical.

Scale shape: two map-side-combined count aggregations (vocab-sized
results), two hash joins against them (many-to-one on bigram / first
token; AQE handles the Zipf-hot keys), and one per-doc aggregation.
The vocabulary size V rides along as a broadcast one-row aggregate —
no driver collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aurora_mito_etl_spark.functions.numeric import dec, dec_to_double, fixed6
from aurora_mito_etl_spark.operators.textstats import (
    shingles_arrow,
    tokens_expr as _tokens,
)


def bigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_threshold: float = -8.0,
    train: DataFrame | None = None,
) -> DataFrame:
    """(id, n_bigrams, avg_logprob, lm_keep) for every input document.

    `train` (default: the corpus itself) provides the count tables;
    documents with no bigrams (< 2 tokens) score 0.0 and are kept —
    length filtering is the quality battery's job, not the LM's.
    `lm_keep` is ``avg_logprob >= keep_threshold`` on the fixed6
    value, so the verdict is engine-stable.
    """
    self_train = train is None
    train = docs if self_train else train

    # Count tables are MATERIALIZED (localCheckpoint) before reuse:
    # each is referenced twice downstream (uni by the vocab scalar and
    # the context join; the collapsed doc-bigram frame by the bigram
    # counts and the contribution join), and Catalyst re-executes an
    # unshared subtree per reference — the final adaptive plan showed
    # the token explode AND the Arrow shingle pass each running twice
    # (8 Generate nodes, zero ReusedExchange). One corpus pass each is
    # the r13 shape (guide §2.4); at 100 TB the materialized frames
    # are the trained model tables (vocab-sized) plus the collapsed
    # (doc, bigram) pairs — the same bytes the old plan's exchanges
    # already spilled, now read twice instead of recomputed.
    words = train.select(
        F.explode(_tokens(F.col(text_col))).alias("w")
    ).filter(F.col("w") != "")
    uni = words.groupBy("w").agg(F.count("*").alias("c1")).localCheckpoint(
        eager=False
    )
    vocab = uni.agg(F.count("*").alias("V"))

    # Collapse doc bigrams to (id, bg, o) occurrence counts FIRST: the
    # per-occurrence contribution is a function of bg alone, so o
    # identical fixed6 values sum to o × f6 — EXACT in DECIMAL
    # (decimal(18,6) × decimal(18,0) is a 37-digit product, no
    # precision cap), bit-equal to the oracle's per-occurrence sum
    # while the contribution join carries distinct pairs, not
    # occurrences (guide §2.3 "aggregate before you shuffle").
    dbc = (
        docs.select(
            F.col(id_col),
            F.explode(shingles_arrow(F.col(text_col), 2)).alias("bg"),
        )
        .groupBy(id_col, "bg")
        .agg(F.count("*").alias("o"))
        .localCheckpoint(eager=False)
    )
    # self-training rolls the bigram count table up from the SAME
    # collapsed frame instead of shingling the corpus a second time
    if self_train:
        bi = dbc.groupBy("bg").agg(F.sum("o").cast("long").alias("c2"))
    else:
        train_bg = train.select(
            F.explode(shingles_arrow(F.col(text_col), 2)).alias("bg")
        )
        bi = train_bg.groupBy("bg").agg(F.count("*").alias("c2"))
    # LEFT joins: a bigram/context unseen in training still gets its
    # Laplace mass ((0+1)/(0+V)) instead of silently dropping out —
    # the whole point of smoothing (caught by the external-train test).
    contrib = (
        dbc.join(bi, "bg", "left")
        .withColumn("w1", F.substring_index(F.col("bg"), " ", 1))
        .join(uni.select(F.col("w").alias("w1"), "c1"), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.col("o"),
            # Degenerate-train guard, PER CONTRIBUTION: V=0 makes the
            # Laplace denominator (c1+V) zero, so a bigram scored
            # against an empty vocabulary fails loudly (external-train
            # misuse). Guarding here instead of inside the vocab
            # aggregate keeps the defined all-NULL/empty-corpus case —
            # zero contribution rows, every doc scores 0.0 exactly as
            # the oracle computes — from tripping over an eager
            # broadcast (r9 schema-chaos tier, docs_allnull variant).
            F.when(
                F.col("V") > 0,
                fixed6(
                    F.log(
                        (F.coalesce("c2", F.lit(0)) + 1).cast("double")
                        / (F.coalesce("c1", F.lit(0)) + F.col("V")).cast(
                            "double"
                        )
                    )
                ),
            )
            .otherwise(
                F.raise_error(
                    F.lit(
                        "bigram_lm_score: training corpus has an empty "
                        "vocabulary (no non-whitespace tokens)"
                    )
                ).cast("double")
            )
            .alias("f6"),
        )
    )
    agg = contrib.groupBy(id_col).agg(
        dec_to_double(
            F.sum(dec(F.col("f6")) * F.col("o").cast("decimal(18,0)"))
        ).alias("s"),
        F.sum("o").cast("long").alias("n"),
    )
    ids = docs.select(id_col).distinct()
    avg = F.when(F.col("n") > 0, F.col("s") / F.col("n")).otherwise(F.lit(0.0))
    return ids.join(agg, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n", F.lit(0)).alias("n_bigrams"),
        fixed6(F.coalesce(avg, F.lit(0.0))).alias("avg_logprob"),
        (fixed6(F.coalesce(avg, F.lit(0.0))) >= F.lit(keep_threshold)).alias(
            "lm_keep"
        ),
    )
