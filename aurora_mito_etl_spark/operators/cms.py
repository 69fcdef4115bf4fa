"""Count-min sketch frequency estimation over the token stream.

Cormode & Muthukrishnan (J. Algorithms 2005): a depth×width grid of
counters; every token increments one counter per row (bucket =
h_r(token)), and a point estimate is the MIN of its row counters —
always >= the true count (counters only ever over-count on
collisions), with error <= 2·n/width at probability 1 − 2^-depth.

This completes the repo's sketch family — Bloom (membership,
`functions/bloom.py`), HLL++ (distinct counts, `profile.py`
exact=False), Misra-Gries (heavy hitters, `textstats.py`) — with the
point-frequency sketch: the structure a 100 TB pipeline uses to ask
"roughly how often does THIS token/domain/n-gram occur" without ever
shuffling the vocabulary.

Scale posture: the sketch build is ONE corpus pass whose shuffle is
bounded by depth·width rows per task (map-side partial aggregation
collapses each task's token stream into at most depth·width counter
cells) — corpus-size-independent, exactly the property that makes the
sketch preferable to a vocabulary groupBy at scale. Estimation never
touches the corpus: the sketch (depth·width rows, a few MB at any
corpus size) is broadcast against the probe set.

Hashing is the repo-portable 60-bit md5 prefix
(`functions/hashing.md5_prefix60`) over ``"{row}:{token}"``, so a
DuckDB oracle replays the whole sketch bit-identically:
``CAST('0x'||substr(md5(r||':'||tok),1,15) AS BIGINT) % width``.

The reference engine has no sketch tier (its corpora fit a single
awk pass, `/root/reference/scripts/process_db.sh`); this module is
part of the LLM-pipeline extension family the survey calls for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aurora_mito_etl_spark.functions.hashing import md5_prefix60
from aurora_mito_etl_spark.operators.textstats import tokens_expr


def cms_bucket(col: Column, row: int, width: int) -> Column:
    """Row-``row`` bucket of a token: md5-prefix60 of "row:token" mod
    width. Non-negative on both engines (the 60-bit prefix is always
    positive, so ``%`` agrees with SQL)."""
    return md5_prefix60(F.concat(F.lit(f"{row}:"), col)) % F.lit(width)


def _token_stream(df: DataFrame, text_col: str) -> DataFrame:
    """(doc_id?, tok) stream via THE shared tokenization chain; empty
    tokens dropped, NULL text contributes nothing."""
    keep = [c for c in ("doc_id",) if c in df.columns]
    return df.select(
        *keep,
        F.explode(
            tokens_expr(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("tok"),
    ).where(F.col("tok") != "")


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    width: int = 4096,
    depth: int = 3,
) -> DataFrame:
    """Build the sketch: ``(r, bucket, c)`` with at most depth·width
    rows. One corpus pass; per-task state bounded by depth·width
    cells via map-side combine, so the shuffle does not grow with the
    corpus."""
    toks = _token_stream(df, text_col)
    buckets = F.array(
        *[cms_bucket(F.col("tok"), r, width) for r in range(depth)]
    )
    return (
        toks.select(F.posexplode(buckets).alias("r", "bucket"))
        .groupBy("r", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    width: int,
    depth: int,
    token_col: str = "token",
) -> DataFrame:
    """Point estimates for a probe-token set: ``(token, est)`` with
    est = min over rows of the token's counter — the CMS guarantee
    makes est >= true count always. The sketch side is broadcast
    (<= depth·width rows regardless of corpus size); a probe whose
    bucket was never touched coalesces to 0 (true count 0)."""
    pb = probes.select(
        F.col(token_col),
        F.posexplode(
            F.array(
                *[cms_bucket(F.col(token_col), r, width) for r in range(depth)]
            )
        ).alias("r", "bucket"),
    )
    return (
        pb.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce("c", F.lit(0).cast("long"))).alias("est"))
    )


def cms_token_estimates(
    df: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    width: int = 4096,
    depth: int = 3,
    token_col: str = "token",
) -> DataFrame:
    """Sketch-estimate vs exact count for a probe-token set:
    ``(token, est, exact_cnt, overestimate)``.

    The exact recount is the verification half (same device as
    ``textstats.heavy_hitter_tokens``): probes are broadcast-semi
    against the token stream, so its shuffle is bounded by the probe
    set, not the vocabulary. ``overestimate`` (est > exact) is the
    collision indicator; est < exact is impossible by construction —
    the self-verifying CMS property the tests pin.
    """
    toks = _token_stream(df, text_col)
    sketch = cms_build(df, text_col, width, depth)
    est = cms_estimate(sketch, probes, width, depth, token_col)
    exact = (
        toks.join(
            F.broadcast(probes.select(token_col)),
            toks["tok"] == F.col(token_col),
        )
        .groupBy(token_col)
        .agg(F.count("*").cast("long").alias("exact_cnt"))
    )
    return est.join(exact, token_col, "left").select(
        token_col,
        "est",
        F.coalesce("exact_cnt", F.lit(0).cast("long")).alias("exact_cnt"),
        (F.col("est") > F.coalesce("exact_cnt", F.lit(0).cast("long"))).alias(
            "overestimate"
        ),
    )
