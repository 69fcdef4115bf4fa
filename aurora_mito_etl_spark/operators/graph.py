"""Iterative graph algorithms on DataFrames: weighted PageRank.

Power iteration expressed as a driver-side loop of pure DataFrame
joins — the standard Spark shape for fixed-iteration graph algorithms
(the dedup tier's connected components, `dedup.py` large-star/
small-star, is the same idea for a different recurrence). Each
iteration is one join + one aggregation; ranks stay a (vertex, rank)
table, edges are visited once per iteration, and nothing ever
collects to the driver except the vertex count.

Cross-engine determinism (the repo discipline): per-edge
contributions are fixed6-rounded and summed in exact DECIMAL
(`functions/numeric`), transition probabilities and the damping
combine are single IEEE double expressions, so after any number of
iterations the ranks are bit-identical across engines and
partitionings — which is what makes the operator oracle-checkable by
an UNROLLED DuckDB CTE chain replaying the same iterations.

Dangling mass (vertices with no out-edges) redistributes uniformly,
the classic correction, computed in-plan via a constant-key broadcast
join — no driver round-trip per iteration.

Beyond-reference surface: the reference has no graph notion at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aurora_mito_etl_spark.functions.numeric import dec, dec_to_double, fixed6


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    iterations: int = 8,
) -> DataFrame:
    """(vertex, rank) after `iterations` rounds of damped weighted
    power iteration over the multigraph `edges`.

    Parallel edges collapse to weights first (count, or the sum of
    `weight_col`); transition probability out of a vertex is its
    edge weight over its out-weight, fixed6-rounded. Ranks start
    uniform at 1/N and update as
    ``(1-d)/N + d * (Σ_in rank·p + dangling/N)``, every per-edge term
    fixed6-rounded and decimal-summed.
    """
    if not 0 < damping < 1:
        raise ValueError("damping must be in (0, 1)")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    w = (
        edges.groupBy(F.col(src).alias("src"), F.col(dst).alias("dst")).agg(
            (F.count("*") if weight_col is None else F.sum(weight_col))
            .cast("double")
            .alias("w")
        )
    )
    out_w = w.groupBy("src").agg(F.sum("w").alias("out_w"))
    # integer-valued doubles sum exactly; for fractional weight_col
    # callers the out_w sum inherits Spark's sum order — document: use
    # integer weights for bit-portable ranks.
    p = w.join(out_w, "src").select(
        "src", "dst", fixed6(F.col("w") / F.col("out_w")).alias("p")
    )
    vertices = (
        w.select(F.col("src").alias("vertex"))
        .unionByName(w.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    n = vertices.count()
    if n == 0:
        # Empty graph (all-NULL or empty edge input): no vertices, no
        # ranks — the oracle's CTE chain is empty too, while 1/n here
        # would divide by zero (r9 schema-chaos tier).
        return vertices.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / float(n)

    has_out = out_w.select(F.col("src").alias("vertex"))
    # Each round references `ranks` three times (contributions,
    # dangling mass, vertex spine); without lineage truncation the
    # logical plan grows 3^iterations. Same pattern as
    # dedup.connected_components: materialize per round.
    p = p.localCheckpoint()
    has_out = has_out.localCheckpoint()
    ranks = vertices.withColumn("rank", F.lit(1.0 / float(n))).localCheckpoint()
    for _ in range(iterations):
        contrib = (
            ranks.join(p, ranks["vertex"] == p["src"])
            .select("dst", fixed6(F.col("rank") * F.col("p")).alias("c"))
            .groupBy("dst")
            .agg(dec_to_double(F.sum(dec("c"))).alias("in_sum"))
        )
        dangling = (
            ranks.join(has_out, "vertex", "anti")
            .agg(dec_to_double(F.sum(dec(fixed6(F.col("rank"))))).alias("dang"))
            .select(F.coalesce("dang", F.lit(0.0)).alias("dang"), F.lit(1).alias("_k"))
        )
        ranks = (
            ranks.select("vertex")
            .join(contrib.withColumnRenamed("dst", "vertex"), "vertex", "left")
            .withColumn("_k", F.lit(1))
            .join(F.broadcast(dangling), "_k")
            .select(
                "vertex",
                fixed6(
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("in_sum", F.lit(0.0))
                        + F.col("dang") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        ).localCheckpoint()
    return ranks
