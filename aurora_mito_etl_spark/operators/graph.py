"""Iterative graph algorithms on DataFrames: weighted PageRank, HITS.

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

    # Each round references `ranks` three times (contributions,
    # dangling mass, vertex spine); without lineage truncation the
    # logical plan grows 3^iterations. Same pattern as
    # dedup.connected_components: materialize per round.
    #
    # r13 (guide §2.4): the dangling-mass branch used to anti-join
    # ranks against the has-out vertex set EVERY round — but the
    # vertex set is static, so the flag is computed ONCE into the
    # initial ranks table and carried through each round's rebuild:
    # dangling becomes a plain filtered aggregate, removing one
    # vertex-sized join per iteration (values unchanged — the same
    # rows feed the same fixed6/decimal sum).
    # lazy checkpoints (r14): same single materialization per frame,
    # but each round's checkpoint job fuses into the broadcast
    # sub-job that first reads it instead of running as its own
    # eager build-time job.
    p = p.localCheckpoint(eager=False)
    ranks = (
        vertices.join(
            out_w.select(
                F.col("src").alias("vertex"), F.lit(True).alias("__has_out")
            ),
            "vertex",
            "left",
        )
        .select(
            "vertex",
            F.lit(1.0 / float(n)).alias("rank"),
            F.coalesce("__has_out", F.lit(False)).alias("__has_out"),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(iterations):
        contrib = (
            ranks.join(p, ranks["vertex"] == p["src"])
            .select("dst", fixed6(F.col("rank") * F.col("p")).alias("c"))
            .groupBy("dst")
            .agg(dec_to_double(F.sum(dec("c"))).alias("in_sum"))
        )
        dangling = (
            ranks.where(~F.col("__has_out"))
            .agg(dec_to_double(F.sum(dec(fixed6(F.col("rank"))))).alias("dang"))
            .select(F.coalesce("dang", F.lit(0.0)).alias("dang"), F.lit(1).alias("_k"))
        )
        ranks = (
            ranks.select("vertex", "__has_out")
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
                "__has_out",
            )
        ).localCheckpoint(eager=False)
    return ranks.select("vertex", "rank")


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
) -> DataFrame:
    """(vertex, hub, auth) after `iterations` rounds of sup-norm
    normalized HITS (Kleinberg 1999) over the multigraph `edges` —
    the complement to :func:`pagerank`: hubs point at good
    authorities, authorities are pointed at by good hubs.

    Bit-portability is simpler than pagerank's: parallel edges
    collapse to exact integer weights, scores live on the 1e-6 grid
    as longs, so every contribution sum ``Σ w·score`` is an exact
    integer (ANSI long overflow raises; the oracle's HUGEINT→BIGINT
    cast raises identically), and each round's sup-norm divide is the
    one (int→double, divide, ·1e6+0.5, floor) sequence — no float
    folds anywhere, so an unrolled DuckDB CTE chain replays it
    exactly. An all-zero round (possible only on an empty graph)
    scores 0 via the shared MAX>0 CASE.

    Scale shape per round: two map-side-combinable aggregations over
    the collapsed edge table plus two sup-norm maxes, each a global
    agg broadcast back as a 1-row join (DEFAULT since r11, VERDICT
    r10 ask #3) — no unpartitioned Window anywhere in the chain, so
    no single task ever sees all |V| rows at any vertex cardinality
    (plan-pinned by tests/test_plan_shapes.py). The raw event table
    is touched once, up front; each half-step localCheckpoints its
    score frame (see `_normalize`) so the max's second reference
    cannot double the logical plan per round."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    grid = F.lit(1000000.0)
    w = edges.groupBy(F.col(src).alias("src"), F.col(dst).alias("dst")).agg(
        F.count("*").alias("w")
    )
    vertices = (
        w.select(F.col("src").alias("vertex"))
        .unionByName(w.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    # lazy (r14): both frames still materialize exactly once (w is
    # read 2x per round, vertices by the initial scores and the final
    # spine), but the jobs fold into the first action instead of
    # running eagerly at DataFrame build — two fewer sequential
    # build-time jobs (~2.7 s of the measured 7.5 s build at sf0.1;
    # the per-half-step normalize barriers are inherent: each sup-norm
    # max is a global aggregate the next step depends on).
    w = w.localCheckpoint(eager=False)
    vertices = vertices.localCheckpoint(eager=False)

    def _normalize(scores: DataFrame, out: str) -> DataFrame:
        """Divide by the round's MAX and re-grid — SPARSE: vertices
        absent from `scores` have score 0 and stay absent until the
        final spine (a missing row contributes exactly what a 0 row
        would to every downstream sum, and can't be the max while any
        row is positive — if ALL are zero/absent both engines emit
        zeros). The MAX is a map-side-combinable global agg broadcast
        back as a 1-row join (DEFAULT since r11, VERDICT r10 ask #3 —
        the earlier `Window.partitionBy()` form funneled all |V|
        post-aggregation rows through one window task; fine at
        event-type grain, a single-task sort at web-graph grain).
        The scores frame is localCheckpointed first: the max agg and
        the probe side BOTH reference it, and without truncation that
        2-way self-reference doubles the logical plan every half-step
        (2^8 over 4 rounds — the analyzer blowup the iterative-loop
        rule exists for). Same max, same divide, same grid: the
        unrolled-CTE oracle replays it unchanged. eager=False defers
        materialization into the enclosing action (the plan-level
        truncation happens at DataFrame construction either way).
        Measured cost of the posture fix at sf0.1: ~3.9s warm vs the
        window form's ~1.4s — the 8 half-step broadcast sides each
        materialize as a sub-job; accepted as the price of removing
        the |V|-row single-task window (the old form's cost was
        invisible at event-type grain and unbounded at web-graph
        grain)."""
        s = scores.localCheckpoint(eager=False)
        mxdf = s.agg(F.max("raw").alias("mx")).withColumn("_k", F.lit(1))
        return (
            s.withColumn("_k", F.lit(1))
            .join(F.broadcast(mxdf), "_k")
            .select(
                "vertex",
                F.when(
                    F.col("mx") > 0,
                    F.floor(
                        F.col("raw").cast("double")
                        / F.col("mx").cast("double")
                        * grid
                        + F.lit(0.5)
                    ),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias(out),
            )
        )

    h = vertices.withColumn("h", F.lit(1_000_000).cast("long"))
    a = None
    for _ in range(iterations):
        araw = (
            h.join(w, h["vertex"] == w["src"])
            .select(F.col("dst").alias("vertex"), (F.col("w") * F.col("h")).alias("t"))
            .groupBy("vertex")
            .agg(F.sum("t").alias("raw"))
        )
        a = _normalize(araw, "a")
        hraw = (
            a.join(w, a["vertex"] == w["dst"])
            .select(F.col("src").alias("vertex"), (F.col("w") * F.col("a")).alias("t"))
            .groupBy("vertex")
            .agg(F.sum("t").alias("raw"))
        )
        h = _normalize(hraw, "h")
    # the spine returns at the end: absent == score 0 on both engines
    return (
        vertices.join(h, "vertex", "left")
        .join(a, "vertex", "left")
        .select(
            "vertex",
            (F.coalesce("h", F.lit(0)).cast("double") / grid).alias("hub"),
            (F.coalesce("a", F.lit(0)).cast("double") / grid).alias("auth"),
        )
    )


def triangle_stats(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-vertex triangle count and local clustering coefficient of
    an undirected graph given as id-ordered edges (src < dst).

    Shape (the 100 TB argument): the classic degree-ordered
    node-iterator (Schank & Wagner 2005). Every edge is re-oriented
    from its lower-(degree, id) endpoint to the higher one, making the
    orientation an acyclic total order; each triangle is then a
    transitive tournament with a UNIQUE source vertex, so generating
    wedges only from a vertex's out-edges and closing them against the
    edge table counts each triangle exactly once. Out-degree under
    this orientation is bounded by O(sqrt(m)) — the wedge explosion a
    naive id-ordered iterator suffers on hub vertices (a near-dup
    megacluster) cannot happen. Three shuffles: degree agg, wedge
    self-join on the apex, closing equi-join on the canonical pair.

    Output: ``vertex, degree, n_triangles, clustering_coeff`` — one
    row per vertex that appears in at least one edge (isolated
    vertices are not the graph's concern); coefficient is
    2T/(d(d-1)), fixed6, NULL for degree-1 vertices.

    Cross-engine contract: triangle sets are orientation-invariant,
    so a plain id-ordered SQL replay (three self-joins) is an exact
    oracle even though this plan orients by degree.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") < F.col("b"))
        .distinct()
        # the edge table is read three times below (degree, wedge,
        # closing join); when `edges` is itself an expensive chain (a
        # near-dup pair plan), recomputation triples its cost — the
        # MMR-shortlist lesson. Edge tables are pair-pruned and small
        # relative to their source corpus, so materializing is cheap.
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("degree"))
        # read once per endpoint side and once for the output spine —
        # materialize so the degree shuffle runs once, not three times
        .localCheckpoint(eager=False)
    )
    da = deg.select(F.col("v").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("v").alias("b"), F.col("degree").alias("degb"))
    ed = e.join(da, "a").join(db, "b")
    # orient lower-(degree, id) -> higher; ids are distinct so the
    # tie-break is total
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        # both wedge legs read this; materialize so the two degree
        # joins run once (Catalyst has no cross-branch subplan reuse)
    ).localCheckpoint(eager=False)
    o1 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("x"))
    o2 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("y"))
    wedges = o1.join(o2, "apex").where(F.col("x") < F.col("y"))
    closed = wedges.join(
        e,
        (F.least("x", "y") == F.col("a")) & (F.greatest("x", "y") == F.col("b")),
    ).select("apex", "x", "y")
    tv = (
        closed.select(F.col("apex").alias("v"))
        .unionByName(closed.select(F.col("x").alias("v")))
        .unionByName(closed.select(F.col("y").alias("v")))
    )
    tc = tv.groupBy("v").agg(F.count("*").alias("n_triangles"))
    d = F.col("degree").cast("double")
    coeff = F.lit(2.0) * F.col("n_triangles").cast("double") / (d * (d - F.lit(1.0)))
    from ..functions.numeric import fixed6

    return (
        deg.join(tc, "v", "left")
        .select(
            F.col("v").alias("vertex"),
            "degree",
            F.coalesce("n_triangles", F.lit(0).cast("long")).alias("n_triangles"),
        )
        .select(
            "vertex",
            "degree",
            "n_triangles",
            F.when(F.col("degree") >= 2, fixed6(coeff)).alias("clustering_coeff"),
        )
    )


def kcore_peel(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 4,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Bounded k-core peel of an undirected id-ordered edge list:
    ``rounds`` iterations of drop-degree-below-k, then the surviving
    vertices with their induced-subgraph degree and a global
    ``converged`` flag (true iff the result IS the k-core — one more
    peel would remove nothing).

    Why bounded: full coreness needs a data-dependent number of peels
    (a path graph needs O(n)), which no unrolled oracle can replay;
    the fixed-round contract is the pagerank/kmeans convention —
    both engines compute 'after exactly R peels' bit-identically, and
    the flag says whether R sufficed. In practice near-dup graphs
    converge in 2-3 peels (tendrils are shallow); at 100 TB you rerun
    with a higher R when converged=false.

    Shape: each round is one degree aggregation + two semi joins,
    with localCheckpoint truncating lineage per round (the iterative-
    loop rule); the candidate set only shrinks. The k-core is the
    cluster-quality gate above the triangle census: vertices OUTSIDE
    the 2-core are exactly the tendril/bridge docs a transitive
    dedup would over-merge through.
    """
    if k < 1 or rounds < 1:
        raise ValueError("k and rounds must be >= 1")
    cur = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def degree(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("a").alias("v"))
            .unionByName(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("deg"))
        )

    for _ in range(rounds):
        keep = degree(cur).where(F.col("deg") >= k).select("v").localCheckpoint(eager=False)
        cur = (
            cur.join(keep.withColumnRenamed("v", "a"), "a", "semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
    final = degree(cur).localCheckpoint(eager=False)
    flag = final.agg(
        F.coalesce(F.min("deg") >= F.lit(k), F.lit(True)).alias("converged")
    )
    return final.crossJoin(F.broadcast(flag)).select(
        F.col("v").alias("vertex"),
        F.col("deg").alias("core_degree"),
        "converged",
    )
