"""localCheckpoint hygiene experiment (VERDICT r13 ask #5).

Operators localCheckpoint intermediates inside queries; the blocks are
never unpersisted, so a long session (the 141-query bench, twice
through) accumulates executor storage in the single local[NN] JVM —
a plausible contributor to the observed mid-suite degradation.

This script runs a query subset N passes through (bench-style) under a
cleanup MODE and reports per-pass times plus the persistent-RDD count
and stored bytes after every query:

    python tools/ckpt_hygiene.py none     [npasses] [query ...]
    python tools/ckpt_hygiene.py unpersist[npasses] [query ...]

Modes:
    none      — today's behavior (blocks accumulate)
    unpersist — after each query, unpersist EVERY persistent RDD
                (safe between top-level queries: nothing references a
                previous query's checkpoints; a localCheckpoint block
                is only unrecoverable if something still needed it)

Default subset: the suite's most checkpoint-heavy tier (dedup, graph,
retrieval, quantiles) — the queries that run LATE in the bench and
showed the round-over-round floor drift.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_QUERIES = [
    "docs_ngram_jaccard_pairs",
    "docs_dup_triangles",
    "docs_dup_kcore",
    "docs_minhash_lsh_pairs",
    "docs_near_dedup_survivors",
    "docs_label_spread",
    "docs_tfidf_topk",
    "docs_bm25_search",
    "docs_mmr_rerank",
    "docs_lm_score",
    "events_pagerank",
    "events_hits",
    "lineitem_price_quantiles_dist",
    "lineitem_price_quantiles_grouped_dist",
    "docs_decontaminate_bloom",
    "docs_heaps_fit",
]


def persistent_stats(spark):
    """(count, total MiB) of currently persistent RDD blocks."""
    jm = spark.sparkContext._jsc.getPersistentRDDs()
    n = jm.size()
    status = spark.sparkContext._jsc.sc().getExecutorMemoryStatus()
    # executor memory status: max vs remaining storage memory
    it = status.iterator()
    used = 0
    while it.hasNext():
        kv = it.next()
        mx, rem = kv._2()._1(), kv._2()._2()
        used += mx - rem
    return n, used / (1024 * 1024)


def unpersist_all(spark) -> int:
    jm = spark.sparkContext._jsc.getPersistentRDDs()
    rdds = list(jm.values())  # py4j maps java.util.Map to a dict view
    for rdd in rdds:
        rdd.unpersist(False)
    return len(rdds)


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "none"
    npasses = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = sys.argv[3:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from aurora_mito_etl_spark.plans.queries import QUERIES
    from aurora_mito_etl_spark.session import get_spark

    spark = get_spark(app_name=f"ckpt-hygiene-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    per_pass: list[float] = []
    for p in range(npasses):
        t_pass = 0.0
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            t_pass += dt
            n_rdd, mib = persistent_stats(spark)
            print(
                f"pass{p} {name:42s} {dt:7.3f}s  persistent_rdds={n_rdd:4d} "
                f"storage_used={mib:8.1f}MiB",
                flush=True,
            )
            if mode == "unpersist":
                unpersist_all(spark)
        per_pass.append(round(t_pass, 3))
    n_rdd, mib = persistent_stats(spark)
    print(
        f"mode={mode} passes={per_pass} final_rdds={n_rdd} "
        f"final_storage={mib:.1f}MiB"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
