"""End-to-end training-corpus pipeline on the bundled testdata.

The north-star composition (COVERAGE.md "Beyond-reference" tier) as a
single runnable script: quality-filter → exact dedup → MinHash-LSH
near-dedup (keep-best survivor) → benchmark decontamination → token
chunking → deterministic epoch shuffle → packed shards with manifest
and provenance, plus the per-source report card before/after.

Every stage is one of the engine's registered operators — this file
only wires them, the way a user of the reference pipeline would
compose their own release job.

Usage: python examples/run_training_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from aurora_mito_etl_spark.operators import decontaminate as dc
from aurora_mito_etl_spark.operators import dedup as dd
from aurora_mito_etl_spark.operators import quality as ql
from aurora_mito_etl_spark.operators import sampling as sp
from aurora_mito_etl_spark.operators import text as tx
from aurora_mito_etl_spark.session import get_spark
from aurora_mito_etl_spark.sources import sinks
from aurora_mito_etl_spark.sources.catalog import load_table


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="training_release_"
    )
    spark = get_spark(app_name="training-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. Quality gate: Gopher-style signal battery, keep passing docs
    #    (the battery emits signals keyed by doc_id; semi-join back).
    # the word-count floor is the knob retuned per corpus (the
    # synthetic testdata docs are short); everything else at defaults
    passing = (
        ql.gopher_signals(docs, min_words=5, min_stop_hits=1)
        .filter(F.col("gopher_keep"))
        .select("doc_id")
    )
    kept = docs.join(passing, "doc_id", "left_semi").select(
        "doc_id", "text", "source"
    )

    # 2. Exact dedup (fingerprint groupBy) BEFORE the LSH tier so
    #    identical-copy clusters never form LSH mega-buckets.
    exact = dd.exact_dedup(kept, "text", "doc_id")

    # 3. Near-dedup: banded MinHash-LSH candidates (hot-bucket capped),
    #    exact-Jaccard verification, keep the LONGEST doc per cluster.
    pairs = dd.minhash_lsh_pairs(
        exact, "text", "doc_id",
        k_shingle=3, num_hashes=16, bands=4, threshold=0.5,
        max_bucket_size=10_000,
    )
    deduped = dd.dedup_clusters_best(
        exact.withColumn("__len", F.length("text")), pairs, "doc_id", "__len"
    ).drop("__len")

    # 4. Decontamination: drop docs sharing 5-gram spans with a
    #    (stand-in) benchmark set — here the first few documents.
    bench = docs.filter(F.col("doc_id") < 5).select("doc_id", "text")
    clean = dc.drop_contaminated(deduped, bench, n=5)

    # 5. Chunk to the training context window; shuffle-key the chunks
    #    for epoch 0 so readers get a reproducible random order.
    chunks = tx.chunk_windows(clean, "text", "doc_id", window_tokens=128, stride=96)
    chunks = chunks.withColumn(
        "chunk_key",
        F.concat_ws(":", F.col("doc_id"), F.col("chunk_id")),
    )
    ordered = sp.epoch_shuffle(chunks, "chunk_key", epoch=0, n_shards=8)

    # 6. Release: shard-partitioned parquet + manifest + provenance.
    release = ordered.join(
        clean.select("doc_id", "source"), "doc_id"
    ).select("doc_id", "chunk_id", "chunk_text", "shard", "pos", "source")
    manifest = sinks.write_training_shards(
        release,
        f"{out_dir}/shards",
        shard_col="source",
        provenance_path=f"{out_dir}/provenance.jsonl",
        sources=[sf_dir],
        date="2026-01-01",
    )

    n_chunks = release.count()
    print(json.dumps({
        "input_docs": n0,
        "after_quality": kept.count(),
        "after_exact_dedup": exact.count(),
        "after_near_dedup": deduped.count(),
        "after_decontamination": clean.count(),
        "chunks_released": n_chunks,
        "shards": manifest,
        "out_dir": out_dir,
    }, indent=2))

    spark.stop()
    if len(sys.argv) <= 2:
        shutil.rmtree(out_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
