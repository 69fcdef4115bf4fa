"""One pinned seed of the adversarial-text oracle replay.

tools/fuzz_gate.py regenerates the documents table with hostile text
(regex metacharacters, exotic whitespace, empty/whitespace-only docs,
huge tokens, planted duplicates) and re-runs the standard DuckDB
compare for the documents-driven queries. Seed 8 found two real
engine divergences in r8 (Java-vs-RE2 `\\s` on \\x0b in TOKEN_RE;
phantom chunk for whitespace-only docs in docs_chunked) that the
shipped generator's tame text could never expose. This test pins one
seed so those stay fixed; run the tool directly for more seeds.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import fuzz_gate  # noqa: E402
from verify_local import TABLES, run_gate  # noqa: E402


def test_fuzz_gate_seed8(spark, tmp_path):
    import random
    import shutil

    import pyarrow.parquet as pq

    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{fuzz_gate.BASE_SF}/{t}.parquet", tmp_path / f"{t}.parquet")
    pq.write_table(
        fuzz_gate.make_documents(random.Random(8), 200),
        tmp_path / "documents.parquet",
    )

    # the light tier only — the full 49-query set is the tool's job
    light = {
        "docs_token_stats",
        "docs_chunked",
        "docs_clean_text",
        "docs_quality",
        "docs_exact_dedup",
        "docs_token_explode",
        "docs_paren_truncate",
        "docs_length_histogram",
        "docs_source_report_counts",
        "docs_bpe_pair_counts",
    }
    assert light <= fuzz_gate.DOCS_QUERIES
    n_pass, n_fail = run_gate(spark, str(tmp_path), light)
    assert n_fail == 0
    assert n_pass == len(light)


def test_fuzz_gate_events_seed8(spark, tmp_path):
    """Events tier pin: timestamp ties, session/interval boundary
    gaps, NULL keys/values, negative and >6-decimal doubles. Seed 8
    found the asof NULL-key match and the raw double->decimal casts
    in r8 — this keeps both fixed."""
    import random
    import shutil

    import pyarrow.parquet as pq

    for t in TABLES:
        if t != "events":
            shutil.copy(f"{fuzz_gate.BASE_SF}/{t}.parquet", tmp_path / f"{t}.parquet")
    pq.write_table(
        fuzz_gate.make_events(random.Random(8), 800), tmp_path / "events.parquet"
    )
    light = {
        "events_asof_join",
        "events_hourly",
        "events_moving_avg",
        "events_cube",
        "events_sessionize",
        "events_interval_join",
        "events_retention",
        "events_json_extract",
    }
    assert light <= fuzz_gate.EVENTS_QUERIES
    n_pass, n_fail = run_gate(spark, str(tmp_path), light)
    assert n_fail == 0
    assert n_pass == len(light)


def test_fuzz_gate_lineitem_seed8(spark, tmp_path):
    """Lineitem tier pin: heavy exact ties in quantity/price
    (percentile interpolation, winsorize cuts, top-k means), zero
    values, ship dates exactly at the pricing cutoff midnight,
    real foreign keys."""
    import random
    import shutil

    import pyarrow.parquet as pq

    for t in TABLES:
        if t != "lineitem":
            shutil.copy(f"{fuzz_gate.BASE_SF}/{t}.parquet", tmp_path / f"{t}.parquet")
    pq.write_table(
        fuzz_gate.make_lineitem(random.Random(8), 1500), tmp_path / "lineitem.parquet"
    )
    light = {
        "pricing_summary",
        "lineitem_price_percentiles",
        "lineitem_winsorized",
        "lineitem_corr_stats",
        "topk_mean_supplier",
        "pricing_rollup",
    }
    assert light <= fuzz_gate.LINEITEM_QUERIES
    n_pass, n_fail = run_gate(spark, str(tmp_path), light)
    assert n_fail == 0
    assert n_pass == len(light)


def test_fuzz_gate_embeddings_seed8(spark, tmp_path):
    """Embeddings tier pin: exact duplicate clusters (cosine/ADC
    ties resolved only by the id tie-break), a zero vector, negated
    copies, a magnitude-300 vector (the fixed6 long-saturation repro
    class), NULL labels. Seed 8 found the fixed6 floor->long
    saturation in r8 — this keeps it fixed."""
    import random
    import shutil

    import pyarrow.parquet as pq

    for t in TABLES:
        if t != "embeddings":
            shutil.copy(f"{fuzz_gate.BASE_SF}/{t}.parquet", tmp_path / f"{t}.parquet")
    pq.write_table(
        fuzz_gate.make_embeddings(random.Random(8), 300),
        tmp_path / "embeddings.parquet",
    )
    light = {
        "emb_array_ops",
        "emb_cosine_topk",
        "emb_near_dup_exact",
        "emb_kmeans_assign",
        "emb_semantic_dedup",
        "emb_knn_classify",
        "emb_dim_stats",
    }
    assert light <= fuzz_gate.EMB_QUERIES
    n_pass, n_fail = run_gate(spark, str(tmp_path), light)
    assert n_fail == 0
    assert n_pass == len(light)


def test_fuzz_gate_relational_seed8(spark, tmp_path):
    """Relational tier pin: orders/customer/part/supplier regenerated
    together — money exactly AT bin edges and the 400k strict-> bound,
    constant-price blocks (segment-average boundary), NULL acctbals
    (explicit window NULL ordering), normalization-colliding part
    names with (norm, price) ties, edit-distance 0/1/2 supplier name
    clusters and short fallback-bucket strings, dangling custkeys.
    Seed 8 found the shingle-less-doc row loss in the bottom-k oracle
    and motivated the decimal segment average + explicit NULLS LAST
    quartile ordering in r8."""
    import random

    import pyarrow.parquet as pq

    import shutil

    built = fuzz_gate.make_relational(random.Random(8), 800)
    assert set(built) == {"orders", "customer", "part", "supplier", "region"}
    for t in TABLES:
        if t not in built:
            shutil.copy(f"{fuzz_gate.BASE_SF}/{t}.parquet", tmp_path / f"{t}.parquet")
    for t, tb in built.items():
        pq.write_table(tb, tmp_path / f"{t}.parquet")
    light = {
        "customer_balance_quartiles",
        "orders_above_segment_avg",
        "order_value_bins",
        "order_rollup_per_customer",
        "keep_first_order_per_customer",
        "part_normalize_dedup",
        "supplier_fuzzy_pairs",
        "scalar_function_parity",
        "window_order_stats",
        "two_tier_lookup",
    }
    assert light <= fuzz_gate.RELATIONAL_QUERIES
    n_pass, n_fail = run_gate(spark, str(tmp_path), light)
    assert n_fail == 0
    assert n_pass == len(light)
