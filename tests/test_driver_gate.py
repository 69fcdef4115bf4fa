"""In-repo smoke of the driver's correctness gate (VERDICT r01 item 9).

Runs a representative 10-query slice of tools/verify_local.py against
the shared test SparkSession at sf0.001, so a query/oracle drift (the
round-1 stale-artifact situation) fails `pytest tests/` instead of
surfacing only at the next driver round.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from verify_local import run_gate  # noqa: E402

SMOKE_QUERIES = {
    "pricing_summary",          # relational spine
    "order_rollup_per_customer",
    "window_order_stats",       # window functions
    "events_sessionize",        # gap/session semantics
    "events_asof_join",         # as-of join
    "docs_clean_text",          # text operators
    "docs_exact_dedup",         # dedup tier
    "docs_minhash_lsh_pairs",   # LSH tier (portable hash)
    "emb_lsh_near_dup",         # embedding LSH + Arrow parity
    "emb_ivf_topk",             # pinned-centroid IVF oracle
    "docs_gopher_quality",      # quality battery (round 2)
    "emb_semantic_dedup",       # SemDeDup cells (round 2)
    "flagship_training_corpus", # composed pipeline (round 2)
}


def test_driver_sample_covers_llm_tier():
    """The driver's hard gate samples the FIRST 50 entries of queries()
    in dict order (VERDICT r04 ask #1). Pin that the curated export
    order puts the flagships and every LLM-tier family inside that
    window, and that the reorder lost nothing."""
    import __spark_entry__ as entry_mod
    from aurora_mito_etl_spark.plans.queries import (
        DRIVER_SAMPLE_PRIORITY,
        ORACLES,
        QUERIES,
    )

    names = list(entry_mod.queries())
    first50 = set(names[:50])
    assert list(QUERIES)[:50] == names[:50]
    # Exactly the curated head, in the curated order.
    assert names[: len(DRIVER_SAMPLE_PRIORITY)] == list(DRIVER_SAMPLE_PRIORITY)
    must_sample = {
        # Pinned every round (window rule, CLAUDE.md)
        "flagship_training_corpus",
        "flagship_compound_mentions",
        "docs_classify_stub",
        "docs_media_features",
        "events_pagerank",
        # round-9 rotation (VERDICT r8 ask #1): the eleven queries with
        # no driver-gate row through r8 — three long-deferred veterans
        # plus the late-r8 batch. Evicted: docs_gopher_quality,
        # docs_incremental_near_dup, emb_semantic_dedup (all green
        # r5-r8), docs_source_report_quality (green r7-r8, non-integer
        # control), and seven single-round r8 greens whose families
        # stay represented (emb_ivfpq_recall, emb_knn_classify,
        # docs_bpe_pair_counts, orders_except_intersect_all,
        # docs_dedup_lines, docs_ngram_repetition,
        # docs_strip_boilerplate).
        "docs_contiguous_ids",
        "docs_length_histogram",
        "emb_dim_stats",
        "docs_length_ks",
        "docs_mmr_rerank",
        "docs_zipf_slope",
        "emb_hard_positives",
        "events_k_anonymity",
        "events_psi_drift",
        "events_type_hour_chi2",
        # lineitem_profile rotated OUT mid-r10 after driver-green r9
        # (profile family stays via events_profile, the NULL-bearing
        # rep); slot to the r10-new docs_dup_triangles.
        "docs_dup_triangles",
        # NEW r9 operator: exact substring-duplication spans (slot
        # freed by docs_ngram_novelty, driver-green r8; n-gram family
        # stays via docs_ngram_diversity + docs_source_overlap)
        "docs_exact_substring_spans",
        # quality tier rep (aggregates the gopher/c4/lm verdict frame)
        "docs_quality_funnel",
        # BIGINT-cast fix control (the _counts sibling rotated OUT
        # after driver-green r8+r9 — bisection settled)
        "docs_source_report",
        # NEW r9 operator pair: bit-portable PCA (slots freed by
        # emb_ivfpq_topk and events_top_paths, both driver-green r8;
        # IVF-PQ stays via emb_ivfpq_rerank, events keeps seven reps)
        "emb_pca_cov",
        "emb_pca_pc1",
        # r10 rotation (VERDICT r9 ask #1): the six late-r9 queries
        # with no driver-gate row ever. Evicted (driver-green r8+r9,
        # families staying represented): docs_source_report_counts,
        # docs_bpe_subwords, docs_chunked, customer_order_full_outer,
        # docs_source_divergence, emb_hard_negatives.
        "emb_pca_project2",
        "emb_whitened_norm",
        "emb_cov_drift",
        "docs_label_spread",
        "events_hits",
        "shipping_priority_topk",
        # round-8 rotation members riding further rounds
        # (events_key_skew_report rotated OUT mid-r10 after driver-
        # green r8+r9; slot to the r10-new lineitem_price_moments)
        "events_value_anomaly",
        "lineitem_price_moments",
        "docs_temperature_mixture",
        "docs_ac_dict_filter",
        # docs_boilerplate_lines rotated OUT mid-r10 after driver-
        # green r8+r9; slot to events_funnel_windowed.
        "events_funnel_windowed",
        "lineitem_price_percentiles",
        "release_sink_smoke",
        "docs_bpe_train",
        "docs_dedup_lines_global",
        # docs_heavy_hitters rotated OUT mid-r10 after driver-green
        # r8+r9 (sketch family stays via docs_cms_estimates); slot to
        # the r10-new docs_char_entropy.
        "docs_char_entropy",
        "events_profile",
        # docs_winnow_fingerprints rotated OUT mid-r10 after driver-
        # green r8+r9; slot to emb_benchmark_decontam.
        "emb_benchmark_decontam",
        "docs_cms_estimates",
        "emb_ivfpq_rerank",
        # docs_ngram_diversity rotated OUT mid-r10 after driver-green
        # r8+r9 (ngram family stays via docs_source_overlap); slot to
        # emb_jl_project.
        "emb_jl_project",
        # docs_tokenizer_fertility rotated OUT mid-r10 after driver-
        # green r8+r9 (BPE family stays via docs_bpe_train); slot to
        # docs_dup_kcore.
        "docs_dup_kcore",
        "docs_line_language",
        "docs_split_leakage",
        "docs_source_overlap",
        "events_rfm",
        # emb_dim_truncation_recall rotated OUT mid-r10 after driver-
        # green r8+r9 (the truncated-ranking kernel stays via
        # emb_rbo_overlap); slot to emb_jl_distortion.
        "emb_jl_distortion",
        # docs_ql_search rotated OUT mid-r10 after driver-green r8+r9
        # (the QL chain stays via docs_rrf_fusion's composition);
        # slot to the r10-new emb_rbo_overlap.
        "docs_rrf_fusion",
        "emb_rbo_overlap",
    }
    assert must_sample <= first50
    # The reorder is a permutation: nothing dropped, oracles intact.
    assert len(names) == len(set(names)) >= 91
    assert set(ORACLES) <= set(QUERIES)
    assert all(n in QUERIES for n in DRIVER_SAMPLE_PRIORITY)


def test_driver_gate_smoke(spark):
    n_pass, n_fail = run_gate(spark, "/root/testdata/sf0.001", SMOKE_QUERIES)
    assert n_fail == 0
    assert n_pass == len(SMOKE_QUERIES)


def test_release_sink_smoke_from_external_cwd(spark, tmp_path, monkeypatch):
    """K1-K4 e2e through the registered query, from a cwd that is not
    the repo root — the way the driver invokes everything."""
    monkeypatch.chdir(tmp_path)
    from aurora_mito_etl_spark.plans.queries import QUERIES

    rows = QUERIES["release_sink_smoke"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 25
    assert all(r["sha_ok"] for r in rows)          # provenance sha256 verifies
    assert all(r["prov_records"] == 1 for r in rows)
    assert rows[0]["link"].startswith("https://pubmed.ncbi.nlm.nih.gov/")
    assert all(r["excel_ok"] for r in rows)  # to_excel ran iff openpyxl exists


def test_all_query_outputs_are_scalar_and_no_cartesian(spark):
    """Two whole-registry invariants in one plan-build pass (analysis
    only for every query EXCEPT release_sink_smoke, whose builder by
    design executes its release pipeline into a temp dir and returns
    the read-back verification rows — building it here runs that
    pipeline once):

    1. No registered query returns Array/Struct/Map columns — the
       driver canonicalizer pandas-sorts every output column and
       cannot hash python lists (the invariant emb_quantize_int8's
       docstring cites).
    2. No physical plan contains a CartesianProduct — the one join
       shape that can never survive scale. (BroadcastNestedLoopJoin
       from single-row aggregate cross-joins is allowed; see
       tools/plan_audit.py for the full per-query posture table.)
    """
    import sys as _sys
    from pathlib import Path as _Path

    from pyspark.sql import types as T

    from aurora_mito_etl_spark.plans.queries import QUERIES

    _sys.path.insert(0, str(_Path(__file__).resolve().parents[1] / "tools"))
    from plan_audit import audit_one, formatted_plan

    bad = []
    for name, fn in QUERIES.items():
        df = fn(spark, "/root/testdata/sf0.001")
        for field in df.schema.fields:
            if isinstance(field.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
        if audit_one(formatted_plan(df))["cartesian"]:
            bad.append(f"{name}: CartesianProduct in physical plan")
    assert not bad, f"registry invariant violations: {bad}"
