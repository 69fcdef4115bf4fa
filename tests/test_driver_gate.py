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


def test_driver_gate_smoke(spark):
    n_pass, n_fail = run_gate(spark, "/root/testdata/sf0.001", SMOKE_QUERIES)
    assert n_fail == 0
    assert n_pass == len(SMOKE_QUERIES)
