"""Adversarial-data replay of the oracle gate.

The driver's correctness gate runs on generator-produced data whose
distributions are tame; a Spark-vs-DuckDB divergence in a regex class,
trim semantics, window tie-break, or interval boundary only surfaces
when a hostile value actually hits it. This tool regenerates ONE table
with adversarial data — the other nine copied verbatim from a real SF
dir — then runs the standard `run_gate` compare for every
oracle-paired query driven by that table.

Tiers:
- docs: documents with regex metacharacters, backslashes, quotes,
  mixed/exotic whitespace, accented letters, zero-length and
  whitespace-only docs, very long tokens, planted duplicates.
  r8 findings: Java-vs-RE2 `\\s` on \\x0b; trim-before-squeeze
  off-by-one; whitespace-only phantom chunk.
- events: timestamp TIES on (user_id, ts), gaps exactly at the
  30-minute session boundary and the 5-minute interval-join boundary,
  midnight/hour-edge timestamps, a hot user, NULL user_id/value rows,
  negative/zero/huge values, edge-case JSON props.

Deliberate scope bounds (documented, not bugs):
- Text stays in Latin-1-ish + controlled specials. Full unicode is
  out of scope: Java regex and RE2 genuinely differ on some unicode
  character classes, and ASCII transliteration is glibc-dependent
  (documented divergence in operators/unicode_udfs.py) — the shipped
  generator never emits those, so the gate contract doesn't cover
  them.
- Only the whitespace forms the shipped oracles already normalize
  (space, tab, newline, \x0b, \f, \r) are generated.
- No NaN/Inf doubles and no NULL ts (a real ingest filters those
  before analytics; the fixed6/decimal twins are not NaN-portable).

Usage: python tools/fuzz_gate.py [seed] [n_rows] [tier]
tier in {docs, events, lineitem, embeddings, all} (default docs);
n_rows 0 (or omitted) uses each tier's default size.
Exit 1 on any mismatched query, 2 on bad arguments.
"""

from __future__ import annotations

import random
import shutil
import sys
import tempfile
from datetime import datetime, timedelta
from pathlib import Path

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

BASE_SF = "/root/testdata/sf0.001"

# Documents-driven, oracle-paired queries exercising the text tier.
DOCS_QUERIES = {
    "docs_clean_text",
    "docs_paren_truncate",
    "docs_ordered_typos",
    "docs_token_explode",
    "docs_topical_filter",
    "docs_dict_anti_filter",
    "docs_ac_dict_filter",
    "docs_exact_dedup",
    "docs_quality",
    "docs_lang_id",
    "docs_token_stats",
    "docs_repetition",
    "docs_ngram_repetition",
    "docs_chunk_windows",
    "docs_chunked",
    "docs_length_histogram",
    "docs_contiguous_ids",
    "docs_hash_sample",
    "docs_gopher_quality",
    "docs_c4_filter",
    "docs_pii_redact",
    "docs_source_report",
    "docs_source_report_counts",
    "docs_stratified_sample",
    "docs_weighted_sample",
    "docs_bpe_pair_counts",
    # token-pipeline / dedup / sketch tier (heavier, same exposure)
    "docs_tfidf_topk",
    "docs_bm25_search",
    "docs_lm_score",
    "docs_source_entropy",
    "docs_source_divergence",
    "docs_vocab_sketch",
    "docs_ngram_jaccard_pairs",
    "docs_minhash_lsh_pairs",
    "docs_simhash_pairs",
    "docs_near_dedup_survivors",
    "docs_duplicate_spans",
    "docs_containment_pairs",
    "docs_bigram_pmi",
    "docs_ngram_novelty",
    "docs_dsir_weights",
    "docs_decontaminate",
    "docs_decontaminate_bloom",
    "docs_ccnet_buckets",
    "docs_temperature_mixture",
    "docs_mixture_sample",
    "docs_pack_sequences",
    "docs_epoch_shuffle",
    "docs_quality_ensemble",
}

LINEITEM_QUERIES = {
    "pricing_summary",
    "revenue_by_nation",
    "local_supplier_volume",
    "order_priority_counts",
    "topk_mean_supplier",
    "lineitem_qty_range_join",
    "pricing_rollup",
    "lineitem_price_percentiles",
    "lineitem_price_percentiles_approx",
    "lineitem_winsorized",
    "lineitem_corr_stats",
}

EMB_QUERIES = {
    "emb_array_ops",
    "emb_quantize_int8",
    "emb_cosine_topk",
    "emb_knn_classify",
    "emb_near_dup_exact",
    "emb_lsh_near_dup",
    "emb_lsh_topk",
    "emb_ivf_topk",
    "emb_kmeans_assign",
    "emb_dim_stats",
    "emb_semantic_dedup",
    "emb_pq_adc_topk",
    "emb_ivfpq_topk",
    "emb_ivfpq_recall",
    "emb_pq_encode",
    "emb_lsh_recall",
}

EVENTS_QUERIES = {
    "events_interval_join",
    "events_hourly",
    "events_sessionize",
    "events_hourly_gap_filled",
    "events_session_windows",
    "events_json_extract",
    "events_moving_avg",
    "events_asof_join",
    "events_pagerank",
    "events_top_paths",
    "events_cube",
    "events_value_anomaly",
    "events_key_skew_report",
    "events_funnel",
    "events_retention",
}

WORDS = [
    "alpha", "beta", "Gamma", "DELTA", "métro", "naïve", "café",
    "a.b", "a*b", "(x)", "[y]", "{z}", "x|y", "x+y", "x?y", "x^y",
    "end$", "\\n", "\\\\", "100%", "_under_", "semi;colon",
    "it's", 'quo"te', "tab\tinside", "comma,sep", "5'-utr", "β",
    "Æon", "ØRSTED", "ß", "ÿ", "the", "of", "and", "is", "was",
    "diabetes", "metformin", "aspirin", "mitochondria",
    # terms the topical-filter / BM25 queries actually match, so the
    # fuzz exercises their positive paths too (they were 0-row before)
    "scan", "merge", "window", "stream", "hash", "join", "sort",
]
WS = [" ", "  ", "\t", "\n", "\x0b", "\f", "\r", " \t ", "\n\n"]
PARENS = ["(note)", "(a(b)c)", "(unclosed", "closed)", "()", "( )"]


def make_text(rng: random.Random) -> str:
    kind = rng.random()
    if kind < 0.03:
        return ""
    if kind < 0.06:
        return rng.choice(WS) * rng.randint(1, 4)
    if kind < 0.09:
        return rng.choice(WORDS) * rng.randint(30, 120)  # one huge token
    n = rng.randint(1, 60)
    parts = []
    for _ in range(n):
        parts.append(rng.choice(WORDS))
        if rng.random() < 0.12:
            parts.append(rng.choice(PARENS))
        parts.append(rng.choice(WS) if rng.random() < 0.3 else " ")
    txt = "".join(parts)
    if rng.random() < 0.2:
        txt = rng.choice(WS) + txt + rng.choice(WS)  # leading/trailing ws
    return txt


def make_documents(rng: random.Random, n: int):
    import pyarrow as pa

    # the REAL source domain is src0..src19 (the mixture/temperature
    # queries target specific src names — web/books/etc matched none)
    sources = [f"src{i}" for i in range(20)]
    langs = ["en", "fr", "de", "xx"]
    rows = []
    for i in range(n):
        rows.append((i, make_text(rng), rng.choice(langs), rng.choice(sources)))
    # a few exact duplicates for the dedup queries
    for i in range(n, n + max(1, n // 20)):
        rows.append(
            (i, rows[rng.randrange(n)][1], rng.choice(langs), rng.choice(sources))
        )
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )


EVENT_TYPES = ["signup", "view", "click", "purchase", "error"]
PROPS = [
    '{"k": 0}', '{"k": 1}', '{"k": -7}', '{"k": 12345678901}',
    '{"k": 3, "j": "x"}', '{"j": 1}', "{}", '{"k": null}',
]


def make_events(rng: random.Random, n: int):
    """Adversarial events: exact timestamp ties per user, gaps landing
    EXACTLY on the 30-min sessionize and 5-min interval-join
    boundaries, midnight/hour-edge timestamps, a hot user, sparse NULL
    user_id/value rows, negative/zero/huge values."""
    import pyarrow as pa

    base = datetime(2024, 1, 1, 0, 0, 0)
    users = list(range(1, 21))
    cur: dict[int, datetime] = {}
    rows = []
    for i in range(n):
        r = rng.random()
        # the hot user takes ~25% of all rows (skew-report stress)
        u = 1 if r < 0.25 else rng.choice(users)
        if rng.random() < 0.02:
            u = None  # NULL key rows
        prev = cur.get(u if u is not None else -1, base)
        g = rng.random()
        if g < 0.10:
            step = timedelta(0)  # exact tie with previous event
        elif g < 0.20:
            step = timedelta(minutes=30)  # exactly the session gap
        elif g < 0.26:
            step = timedelta(minutes=5)  # exactly the interval bound
        elif g < 0.32:
            # land exactly on the next hour edge
            nxt = (prev + timedelta(hours=1)).replace(
                minute=0, second=0, microsecond=0
            )
            step = nxt - prev
        elif g < 0.36:
            # land exactly on the next midnight (retention day edge)
            nxt = (prev + timedelta(days=1)).replace(
                hour=0, minute=0, second=0, microsecond=0
            )
            step = nxt - prev
        else:
            step = timedelta(seconds=rng.randint(1, 4000),
                             microseconds=rng.randint(0, 999999))
        ts = prev + step
        cur[u if u is not None else -1] = ts
        v = rng.random()
        if v < 0.05:
            value = None
        elif v < 0.12:
            value = 0.0
        elif v < 0.2:
            value = -rng.randint(1, 500) / 100.0
        elif v < 0.25:
            value = 1e9 + rng.randint(0, 999) / 7.0
        else:
            value = rng.randint(0, 30000) / 100.0
        rows.append(
            (i, ts, u, rng.choice(EVENT_TYPES), value, rng.choice(PROPS))
        )
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )


def make_lineitem(rng: random.Random, n: int):
    """Adversarial lineitem: heavy exact TIES in quantity and price
    (percentile interpolation between equal values, winsorize cut
    points, top-k mean tie-breaks), zero quantities/prices/discounts,
    ship dates exactly AT the pricing-summary cutoff midnight, and
    foreign keys sampled from the REAL sibling tables so the join
    queries still match rows. Money stays 2-decimal — TPC-H money is
    2-decimal BY CONTRACT, and the decimal-cast convention for
    arbitrary doubles is exercised by the events tier instead."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def keys(table: str, col: str) -> list[int]:
        return (
            pq.read_table(f"{BASE_SF}/{table}.parquet", columns=[col])
            .column(col)
            .to_pylist()
        )

    okeys = keys("orders", "o_orderkey")
    pkeys = keys("part", "p_partkey")
    skeys = keys("supplier", "s_suppkey")
    cutoff = datetime(1998, 9, 2)  # TPC-H Q1 boundary
    rows = []
    for i in range(n):
        q = rng.random()
        if q < 0.3:
            qty = 25.0  # the tie block
        elif q < 0.36:
            qty = 0.0
        else:
            qty = rng.randint(1, 50) * 1.0
        p = rng.random()
        if p < 0.3:
            price = 10000.00  # tie block
        elif p < 0.35:
            price = 0.0
        else:
            price = rng.randint(100, 9999999) / 100.0
        d = rng.random()
        if d < 0.4:
            ship = cutoff  # exactly at the cutoff midnight
        elif d < 0.5:
            ship = cutoff + timedelta(days=rng.choice([-1, 1]))
        else:
            ship = datetime(1995, 1, 1) + timedelta(
                days=rng.randint(0, 2000), seconds=rng.randint(0, 86399)
            )
        rows.append(
            (
                rng.choice(okeys),
                rng.choice(pkeys),
                rng.choice(skeys),
                rng.randint(1, 7),
                qty,
                price,
                rng.choice([0.0, 0.0, 0.01, 0.05, 0.1]),
                rng.choice([0.0, 0.02, 0.08]),
                rng.choice(["A", "N", "R"]),
                rng.choice(["F", "O"]),
                ship,
            )
        )
    cols = list(zip(*rows))
    return pa.table(
        {
            "l_orderkey": pa.array(cols[0], pa.int64()),
            "l_partkey": pa.array(cols[1], pa.int64()),
            "l_suppkey": pa.array(cols[2], pa.int64()),
            "l_linenumber": pa.array(cols[3], pa.int32()),
            "l_quantity": pa.array(cols[4], pa.float64()),
            "l_extendedprice": pa.array(cols[5], pa.float64()),
            "l_discount": pa.array(cols[6], pa.float64()),
            "l_tax": pa.array(cols[7], pa.float64()),
            "l_returnflag": pa.array(cols[8], pa.string()),
            "l_linestatus": pa.array(cols[9], pa.string()),
            "l_shipdate": pa.array(cols[10], pa.timestamp("us")),
        }
    )


def make_embeddings(rng: random.Random, n: int):
    """Adversarial embeddings (float32, dim 64): EXACT duplicate
    clusters (cosine/ADC ties resolved only by the explicit id
    tie-break), a zero vector (norm guard), negated copies (cosine
    -1), a huge-magnitude vector, and sparse NULL labels (null-safe
    kNN vote). Exact ties are portable — both engines see bit-equal
    scores and the (score, id) ordering decides; NEAR-ties (the ulp
    canary's subject) are not generated."""
    import numpy as np
    import pyarrow as pa

    dim = 64
    rng_np = np.random.RandomState(rng.randint(0, 2**31 - 1))
    base = rng_np.randn(n, dim).astype(np.float32)
    # duplicate cluster: ids 2..11 share id 2's vector
    for i in range(3, 12):
        base[i] = base[2]
    base[1] = 0.0  # zero vector in the corpus
    base[13] = -base[2]  # exact negation
    # Huge magnitude, same direction. 300 is extreme for an embedding
    # but inside the kmeans long-grid input contract (clustering.py
    # _int_dot: dim 64 -> max|x| ~ 380); magnitude 1e6 correctly makes
    # the grid fold fail LOUDLY with ANSI long overflow (and exposed
    # the fixed6 floor->long saturation, fixed in functions/numeric).
    base[14] = base[2] * np.float32(300.0)
    # make one QUERY row (vec_id 100) a member of the duplicate cluster
    if n > 100:
        base[100] = base[2]
    labels = []
    for i in range(n):
        labels.append(None if rng.random() < 0.05 else rng.randint(0, 4))
    return pa.table(
        {
            "vec_id": pa.array(list(range(n)), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in row] for row in base],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )


# tier -> (table, builder, queries, default_n)
TIERS = {
    "docs": ("documents", make_documents, DOCS_QUERIES, 1500),
    "events": ("events", make_events, EVENTS_QUERIES, 1500),
    "lineitem": ("lineitem", make_lineitem, LINEITEM_QUERIES, 3000),
    "embeddings": ("embeddings", make_embeddings, EMB_QUERIES, 600),
}


def run_tier(spark, rng: random.Random, tier: str, n: int) -> tuple[int, int]:
    import pyarrow.parquet as pq

    from verify_local import TABLES, run_gate

    table, builder, queries, _n0 = TIERS[tier]
    tmp = Path(tempfile.mkdtemp(prefix=f"fuzz_gate_{tier}_"))
    try:
        for t in TABLES:
            if t != table:
                shutil.copy(f"{BASE_SF}/{t}.parquet", tmp / f"{t}.parquet")
        pq.write_table(builder(rng, n), tmp / f"{table}.parquet")
        return run_gate(spark, str(tmp), queries)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 0  # 0 = per-tier default
    tier = sys.argv[3] if len(sys.argv) > 3 else "docs"
    tiers = list(TIERS) if tier == "all" else [tier]
    if any(t not in TIERS for t in tiers):
        print(f"unknown tier {tier!r}; choose from {sorted(TIERS)} or 'all'")
        return 2

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .appName("fuzz_gate")
        .getOrCreate()
    )
    rc = 0
    for t in tiers:
        nt = n or TIERS[t][3]
        n_pass, n_fail = run_tier(spark, random.Random(seed), t, nt)
        print(f"fuzz_gate tier={t} seed={seed} n={nt}: "
              f"{n_pass} passed, {n_fail} failed")
        rc = rc or (1 if n_fail else 0)
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
