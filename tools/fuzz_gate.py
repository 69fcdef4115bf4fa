"""Adversarial-text replay of the oracle gate.

The driver's correctness gate runs on generator-produced text whose
character distribution is tame; a Spark-vs-DuckDB divergence in a
regex class, trim semantics, or unicode case fold would only surface
when a nasty string actually hits it. This tool regenerates the
`documents` table with adversarial text — regex metacharacters,
backslashes, quotes, mixed/exotic whitespace, accented letters,
zero-length and whitespace-only docs, very long tokens — alongside
the other nine tables copied verbatim from a real SF dir, then runs
the standard `run_gate` compare for every documents-driven query that
has an oracle.

Deliberate scope bounds (documented, not bugs):
- Text stays in Latin-1-ish + controlled specials. Full unicode is
  out of scope: Java regex and RE2 genuinely differ on some unicode
  character classes, and ASCII transliteration is glibc-dependent
  (documented divergence in operators/unicode_udfs.py) — the shipped
  generator never emits those, so the gate contract doesn't cover
  them.
- Only the whitespace forms the shipped oracles already normalize
  (space, tab, newline, \x0b, \f, \r) are generated.

Usage: python tools/fuzz_gate.py [seed] [n_docs]
Exit 1 on any mismatched query.
"""

from __future__ import annotations

import random
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

BASE_SF = "/root/testdata/sf0.001"

# Documents-driven, oracle-paired queries exercising the text tier.
FUZZ_QUERIES = {
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

WORDS = [
    "alpha", "beta", "Gamma", "DELTA", "métro", "naïve", "café",
    "a.b", "a*b", "(x)", "[y]", "{z}", "x|y", "x+y", "x?y", "x^y",
    "end$", "\\n", "\\\\", "100%", "_under_", "semi;colon",
    "it's", 'quo"te', "tab\tinside", "comma,sep", "5'-utr", "β",
    "Æon", "ØRSTED", "ß", "ÿ", "the", "of", "and", "is", "was",
    "diabetes", "metformin", "aspirin", "mitochondria",
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


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import SparkSession

    from verify_local import TABLES, run_gate

    rng = random.Random(seed)
    rows = []
    sources = ["web", "books", "code", "wiki"]
    langs = ["en", "fr", "de", "xx"]
    for i in range(n_docs):
        t = make_text(rng)
        rows.append((i, t, rng.choice(langs), rng.choice(sources), len(t)))
    # a few exact duplicates for the dedup queries
    for i in range(n_docs, n_docs + 20):
        rows.append((i, rows[rng.randrange(n_docs)][1],
                     rng.choice(langs), rng.choice(sources), None))
    rows = [(i, t, lg, src, len(t)) for (i, t, lg, src, _x) in rows]

    tmp = Path(tempfile.mkdtemp(prefix="fuzz_gate_"))
    try:
        for t in TABLES:
            if t != "documents":
                shutil.copy(f"{BASE_SF}/{t}.parquet", tmp / f"{t}.parquet")
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        )
        pq.write_table(tbl, tmp / "documents.parquet")

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .appName("fuzz_gate")
            .getOrCreate()
        )
        n_pass, n_fail = run_gate(spark, str(tmp), FUZZ_QUERIES)
        print(f"fuzz_gate seed={seed} n_docs={len(rows)}: "
              f"{n_pass} passed, {n_fail} failed")
        spark.stop()
        return 1 if n_fail else 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
