"""Fuzzy (edit-distance) joins via lossless prefix-filtered q-gram
blocking (Ed-Join-style; Xiao, Wang & Lin, VLDB 2008).

Entity resolution for corpus pipelines: author/supplier/domain name
canonicalization, near-identical URL variants, OCR'd titles. The
naive formulation — ``a JOIN b ON levenshtein(a, b) <= k`` — is a
cartesian product; the scale shape is BLOCK (candidate pairs from
shared character q-grams, an equi-join) then VERIFY (exact
levenshtein on candidates only).

Why the block is lossless (result equals the cartesian answer):

- One edit changes at most q consecutive gram positions, so a string
  within edit distance k of another loses at most q*k DISTINCT gram
  values: |G(a) ∩ G(b)| >= max(|G(a)|, |G(b)|) - q*k.
- Prefix-filter lemma: fix ANY global total order on grams; if two
  sets must overlap by >= t elements, their first (|G| - t + 1)
  grams in that order must already share one. With
  t = max(|Ga|,|Gb|) - q*k, a fixed prefix length of q*k + 1 is
  always >= the required length — so candidates = pairs sharing a
  PREFIX gram are a superset of all true pairs. The order used here
  is ascending global gram frequency (rarest first), which makes
  prefixes maximally selective: strings sharing only boilerplate
  (a constant "Supplier#000000" prefix, a shared URL domain) stop
  generating candidates because boilerplate grams are frequent and
  never make the prefix.
- The lemma needs t >= 1. Two bounded fallback buckets catch the
  stragglers exactly: strings SHORTER than q + k + 1 chars (an edit
  can erase all gram sharing; their distinct values are
  alphabet-bounded) and LOW-GRAM strings with <= 2*q*k distinct
  grams (highly repetitive, e.g. "ababab"; a <=q*k-gram string's
  partner has <= 2*q*k grams, so pairing everything under 2*q*k
  covers the vacuous-t cases). Both pair via a constant-key
  broadcast join — equi-joins, not cartesians — and the final
  distinct() dedupes against the gram path.

The candidate join carries only (id, length) — the dedup shuffle is
two longs wide — and strings re-attach by id for the verify, which is
whole-stage codegen (`levenshtein` is a JVM builtin). No Python
anywhere.

Beyond-reference surface: the reference's joins are exact-key only
(`join -t$'\\t'` in scripts/merge_filter.sh); its typo handling is a
hand-ordered substitution list (finalize_realease.py), covered by P17.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_qgrams(col: Column, q: int = 2) -> Column:
    """Distinct character q-grams of a string as an array — pure
    Catalyst (sequence + transform + substring)."""
    n = F.length(col)
    idx = F.sequence(F.lit(1), F.greatest(n - (q - 1), F.lit(0)))
    return F.array_distinct(
        F.when(n >= q, F.transform(idx, lambda i: F.substring(col, i, q)))
        .otherwise(F.array().cast("array<string>"))
    )


def _side(df: DataFrame, id_col: str, text_col: str, tag: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"id_{tag}"),
        F.col(text_col).alias(f"s_{tag}"),
    ).where(F.col(f"s_{tag}").isNotNull())


def _prefix_grams(side: DataFrame, tag: str, q: int, prefix_len: int,
                  gram_freq: DataFrame, min_safe: int) -> DataFrame:
    """(id, len, _g) for the `prefix_len` globally-rarest grams of
    each string of length >= min_safe. groupBy + array_sort + slice
    (partial-aggregating; no global window)."""
    sid, ss = f"id_{tag}", f"s_{tag}"
    exploded = (
        side.where(F.length(ss) >= min_safe)
        .select(sid, F.length(ss).alias("_len"),
                F.explode(char_qgrams(F.col(ss), q)).alias("_g"))
        .join(gram_freq, "_g")
    )
    return (
        exploded.groupBy(sid, "_len")
        .agg(F.collect_list(F.struct("_freq", "_g")).alias("_gs"))
        .select(
            sid, "_len",
            F.explode(
                F.slice(F.array_sort("_gs"), 1, prefix_len)
            ).alias("_fg"),
        )
        .select(sid, "_len", F.col("_fg._g").alias("_g"))
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_col: str,
    right_col: str,
    max_edit: int = 1,
    q: int = 2,
    candidate_filter: Column | None = None,
) -> DataFrame:
    """All (id_a, id_b, dist) pairs with
    ``levenshtein(left_col, right_col) <= max_edit`` — prefix-filtered
    q-gram blocking + exact verify, equal to the cartesian answer.

    `candidate_filter` (on id_a/id_b) prunes candidates before the
    dedup — the self-join passes ``id_a < id_b`` so each unordered
    pair blocks and verifies once.
    """
    if max_edit < 0:
        raise ValueError("max_edit must be >= 0")
    if q < 1:
        raise ValueError("q must be >= 1")
    L = _side(left, left_id, left_col, "a")
    R = _side(right, right_id, right_col, "b")
    min_safe = q + max_edit + 1
    prefix_len = q * max_edit + 1
    low_gram_cap = 2 * q * max_edit

    # One consistent global gram order for BOTH sides: ascending
    # document frequency over the union, ties by gram value.
    all_grams = L.select(F.explode(char_qgrams(F.col("s_a"), q)).alias("_g")).unionAll(
        R.select(F.explode(char_qgrams(F.col("s_b"), q)).alias("_g"))
    )
    gram_freq = all_grams.groupBy("_g").agg(F.count("*").alias("_freq"))

    band = F.abs(F.col("_len_a") - F.col("_len_b")) <= max_edit
    ga = _prefix_grams(L, "a", q, prefix_len, gram_freq, min_safe).withColumnRenamed(
        "_len", "_len_a"
    )
    gb = _prefix_grams(R, "b", q, prefix_len, gram_freq, min_safe).withColumnRenamed(
        "_len", "_len_b"
    )
    cand_long = ga.join(gb, "_g").where(band).select("id_a", "id_b")

    # Fallback buckets (see module docstring). Pure-id output; the
    # length band applies inside, lengths recomputed from the strings.
    def bucket(side: DataFrame, tag: str, cond: Column) -> DataFrame:
        ss = f"s_{tag}"
        return (
            side.where(cond)
            .select(f"id_{tag}", F.length(ss).alias(f"_len_{tag}"))
            .withColumn("_k", F.lit(1))
        )

    short_cap = min_safe + max_edit - 1
    cand_short = (
        bucket(L, "a", F.length("s_a") <= short_cap)
        .join(F.broadcast(bucket(R, "b", F.length("s_b") <= short_cap)), "_k")
        .where(band)
        .select("id_a", "id_b")
    )
    low = (
        bucket(L, "a", F.size(char_qgrams(F.col("s_a"), q)) <= low_gram_cap)
        .join(
            F.broadcast(
                bucket(R, "b", F.size(char_qgrams(F.col("s_b"), q)) <= low_gram_cap)
            ),
            "_k",
        )
        .where(band)
        .select("id_a", "id_b")
    )

    cands = cand_long.unionByName(cand_short).unionByName(low)
    if candidate_filter is not None:
        cands = cands.where(candidate_filter)
    cands = cands.distinct()

    # Re-attach strings by id and verify exactly, in codegen.
    return (
        cands.join(L, "id_a")
        .join(R, "id_b")
        .where(F.levenshtein("s_a", "s_b") <= F.lit(max_edit))
        .select("id_a", "id_b", F.levenshtein("s_a", "s_b").alias("dist"))
    )


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_edit: int = 1,
    q: int = 2,
) -> DataFrame:
    """Unordered within-table fuzzy pairs (id_a < id_b) — the
    entity-resolution self-join. Each unordered pair blocks and
    verifies once (order filter applied before the candidate dedup)."""
    return fuzzy_join(
        df, df, id_col, id_col, text_col, text_col, max_edit=max_edit, q=q,
        candidate_filter=F.col("id_a") < F.col("id_b"),
    )
