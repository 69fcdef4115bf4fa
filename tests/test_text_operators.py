"""SURVEY §2.2 operator semantics, branch by branch.

Fixture rows mirror the reference's edge cases (FIXTURES.md): empty
abstract, '['-prefixed title, year<2000, HTML tags, zero-width chars,
unmatched parens, ordered typo substitution.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aurora_mito_etl_spark.operators import text as tx


def _one(spark, value: str, expr) -> str | None:
    df = spark.createDataFrame([(value,)], "s string")
    return df.select(expr(F.col("s")).alias("v")).collect()[0]["v"]


def test_squeeze_ws(spark):
    assert _one(spark, "  a \t b\n\nc ", tx.squeeze_ws) == "a b c"


def test_strip_inline_tags(spark):
    assert (
        _one(spark, "x <sup>2</sup> and <i>term</i><br/>", tx.strip_inline_tags)
        == "x 2 and term"
    )
    # non-listed tags survive (reference strips a fixed list)
    assert _one(spark, "<table>x</table>", tx.strip_inline_tags) == "<table>x</table>"


def test_scrub_special_chars(spark):
    s = "a b​c\x01d\x7fe"
    assert _one(spark, s, tx.scrub_special_chars) == "a bcde"


def test_canonicalize_dashes(spark):
    assert _one(spark, "a–b—c−d", tx.canonicalize_dashes) == "a-b-c-d"


def test_fix_title_terminator(spark):
    assert _one(spark, "Title", tx.fix_title_terminator) == "Title."
    assert _one(spark, "Title.", tx.fix_title_terminator) == "Title."


def test_truncate_at_unmatched_paren(spark):
    assert _one(spark, "metformin (unclosed", tx.truncate_at_unmatched_paren) == "metformin"
    assert (
        _one(spark, "metformin (closed)", tx.truncate_at_unmatched_paren)
        == "metformin (closed)"
    )
    assert _one(spark, "plain", tx.truncate_at_unmatched_paren) == "plain"


def test_ordered_substitutions_order_matters(spark):
    # 'analogs'→'' must run before 'analog'→'' (reference typos.txt order)
    pairs = [("analogs", ""), ("analog", "")]
    assert _one(
        spark, "drug analogs analog", lambda c: tx.apply_ordered_substitutions(c, pairs)
    ) == "drug  "
    # reversed order leaves a dangling 's'
    rev = [("analog", ""), ("analogs", "")]
    assert _one(
        spark, "drug analogs", lambda c: tx.apply_ordered_substitutions(c, rev)
    ) == "drug s"


def test_extract_year(spark):
    df = spark.createDataFrame(
        [("published 1999-01",), ("2024 Jan",), ("no year",), ("1899",)], "s string"
    )
    got = [r["y"] for r in df.select(tx.extract_year(F.col("s")).alias("y")).collect()]
    assert got == [1999, 2024, None, None]


def test_topical_filter(spark):
    df = spark.createDataFrame(
        [
            ("Rotenone INHIBITS mitochondrial complex I",),  # verb+topic → keep
            ("inhibition without any topic",),  # verb only → drop
            ("complex I discussed, nothing inhibited... wait it is",),
            ("unrelated text",),
        ],
        "s string",
    )
    keep = tx.topical_filter(F.col("s"), r"\binhibit\w*", r"complex\s+I\b", r"NADH")
    got = df.filter(keep).count()
    assert got == 2


def test_dictionary_anti_filter_and_contains_any(spark):
    df = spark.createDataFrame(
        [("has Rotenone inside",), ("clean row",), ("PIERICIDIN uppercase",)],
        "s string",
    )
    out = tx.dictionary_anti_filter(
        df, "s", ["rotenone", "piericidin", "# comment", "ab"]
    )
    assert [r["s"] for r in out.collect()] == ["clean row"]


def test_explode_delimited(spark):
    df = spark.createDataFrame([(1, "a; b ;;c"), (2, " ")], "id int, s string")
    out = tx.explode_delimited(df, "s", "item")
    assert [(r["id"], r["item"]) for r in out.collect()] == [
        (1, "a"),
        (1, "b"),
        (1, "c"),
    ]


def test_clean_text_composition(spark):
    s = "A <b>bold</b>  move – with​  controls\x02"
    assert _one(spark, s, tx.clean_text) == "A bold move - with controls"


def test_chunk_windows_coverage_and_edges(spark):
    from aurora_mito_etl_spark.operators import text as tx

    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),   # n=10 < window → 1 chunk
        (2, " ".join(f"w{i}" for i in range(12))),   # n == window → 1 chunk
        (3, " ".join(f"w{i}" for i in range(13))),   # one token past → 2 chunks
        (4, " ".join(f"w{i}" for i in range(28))),   # 1+ceil(16/8)=3 chunks
        (5, ""),                                     # empty → no chunks
        (6, "   "),                                  # whitespace only → none
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tx.chunk_windows(df, "text", "doc_id", window_tokens=12, stride=8)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(r)
    assert {k: len(v) for k, v in got.items()} == {1: 1, 2: 1, 3: 2, 4: 3}
    # every token of doc 4 appears in some chunk; tail chunk is short
    toks4 = set(" ".join(r["chunk_text"] for r in got[4]).split())
    assert toks4 == {f"w{i}" for i in range(28)}
    c4 = sorted(got[4], key=lambda r: r["chunk_id"])
    assert [r["n_chunk_tokens"] for r in c4] == [12, 12, 12]  # 16..27 covers 12
    c3 = sorted(got[3], key=lambda r: r["chunk_id"])
    assert [r["n_chunk_tokens"] for r in c3] == [12, 5]       # tokens 8..12
    # overlap: chunk 1 of doc 3 starts at token 8 (stride), not 12
    assert c3[1]["chunk_text"].split()[0] == "w8"


def test_boilerplate_lines_detector(spark):
    rows = [
        (1, "Cookie banner\nreal text one\n\nCookie banner", "s1"),
        (2, "  Cookie banner  \nreal text two", "s1"),
        (3, "real text three\nCookie banner", "s1"),
        (4, "Cookie banner\nother source", "s2"),   # different group
        (5, "\n\n\n", "s1"),                        # blank lines never count
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["source"], r["line"]): r["n_docs"]
        for r in tx.boilerplate_lines(
            df, "text", "doc_id", "source", min_docs=3
        ).collect()
    }
    # doc 1 repeats the line twice but counts ONCE (distinct docs);
    # s2's single occurrence is below threshold; '' is filtered.
    assert got == {("s1", "Cookie banner"): 3}
    import pytest

    with pytest.raises(ValueError):
        tx.boilerplate_lines(df, "text", "doc_id", "source", min_docs=1)


def test_strip_boilerplate_rebuild(spark):
    rows = [
        (1, "BP\n keep one \nBP", "s1"),
        (2, "  BP\nkeep two", "s1"),
        (3, "BP", "s1"),              # pure boilerplate → ''
        (4, "BP\nsolo source", "s2"), # below threshold in s2 → unchanged
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r["clean_text"]
        for r in tx.strip_boilerplate(
            df, "text", "doc_id", "source", min_docs=2
        ).collect()
    }
    # raw (untrimmed) forms and original order survive; matching is on
    # the trimmed key ('  BP' in doc 2 is still stripped)
    assert out == {
        1: " keep one ",
        2: "keep two",
        3: "",
        4: "BP\nsolo source",
    }


def test_dedup_lines_within_doc(spark):
    rows = [
        # repeated 'nav' keeps FIRST raw form ('nav ', untrimmed);
        # blank lines never collapse; later ' nav' variant also drops
        (1, "nav \nbody one\n\n\nnav\nbody two\n nav", "s1"),
        (2, "only\nlines\nhere", "s1"),
        (3, "", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r["clean_text"]
        for r in tx.dedup_lines_within_doc(df, "text", "doc_id").collect()
    }
    assert out == {
        1: "nav \nbody one\n\n\nbody two",
        2: "only\nlines\nhere",
        3: "",
    }


def test_dedup_lines_across_docs(spark):
    rows = [
        # doc 1 keeps its own first 'nav ' (raw form); doc 2's 'nav'
        # copy loses to doc 1's earlier (id, pos); doc 2 keeps what is
        # unique to it; blank lines survive everywhere; doc 3 is all
        # losses + one blank -> just the blank survives
        (1, "nav \nbody one\n\nnav", "s1"),
        (2, "nav\nbody two", "s1"),
        (3, "body one\n\nbody two", "s2"),
        (4, "", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r["clean_text"]
        for r in tx.dedup_lines_across_docs(df, "text", "doc_id").collect()
    }
    assert out == {
        1: "nav \nbody one\n",
        2: "body two",
        3: "",
        4: "",
    }


def test_bpe_train_classic_corpus(spark):
    """Sennrich-style hand-check: words low:3, lower:2, newest:1.
    Round-by-round (count desc, then left/right symbol asc):
      1: (l,o)=5 ties (o,w)=5 -> 'l' < 'o' wins
      2: (lo,w)=5
      3: (e,r)=2 ties (low,e)=2 -> 'e' < 'low' wins
      4: (low,er)=2
    Punctuated/uppercase tokens are filtered before training."""
    from aurora_mito_etl_spark.operators import bpe

    rows = [
        (1, "low low LOW! low lower", "s1"),
        (2, "lower newest", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe.bpe_train(df, "text", num_merges=4)
        .orderBy("merge_rank")
        .collect()
    ]
    assert out == [
        (1, "l", "o", 5),
        (2, "lo", "w", 5),
        (3, "e", "r", 2),
        (4, "low", "er", 2),
    ]


def test_bpe_train_overlap_and_adjacent_sites(spark):
    """The representation-invariant edge cases: 'aaa' merges
    left-to-right non-overlapping under (a,a) -> [aa, a], and
    'abab' rewrites BOTH adjacent (a,b) sites in one pass."""
    from aurora_mito_etl_spark.operators import bpe

    rows = [(1, "abab abab aaa", "s1")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe.bpe_train(df, "text", num_merges=2)
        .orderBy("merge_rank")
        .collect()
    ]
    # round 1: (a,b)=4 (2 per 'abab' x2), (b,a)=2, (a,a)=2 -> (a,b)
    # round 2: words 'ab ab' x2 and 'aaa': (ab,ab)=2, (a,a)=2
    #          -> tie 2 vs 2, 'a' < 'ab' -> (a,a); 'aaa' -> [aa, a]
    assert out == [(1, "a", "b", 4), (2, "a", "a", 2)]


def test_bpe_subword_freqs_apply_side(spark):
    """After the 4 merges of the classic corpus (the 4th merges
    low+er) the segmentations are low->[low], lower->[lower],
    newest->[n,e,w,e,s,t]; weighted by word freq (3/2/1): low:3,
    lower:2, e:2, n/s/t/w:1 — ties break on token asc."""
    from aurora_mito_etl_spark.operators import bpe

    rows = [
        (1, "low low LOW! low lower", "s1"),
        (2, "lower newest", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = [
        (r["token"], r["n_count"], r["rank"])
        for r in bpe.bpe_subword_freqs(df, "text", num_merges=4, top_k=5)
        .orderBy("rank")
        .collect()
    ]
    assert out == [
        ("low", 3, 1),
        ("e", 2, 2),
        ("lower", 2, 3),
        ("n", 1, 4),
        ("s", 1, 5),
    ]


def test_tokenizer_fertility_hand_check(spark):
    """Same Sennrich corpus as the train test, after 4 merges:
    low -> [low] (1 sub), lower -> [lower] (1), newest -> 6 singles.
    s1: n_words=6, n_subwords=3+2+6=11, n_chars=9+10+6=25;
    fertility=11/6, chars_per_subword=25/11 (fixed6). A source with
    no [a-z]+ words is absent entirely."""
    from aurora_mito_etl_spark.operators import bpe

    rows = [
        (1, "low low LOW! low lower", "s1"),
        (2, "lower newest", "s1"),
        (3, "123 !!!", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["source"]: r
        for r in bpe.tokenizer_fertility(df, "text", "source", num_merges=4).collect()
    }
    assert set(got) == {"s1"}
    r = got["s1"]
    assert (r["n_words"], r["n_subwords"], r["n_chars"]) == (6, 11, 25)
    assert r["fertility"] == 1.833333
    assert r["chars_per_subword"] == 2.272727
