"""TF-IDF lexical top-k (operators/tfidf.py)."""

from __future__ import annotations

from aurora_mito_etl_spark.operators import tfidf as tfi

DOCS = [
    (1, "the apple banana apple"),
    (2, "the apple banana"),
    (3, "the cherry date"),
    (4, "the cherry date egg"),
    (5, "unique words only here"),
    (6, None),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _topk(spark, **kw):
    out = tfi.tfidf_topk(_df(spark), **kw)
    return {
        (r["doc_id"], r["neighbor_id"]): (r["sim"], r["rank"])
        for r in out.collect()
    }


def test_neighbors_cluster_by_vocabulary(spark):
    got = _topk(spark, max_df_frac=0.5)  # "the" (df=5) drops from index
    # fruit cluster and stone-fruit cluster pair up, never cross
    assert (1, 2) in got and (2, 1) in got
    assert (3, 4) in got and (4, 3) in got
    assert got[(1, 2)][0] > 0 and got[(1, 2)][1] == 1
    assert got[(3, 4)][1] == 1
    assert not any(a in (1, 2) and b in (3, 4) for a, b in got)
    # doc 5 shares no indexed token; doc 6 has no tokens
    assert not any(5 in p or 6 in p for p in got)


def test_symmetric_sims(spark):
    got = _topk(spark, max_df_frac=0.5)
    for (a, b), (sim, _) in got.items():
        assert got[(b, a)][0] == sim  # one pair computation, mirrored


def test_stopword_cap_prunes_index(spark):
    # with the cap at 100% "the" stays indexed and links everything
    loose = _topk(spark, max_df_frac=1.0)
    assert any(a in (1, 2) and b in (3, 4) for a, b in loose)
    strict = _topk(spark, max_df_frac=0.5)
    assert not any(a in (1, 2) and b in (3, 4) for a, b in strict)


def test_deterministic(spark):
    a = sorted(_topk(spark).items())
    b = sorted(_topk(spark).items())
    assert a == b


def test_k_truncates(spark):
    # 9 identical docs (df=9 < N=10 keeps idf > 0) + 1 unrelated doc
    docs = spark.createDataFrame(
        [(i, "shared token stream") for i in range(9)] + [(9, "different things")],
        "doc_id long, text string",
    )
    out = tfi.tfidf_topk(docs, k=3, max_df_frac=1.0).collect()
    per_doc = {}
    for r in out:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
    assert set(per_doc) == set(range(9))  # doc 9 shares nothing
    assert all(v == 3 for v in per_doc.values())


def test_bm25_ranks_matching_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark shuffle join join join"),     # 3x join, short
            (2, "spark shuffle join"),               # 1x join
            (3, "completely unrelated words here"),  # no term
            (4, "join " * 50),                       # high tf, long doc
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = tfi.bm25_search(docs, "join", k=10).collect()
    got = {r["doc_id"]: (r["score"], r["rank"]) for r in out}
    assert 3 not in got and 5 not in got  # no term / no tokens
    assert set(got) == {1, 2, 4}
    # repeated term beats single mention; tf saturation + length
    # normalization keep the 50x doc from dominating linearly
    assert got[1][0] > got[2][0]
    # tf saturation: the 50x doc wins but sublinearly (score bounded
    # by idf*(k1+1), nowhere near 50x the single-mention score)
    assert got[4][1] == 1 and got[1][1] == 2
    assert got[4][0] < 3 * got[2][0]


def test_bm25_empty_query_refused(spark):
    import pytest

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        tfi.bm25_search(docs, "   ")


def test_bm25_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 7} gamma") for i in range(40)],
        "doc_id long, text string",
    )
    a = [tuple(r) for r in tfi.bm25_search(docs, "alpha w3", k=5).collect()]
    b = [tuple(r) for r in tfi.bm25_search(docs, "alpha w3", k=5).collect()]
    assert a == b and len(a) == 5


def test_bigram_lm_score_ranks_boilerplate_above_soup(spark):
    from aurora_mito_etl_spark.operators.lm_score import bigram_lm_score

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "zxq vbn mkl pqr stw uvx yzb cde fgh"),  # token soup
        (5, "hi"),  # < 2 tokens: no bigrams
        (6, "the quick brown fox naps under the lazy dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_lm_score(df).collect()}
    assert len(got) == 6
    # repeated boilerplate: every bigram seen 3-4x -> high logprob;
    # the soup's bigrams are singletons -> low
    assert got[1]["avg_logprob"] > got[4]["avg_logprob"]
    assert got[6]["avg_logprob"] > got[4]["avg_logprob"]
    # no-bigram doc scores 0.0 and is kept (length filtering is the
    # quality battery's job)
    assert got[5]["n_bigrams"] == 0
    assert got[5]["avg_logprob"] == 0.0
    assert bool(got[5]["lm_keep"])
    # identical docs score identically
    assert got[1]["avg_logprob"] == got[2]["avg_logprob"] == got[3]["avg_logprob"]


def test_bigram_lm_score_external_train_corpus(spark):
    from aurora_mito_etl_spark.operators.lm_score import bigram_lm_score

    train = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta") for i in range(5)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_lm_score(docs, train=train).collect()}
    # doc 1 follows the training transitions, doc 2 reverses them
    assert got[1]["avg_logprob"] > got[2]["avg_logprob"]


def test_bigram_lm_score_rejects_empty_vocabulary(spark):
    """A training corpus with no non-whitespace tokens gives V=0 and
    every Laplace denominator zero — the per-contribution guard raises
    instead of emitting ln(x/0)=+inf scores (ADVICE r6). Since r9 the
    guard is lazy: it fires only when a bigram is actually scored
    against the empty vocabulary, so the all-NULL/empty self-train
    corpus (zero contributions) stays defined and oracle-matching."""
    import pytest

    from aurora_mito_etl_spark.operators.lm_score import bigram_lm_score

    docs = spark.createDataFrame(
        [("d1", "some real text here")], "doc_id string, text string"
    )
    train = spark.createDataFrame(
        [("t1", "   "), ("t2", "")], "doc_id string, text string"
    )
    with pytest.raises(Exception, match="empty vocabulary"):
        bigram_lm_score(docs, train=train).collect()

    # degenerate SELF-train: no tokens anywhere -> no contributions,
    # every doc scores 0.0 and is kept (the r9 schema-chaos contract)
    degenerate = spark.createDataFrame(
        [("d1", None), ("d2", "   ")], "doc_id string, text string"
    )
    got = {r["doc_id"]: r for r in bigram_lm_score(degenerate).collect()}
    assert got["d1"]["n_bigrams"] == 0 and got["d1"]["avg_logprob"] == 0.0
    assert got["d2"]["lm_keep"] is True
