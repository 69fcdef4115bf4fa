from __future__ import annotations

from pyspark.sql import functions as F

from aurora_mito_etl_spark.operators import udtfs


def test_split_sentences_pure():
    got = udtfs.split_sentences(
        "Dr. Smith et al. found effects. It rose 3.5 fold! e.g. here. Done?  Tail"
    )
    assert got == [
        "Dr. Smith et al. found effects.",
        "It rose 3.5 fold!",
        "e.g. here.",
        "Done?",
        "Tail",
    ]
    # single letters read as initials (ambiguous 'found X.' case)
    assert udtfs.split_sentences("found X. next") == ["found X. next"]
    assert udtfs.split_sentences("") == []
    assert udtfs.split_sentences("no terminator") == ["no terminator"]


def test_chunk_tokens_pure():
    import pytest

    toks = [f"t{i}" for i in range(10)]
    got = udtfs.chunk_tokens(toks, chunk_size=4, overlap=2)
    assert [c for _i, c, _n in got] == [
        "t0 t1 t2 t3",
        "t2 t3 t4 t5",
        "t4 t5 t6 t7",
        "t6 t7 t8 t9",
    ]
    assert all(n == len(c.split()) for _i, c, n in got)
    assert udtfs.chunk_tokens([], 4, 2) == []
    assert udtfs.chunk_tokens(["a"], 4, 2) == [(0, "a", 1)]
    with pytest.raises(ValueError):
        udtfs.chunk_tokens(toks, chunk_size=4, overlap=4)


def test_sentences_udtf_lateral_join(spark):
    df = spark.createDataFrame(
        [(1, "First point. Second one! e.g. stays intact. End"), (2, "")],
        "doc_id int, text string",
    )
    out = df.lateralJoin(udtfs.sentences(F.col("text").outer())).select(
        "doc_id", "sent_idx", "sentence"
    )
    got = [(r["doc_id"], r["sent_idx"], r["sentence"]) for r in out.collect()]
    assert got == [
        (1, 0, "First point."),
        (1, 1, "Second one!"),
        (1, 2, "e.g. stays intact."),
        (1, 3, "End"),
    ]


def test_chunks_udtf(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    out = df.lateralJoin(udtfs.chunks(F.col("text").outer(), 4, 2)).select(
        "doc_id", "chunk_idx", "chunk", "n_tokens"
    )
    rows = sorted(out.collect(), key=lambda r: r["chunk_idx"])
    assert [r["chunk"] for r in rows][0] == "w0 w1 w2 w3"
    assert all(r["n_tokens"] == 4 for r in rows)
    assert len(rows) == 4
