"""HTML main-content extraction + URL canonicalization (r13).

Operator-level semantics with adversarial inputs (malformed markup,
nesting, entities, NULLs), plus Spark/DuckDB twin parity of the SQL
builders on the same hostile strings — the oracle gate's contract,
pinned here at unit grain.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from aurora_mito_etl_spark.operators.html import (
    extract_main_text,
    main_text_sql,
)
from aurora_mito_etl_spark.operators.url import (
    normalize_url,
    normalize_url_sql,
    url_host,
)

LONG = "This paragraph easily clears the minimum block length threshold."

PAGES = [
    # main text kept; nav / footer link-walls dropped
    (
        1,
        '<html><head><title>T</title></head><body>'
        '<nav><a href="/">Home</a> <a href="/x">X</a></nav>'
        f"<p>{LONG}</p>"
        '<footer><a href="/a">A</a> <a href="/b">B</a></footer></body></html>',
    ),
    # script/style payloads vanish even with attributes and newlines
    (
        2,
        f"<div>{LONG}</div><script type='x'>\nvar a=1;\n</script>"
        f"<style>\np {{color: red}}\n</style><p>{LONG}</p>",
    ),
    # entities decode AFTER tag strip; &amp;lt; stays literal '&lt;'
    (
        3,
        "<p>Entities &amp; &quot;q&quot; it&#39;s &lt;b&gt;&nbsp;"
        "and &amp;lt; stays — plus padding padding padding.</p>",
    ),
    # malformed: an unescaped '<' opens a "tag" that eats to the next
    # '>' (bare '<' must be '&lt;' in valid HTML) — identical on both
    # engines, pinned here
    (4, f"<p>{LONG} 1 < 2 and <unclosed junk <b>tail</p>"),
    # nested blocks split; each side scored independently
    (5, f"<div>{LONG}<div>short</div>{LONG}</div>"),
    # comment-wrapped content vanishes
    (6, f"<!-- <p>{LONG}</p> --><p>{LONG}</p>"),
    # link-heavy paragraph: long enough but one anchor per few chars
    (
        7,
        "<p>"
        + " ".join(f'<a href="/{i}">w{i}</a>' for i in range(12))
        + " tiny tail of text here</p>",
    ),
    (8, None),  # NULL page -> NULL everything
    (9, ""),  # empty page -> '' main, 0 blocks
]


def _duck_twin(rows):
    main, n_kept = main_text_sql("html")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    return {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT id, {main}, {n_kept} FROM t"
        ).fetchall()
    }


def test_extract_main_text_semantics_and_duck_parity(spark):
    df = spark.createDataFrame(PAGES, "id long, html string")
    got = {
        r["id"]: (r["main_text"], r["n_blocks_kept"])
        for r in extract_main_text(df, "html").collect()
    }
    # semantics
    assert got[1] == (LONG, 1)  # nav + footer dropped
    assert got[2] == (f"{LONG}\n{LONG}", 2)  # script/style payload gone
    text3 = got[3][0]
    assert '&amp;' not in text3 and '"q"' in text3 and "it's" in text3
    assert "&lt; stays" in text3  # double-escaped entity stays literal
    assert "<b>" in text3  # decoded &lt;b&gt; is literal text, not markup
    assert got[4][0] == f"{LONG} 1 tail"  # '< 2 … <b>' eaten as one "tag"
    assert got[5] == (f"{LONG}\n{LONG}", 2)  # nested: 'short' dropped
    assert got[6] == (LONG, 1)  # commented-out clone gone
    assert got[7] == ("", 0)  # link-wall fails the density rule
    assert got[8] == (None, None)
    assert got[9] == ("", 0)
    # twin parity on every page
    assert got == _duck_twin(PAGES)


URLS = [
    (1, "HTTPS://WWW.Example.COM:443/A//B/?utm_source=x&b=2&a=1#frag"),
    (2, "http://example.com:80/"),
    (3, "http://example.com:8080/x?"),
    (4, "https://sub.example.com/p/?fbclid=1&gclid=2&utm_campaign=3"),
    (5, "ftp://Files.example.com/pub"),
    (6, "no-scheme.example.com/path"),
    (7, "http:///path-without-host"),
    (8, None),
    (9, "https://h.io/a?z=1&a=10&a=1&&y=0"),
]

WANT = {
    1: "https://example.com/A/B?a=1&b=2",
    2: "http://example.com/",
    3: "http://example.com:8080/x",
    4: "https://sub.example.com/p",
    5: "ftp://files.example.com/pub",
    6: None,
    7: None,
    8: None,
    9: "https://h.io/a?a=1&a=10&y=0&z=1",
}


def test_normalize_url_semantics_and_duck_parity(spark):
    df = spark.createDataFrame(URLS, "id long, url string")
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", normalize_url(F.col("url")).alias("n")
        ).collect()
    }
    assert got == WANT
    # host extraction: lowercased, www/port stripped, '' when absent
    hosts = {
        r["id"]: r["h"]
        for r in df.select("id", url_host(F.col("url")).alias("h")).collect()
    }
    assert hosts[1] == "example.com"
    assert hosts[5] == "files.example.com"
    assert hosts[6] == "" and hosts[8] is None
    # twin parity
    twins = normalize_url_sql("url")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", URLS)
    duck = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT id, {twins['url_norm']}, {twins['host']} FROM t"
        ).fetchall()
    }
    assert duck == {k: (WANT[k], hosts[k]) for k in WANT}


def test_extract_plan_is_single_projection_no_python(spark):
    """The whole extraction must fuse into the scan projection: no
    shuffle, no python runner, whole-stage codegen on."""
    df = spark.createDataFrame(PAGES, "id long, html string")
    out = extract_main_text(df, "html")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "MapInPandas" not in plan
