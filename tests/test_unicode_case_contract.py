"""Unicode case-mapping contract between the engines (r10).

`lower()` appears in nearly every tokenization oracle, and the two
engines implement it with different Unicode machinery: Spark uses the
JVM's case tables (same answers as CPython on every probe tested),
DuckDB uses utf8proc. An exhaustive sweep of all 1.1M codepoints
(r10) found 44 divergent lowercase mappings:

- U+0130 LATIN CAPITAL LETTER I WITH DOT ABOVE ('İ'): the one
  SpecialCasing multi-char lowercase in Unicode — Python/JVM give
  'i' + U+0307 COMBINING DOT (2 chars), utf8proc gives plain 'i'.
- 43 letters added in Unicode 12-15 (Vithkuqi, Latin Extended-D
  additions, etc.) where utf8proc's table predates the mapping.

These cannot be reconciled in SQL, so they are a DATA-CONTRACT
exclusion: text containing them is outside the oracle guarantee for
case-folded comparisons (the engine itself — the Spark side — is
fine; only DuckDB-replay parity is affected). The fuzz alphabet
deliberately stays inside the contract; this test pins both the
divergence (so an engine upgrade that fixes it is noticed) and the
alphabet's safety.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def test_dotted_capital_i_divergence_still_exists():
    """Pin the KNOWN İ divergence: if a DuckDB upgrade starts agreeing
    with Python/JVM here, the contract note (and possibly the fuzz
    alphabet) should be revisited."""
    duck = duckdb.sql("SELECT lower('İ')").fetchone()[0]
    assert duck == "i"  # utf8proc: single char, dot lost
    assert "İ".lower() == "i̇"  # Python/JVM: combining dot kept
    assert duck != "İ".lower()


def test_fuzz_alphabet_is_case_portable():
    """Every character the generators can emit lowercases identically
    in DuckDB and Python (Python == JVM on all probed mappings), so
    no oracle can diverge on case-folding over fuzz data."""
    from fuzz_gate import EVENT_TYPES, PARENS, PROPS, WORDS, WS

    alphabet = set("".join(WORDS) + "".join(WS) + "".join(PARENS)
                   + "".join(EVENT_TYPES) + "".join(PROPS))
    alphabet |= set("0123456789 srcabcdefghijklmnopqrstuvwxyz")
    chars = "".join(sorted(alphabet))
    duck = duckdb.sql("SELECT lower(?)", params=[chars]).fetchone()[0]
    assert duck == chars.lower()


def test_reference_panels_are_case_portable():
    """The committed chem golden inputs (716 reference SMILES + 52
    inhibitor names) also stay inside the case contract."""
    import json

    g = json.loads(
        (Path(__file__).resolve().parent / "fixtures" / "chem_ref_goldens.json")
        .read_text()
    )
    blob = "".join(r["SMILES"] + (r.get("ref_name") or "") for r in g["rows"])
    blob += "".join(r["name"] for r in g["inhibitor_resolution"])
    duck = duckdb.sql("SELECT lower(?)", params=[blob]).fetchone()[0]
    assert duck == blob.lower()
