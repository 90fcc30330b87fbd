"""Adversarial-web fixture family: per-kind extraction invariants
(VERDICT r3 next-round #6).  Byte-level behavior is pinned by goldens
(tests/golden/page_*.json via test_golden.py); these assertions state
the properties that must hold regardless of golden regeneration."""

import time

from document_extraction_service_spark import fixtures as fx
from document_extraction_service_spark.extract.pipeline import extract_document


def _first_of_kind(kind: int, n: int = 2) -> list[int]:
    out = []
    for i in range(6000):
        if fx.family_of(i) == "adversarial" and i % 5 == kind:
            out.append(i)
            if len(out) == n:
                break
    return out


def _extract(i: int) -> dict:
    r = fx.gen_page(i)
    t0 = time.time()
    res = extract_document(r["html"], r["url"], r["lang"])
    assert time.time() - t0 < 15.0, f"adversarial page {i} slow"  # wide gate: host bimodal windows (CLAUDE.md #17) must not flake this
    assert res == extract_document(r["html"], r["url"], r["lang"]), "nondeterministic"
    return res


def test_unclosed_misnested_tags_recovered():
    """kind 0: unclosed <p>/<div>, misnested <b><i>, truncated before
    </body> — body paragraphs must still come out."""
    for i in _first_of_kind(0):
        res = _extract(i)
        assert res["status"]["ok"]
        assert len(res["extraction"]["extracted_text"]) > 100


def test_deep_div_soup_no_blowup():
    """kind 1: 400 attribute-carrying nested divs — the <2s gate in
    _extract is the non-quadratic evidence; the buried paragraph must
    surface."""
    for i in _first_of_kind(1):
        res = _extract(i)
        assert res["status"]["ok"]
        assert len(res["extraction"]["extracted_text"]) > 50


def test_attribute_and_script_bombs_skipped():
    """kind 2: 64KB attribute + 32KB script + 16KB style.  None of the
    bomb payloads may leak into the text; both real paragraphs must
    survive around them."""
    for i in _first_of_kind(2):
        res = _extract(i)
        txt = res["extraction"]["extracted_text"]
        assert res["status"]["ok"]
        assert "AAAA" not in txt           # attribute blob
        assert "var x=1" not in txt        # script body
        assert ".c{color" not in txt       # style body
        assert len(txt) > 200              # the paragraphs made it


def test_nested_tables_inner_data_table_found():
    """kind 3: data table nested two layout tables deep.  The inner
    table (header row + numeric rows) must be detected; the outer
    single-cell layout shell must not count as a table of its own."""
    for i in _first_of_kind(3):
        res = _extract(i)
        assert res["status"]["ok"]
        assert 1 <= res["status"]["n_tables"] <= 2
        tables = res["extraction"]["tables"]
        cells = {c for t in tables for row in t["rows"] for c in row}
        assert {"alpha", "beta"} <= cells, cells


def test_utf16_bom_beats_declared_charset():
    """kind 4: utf-16-LE bytes with BOM but an utf-8 <meta> — the BOM
    must win the sniff, and the page decodes to its real text."""
    for i in _first_of_kind(4):
        r = fx.gen_page(i)
        assert r["html"][:2] == b"\xff\xfe"
        res = _extract(i)
        assert res["status"]["ok"]
        # the title must decode intact (it prefixes the crawl text);
        # h1/title is metadata, not body text, like every family
        title = res["extraction"]["metadata"]["title"]
        assert title and r["text"].startswith(f"[crawl] {title}")
        assert len(res["extraction"]["extracted_text"]) > 50
