"""Span semantics: table/figure spans anchor to valid char ranges of
extracted_text (the geometry replacement for the reference's bboxes)."""

from document_extraction_service_spark import fixtures as fx
from document_extraction_service_spark.extract.pipeline import extract_document


def _iter_family(fam, limit=20):
    found = 0
    for i in range(4000):
        if fx.family_of(i) == fam:
            yield i
            found += 1
            if found >= limit:
                return


def test_table_spans_anchor_into_text():
    checked = 0
    for i in _iter_family("tabular"):
        r = fx.gen_page(i)
        res = extract_document(r["html"], r["url"], r["lang"])
        text = res["extraction"]["extracted_text"]
        for t in res["extraction"]["tables"]:
            s = t["span"]
            if s["start"] >= 0:
                assert 0 <= s["start"] <= s["end"] <= len(text)
                # the anchor is a whole line of extracted_text
                assert "\n" not in text[s["start"]:s["end"]]
                checked += 1
    assert checked > 5


def test_figure_spans_anchor_into_text():
    checked = 0
    for i in _iter_family("figure"):
        r = fx.gen_page(i)
        res = extract_document(r["html"], r["url"], r["lang"])
        text = res["extraction"]["extracted_text"]
        for im in res["extraction"]["images"]:
            s = im["span"]
            if s["start"] >= 0:
                assert 0 <= s["start"] <= s["end"] <= len(text)
                assert "\n" not in text[s["start"]:s["end"]]
                checked += 1
    assert checked > 5


def test_boilerplate_never_leaks():
    """No chrome strings may appear in any extracted text across the
    whole boilerplate family sample."""
    banned = (
        "cookie", "Share on", "Log in", "All rights reserved",
        "Privacy", "Related story",
    )
    for i in _iter_family("boilerplate", limit=30):
        r = fx.gen_page(i)
        res = extract_document(r["html"], r["url"], r["lang"])
        text = res["extraction"]["extracted_text"]
        for b in banned:
            assert b.lower() not in text.lower(), f"{b!r} leaked at i={i}"
