"""Unit tests for figure association (reference F5/F9 + the non-markup
adjacency binding, image_api.py:88-101 / image_models.py:130-229)."""

from document_extraction_service_spark.extract.pipeline import extract_document


def _figs(html: str):
    return extract_document(html.encode(), "http://x/f", "en")["extraction"]["images"]


TBL = "<p>Some intro paragraph text.</p>"


class TestMarkupFigures:
    def test_figcaption_bound(self):
        figs = _figs(
            "<html><body><h1>T</h1><figure><img src='a.png'>"
            "<figcaption>Figure 1. A nice diagram.</figcaption></figure></body></html>"
        )
        assert len(figs) == 1
        assert figs[0]["name"] == "Figure 1" and figs[0]["src"] == "a.png"

    def test_invalid_figcaption_rejected_no_fallback(self):
        # F9: >2 sentences -> rejected; an explicit bad caption must NOT
        # fall back to a nearby block
        figs = _figs(
            "<html><body><p>Figure 1. Nearby text.</p>"
            "<figure><img src='a.png'><figcaption>Figure 1. One. Two. Three. Four.</figcaption>"
            "</figure></body></html>"
        )
        assert figs == []


class TestNonMarkupFigures:
    def test_img_then_caption_paragraph(self):
        """The very common real-web shape: <img ...><p>Figure 1. ...</p>
        with no <figure> markup (VERDICT r2 missing #1)."""
        figs = _figs(
            "<html><body><h1>T</h1><img src='b.png'>"
            "<p>Figure 1. The described picture.</p></body></html>"
        )
        assert len(figs) == 1
        assert figs[0]["src"] == "b.png"
        assert figs[0]["description"] == "Figure 1. The described picture."

    def test_caption_paragraph_then_img(self):
        figs = _figs(
            "<html><body><h1>T</h1><p>Figure 2. Description precedes.</p>"
            "<img src='c.png'><p>Unrelated following text.</p></body></html>"
        )
        assert len(figs) == 1
        assert figs[0]["name"] == "Figure 2" and figs[0]["src"] == "c.png"

    def test_far_caption_not_claimed(self):
        fillers = "".join(
            f"<p>Filler paragraph {i} with plain prose.</p>" for i in range(4)
        )
        figs = _figs(
            "<html><body><p>Figure 3. Far away description.</p>"
            f"{fillers}<img src='d.png'><p>Tail text here.</p></body></html>"
        )
        assert figs == []

    def test_without_replacement(self):
        """Two bare imgs near ONE caption block: only one binds."""
        figs = _figs(
            "<html><body><img src='e.png'><img src='f.png'>"
            "<p>Figure 4. Shared candidate.</p></body></html>"
        )
        assert len(figs) == 1

    def test_long_caption_rejected_in_adjacency_path(self):
        figs = _figs(
            "<html><body><img src='g.png'>"
            "<p>Figure 5. One. Two. Three. Four.</p></body></html>"
        )
        assert figs == []
