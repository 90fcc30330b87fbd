"""Unit tests for metadata harvesting — author structure parity
(reference Author/Reference models, datamodels.py:60-70)."""

from document_extraction_service_spark.extract.metadata import split_author
from document_extraction_service_spark.extract.pipeline import extract_document


def _meta(html: str):
    res = extract_document(html.encode(), "http://x/m", "en")
    return res["extraction"]["metadata"]


class TestSplitAuthor:
    def test_highwire_comma_form(self):
        assert split_author("Müller, A.") == {"first_name": "A.", "last_name": "Müller"}

    def test_first_last_form(self):
        assert split_author("A. Müller") == {"first_name": "A.", "last_name": "Müller"}

    def test_middle_names_go_to_first(self):
        assert split_author("John Q. Public") == {
            "first_name": "John Q.", "last_name": "Public"}

    def test_single_token_is_last_name(self):
        assert split_author("Aristotle") == {"first_name": "", "last_name": "Aristotle"}

    def test_empty(self):
        assert split_author("") is None and split_author("   ") is None


class TestAuthorsEndToEnd:
    def test_both_conventions_split_and_dedup(self):
        """'A. Müller' (plain meta) and 'Müller, A.' (citation meta) are
        the same person -> one structured author."""
        m = _meta(
            "<html><head><title>T</title>"
            '<meta name="author" content="A. Müller">'
            '<meta name="citation_author" content="Müller, A.">'
            '<meta name="citation_author" content="Smith, J.">'
            "</head><body><p>Body text here.</p></body></html>"
        )
        assert m["authors"] == [
            {"first_name": "A.", "last_name": "Müller"},
            {"first_name": "J.", "last_name": "Smith"},
        ]

    def test_reference_authors_from_citation_reference(self):
        m = _meta(
            "<html><head><title>T</title>"
            '<meta name="citation_reference" content="citation_title=Prior Work;'
            'citation_author=Zhang, L.;citation_author=Tanaka, K.;'
            'citation_doi=10.1000/x.123456"></head>'
            "<body><p>Body text here.</p></body></html>"
        )
        refs = m["references"]
        assert len(refs) == 1
        assert refs[0]["title"] == "Prior Work"
        assert refs[0]["doi"] == "10.1000/x.123456"
        assert refs[0]["authors"] == [
            {"first_name": "L.", "last_name": "Zhang"},
            {"first_name": "K.", "last_name": "Tanaka"},
        ]

    def test_cite_reference_has_empty_authors(self):
        m = _meta(
            "<html><head><title>T</title></head><body>"
            "<p>Body text here.</p>"
            "<ul><li><cite>Some Work. doi:10.1000/y.654321</cite></li></ul>"
            "</body></html>"
        )
        assert len(m["references"]) == 1
        assert m["references"][0]["authors"] == []
