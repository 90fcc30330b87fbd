"""Unit tests for the pure text operators (SURVEY §5.2 item 2)."""

from document_extraction_service_spark.extract import textops as X


class TestSentenceSplit:
    def test_basic(self):
        assert X.split_sentences("One two. Three four.") == ["One two.", "Three four."]

    def test_et_al_not_split(self):
        # reference W6 rule (text_models.py:673-690)
        s = "Results shown by Smith et al. Analysis follows."
        assert X.split_sentences(s) == [s]

    def test_et_al_in_citation(self):
        s = "Observed effect (Müller et al., 2021). Next sentence here."
        assert X.split_sentences(s) == [
            "Observed effect (Müller et al., 2021).",
            "Next sentence here.",
        ]

    def test_initials_not_split(self):
        s = "Written by A. Müller for the journal."
        assert X.split_sentences(s) == [s]

    def test_abbreviations(self):
        s = "See Fig. 3 for details. The value e.g. rises."
        out = X.split_sentences(s)
        assert out == ["See Fig. 3 for details.", "The value e.g. rises."]

    def test_empty(self):
        assert X.split_sentences("") == []
        assert X.split_sentences("   ") == []

    def test_fragment_merge(self):
        # previous sentence not ending in terminal punctuation merges
        s = "A value of 3.5 was seen. It rose."
        assert X.split_sentences(s) == ["A value of 3.5 was seen.", "It rose."]


class TestDehyphenate:
    def test_soft_hyphen_join(self):
        # reference W3 (internal_models.py:492-515): fuse iff lowercase follows
        assert X.dehyphenate("measure­ment") == "measurement"
        assert X.dehyphenate("measure­ ment") == "measurement"

    def test_soft_hyphen_before_upper_dropped(self):
        assert X.dehyphenate("A­B") == "AB"

    def test_no_hyphen(self):
        assert X.dehyphenate("plain text") == "plain text"


class TestCellType:
    # reference A9 classifier (text_detection.py:32-53)
    def test_num(self):
        assert X.cell_type("42.5") == "NUM"
        assert X.cell_type("1,234") == "NUM"
        assert X.cell_type("95 %") == "NUM"
        assert X.cell_type("-3.2") == "NUM"

    def test_word(self):
        assert X.cell_type("pressure") == "WORD"

    def test_unknown(self):
        assert X.cell_type("") == "UNKNOWN"
        assert X.cell_type("ab") == "UNKNOWN"
        assert X.cell_type("%") == "UNKNOWN"  # no digit


class TestFuzzyKey:
    def test_short(self):
        assert X.fuzzy_key("Hello, World!") == "helloworld"

    def test_long_takes_ends(self):
        s = "a" * 60 + "b" * 60
        k = X.fuzzy_key(s)
        assert k == "a" * 50 + "b" * 50

    def test_names(self):
        assert X.TABLE_NAME_RE.match("Table 3. Stuff").group(1) == "3"
        assert X.TABLE_NAME_RE.match("Tab. 12 more").group(1) == "12"
        assert X.FIGURE_NAME_RE.match("Figure 2. Caption").group(1) == "2"
        assert X.FIGURE_NAME_RE.match("Fig. 7 x").group(1) == "7"

    def test_doi(self):
        m = X.DOI_RE.findall("see doi:10.1234/abc.def-5 end")
        assert m == ["10.1234/abc.def-5"]
