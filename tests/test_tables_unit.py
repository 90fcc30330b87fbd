"""Unit tests for the table grid reconstruction (reference J7/F10/F11/A10)."""

from document_extraction_service_spark.extract import tables as TB


def _cell(t, th=False, cs=1, rs=1):
    return (t, th, cs, rs)


class TestFillGrid:
    def test_plain(self):
        rows = [[_cell("a"), _cell("b")], [_cell("c"), _cell("d")]]
        g = TB.fill_grid(rows)
        assert [[t for t, _ in r] for r in g] == [["a", "b"], ["c", "d"]]

    def test_colspan(self):
        rows = [[_cell("a", cs=2), _cell("b")], [_cell("c"), _cell("d"), _cell("e")]]
        g = TB.fill_grid(rows)
        assert [[t for t, _ in r] for r in g] == [["a", "a", "b"], ["c", "d", "e"]]

    def test_rowspan(self):
        rows = [[_cell("a", rs=2), _cell("b")], [_cell("c")]]
        g = TB.fill_grid(rows)
        assert [[t for t, _ in r] for r in g] == [["a", "b"], ["a", "c"]]

    def test_ragged_padded(self):
        # J7 gap-fill semantics (table_models.py:283-349): ragged rows pad
        rows = [[_cell("a"), _cell("b"), _cell("c")], [_cell("d")]]
        g = TB.fill_grid(rows)
        assert [[t for t, _ in r] for r in g] == [["a", "b", "c"], ["d", "", ""]]

    def test_empty(self):
        assert TB.fill_grid([]) == []


class TestValidators:
    def test_single_column_table_rejected(self):
        # the decoy nav table: avg cells/row < 2 (table_models.py:793-800)
        rows = [[_cell("x")] for _ in range(5)]
        g = TB.fill_grid(rows)
        kept = TB.validate_rows(g, [1] * 5)
        assert not TB.table_valid(g, [1] * 5, kept)

    def test_good_table_kept(self):
        rows = [[_cell("a"), _cell("b"), _cell("c")] for _ in range(4)]
        g = TB.fill_grid(rows)
        kept = TB.validate_rows(g, [3] * 4)
        assert kept == [0, 1, 2, 3]
        assert TB.table_valid(g, [3] * 4, kept)

    def test_sandwich_resurrection(self):
        # W8 (table_models.py:908-911)
        raw = [3, 1, 3]
        rows = [
            [_cell("a"), _cell("b"), _cell("c")],
            [_cell("short")],
            [_cell("d"), _cell("e"), _cell("f")],
        ]
        g = TB.fill_grid(rows)
        kept = TB.validate_rows(g, raw)
        assert kept == [0, 1, 2]

    def test_sentence_row_dropped(self):
        sent = "this is clearly a prose sentence with many words in it."
        rows = [
            [_cell("a"), _cell("b")],
            [_cell(sent)],
            [_cell("c"), _cell("d")],
            [_cell("e"), _cell("f")],
        ]
        g = TB.fill_grid(rows)
        kept = TB.validate_rows(g, [2, 1, 2, 2])
        # sandwiched between good rows -> resurrected by W8; move it to
        # the edge and it stays dropped
        rows2 = [
            [_cell(sent)],
            [_cell("a"), _cell("b")],
            [_cell("c"), _cell("d")],
        ]
        g2 = TB.fill_grid(rows2)
        kept2 = TB.validate_rows(g2, [1, 2, 2])
        assert 0 not in kept2
        assert kept == [0, 1, 2, 3]


class TestHeaderOrientation:
    def test_th_row(self):
        g = [[("h1", True), ("h2", True)], [("1", False), ("2", False)]]
        assert TB.header_orientation(g) == "row"

    def test_th_column(self):
        g = [[("h1", True), ("1", False)], [("h2", True), ("2", False)]]
        assert TB.header_orientation(g) == "column"

    def test_word_count_fallback(self):
        # A10: words in first row vs first column (table_api.py:64-77)
        g = [
            [("name", False), ("width", False)],
            [("1.0", False), ("2.0", False)],
        ]
        assert TB.header_orientation(g) == "row"
