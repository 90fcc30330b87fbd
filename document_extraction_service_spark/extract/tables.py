"""Table reconstruction.

The analog of the reference's TableStrategy + Table grid model
(/root/reference/app/core/extraction_modul/apis/table_api.py,
datamodels/table_models.py).  HTML markup makes region detection (the
Cascade-Mask-R-CNN stage T1) exact — `<table>` elements — so what
remains is exactly what the reference layers *on top of* its model:
grid reconstruction (J7), row/table validators (F10/F11 with the W8
sandwich resurrection), header-orientation decision (A10), and cell
word-type labels (A9).
"""

from __future__ import annotations

from . import textops as X

# validator constants (reference table_models.py:881-911, 793-800)
ROW_MIN_RATIO = 0.5     # row dropped when cells < 0.5 x table average
ROW_MAX_RATIO = 2.0     # ... or >= 2 x table average
MIN_AVG_CELLS = 2.0     # table kept iff avg cells/row >= 2
MAX_SENTENCE_ROW_SHARE = 0.3  # quota of sentence-shaped rows
SENTENCE_ROW_MIN_WORDS = 8
# hard bound on the EXPANDED grid (raw cells are capped at parse time,
# but colspan multiplies up to 64x and ragged-row padding multiplies by
# max width — an 84KB page could otherwise expand past 2GB).  The span
# expansion draws on ONE shared remaining-cell budget (MAX_GRID_CELLS)
# across all rows — a uniform per-row slice clamped legitimately wide
# rows of tall tables (4000 one-cell rows + a 10-column header gave
# per_row_cap=4 and silently dropped real header cells).  The final
# ragged-row padding is bounded separately (MAX_PADDED_CELLS): never
# OOM, flag truncated.
MAX_GRID_CELLS = 16_384
MAX_PADDED_CELLS = 65_536
# J2 proximity bound: the reference's nearest-description match is
# distance-bounded (table_models.py:113-131); the caption backscan must
# not claim a "Tab…" block pages earlier as this table's caption.
CAPTION_BACKSCAN_BLOCKS = 3


def fill_grid(rows) -> tuple[list[list[tuple[str, bool]]], bool]:
    """rowspan/colspan expansion into a dense (text, is_th) matrix —
    the exact-markup version of the reference's nearest-slot grid fill
    (J7, table_models.py:283-349,475-545): ragged rows are padded with
    empty cells, spans repeat their value into covered slots.

    Returns (grid, truncated): expansion draws on a shared budget of
    MAX_GRID_CELLS filled cells; the padded matrix is additionally
    bounded at MAX_PADDED_CELLS (see the constants note)."""
    if not rows:
        return [], False
    remaining = MAX_GRID_CELLS
    truncated = False
    grid: list[list[tuple[str, bool]]] = []
    pending: dict[int, list] = {}  # col -> [remaining_rows, text, th]
    for row in rows:
        out: list[tuple[str, bool]] = []
        c = 0
        it = iter(row)
        cell = next(it, None)
        while cell is not None or c in pending:
            if remaining <= 0:
                truncated = True
                break
            if c in pending:
                rem = pending[c]
                out.append((rem[1], rem[2]))
                remaining -= 1
                rem[0] -= 1
                if rem[0] <= 0:
                    del pending[c]
                c += 1
                continue
            text, th, colspan, rowspan = cell
            for _ in range(colspan):
                if remaining <= 0:
                    truncated = True
                    break
                out.append((text, th))
                remaining -= 1
                if rowspan > 1:
                    pending[c] = [rowspan - 1, text, th]
                c += 1
            cell = next(it, None)
        grid.append(out)
    width = max((len(r) for r in grid), default=0)
    # padding bound: n_rows x width must not blow past MAX_PADDED_CELLS
    # (one 16k-cell row + 4000 empty rows would otherwise pad to 65M)
    if width and len(grid) * width > MAX_PADDED_CELLS:
        width = max(1, MAX_PADDED_CELLS // len(grid))
        truncated = True
        grid = [row[:width] for row in grid]
    return [
        list(row) + [("", False)] * (width - len(row)) for row in grid
    ], truncated


def _is_sentence_row(row, raw_cell_count: int) -> bool:
    """Reference F10: a 'row' that is really a prose sentence
    (table_models.py:881-885)."""
    if raw_cell_count > 1:
        return False
    joined = " ".join(t for t, _ in row).strip()
    return X.n_words(joined) >= SENTENCE_ROW_MIN_WORDS and joined.endswith(".")


def validate_rows(grid, raw_counts):
    """Row validators F10 + sandwich resurrection W8
    (table_models.py:881-911).  Returns kept row indices."""
    n = len(grid)
    if n == 0:
        return []
    avg = sum(raw_counts) / n
    good = []
    for r in range(n):
        cnt = raw_counts[r]
        ok = (
            cnt > 1
            and cnt >= ROW_MIN_RATIO * avg
            and cnt < ROW_MAX_RATIO * avg
            and not _is_sentence_row(grid[r], cnt)
        )
        good.append(ok)
    # W8: a bad row sandwiched between two good rows is resurrected
    for r in range(1, n - 1):
        if not good[r] and good[r - 1] and good[r + 1]:
            good[r] = True
    return [r for r in range(n) if good[r]]


def table_valid(grid, raw_counts, kept) -> bool:
    """Reference F11 (table_models.py:793-800)."""
    if not kept:
        return False
    avg = sum(raw_counts[r] for r in kept) / len(kept)
    n_sent = sum(1 for r in kept if _is_sentence_row(grid[r], raw_counts[r]))
    return avg >= MIN_AVG_CELLS and n_sent <= MAX_SENTENCE_ROW_SHARE * len(kept)


def header_orientation(grid) -> str:
    """Reference A10 (table_api.py:64-77): compare WORD-type cells in
    the first row vs the first column; explicit <th> markup wins when
    unambiguous."""
    if not grid:
        return "row"
    first_row_th = all(th for _, th in grid[0]) and len(grid[0]) > 0
    first_col_th = all(row[0][1] for row in grid if row)
    if first_row_th and not first_col_th:
        return "row"
    if first_col_th and not first_row_th:
        return "column"
    row_words = sum(1 for t, _ in grid[0] if X.cell_type(t) == "WORD")
    col_words = sum(1 for row in grid if row and X.cell_type(row[0][0]) == "WORD")
    return "row" if row_words >= col_words else "column"


def extract_tables(parsed, labels, blocks, offsets):
    """ParseResult -> (list of output-table dicts (schema.TABLE),
    truncated: bool — True when any grid expansion hit its budget)."""
    from .text import anchor_span

    out = []
    truncated = False
    t_counter = 0
    used_caption_blocks: set[int] = set()  # J2: without-replacement
    for tc in parsed.tables:
        grid_th, g_trunc = fill_grid(tc.rows)
        truncated = truncated or g_trunc
        raw_counts = [len(r) for r in tc.rows]
        kept = validate_rows(grid_th, raw_counts)
        if not table_valid(grid_th, raw_counts, kept):
            continue
        grid = [grid_th[r] for r in kept]

        # caption: <caption> if present, else nearest preceding block
        # starting with "tab" (F4, table_api.py:43-48) — greedy
        # WITHOUT replacement (J2, table_models.py:93-153): a caption
        # block feeds at most one table, so consecutive caption-less
        # tables never share one description.  Proximity-bounded like
        # the reference (CAPTION_BACKSCAN_BLOCKS): a far-away "Tab…"
        # block is not this table's caption.
        caption = tc.caption
        if not caption:
            for k in range(tc.anchor - 1,
                           max(-1, tc.anchor - 1 - CAPTION_BACKSCAN_BLOCKS), -1):
                if k in used_caption_blocks:
                    continue
                btxt = blocks[k].text.lstrip().lower()
                if btxt.startswith(X.TABLE_DESC_PREFIX):
                    caption = blocks[k].text
                    used_caption_blocks.add(k)
                    break
        m = X.TABLE_NAME_RE.match(caption or "")
        t_counter += 1
        name = f"Table {m.group(1)}" if m else f"Table {t_counter}"

        orient = header_orientation(grid)
        if orient == "row" and len(grid) > 1:
            header = [t for t, _ in grid[0]]
            body = grid[1:]
        elif orient == "column" and grid and len(grid[0]) > 1:
            header = [row[0][0] for row in grid]
            body = [row[1:] for row in grid]
        else:
            header = []
            body = grid
        rows_txt = [[t for t, _ in row] for row in body]
        types = [[X.cell_type(t) for t in row] for row in rows_txt]
        out.append(
            {
                "name": name,
                "description": caption or "",
                "header": header,
                "header_kind": orient,
                "rows": rows_txt,
                "cell_types": types,
                "span": anchor_span(tc.anchor, offsets),
            }
        )
    return out, truncated
