"""Table-structure decode: <table> HTML -> structured (row, col, text) cells.

The analog of the reference's table decoders
(`mindocr/postprocess/table_postprocess.py:166-432` `TableLabelDecode` /
`TableMasterLabelDecode`, and `mindocr/data/transforms/table_transform.py:
107-390`): where the reference decodes structure-token sequences plus cell
bboxes into an HTML table, this stage inverts the web-document direction —
it parses a `<table>` region into an explicit cell grid, the structured
output a downstream consumer (SQL, layout reconstruction, the cell⇄text
matcher in `webextract.functions.matcher`) actually wants.

Semantics (the part that must be exact):

* grid coordinates are (row, col) with 0-based indices;
* `colspan`/`rowspan` occupy their full rectangle — a later cell in the
  same row is pushed RIGHT past occupied columns (the standard HTML table
  algorithm, and the reason TableMasterLabelDecode tracks cell bboxes
  per structure token rather than per <td>);
* cell text uses the SAME canonical decode rules as block extraction
  (`webextract.html.decode.decode_fragment`) — one whitespace policy
  engine-wide (byte-identity discipline);
* empty cells are kept (they carry grid structure), `<th>` counts as a
  cell with `header=True`.

Runs per document inside `map_batches` — a table is small; there is never a
shuffle (SURVEY.md §2.4 "per-document join" pattern).
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from webextract.html.decode import decode_fragment
from webextract.html.tokenizer import get_attr, iter_events

_CELL_TAGS = ("td", "th")


def _int_attr(html: bytes, a0: int, a1: int, name: str, default: int = 1) -> int:
    raw = get_attr(html, a0, a1, name)
    if raw is None:
        return default
    try:
        v = int(raw.strip())
    except ValueError:
        return default
    return max(v, 1)


def decode_table(html: bytes) -> List[dict]:
    """Parse the FIRST <table> in `html` into cell dicts.

    Returns [{row, col, rowspan, colspan, header, text}] in source order.
    Nested tables inside a cell contribute their raw text to the outer cell
    (the outer grid is the structure being decoded — matcher semantics).
    """
    cells: List[dict] = []
    in_table = False  # inside the first top-level <table>
    nested = 0  # nested-<table> depth while inside a cell
    row = -1
    occupied: set = set()  # (row, col) squares claimed by row/colspans
    cur: Optional[dict] = None  # open cell being accumulated
    cell_start = 0

    for ev in iter_events(html):
        k = ev[0]
        if k == "open":
            tag = ev[1]
            if cur is not None:
                # everything inside an open cell is cell content; only
                # track nested tables so their </td> can't close our cell
                if tag == "table":
                    nested += 1
                elif tag in _CELL_TAGS and nested == 0 or tag == "tr" and nested == 0:
                    # a sibling cell/row opening implicitly closes the
                    # unclosed cell (the HTML tree-construction rule)
                    cur["text"] = decode_fragment(
                        html[cell_start : ev[4]].decode("utf-8", "replace"),
                        "td",
                    )
                    cells.append(cur)
                    cur = None
                    # fall through to normal handling of this open tag
                else:
                    continue
            if cur is not None:
                continue
            if tag == "table":
                if not in_table:
                    in_table = True
                continue
            if not in_table:
                continue
            if tag == "tr":
                row += 1
            elif tag in _CELL_TAGS:
                if row < 0:
                    row = 0  # tr-less malformed table: implicit first row
                col = 0
                while (row, col) in occupied:
                    col += 1
                rs = _int_attr(html, ev[2], ev[3], "rowspan")
                cs = _int_attr(html, ev[2], ev[3], "colspan")
                for r in range(row, row + rs):
                    for c in range(col, col + cs):
                        occupied.add((r, c))
                cur = {
                    "row": row,
                    "col": col,
                    "rowspan": rs,
                    "colspan": cs,
                    "header": tag == "th",
                }
                nested = 0
                cell_start = ev[5]
        elif k == "close":
            tag = ev[1]
            if cur is not None:
                if tag == "table" and nested > 0:
                    nested -= 1
                elif tag == "table":
                    # </table> with the last cell still open: close the
                    # cell at the close-tag position AND end the table —
                    # otherwise the cell silently absorbs all trailing
                    # document content (common in crawl HTML)
                    cur["text"] = decode_fragment(
                        html[cell_start : ev[2]].decode("utf-8", "replace"),
                        "td",
                    )
                    cells.append(cur)
                    cur = None
                    break
                elif tag in _CELL_TAGS and nested == 0:
                    cur["text"] = decode_fragment(
                        html[cell_start : ev[2]].decode("utf-8", "replace"),
                        "td",
                    )
                    cells.append(cur)
                    cur = None
                continue
            if tag == "table" and in_table:
                break  # first top-level table fully decoded
    if cur is not None:
        # unclosed cell at EOF: close at end of buffer (forgiving parse)
        cur["text"] = decode_fragment(
            html[cell_start:].decode("utf-8", "replace"), "td"
        )
        cells.append(cur)
    return cells


_CELLS_TYPE = pa.list_(
    pa.struct(
        [
            ("row", pa.int32()),
            ("col", pa.int32()),
            ("rowspan", pa.int32()),
            ("colspan", pa.int32()),
            ("header", pa.bool_()),
            ("text", pa.string()),
        ]
    )
)


def decode_tables_batch(batch: pa.Table, html_col: str = "html") -> pa.Table:
    """map_batches UDF: add `cells` (list<struct>) per document."""
    rows = [decode_table(h or b"") for h in batch.column(html_col).to_pylist()]
    return batch.append_column("cells", pa.array(rows, type=_CELLS_TYPE))


def explode_cells(batch: pa.Table, id_col: str = "doc_id",
                  html_col: str = "html") -> pa.Table:
    """map_batches UDF: one output ROW per table cell (id, row, col, text).

    The flat relational projection of the decode — the shape a SQL oracle
    (and most downstream consumers) compares against.
    """
    ids, rr, cc, tt = [], [], [], []
    for i, h in zip(batch.column(id_col).to_pylist(),
                    batch.column(html_col).to_pylist()):
        for cell in decode_table(h or b""):
            ids.append(i)
            rr.append(cell["row"])
            cc.append(cell["col"])
            tt.append(cell["text"])
    return pa.table(
        {
            id_col: pa.array(ids, type=pa.int64()),
            "row": pa.array(rr, type=pa.int32()),
            "col": pa.array(cc, type=pa.int32()),
            "cell_text": pa.array(tt, type=pa.string()),
        }
    )
