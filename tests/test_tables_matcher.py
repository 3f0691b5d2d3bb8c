"""Table-structure decode + cell⇄text spatial matcher semantics."""

import pyarrow as pa

from webextract.functions.matcher import assemble_cell_texts, match_cells
from webextract.stages.tables import decode_table, explode_cells


def _grid(cells):
    return [(c["row"], c["col"], c["text"]) for c in cells]


class TestTableDecode:
    def test_simple_grid(self):
        html = b"<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
        assert _grid(decode_table(html)) == [
            (0, 0, "a"), (0, 1, "b"), (1, 0, "c"), (1, 1, "d")
        ]

    def test_th_header_flag(self):
        html = b"<table><tr><th>H</th></tr><tr><td>v</td></tr></table>"
        cells = decode_table(html)
        assert cells[0]["header"] is True and cells[1]["header"] is False

    def test_colspan_pushes_following_cells(self):
        html = (
            b"<table><tr><td colspan=2>wide</td><td>x</td></tr>"
            b"<tr><td>a</td><td>b</td><td>c</td></tr></table>"
        )
        assert _grid(decode_table(html)) == [
            (0, 0, "wide"), (0, 2, "x"),
            (1, 0, "a"), (1, 1, "b"), (1, 2, "c"),
        ]

    def test_rowspan_occupies_next_row(self):
        html = (
            b'<table><tr><td rowspan="2">tall</td><td>r0</td></tr>'
            b"<tr><td>r1</td></tr></table>"
        )
        assert _grid(decode_table(html)) == [
            (0, 0, "tall"), (0, 1, "r0"), (1, 1, "r1")
        ]

    def test_cell_markup_uses_canonical_decode(self):
        html = b"<table><tr><td> <em>a</em>&amp;b\n c </td></tr></table>"
        assert decode_table(html)[0]["text"] == "a&b c"

    def test_nested_table_stays_in_outer_cell(self):
        html = (
            b"<table><tr><td>outer "
            b"<table><tr><td>inner</td></tr></table>"
            b"</td><td>next</td></tr></table>"
        )
        assert _grid(decode_table(html)) == [(0, 0, "outer inner"), (0, 1, "next")]

    def test_unclosed_cells_implicitly_closed(self):
        html = b"<table><tr><td>a<td>b<tr><td>c</table>"
        assert _grid(decode_table(html)) == [(0, 0, "a"), (0, 1, "b"), (1, 0, "c")]

    def test_only_first_table_decoded(self):
        html = (
            b"<table><tr><td>one</td></tr></table>"
            b"<table><tr><td>two</td></tr></table>"
        )
        assert _grid(decode_table(html)) == [(0, 0, "one")]

    def test_explode_cells_batch(self):
        b = pa.table(
            {
                "doc_id": pa.array([7], type=pa.int64()),
                "html": pa.array(
                    [b"<table><tr><td>x</td><td>y</td></tr></table>"],
                    type=pa.binary(),
                ),
            }
        )
        out = explode_cells(b)
        assert out.column("doc_id").to_pylist() == [7, 7]
        assert out.column("row").to_pylist() == [0, 0]
        assert out.column("col").to_pylist() == [0, 1]
        assert out.column("cell_text").to_pylist() == ["x", "y"]


class TestMatcher:
    CELLS = [[0, 0, 10, 10], [10, 0, 20, 10], [0, 10, 10, 20]]

    def test_tier1_center_in_cell(self):
        assert match_cells(self.CELLS, [[1, 1, 3, 3], [12, 2, 14, 4]]) == [0, 1]

    def test_tier2_iou_when_center_outside(self):
        # box straddles cells 0/1 with center exactly on the shared edge x=10
        # -> center inside BOTH (inclusive): tier 1, lowest index wins
        assert match_cells(self.CELLS, [[8, 2, 12, 4]]) == [0]
        # center outside all cells (y > 20) but overlapping cell 2 only
        assert match_cells(self.CELLS, [[2, 18, 6, 26]]) == [2]

    def test_tier3_min_distance_when_no_overlap(self):
        # far box, nearest center is cell 1 (15,5)
        assert match_cells(self.CELLS, [[40, 2, 44, 4]]) == [1]

    def test_order_preserving_assembly(self):
        assign = [0, 1, 0]
        texts = ["first", "other", "second"]
        assert assemble_cell_texts(3, assign, texts) == [
            "first second", "other", ""
        ]

    def test_empty_sides(self):
        assert match_cells([], [[0, 0, 1, 1]]) == [-1]
        assert match_cells(self.CELLS, []) == []


class TestReadingOrderComparator:
    def test_same_line_tolerance_orders_by_x(self):
        from webextract.functions.matcher import sort_boxes_reading_order

        # slightly staggered y's (within tol) on one line; second line below
        boxes = [[50, 12, 90, 22], [0, 10, 40, 20], [0, 40, 40, 50],
                 [50, 42, 90, 52]]
        assert sort_boxes_reading_order(boxes, y_tol=10) == [1, 0, 2, 3]

    def test_outside_tolerance_is_top_to_bottom(self):
        from webextract.functions.matcher import sort_boxes_reading_order

        boxes = [[50, 30, 90, 40], [0, 0, 40, 10]]
        assert sort_boxes_reading_order(boxes, y_tol=10) == [1, 0]

    def test_deterministic_ties(self):
        from webextract.functions.matcher import sort_boxes_reading_order

        boxes = [[0, 0, 10, 10], [0, 0, 10, 10]]
        assert sort_boxes_reading_order(boxes) == [0, 1]

    def test_empty(self):
        from webextract.functions.matcher import sort_boxes_reading_order

        assert sort_boxes_reading_order([]) == []
