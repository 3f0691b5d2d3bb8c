"""Property tests for round-2 operators (hypothesis)."""

from html import escape

from hypothesis import given, settings
from hypothesis import strategies as st

from webextract.functions.entities import bio_decode
from webextract.stages.tables import decode_table

_WORD = st.text(alphabet="abcxyz09", min_size=1, max_size=6)


@settings(max_examples=60, deadline=None)
@given(
    grid=st.lists(
        st.lists(_WORD, min_size=1, max_size=4), min_size=1, max_size=4
    )
)
def test_table_plain_grid_roundtrip(grid):
    html = "<table>" + "".join(
        "<tr>" + "".join(f"<td>{escape(w)}</td>" for w in row) + "</tr>"
        for row in grid
    ) + "</table>"
    cells = decode_table(html.encode())
    got = {}
    for c in cells:
        got[(c["row"], c["col"])] = c["text"]
    want = {(r, i): w for r, row in enumerate(grid) for i, w in enumerate(row)}
    assert got == want


@settings(max_examples=60, deadline=None)
@given(
    spans=st.lists(
        st.tuples(st.integers(1, 3), st.integers(1, 3), _WORD),
        min_size=1, max_size=6,
    )
)
def test_table_spans_never_overlap(spans):
    # one row of spanned cells followed by a plain row: decoded occupancy
    # rectangles must be disjoint and in source order
    html = "<table><tr>" + "".join(
        f'<td rowspan="{rs}" colspan="{cs}">{escape(w)}</td>'
        for rs, cs, w in spans
    ) + "</tr><tr><td>z</td></tr></table>"
    cells = decode_table(html.encode())
    seen = set()
    for c in cells:
        for r in range(c["row"], c["row"] + c["rowspan"]):
            for col in range(c["col"], c["col"] + c["colspan"]):
                assert (r, col) not in seen
                seen.add((r, col))
    # cells arrive in source order: same-row cells have increasing col
    first_row = [c for c in cells if c["row"] == 0]
    assert [c["col"] for c in first_row] == sorted(c["col"] for c in first_row)


_TAG = st.sampled_from(["O", "B-A", "I-A", "B-B", "I-B"])


@settings(max_examples=100, deadline=None)
@given(tags=st.lists(_TAG, max_size=24))
def test_bio_spans_partition_tagged_positions(tags):
    tokens = [f"t{i}" for i in range(len(tags))]
    spans = bio_decode(tokens, tags)
    covered = set()
    prev_end = -1
    for s in spans:
        assert 0 <= s["tok_start"] < s["tok_end"] <= len(tags)
        assert s["tok_start"] >= prev_end  # sorted, non-overlapping
        prev_end = s["tok_end"]
        assert s["text"] == " ".join(tokens[s["tok_start"]:s["tok_end"]])
        for i in range(s["tok_start"], s["tok_end"]):
            assert tags[i] != "O"  # spans never swallow O positions
            assert tags[i].endswith(s["label"])
            covered.add(i)
    # every tagged position is covered by exactly one span
    assert covered == {i for i, t in enumerate(tags) if t != "O"}
