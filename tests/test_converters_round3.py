"""Round-3 converter tests: 9 more of the reference's dataset formats."""

import json

import pyarrow as pa

from webextract.sources.converters import (
    _convex_hull,
    _poly_is_valid,
    _signed_area,
    _sort_clockwise,
    casia10k_to_quads,
    cocotext_to_quads,
    ctw1500_to_quads,
    ctw1500_xml_to_quads,
    lsvt_to_quads,
    rects_to_quads,
    sroie_to_quads,
    svt_to_quads,
    td500_to_quads,
)

SQUARE_CW = [[0, 0], [10, 0], [10, 10], [0, 10]]  # cw in image coords (y down)


def test_geometry_helpers():
    # image coords: y grows down, so visual-cw = positive shoelace area
    assert _signed_area(SQUARE_CW) > 0
    assert _poly_is_valid(SQUARE_CW)
    assert not _poly_is_valid([[0, 0], [10, 10], [10, 0], [0, 10]])  # bowtie
    assert not _poly_is_valid([[0, 0], [5, 0], [10, 0]])  # zero area
    hull = _convex_hull([[0, 0], [10, 0], [10, 10], [0, 10], [5, 5]])
    assert len(hull) == 4 and [5.0, 5.0] not in hull
    ordered = _sort_clockwise([[10, 0], [0, 0], [10, 10], [0, 10]])
    # reference formula: ascending centroid angle from -pi
    assert ordered == [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]


def test_ctw1500_txt():
    lines = ["0,0,10,0,10,10,0,10,####hello", "0,0,10,10,bad", "", 
             "0,10,10,10,10,0,0,0,#######"]
    out = ctw1500_to_quads(pa.table({"record_id": ["img1"], "lines": [lines]}))
    quads = out.column("quads")[0].as_py()
    assert len(quads) == 2
    assert quads[0]["text"] == "hello" and not quads[0]["ignore"]
    # every output polygon is shapely-clockwise (negative shoelace area):
    # line 1 was ccw (positive) and got reversed; line 4 was already cw
    for q in quads:
        poly = [[q["points"][i], q["points"][i + 1]] for i in range(0, 8, 2)]
        assert _signed_area(poly) < 0
    assert quads[1]["ignore"]


def test_ctw1500_xml():
    segs = ",".join(str(v) for v in
                    [0, 0, 4, 0, 8, 0, 12, 0, 12, 4, 12, 8, 12, 12, 8, 12,
                     4, 12, 0, 12, 0, 8, 0, 6, 0, 4, 0, 2])
    xml = f"""<root><image><box><label>word</label><segs>{segs}</segs>
    </box></image></root>"""
    out = ctw1500_xml_to_quads(
        pa.table({"record_id": ["x"], "xml": [xml]}))
    quads = out.column("quads")[0].as_py()
    assert len(quads) == 1 and quads[0]["text"] == "word"
    assert len(quads[0]["points"]) == 28


def test_svt_xml():
    xml = """<tagset><image><imageName>img/00_00.jpg</imageName>
    <address>x</address><taggedRectangles>
    <taggedRectangle height="20" width="50" x="5" y="-3">
      <tag>LABEL</tag></taggedRectangle>
    </taggedRectangles></image></tagset>"""
    out = svt_to_quads(pa.table({"xml": [xml]}))
    assert out.column("record_id")[0].as_py() == "img/00_00.jpg"
    q = out.column("quads")[0].as_py()[0]
    assert q["text"] == "LABEL"
    # y clipped at 0 like the reference crop
    assert q["points"][:4] == [5.0, 0.0, 55.0, 0.0]


def test_cocotext():
    data = {
        "imgs": {"1": {"id": 1, "set": "train", "file_name": "a.jpg"},
                 "2": {"id": 2, "set": "val", "file_name": "b.jpg"},
                 "3": {"id": 3, "set": "train", "file_name": "c.jpg"}},
        "imgToAnns": {"1": [10, 11], "2": [12], "3": [13]},
        "anns": {
            "10": {"polygon": [0, 0, 10, 0, 10, 10, 0, 10],
                   "utf8_string": "ok", "legibility": "legible",
                   "class": "machine printed", "language": "english"},
            "11": {"polygon": [0, 0, 5, 0, 5, 5, 0, 5],
                   "legibility": "illegible", "class": "o", "language": "n"},
            "12": {"polygon": [0, 0, 10, 0, 10, 10, 0, 10],
                   "utf8_string": "valonly", "legibility": "legible",
                   "class": "m", "language": "e"},
            "13": {"polygon": [0, 0, 5, 0, 5, 5, 0, 5],
                   "legibility": "illegible", "class": "o", "language": "n"},
        },
    }
    out = cocotext_to_quads(pa.table({"json": [json.dumps(data)]}))
    # img 2 is val-split, img 3 all-illegible -> only img 1 survives
    assert out.column("record_id").to_pylist() == ["a.jpg"]
    quads = out.column("quads")[0].as_py()
    assert [q["text"] for q in quads] == ["ok", ""]
    assert [q["ignore"] for q in quads] == [False, True]
    assert quads[0]["script"] == "english"


def test_td500_rotation():
    out = td500_to_quads(pa.table(
        {"record_id": ["r"], "lines": [["0 0 10 20 30 40 0.0",
                                        "1 1 0 0 10 10 0.0"]]}))
    quads = out.column("quads")[0].as_py()
    assert quads[0]["points"] == [10.0, 20.0, 40.0, 20.0, 40.0, 60.0,
                                  10.0, 60.0]
    assert not quads[0]["ignore"] and quads[0]["text"] == ""
    assert quads[1]["ignore"]
    import math
    out2 = td500_to_quads(pa.table(
        {"record_id": ["r"], "lines": [[f"0 0 0 0 10 10 {math.pi / 2}"]]}))
    pts = out2.column("quads")[0].as_py()[0]["points"]
    # 90-degree rotation about the center maps (0,0) -> (10, 0)
    assert pts[0:2] == [10.0, 0.0]


def test_lsvt_hull_repair():
    data = {"gt_1": [
        {"transcription": "fine", "illegibility": False,
         "points": [[0, 0], [10, 0], [10, 10], [0, 10]]},
        {"transcription": "bow", "illegibility": False,
         "points": [[0, 0], [10, 10], [10, 0], [0, 10]]},  # self-crossing
        {"transcription": "xx", "illegibility": True,
         "points": [[0, 0], [4, 0], [4, 4], [0, 4]]},
    ]}
    out = lsvt_to_quads(pa.table({"json": [json.dumps(data)]}))
    quads = out.column("quads")[0].as_py()
    assert quads[0]["text"] == "fine"
    # bowtie repaired by convex hull -> valid simple polygon again
    pts = quads[1]["points"]
    poly = [[pts[i], pts[i + 1]] for i in range(0, len(pts), 2)]
    assert _poly_is_valid(poly)
    assert quads[2]["ignore"] and quads[2]["text"] == ""


def test_rects():
    info = {"lines": [
        {"points": [0, 0, 10, 0, 10, 10, 0, 10],
         "transcription": "t", "ignore": 0},
        {"points": [0, 0, 10, 10, 10, 0, 0, 10],
         "transcription": "bad", "ignore": 0},  # invalid -> skipped
        {"points": [0, 0, 8, 0, 8, 8, 0, 8],
         "transcription": "z", "ignore": 1},
    ], "chars": [{"points": [0, 0, 1, 0, 1, 1, 0, 1]}]}
    out = rects_to_quads(pa.table({"record_id": ["img_1"],
                                   "json": [json.dumps(info)]}))
    quads = out.column("quads")[0].as_py()
    assert len(quads) == 2  # invalid polygon dropped; chars ignored
    assert quads[0]["text"] == "t"
    assert quads[1]["ignore"] and quads[1]["text"] == ""


def test_casia10k_sorts_clockwise():
    out = casia10k_to_quads(pa.table(
        {"record_id": ["r"],
         "lines": [["10,0,0,0,10,10,0,10,word", "0,0,10,0,10,10,0,10,###"]]}))
    quads = out.column("quads")[0].as_py()
    assert quads[0]["text"] == "word"
    assert quads[0]["points"] == [0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0]
    assert quads[1]["ignore"]


def test_sroie():
    lines = ["", "72,25,326,25,326,64,72,64,TOTAL 9.00",
             "0,0,10,10,10,0,0,10,junk",  # invalid polygon
             "1,1,9,1,9,9,1,9,***"]
    out = sroie_to_quads(pa.table({"record_id": ["X0"], "lines": [lines]}))
    quads = out.column("quads")[0].as_py()
    assert len(quads) == 2
    assert quads[0]["text"] == "TOTAL 9.00"
    assert quads[1]["ignore"] and quads[1]["text"] == ""
