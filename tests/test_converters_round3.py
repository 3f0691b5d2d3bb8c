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


def test_rctw17():
    from webextract.sources.converters import rctw17_to_quads

    lines = ['0,0,10,0,10,10,0,10,1,"hello world"',
             '0,0,10,0,10,10,0,10,0,"faint"',
             "0,0,10,10,10,0,0,10,1,bow"]
    out = rctw17_to_quads(pa.table({"record_id": ["r"], "lines": [lines]}))
    quads = out.column("quads")[0].as_py()
    # NOTE: line 3's bowtie becomes valid after the clockwise sort (the
    # reference sorts BEFORE validity), so 3 rows survive
    assert quads[0]["text"] == "hello world" and not quads[0]["ignore"]
    assert quads[1]["ignore"] and quads[1]["text"] == ""


def test_ctw_jsonl():
    from webextract.sources.converters import ctw_jsonl_to_quads

    rec = {
        "file_name": "img1.jpg",
        "annotations": [[
            {"text": "你", "polygon": [[0, 0], [4, 0], [4, 4], [0, 4]]},
            {"text": "好", "polygon": [[5, 0], [9, 0], [9, 4], [5, 4]]},
        ]],
        "ignore": [{"polygon": [[20, 20], [24, 20], [24, 24], [20, 24]]}],
    }
    out = ctw_jsonl_to_quads(pa.table({"line": [json.dumps(rec)]}))
    assert out.column("record_id")[0].as_py() == "img1.jpg"
    quads = out.column("quads")[0].as_py()
    assert quads[0]["text"] == "你好"
    # hull covers both character boxes
    xs = quads[0]["points"][0::2]
    assert min(xs) == 0.0 and max(xs) == 9.0
    assert quads[1]["ignore"]


def test_borndigital():
    from webextract.sources.converters import borndigital_to_quads

    lines = ['5, 5, 50, 20, "Sample Text"', "0, 0, 0, 10, \"zero\""]
    out = borndigital_to_quads(
        pa.table({"record_id": ["r"], "lines": [lines]}))
    quads = out.column("quads")[0].as_py()
    assert len(quads) == 1  # zero-area box skipped
    assert quads[0]["text"] == "Sample Text"
    assert quads[0]["points"] == [5.0, 5.0, 50.0, 5.0, 50.0, 20.0, 5.0, 20.0]


def test_textocr():
    from webextract.sources.converters import textocr_to_quads

    data = {
        "imgs": {"1": {"id": 1, "file_name": "train/a.jpg"}},
        "imgToAnns": {"1": [7, 8, 9]},
        "anns": {
            "7": {"points": [0, 0, 10, 0, 10, 10, 0, 10],
                  "utf8_string": "ok", "bbox": [0, 0, 10, 10]},
            "8": {"points": [0, 0, 10, 10, 10, 0, 0, 10, 5, 20],
                  "utf8_string": "poly", "bbox": [1, 2, 3, 4]},  # invalid 5-gon -> bbox
            "9": {"points": [0, 0, 5, 0, 5, 5, 0, 5],
                  "utf8_string": ".", "bbox": [0, 0, 5, 5]},  # dot = ignore
        },
    }
    out = textocr_to_quads(pa.table({"json": [json.dumps(data)]}))
    quads = out.column("quads")[0].as_py()
    assert quads[0]["text"] == "ok"
    assert quads[1]["points"] == [1.0, 2.0, 4.0, 2.0, 4.0, 6.0, 1.0, 6.0]
    assert quads[2]["ignore"]


def test_art():
    from webextract.sources.converters import art_to_quads

    data = {"gt_2": [
        {"transcription": "word", "language": "Latin", "illegibility": False,
         "points": [[0, 0], [10, 0], [10, 10], [0, 10]]},
        {"transcription": "xx", "language": "Latin", "illegibility": False,
         "points": [[0, 0], [5, 5]]},  # < 3 points -> skipped
        {"transcription": "yy", "language": "Chinese", "illegibility": True,
         "points": [[0, 0], [4, 0], [4, 4], [0, 4]]},
    ]}
    out = art_to_quads(pa.table({"json": [json.dumps(data)]}))
    quads = out.column("quads")[0].as_py()
    assert len(quads) == 2
    assert quads[0]["text"] == "word" and quads[0]["script"] == "Latin"
    assert quads[1]["ignore"] and quads[1]["script"] == "Chinese"


def test_ccpd():
    from webextract.sources.converters import ccpd_to_quads

    # province 0 = 皖, alphabet 0 = A, ads 24 = '0', ads 33 = '9'
    name = ("025-95_113-154&383_386&473-386&473_177&454_154&383_363&402-"
            "0_0_24_33_24_33_24-134-56.jpg")
    out = ccpd_to_quads(pa.table({"file_name": [name]}))
    quads = out.column("quads")[0].as_py()
    assert len(quads) == 1
    assert quads[0]["text"] == "皖A0909 0".replace(" ", "")
    assert quads[0]["points"][:4] == [386.0, 473.0, 177.0, 454.0]
