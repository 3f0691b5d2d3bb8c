"""Converter tests: foreign annotation formats -> canonical tables."""

import base64
import json

import pyarrow as pa

from webextract.sources.converters import (
    det_labels_to_blocks,
    jsonl_to_pages,
    rec_labels_to_spans,
)


def test_det_labels_roundtrip():
    line = "https://a.example/1\t" + json.dumps(
        [
            {"transcription": "hello world", "span": [10, 30], "kind": "p"},
            {"transcription": "###", "span": [40, 50]},
        ]
    )
    out = det_labels_to_blocks(pa.table({"line": [line]}))
    blocks = out.column("blocks")[0].as_py()
    assert blocks[0]["text"] == "hello world" and not blocks[0]["ignore"]
    assert blocks[1]["ignore"] and blocks[1]["text"] == ""
    assert out.column("error")[0].as_py() == ""


def test_det_labels_quarantines_bad_line():
    out = det_labels_to_blocks(pa.table({"line": ["junk-without-tab"]}))
    assert out.column("error")[0].as_py().startswith("parse-error")
    assert out.column("blocks")[0].as_py() == []


def test_rec_labels():
    frag = b"<p>hi</p>"
    line = base64.b64encode(frag).decode() + "\thi"
    out = rec_labels_to_spans(pa.table({"line": [line]}))
    assert out.column("block_html")[0].as_py() == frag
    assert out.column("gold_text")[0].as_py() == "hi"


def test_jsonl_to_pages_schema():
    rec = {
        "url": "https://x.example/",
        "ts": "2024-03-01T12:00:00",
        "html_b64": base64.b64encode(b"<p>x</p>").decode(),
        "lang": "en",
    }
    out = jsonl_to_pages(pa.table({"text": [json.dumps(rec)]}))
    assert out.column_names == ["url", "warc_ts", "html", "text", "lang"]
    assert out.column("html")[0].as_py() == b"<p>x</p>"
    assert out.column("text")[0].as_py() == ""


def test_ic15_to_quads():
    from webextract.sources.converters import ic15_to_quads

    b = pa.table(
        {
            "record_id": ["img_1"],
            "lines": [[
                "﻿377,117,463,117,465,130,378,130,Genaxis Theatre",
                "374,155,409,155,409,170,374,170,###",
                "garbage line",
            ]],
        }
    )
    out = ic15_to_quads(b)
    quads = out.column("quads")[0].as_py()
    assert len(quads) == 2
    assert quads[0]["text"] == "Genaxis Theatre" and not quads[0]["ignore"]
    assert quads[0]["points"][:2] == [377.0, 117.0]
    assert quads[1]["ignore"] and quads[1]["text"] == ""


def test_totaltext_to_quads():
    from webextract.sources.converters import totaltext_to_quads

    line = ("x: [[115 503 494 115]], y: [[322 346 426 404]], "
            "ornt: [u'c'], transcriptions: [u'nauGHTY']")
    b = pa.table({"record_id": ["img0"], "lines": [[line]]})
    q = totaltext_to_quads(b).column("quads")[0].as_py()
    assert q[0]["text"] == "nauGHTY"
    assert q[0]["points"] == [115.0, 322.0, 503.0, 346.0, 494.0, 426.0, 115.0, 404.0]


def test_mlt_to_quads_script_field():
    from webextract.sources.converters import mlt_to_quads

    b = pa.table(
        {"record_id": ["r"], "lines": [["1,2,3,4,5,6,7,8,Latin,hello"]]}
    )
    q = mlt_to_quads(b).column("quads")[0].as_py()
    assert q[0]["script"] == "Latin" and q[0]["text"] == "hello"


def test_kv_to_spans_filters():
    from webextract.sources.converters import kv_to_spans

    b = pa.table(
        {
            "key": [b"image-000000001", b"label-000000001",
                    b"image-000000002", b"label-000000002",
                    b"image-000000003"],  # no label: dropped
            "value": [b"<p>one</p>", "café".encode(),
                      b"<p>two</p>", b"toolongword",
                      b"<p>orphan</p>"],
        }
    )
    out = kv_to_spans(b, max_text_len=8, standardize=True)
    assert out.num_rows == 1  # record 2 filtered by max_text_len
    import unicodedata

    assert out.column("gold_text")[0].as_py() == unicodedata.normalize("NFKD", "café")


def test_kie_labels_to_tokens():
    import json

    from webextract.sources.converters import kie_labels_to_tokens

    line = "https://x/1\t" + json.dumps(
        {"tokens": ["John", "Smith"], "tags": ["B-PER", "I-PER"]}
    )
    out = kie_labels_to_tokens(pa.table({"line": [line, "broken"]}))
    assert out.column("tokens")[0].as_py() == ["John", "Smith"]
    assert out.column("error")[1].as_py().startswith("parse-error")


def test_pubtab_to_cells_with_spans():
    import json

    from webextract.sources.converters import pubtab_to_cells

    rec = {
        "filename": "t1.png",
        "html": {
            "structure": {"tokens": [
                "<tr>", "<td", ' colspan="2"', ">", "<td></td>", "</tr>",
                "<tr>", "<td></td>", "<td></td>", "<td></td>", "</tr>",
            ]},
            "cells": [
                {"tokens": ["w", "ide"]}, {"tokens": ["x"]},
                {"tokens": ["a"]}, {"tokens": ["b"]}, {"tokens": ["c"]},
            ],
        },
    }
    out = pubtab_to_cells(pa.table({"line": [json.dumps(rec)]}))
    rows = list(zip(out.column("row").to_pylist(),
                    out.column("col").to_pylist(),
                    out.column("cell_text").to_pylist()))
    assert rows == [(0, 0, "wide"), (0, 2, "x"),
                    (1, 0, "a"), (1, 1, "b"), (1, 2, "c")]


def test_mtwi2018_float_coords_and_sort():
    from webextract.sources.converters import mtwi2018_to_quads

    lines = [
        "﻿10.5,10.0,90.2,10.0,90.2,40.7,10.5,40.7,hello",
        "0,0,1,0,1,1,0,1,###",
        "garbage-line",
    ]
    out = mtwi2018_to_quads(
        pa.table({"record_id": ["img1"], "lines": [lines]}))
    quads = out.column("quads")[0].as_py()
    assert len(quads) == 2
    assert quads[0]["text"] == "hello" and not quads[0]["ignore"]
    # clockwise from top-left: floats preserved
    assert quads[0]["points"][:2] == [10.5, 10.0]
    assert quads[1]["ignore"] and quads[1]["text"] == ""


def test_syntext150k_bbox_and_rec_decode():
    from webextract.sources.converters import syntext150k_to_quads

    doc = json.dumps({
        "images": [{"id": 60001, "file_name": "0000000.jpg",
                    "width": 400, "height": 600},
                   {"id": 60002, "width": 10, "height": 10}],
        "annotations": [
            {"image_id": 60001, "bbox": [218.0, 406.0, 138.0, 47.0],
             # 'the' in printable-ASCII ids (offset 32), then the CJK id
             "rec": [ord('t') - 32, ord('h') - 32, ord('e') - 32, 95, 96]},
            {"image_id": 60002, "bbox": [1, 2, 3, 4], "rec": []},
        ],
    })
    out = syntext150k_to_quads(pa.table({"json": [doc]}))
    assert out.column("record_id").to_pylist() == ["0000000.jpg",
                                                   "0060002.jpg"]
    q = out.column("quads")[0].as_py()[0]
    assert q["text"] == "the口"   # id 96 (> vocab) dropped, 95 -> CJK
    assert q["points"] == [218.0, 406.0, 356.0, 406.0,
                           356.0, 453.0, 218.0, 453.0]


def test_synthadd_rec_lines():
    from webextract.sources.converters import synthadd_to_spans

    out = synthadd_to_spans(pa.table({
        "folder": ["crop_img_1"],
        "lines": [['1.jpg,"Hello, world"', "bad line", '2.jpg,"x"']],
    }))
    assert out.column("record_id").to_pylist() == [
        "crop_img_1/1.jpg", "crop_img_1/?", "crop_img_1/2.jpg"]
    assert out.column("gold_text").to_pylist() == ["Hello, world", "", "x"]
    assert out.column("error")[1].as_py().startswith("unparseable")


def test_publaynet_layout_rows():
    from webextract.sources.converters import publaynet_to_layout

    doc = json.dumps({
        "images": [{"id": 1, "file_name": "p1.jpg",
                    "width": 200, "height": 100}],
        "annotations": [
            {"image_id": 1, "bbox": [50, 25, 100, 50], "category_id": 2},
            {"image_id": 1, "bbox": [0, 0, 20, 10], "category_id": 9},
            {"image_id": 42, "bbox": [0, 0, 1, 1], "category_id": 1},
        ],
    })
    out = publaynet_to_layout(pa.table({"json": [doc]}))
    assert out.num_rows == 2          # unknown image dropped
    assert out.column("category").to_pylist() == [0, -1]  # remap 2->0
    assert out.column("x_center")[0].as_py() == 0.5
    assert out.column("y_center")[0].as_py() == 0.5
    assert out.column("w")[0].as_py() == 0.5
    assert out.column("h")[0].as_py() == 0.5
    assert out.column("error")[1].as_py().startswith("unknown category")
