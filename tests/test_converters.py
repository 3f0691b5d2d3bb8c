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
