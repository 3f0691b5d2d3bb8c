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
