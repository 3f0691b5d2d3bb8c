"""Pins for the JSONL / CSV pages sources (sources/pages.py): loosely
typed inputs coerce to the canonical pages schema and run the full
extraction pipeline unchanged."""

import json

import pyarrow as pa

from webextract import corpus
from webextract.pipelines.extract_pipeline import extract_pages
from webextract.sources.pages import read_pages_csv, read_pages_jsonl


def _rows(n=40):
    out = []
    for r in corpus.generate_pages(n):
        try:
            html_s = r["html"].decode("utf-8")
        except UnicodeDecodeError:
            continue  # corrupt rows can't ride a text container format
        out.append({
            "url": r["url"],
            "warc_ts": int(r["warc_ts"].timestamp()),  # epoch seconds form
            "html": html_s,
            "text": r["text"],
            "lang": r["lang"],
        })
    return out


def test_jsonl_source_extracts_byte_identical(ray_session, tmp_path):
    rows = _rows()
    p = tmp_path / "pages.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ds = read_pages_jsonl(str(p))
    out = extract_pages(ds).to_pandas()
    ok = out[out.status == "ok"]
    assert len(out) == len(rows)
    assert (ok.text == ok.gold_text).all()
    # warc_ts coerced from epoch seconds
    assert str(out.warc_ts.dtype).startswith("datetime64")


def test_csv_source_extracts_byte_identical(ray_session, tmp_path):
    import csv

    rows = _rows()
    p = tmp_path / "pages.csv"
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["url", "warc_ts", "html", "text", "lang"]
        )
        w.writeheader()
        for r in rows:
            w.writerow(r)
    ds = read_pages_csv(str(p))
    out = extract_pages(ds).to_pandas()
    ok = out[out.status == "ok"]
    assert len(out) == len(rows)
    assert (ok.text == ok.gold_text).all()


def test_jsonl_source_defaults_missing_columns(ray_session, tmp_path):
    p = tmp_path / "min.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"url": "u1", "html": "<p>hello world</p>"})
                + "\n")
    t = read_pages_jsonl(str(p)).take_all()
    assert t[0]["text"] == "" and t[0]["lang"] == "und"
    assert isinstance(t[0]["html"], bytes)
