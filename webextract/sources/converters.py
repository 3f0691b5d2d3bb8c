"""Dataset converters: external annotation formats -> canonical tables.

The reference ships ~25 one-off converters normalizing public datasets into
its common `img\\tjson` label format (`tools/dataset_converters/*.py`, e.g.
`ic15.py`, `totaltext.py`). Same pattern here: each converter is a
`map_batches` normalizer from a foreign layout into one of our canonical
schemas (pages / blocks_gold / spans_rec), so every downstream operator
sees one shape.

Implemented converters:

* :func:`det_labels_to_blocks` — the det annotation format
  (`url\\tjson(list[{"transcription", "span"}])`, the web analog of
  `img_name\\t[{"transcription", "points"}]`, det_dataset.py:17-25) ->
  blocks_gold table.
* :func:`rec_labels_to_spans` — the rec format (`fragment\\ttext`,
  rec_dataset.py:10-15 analog) -> spans_rec table.
* :func:`jsonl_to_pages` — JSONL crawl dumps ({url, ts, html_b64, lang})
  -> pages table.
"""

from __future__ import annotations

import base64
import json
from typing import List

import pyarrow as pa

BLOCKS_GOLD_TYPE = pa.list_(
    pa.struct(
        [
            ("start", pa.int64()),
            ("end", pa.int64()),
            ("kind", pa.string()),
            ("text", pa.string()),
            ("ignore", pa.bool_()),
        ]
    )
)


def det_labels_to_blocks(batch: pa.Table, *, line_col: str = "line") -> pa.Table:
    """`url\\tjson` annotation lines -> (url, blocks) rows.

    Unparseable lines produce an `error` row instead of crashing (quarantine
    discipline), mirroring how `###` transcriptions mark ignored regions in
    the reference format (det_transforms.py:77-80): a block whose text is
    `###` gets ignore=True.
    """
    urls: List[str] = []
    blocks_col: List[list] = []
    errors: List[str] = []
    for line in batch.column(line_col).to_pylist():
        try:
            url, payload = line.split("\t", 1)
            raw = json.loads(payload)
            blocks = [
                {
                    "start": int(b["span"][0]),
                    "end": int(b["span"][1]),
                    "kind": b.get("kind", "p"),
                    "text": "" if b["transcription"] == "###" else b["transcription"],
                    "ignore": b["transcription"] == "###",
                }
                for b in raw
            ]
            urls.append(url)
            blocks_col.append(blocks)
            errors.append("")
        except (ValueError, KeyError, json.JSONDecodeError) as e:
            urls.append(line.split("\t", 1)[0] if "\t" in line else "")
            blocks_col.append([])
            errors.append(f"parse-error: {type(e).__name__}")
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "blocks": pa.array(blocks_col, type=BLOCKS_GOLD_TYPE),
            "error": pa.array(errors, type=pa.string()),
        }
    )


def rec_labels_to_spans(batch: pa.Table, *, line_col: str = "line") -> pa.Table:
    """`fragment_b64\\tgold_text` lines -> spans_rec rows (FIXTURES.md §3)."""
    frags: List[bytes] = []
    golds: List[str] = []
    for line in batch.column(line_col).to_pylist():
        frag_b64, gold = line.split("\t", 1)
        frags.append(base64.b64decode(frag_b64))
        golds.append(gold)
    return pa.table(
        {
            "block_html": pa.array(frags, type=pa.binary()),
            "gold_text": pa.array(golds, type=pa.string()),
        }
    )


def jsonl_to_pages(batch: pa.Table, *, line_col: str = "text") -> pa.Table:
    """JSONL crawl-dump lines -> pages rows (url, warc_ts, html, text, lang)."""
    import datetime

    urls, ts, htmls, texts, langs = [], [], [], [], []
    for line in batch.column(line_col).to_pylist():
        rec = json.loads(line)
        urls.append(rec["url"])
        ts.append(datetime.datetime.fromisoformat(rec["ts"]))
        htmls.append(base64.b64decode(rec["html_b64"]))
        texts.append(rec.get("text", ""))
        langs.append(rec.get("lang", "und"))
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )
