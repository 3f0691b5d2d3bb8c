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
* :func:`ic15_to_quads` — ICDAR-2015 gt lines
  (`x1,y1,...,x4,y4,transcription`, `tools/dataset_converters/ic15.py`)
  -> per-record quad+text rows, `###` = ignore.
* :func:`totaltext_to_quads` — TotalText repr-style lines
  (`x: [[..]], y: [[..]], ..., transcriptions: [u'word']`,
  `tools/dataset_converters/totaltext.py` regex parse) -> polygon rows.
* :func:`mlt_to_quads` — MLT-2017 lines with a script/language field
  (`x1,y1,...,x4,y4,script,transcription`, `dataset_converters/mlt2017.py`).
* :func:`kv_to_spans` — LMDB-style K/V records (`image-%09d`/`label-%09d`,
  `mindocr/data/rec_lmdb_dataset.py:21-120`) -> spans_rec rows, with the
  reference's LOAD-TIME filters: NFKD label standardization
  (`label_standandize`) and max-length filtering (`filter_max_len`).
* :func:`kie_labels_to_tokens` — SER/KIE annotation lines
  (`url\\tjson({tokens, tags})`, `mindocr/data/kie_dataset.py` analog) ->
  (url, tokens, tags) rows for the BIO entity decoder.
* :func:`pubtab_to_cells` — PubTabNet-style JSONL structure-token records
  (`mindocr/data/table_pubtab_dataset.py:15` + the structure-token walk of
  `table_postprocess.py:166-432`) -> explicit (row, col, text) cell rows.
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


QUADS_TYPE = pa.list_(
    pa.struct(
        [
            ("points", pa.list_(pa.float64())),  # x1,y1,...,x4,y4 (or poly)
            ("text", pa.string()),
            ("ignore", pa.bool_()),
            ("script", pa.string()),
        ]
    )
)


def _quad_table(ids, quads):
    return pa.table(
        {
            "record_id": pa.array(ids, type=pa.string()),
            "quads": pa.array(quads, type=QUADS_TYPE),
        }
    )


def ic15_to_quads(batch: pa.Table, *, id_col: str = "record_id",
                  lines_col: str = "lines") -> pa.Table:
    """ICDAR-2015 per-record gt lines -> quad rows.

    Line format: `x1,y1,x2,y2,x3,y3,x4,y4,transcription`; a transcription of
    `###` marks the region ignored (the reference's ignore_tags convention,
    det_transforms.py:77-80). A UTF-8 BOM on the first line is stripped
    (the real gt files carry one — ic15.py does the same).
    """
    ids, quads = [], []
    for rid, lines in zip(batch.column(id_col).to_pylist(),
                          batch.column(lines_col).to_pylist()):
        out = []
        for line in lines or []:
            line = line.lstrip("\ufeff").strip()
            if not line:
                continue
            parts = line.split(",", 8)
            if len(parts) < 9:
                continue
            try:
                pts = [float(p) for p in parts[:8]]
            except ValueError:
                continue
            text = parts[8]
            out.append({"points": pts, "text": "" if text == "###" else text,
                        "ignore": text == "###", "script": ""})
        ids.append(rid)
        quads.append(out)
    return _quad_table(ids, quads)


_TT_X_RE = None
_TT_Y_RE = None
_TT_T_RE = None


def _tt_res():
    global _TT_X_RE, _TT_Y_RE, _TT_T_RE
    if _TT_X_RE is None:
        import re

        _TT_X_RE = re.compile(r"x:\s*\[\[([^\]]*)\]\]")
        _TT_Y_RE = re.compile(r"y:\s*\[\[([^\]]*)\]\]")
        _TT_T_RE = re.compile(r"transcriptions:\s*\[u?'(.*)'\]")
    return _TT_X_RE, _TT_Y_RE, _TT_T_RE


def totaltext_to_quads(batch: pa.Table, *, id_col: str = "record_id",
                       lines_col: str = "lines") -> pa.Table:
    """TotalText repr-style annotation lines -> polygon rows.

    Line shape: `x: [[402 404 ...]], y: [[...]], ornt: [u'c'],
    transcriptions: [u'word']` — parsed with the same regex strategy as the
    reference converter (totaltext.py); `#` transcription = ignore.
    """
    rx, ry, rt = _tt_res()
    ids, quads = [], []
    for rid, lines in zip(batch.column(id_col).to_pylist(),
                          batch.column(lines_col).to_pylist()):
        out = []
        for line in lines or []:
            mx, my, mt = rx.search(line), ry.search(line), rt.search(line)
            if not (mx and my):
                continue
            xs = [float(v) for v in mx.group(1).split()]
            ys = [float(v) for v in my.group(1).split()]
            pts = []
            for x, y in zip(xs, ys):
                pts.extend((x, y))
            text = mt.group(1) if mt else ""
            out.append({"points": pts, "text": "" if text == "#" else text,
                        "ignore": text == "#", "script": ""})
        ids.append(rid)
        quads.append(out)
    return _quad_table(ids, quads)


def mlt_to_quads(batch: pa.Table, *, id_col: str = "record_id",
                 lines_col: str = "lines") -> pa.Table:
    """MLT-2017 gt lines (`x1,..,y4,script,transcription`) -> quad rows
    carrying the script/language field (mlt2017.py analog)."""
    ids, quads = [], []
    for rid, lines in zip(batch.column(id_col).to_pylist(),
                          batch.column(lines_col).to_pylist()):
        out = []
        for line in lines or []:
            parts = line.lstrip("\ufeff").strip().split(",", 9)
            if len(parts) < 10:
                continue
            try:
                pts = [float(p) for p in parts[:8]]
            except ValueError:
                continue
            script, text = parts[8], parts[9]
            out.append({"points": pts, "text": "" if text == "###" else text,
                        "ignore": text == "###", "script": script})
        ids.append(rid)
        quads.append(out)
    return _quad_table(ids, quads)


def kv_to_spans(batch: pa.Table, *, key_col: str = "key",
                value_col: str = "value", max_text_len: int = 0,
                standardize: bool = False) -> pa.Table:
    """LMDB-style K/V rows -> spans_rec rows, with load-time filters.

    Keys follow the reference's `image-%09d` / `label-%09d` convention
    (rec_lmdb_dataset.py:21-120); a record needs both halves. Options mirror
    the reference's load filters: `standardize` applies NFKD normalization
    (`label_standandize`), `max_text_len>0` drops longer labels
    (`filter_max_len` — the CTC-feasibility filter).
    """
    import unicodedata

    frags = {}
    labels = {}
    for k, v in zip(batch.column(key_col).to_pylist(),
                    batch.column(value_col).to_pylist()):
        ks = k.decode("ascii") if isinstance(k, bytes) else k
        if ks.startswith("image-"):
            frags[ks[6:]] = v if isinstance(v, bytes) else str(v).encode()
        elif ks.startswith("label-"):
            labels[ks[6:]] = v.decode("utf-8") if isinstance(v, bytes) else str(v)
    out_f, out_g = [], []
    for idx in sorted(frags.keys() & labels.keys()):
        gold = labels[idx]
        if standardize:
            gold = unicodedata.normalize("NFKD", gold)
        if max_text_len and len(gold) > max_text_len:
            continue
        out_f.append(frags[idx])
        out_g.append(gold)
    return pa.table(
        {
            "block_html": pa.array(out_f, type=pa.binary()),
            "gold_text": pa.array(out_g, type=pa.string()),
        }
    )


def kie_labels_to_tokens(batch: pa.Table, *, line_col: str = "line") -> pa.Table:
    """`url\\tjson({tokens, tags})` SER annotation lines -> token/tag rows
    feeding the BIO entity decoder (kie_dataset.py analog)."""
    urls, toks, tags, errs = [], [], [], []
    for line in batch.column(line_col).to_pylist():
        try:
            url, payload = line.split("\t", 1)
            rec = json.loads(payload)
            urls.append(url)
            toks.append([str(t) for t in rec["tokens"]])
            tags.append([str(t) for t in rec["tags"]])
            errs.append("")
        except (ValueError, KeyError, json.JSONDecodeError) as e:
            urls.append(line.split("\t", 1)[0] if "\t" in line else "")
            toks.append([])
            tags.append([])
            errs.append(f"parse-error: {type(e).__name__}")
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "tokens": pa.array(toks, type=pa.list_(pa.string())),
            "tags": pa.array(tags, type=pa.list_(pa.string())),
            "error": pa.array(errs, type=pa.string()),
        }
    )


def pubtab_to_cells(batch: pa.Table, *, line_col: str = "line") -> pa.Table:
    """PubTabNet-style JSONL -> one row per table cell (row, col, text).

    Record shape: {"filename", "html": {"structure": {"tokens": [...]},
    "cells": [{"tokens": [...]}]}} — the structure-token walk mirrors the
    reference's table decode (`table_postprocess.py:166-432`): `<tr>`
    advances the row, `<td></td>` (or `<td` ... `>` with span attrs)
    consumes the next cell; row/colspan attrs claim their grid rectangle.
    """
    names, rr, cc, tt = [], [], [], []
    for line in batch.column(line_col).to_pylist():
        rec = json.loads(line)
        name = rec.get("filename", "")
        tokens = rec["html"]["structure"]["tokens"]
        cells = rec["html"].get("cells", [])
        row, cell_i = -1, 0
        occupied = set()
        i = 0
        while i < len(tokens):
            tok = tokens[i]
            if tok == "<tr>":
                row += 1
            elif tok in ("<td></td>", "<td>") or tok == "<td":
                rs = cs = 1
                if tok == "<td":  # attribute tokens until ">"
                    j = i + 1
                    while j < len(tokens) and tokens[j] != ">":
                        attr = tokens[j].strip()
                        if attr.startswith('rowspan="'):
                            rs = int(attr.split('"')[1])
                        elif attr.startswith('colspan="'):
                            cs = int(attr.split('"')[1])
                        j += 1
                    i = j
                if row < 0:
                    row = 0
                col = 0
                while (row, col) in occupied:
                    col += 1
                for r in range(row, row + rs):
                    for c in range(col, col + cs):
                        occupied.add((r, c))
                text = ""
                if cell_i < len(cells):
                    text = "".join(cells[cell_i].get("tokens", []))
                cell_i += 1
                names.append(name)
                rr.append(row)
                cc.append(col)
                tt.append(text)
            i += 1
    return pa.table(
        {
            "record_id": pa.array(names, type=pa.string()),
            "row": pa.array(rr, type=pa.int32()),
            "col": pa.array(cc, type=pa.int32()),
            "cell_text": pa.array(tt, type=pa.string()),
        }
    )


def columnar_to_blocks(record_ids, texts_per_record, spans_per_record=None) -> pa.Table:
    """SynthText-style columnar arrays -> canonical blocks table.

    The reference loads SynthText's `.mat` as parallel columnar arrays of
    paths / wordboxes / texts and fans them out per record
    (`mindocr/data/det_dataset.py:162-179`). Analog: three parallel Python/
    numpy sequences -> one (record_id, blocks) row each, zero file-format
    baggage (the `.mat` container itself needs scipy, absent here — the
    COLUMNAR-load pattern is the capability).
    """
    blocks_col = []
    for i, texts in enumerate(texts_per_record):
        spans = spans_per_record[i] if spans_per_record is not None else None
        blocks = []
        for j, t in enumerate(texts):
            start, end = (spans[j] if spans is not None else (0, 0))
            blocks.append(
                {"start": int(start), "end": int(end), "kind": "p",
                 "text": str(t), "ignore": str(t) == "###"}
            )
        blocks_col.append(blocks)
    return pa.table(
        {
            "record_id": pa.array([str(r) for r in record_ids], type=pa.string()),
            "blocks": pa.array(blocks_col, type=BLOCKS_GOLD_TYPE),
        }
    )
