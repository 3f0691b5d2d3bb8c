"""Anchor/outlink extraction from raw HTML pages.

The web-graph analog of the reference's det stage crop fan-out: where
`crop_text_region` slices each detected region out of the page image and
ships only the crops (`tools/infer/text/predict_system.py:120-150`), the
link extractor slices each ``<a href>`` region out of the page bytes and
ships only ``(doc_id, href, anchor)`` rows — the input every link-graph /
PageRank / anchor-text-index stage of a crawl pipeline consumes.

Gating mirrors `stages/segment.BlockSegmenter` exactly: null payloads and
non-UTF-8 pages emit no links (the quarantine classes), PDF payloads emit
no links (the PDF layout parser has no anchor concept). Anchor text is
canonicalized with the SAME decode chain as block text
(`html/decode.decode_fragment`: strip tags -> unescape -> collapse ws), so
a downstream join of anchors against extracted text is consistent.

Nested ``<a>`` is illegal HTML; the scanner keeps the OUTERMOST open
anchor (inner opens are ignored), and an anchor left open at EOF is
dropped — both the forgiving-parse discipline of `html/tokenizer`.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from webextract.html.decode import decode_fragment
from webextract.html.tokenizer import get_attr, iter_events

_PDF_MAGIC = b"%PDF-"




def scan_links(html: bytes, encoding: str = "utf-8") -> List[tuple]:
    """One page -> [(href, anchor_text)] in document order."""
    out: List[tuple] = []
    href: Optional[bytes] = None
    a_start = 0
    for ev in iter_events(html):
        kind = ev[0]
        if kind == "open" and ev[1] == "a":
            if href is None:  # outermost anchor wins
                h = get_attr(html, ev[2], ev[3], "href")
                if h is not None:
                    href = h
                    a_start = ev[5]
        elif kind == "close" and ev[1] == "a" and href is not None:
            frag = html[a_start:ev[2]].decode(encoding, "replace")
            out.append((href.decode(encoding, "replace"),
                        decode_fragment(frag)))
            href = None
    return out


class LinkExtractor:
    """Actor-pool batch UDF: pages batch -> (id, href, anchor) rows.

    ``id_col`` is the page identity carried through: ``doc_id`` (int64)
    for the documents-derived pages table, ``url`` (string) for the
    BASELINE-shaped on-disk corpus (PAGES_SCHEMA has no doc_id)."""

    def __init__(self, id_col: str = "doc_id",
                 id_type: pa.DataType = pa.int64()):
        self.id_col = id_col
        self.schema = pa.schema([
            (id_col, id_type),
            ("href", pa.string()),
            ("anchor", pa.string()),
        ])

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: List = []
        hrefs: List[str] = []
        anchors: List[str] = []
        for pid, html in zip(batch.column(self.id_col).to_pylist(),
                             batch.column("html").to_pylist()):
            if html is None or html[:5] == _PDF_MAGIC:
                continue
            enc = "utf-8"
            try:
                # ASCII fast path (valid UTF-8 by construction, no str alloc)
                if not html.isascii():
                    html.decode("utf-8", "strict")
            except UnicodeDecodeError:
                # same charset-sniff rule as the extractor (segment.py):
                # declared legacy charset decodes, else quarantine class
                from webextract.stages.segment import sniff_charset

                enc = sniff_charset(html)
                if enc is None:
                    continue  # quarantine class: corrupt page, no links
                try:
                    html.decode(enc, "strict")
                except UnicodeDecodeError:
                    continue
            for href, anchor in scan_links(html, enc):
                ids.append(pid)
                hrefs.append(href)
                anchors.append(anchor)
        return pa.table({
            self.id_col: pa.array(ids, type=self.schema.types[0]),
            "href": pa.array(hrefs, type=pa.string()),
            "anchor": pa.array(anchors, type=pa.string()),
        }, schema=self.schema)


def extract_links(pages, *, id_col: str = "doc_id",
                  id_type: pa.DataType = pa.int64(),
                  concurrency=(1, 4), batch_size: int = 256):
    """Dataset op: pages (id_col, html, ...) -> links (id_col, href,
    anchor). Pruned to the two needed columns before the actor pool so
    page payloads stop at the extractor."""
    return pages.select_columns([id_col, "html"]).map_batches(
        LinkExtractor(id_col=id_col, id_type=id_type),
        batch_format="pyarrow", batch_size=batch_size,
    )
