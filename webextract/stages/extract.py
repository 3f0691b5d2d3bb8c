"""Extract stage: span -> canonical text decode.

The analog of CRNN/SVTR recognition + `RecCTCLabelDecode`
(`mindocr/postprocess/rec_postprocess.py:104-166`): each detected span is
sliced out of the original payload (the `crop_text_region` analog,
`tools/infer/text/utils/utils.py:50-93`) and decoded to canonical text under
the exactly-specified rule order in `webextract.html.decode` (the
CTC-collapse analog). Per-row branch dispatch routes PDF spans to the PDF
string decoder — the layout-category dispatch pattern of
`tools/infer/text/predict_table_e2e.py:171-218`.

Runs as an actor pool (`map_batches(SpanExtractor, concurrency=(1, N))`) —
in the reference this stage holds warm recognizer weights
(`tools/infer/text/predict_rec.py:43-111`); here the warm state is the
compiled decode machinery, instantiated once per actor in `__init__`.
"""

from __future__ import annotations

import re
from typing import List, Optional

import pyarrow as pa

from webextract.html.decode import decode_fragment
from webextract.schema import BLOCK_TEXTS_TYPE

_PDF_UNESCAPE_RE = re.compile(rb"\\(.)", re.DOTALL)


def _pdf_unescape(raw: bytes) -> str:
    """Invert corpus._pdf_escape: \\( \\) \\\\ -> ( ) \\ ."""
    return _PDF_UNESCAPE_RE.sub(rb"\1", raw).decode("utf-8", "replace")


def decode_span(html: bytes, start: int, end: int, kind: str) -> str:
    """Decode one block span (offsets are byte offsets into `html`)."""
    raw = html[start:end]
    if kind == "pdf":
        return _pdf_unescape(raw)
    return decode_fragment(raw.decode("utf-8", "strict"), kind)


class SpanExtractor:
    """Actor-pool batch UDF: pages+spans batch -> + block_texts column.

    `drop_score` mirrors the reference's recognition-confidence filter
    (`predict_system.py:327-336`): blocks whose detect score falls below it
    are dropped (their text AND span, keeping the two columns parallel).
    """

    def __init__(self, drop_score: float = 0.5):
        self.drop_score = drop_score

    def __call__(self, batch: pa.Table) -> pa.Table:
        drop_score = self.drop_score
        html_col = batch.column("html")
        spans_col = batch.column("spans")
        status_col = batch.column("status")
        out_texts: List[List[str]] = []
        out_spans: List[List[dict]] = []
        for i in range(batch.num_rows):
            if status_col[i].as_py() != "ok":
                out_texts.append([])
                out_spans.append([])
                continue
            html = html_col[i].as_py()
            texts: List[str] = []
            kept: List[dict] = []
            for span in spans_col[i].as_py():
                if span["score"] < drop_score:
                    continue
                text = decode_span(html, span["start"], span["end"], span["kind"])
                if not text:
                    continue  # empty-after-decode blocks vanish (blank analog)
                texts.append(text)
                kept.append(span)
            out_texts.append(texts)
            out_spans.append(kept)
        idx = batch.schema.get_field_index("spans")
        return batch.set_column(
            idx, "spans", pa.array(out_spans, type=batch.schema.field("spans").type)
        ).append_column("block_texts", pa.array(out_texts, type=BLOCK_TEXTS_TYPE))
