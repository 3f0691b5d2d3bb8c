"""Extract stage: block fragment -> canonical text decode.

The analog of CRNN/SVTR recognition + `RecCTCLabelDecode`
(`mindocr/postprocess/rec_postprocess.py:104-166`): each cropped block
fragment (sliced by the detect stage, the `crop_text_region` analog,
`tools/infer/text/utils/utils.py:50-93`) is decoded to canonical text under
the exactly-specified rule order in `webextract.html.decode` (the
CTC-collapse analog). Per-block branch dispatch routes PDF spans to the PDF
string decoder — the layout-category dispatch pattern of
`tools/infer/text/predict_table_e2e.py:171-218`.

Runs as an actor pool (`map_batches(SpanExtractor, concurrency=(1, N))`) —
in the reference this stage holds warm recognizer weights
(`tools/infer/text/predict_rec.py:43-111`). The hot path reads the
list<struct> spans and list<binary> fragments through their FLAT value
arrays + offsets (zero per-row dict materialization) and rebuilds the kept
subsets the same way.
"""

from __future__ import annotations

import re
from typing import List

import pyarrow as pa

from webextract.html.decode import decode_fragment

_PDF_UNESCAPE_RE = re.compile(rb"\\(.)", re.DOTALL)


def _pdf_unescape(raw: bytes) -> str:
    """Invert corpus._pdf_escape: \\( \\) \\\\ -> ( ) \\ ."""
    return _PDF_UNESCAPE_RE.sub(rb"\1", raw).decode("utf-8", "replace")


def decode_span(html: bytes, start: int, end: int, kind: str,
                encoding: str = "utf-8") -> str:
    """Decode one block span (offsets are byte offsets into `html`)."""
    return decode_block(html[start:end], kind, encoding)


def decode_block(raw: bytes, kind: str, encoding: str = "utf-8") -> str:
    """Decode one cropped block fragment to canonical text."""
    if kind == "pdf":
        return _pdf_unescape(raw)
    return decode_fragment(raw.decode(encoding or "utf-8", "strict"), kind)


def _combined(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


class SpanExtractor:
    """Actor-pool batch UDF: spans+fragments batch -> + block_texts column.

    `drop_score` mirrors the reference's recognition-confidence filter
    (`predict_system.py:327-336`): blocks whose detect score falls below it
    are dropped (text, span AND fragment — the three list columns stay
    parallel). Empty-after-decode blocks vanish (the CTC blank analog).
    """

    def __init__(self, drop_score: float = 0.5):
        self.drop_score = drop_score

    def __call__(self, batch: pa.Table) -> pa.Table:
        drop_score = self.drop_score
        spans = _combined(batch.column("spans"))
        frags = _combined(batch.column("block_html"))
        span_off = spans.offsets.to_pylist()
        sv = spans.values
        f_start = sv.field("start").to_pylist()
        f_end = sv.field("end").to_pylist()
        f_kind = sv.field("kind").to_pylist()
        f_score = sv.field("score").to_pylist()
        f_frag = frags.values.to_pylist()
        if "encoding" in batch.column_names:
            encodings = batch.column("encoding").to_pylist()
        else:
            encodings = ["utf-8"] * batch.num_rows

        n_starts: List[int] = []
        n_ends: List[int] = []
        n_kinds: List[str] = []
        n_scores: List[float] = []
        n_frags: List[bytes] = []
        n_texts: List[str] = []
        new_off = [0]
        for row in range(batch.num_rows):
            lo, hi = span_off[row], span_off[row + 1]
            enc = encodings[row] or "utf-8"
            for j in range(lo, hi):
                if f_score[j] < drop_score:
                    continue
                text = decode_block(f_frag[j], f_kind[j], enc)
                if not text:
                    continue
                n_starts.append(f_start[j])
                n_ends.append(f_end[j])
                n_kinds.append(f_kind[j])
                n_scores.append(f_score[j])
                n_frags.append(f_frag[j])
                n_texts.append(text)
            new_off.append(len(n_starts))

        off = pa.array(new_off, type=pa.int32())
        struct = pa.StructArray.from_arrays(
            [
                pa.array(n_starts, type=pa.int64()),
                pa.array(n_ends, type=pa.int64()),
                pa.array(n_kinds, type=pa.string()),
                pa.array(n_scores, type=pa.float64()),
            ],
            names=["start", "end", "kind", "score"],
        )
        spans_arr = pa.ListArray.from_arrays(off, struct)
        frags_arr = pa.ListArray.from_arrays(off, pa.array(n_frags, type=pa.binary()))
        texts_arr = pa.ListArray.from_arrays(off, pa.array(n_texts, type=pa.string()))
        i_spans = batch.schema.get_field_index("spans")
        batch = batch.set_column(i_spans, "spans", spans_arr)
        i_frags = batch.schema.get_field_index("block_html")
        batch = batch.set_column(i_frags, "block_html", frags_arr)
        return batch.append_column("block_texts", texts_arr)
