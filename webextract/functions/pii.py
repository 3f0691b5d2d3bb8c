"""PII detection / redaction over text columns.

The entity-span analog of the reference's SER/BIO postprocess
(`mindocr/postprocess/kie_ser_postprocess.py:10-83`: tag sequence -> entity
spans) recast for crawl text: regex entity detectors emit typed char-offset
spans per document, and an optional redaction pass replaces them with typed
placeholders. Standard prep step before training-data release.

Patterns are compiled once per actor (stateful-setup discipline); spans are
char offsets into the `text` column value (NOT the raw html — PII filtering
runs on extracted text).
"""

from __future__ import annotations

import re
from typing import List, Pattern, Tuple

import pyarrow as pa

PII_SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("start", pa.int64()),
            ("end", pa.int64()),
            ("kind", pa.string()),
        ]
    )
)

# specificity order: more specific patterns claim their span first
_PATTERNS: List[Tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
             r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b"),
    ("ssn_like", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d"),
]


def _compiled() -> List[Tuple[str, Pattern]]:
    return [(kind, re.compile(pat)) for kind, pat in _PATTERNS]


def detect_pii(text: str, patterns=None) -> List[dict]:
    """Typed, non-overlapping PII spans in char offsets (first match wins by
    pattern order, then position)."""
    patterns = patterns or _compiled()
    found: List[dict] = []
    taken: List[Tuple[int, int]] = []
    for kind, pat in patterns:
        for m in pat.finditer(text):
            s, e = m.start(), m.end()
            if any(s < te and ts < e for ts, te in taken):
                continue
            taken.append((s, e))
            found.append({"start": s, "end": e, "kind": kind})
    found.sort(key=lambda d: d["start"])
    return found


def redact(text: str, spans: List[dict]) -> str:
    """Replace spans (assumed sorted, non-overlapping) with <KIND> tokens."""
    out = []
    pos = 0
    for s in spans:
        out.append(text[pos : s["start"]])
        out.append(f"<{s['kind'].upper()}>")
        pos = s["end"]
    out.append(text[pos:])
    return "".join(out)


class PiiScanner:
    """Actor-pool UDF: add `pii_spans` (+ `text_redacted` when redacting)."""

    def __init__(self, text_col: str = "text", redact_col: bool = True):
        self.text_col = text_col
        self.redact_col = redact_col
        self.patterns = _compiled()  # compiled once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col: List[List[dict]] = []
        red_col: List[str] = []
        for text in batch.column(self.text_col).to_pylist():
            spans = detect_pii(text or "", self.patterns)
            spans_col.append(spans)
            if self.redact_col:
                red_col.append(redact(text or "", spans))
        batch = batch.append_column(
            "pii_spans", pa.array(spans_col, type=PII_SPAN_TYPE)
        )
        if self.redact_col:
            batch = batch.append_column(
                "text_redacted", pa.array(red_col, type=pa.string())
            )
        return batch
