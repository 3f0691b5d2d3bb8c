"""Explicit Arrow schemas for every stage boundary.

The reference infers its column set by probing sample 0 through the transform
chain (`mindocr/data/det_dataset.py:83-99`); here every logical table has a
declared `pyarrow.Schema` instead (Ray Data blocks are Arrow tables).
"""

from __future__ import annotations

import pyarrow as pa

# Input table (BASELINE.json input_hint): one row per crawled web document.
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),  # reserved gold slot (FIXTURES.md §1)
        ("lang", pa.string()),
    ]
)

# Block spans produced by the detect stage: byte offsets into `html`
# (analog of polygons `float32 [N, pts, 2]`, mindocr det_transforms.py:82-86 —
# ragged per-document, so an Arrow list<struct> column, never padded).
SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("start", pa.int64()),
            ("end", pa.int64()),
            ("kind", pa.string()),
            ("score", pa.float64()),
        ]
    )
)

# Extracted per-block texts (parallel to spans, ragged).
BLOCK_TEXTS_TYPE = pa.list_(pa.string())

# Final output row (analog of the reference result line
# `name\tjson(list[{transcription, points}])`, predict_system.py:358-379).
OUTPUT_FIELDS = [
    ("url", pa.string()),
    ("text", pa.string()),  # extracted canonical text, '\n'-joined blocks
    ("n_blocks", pa.int32()),
    ("status", pa.string()),  # 'ok' | 'error'
    ("error", pa.string()),  # quarantine reason, '' when ok
    ("doctype", pa.string()),  # 'html' | 'pdf' | ''
]
