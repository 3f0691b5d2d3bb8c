"""Assembly stage: ordered block texts -> canonical per-document text.

The analog of the reference's end-to-end result assembly
(`tools/infer/text/predict_system.py:327-379` + `recovery_to_doc.py`):
blocks are already in reading order (byte order — the `sorted_boxes`
top-to-bottom/left-to-right semantics, `tools/infer/text/utils/utils.py:
95-104`, degenerate to span order in a linear document), joined with a
single '\n' — THE byte-identity surface (SURVEY.md §2.8 "docx recovery").

Stateless `map_batches` function; drops the heavy `html` payload column so
only the compact result flows to the sink (the reference frees `data`/`frame`
for the same reason, `det_post_node.py:44-48`).
"""

from __future__ import annotations

import pyarrow as pa


def assemble_batch(batch: pa.Table, keep_spans: bool = False) -> pa.Table:
    texts = []
    n_blocks = []
    for lst in batch.column("block_texts").to_pylist():
        texts.append("\n".join(lst))
        n_blocks.append(len(lst))
    batch = batch.append_column("extracted_text", pa.array(texts, type=pa.string()))
    batch = batch.append_column("n_blocks", pa.array(n_blocks, type=pa.int32()))
    drop = ["html", "block_html", "block_texts"]
    if not keep_spans:
        drop.append("spans")
    batch = batch.drop_columns([c for c in drop if c in batch.column_names])
    # Input gold slot (FIXTURES.md: pages.text) moves aside; the extracted
    # text takes the canonical `text` name in the output schema.
    names = batch.column_names
    if "text" in names:
        batch = batch.rename_columns(
            ["gold_text" if n == "text" else n for n in names]
        )
    return batch.rename_columns(
        ["text" if n == "extracted_text" else n for n in batch.column_names]
    )
