"""BIO tag-sequence -> entity-span decoding over token streams.

The analog of the reference's SER postprocess
(`mindocr/postprocess/kie_ser_postprocess.py:10-83`,
`VQASerTokenLayoutLMPostProcess`): a per-token BIO tag sequence is decoded
into contiguous entity spans. Decode rules (the exactly-specified order that
makes output deterministic):

* ``B-X`` starts a new span with label X (closing any open span);
* ``I-X`` continues an open span of the SAME label; an ``I-X`` with no
  matching open span starts one (the standard lenient-BIO repair — stray
  continuations become singletons instead of being dropped);
* ``O`` (or any other value) closes the open span;
* end-of-sequence closes the open span.

Span text joins its tokens with a single space (the engine-wide assembly
discipline). Runs per row inside `map_batches`; no state, no shuffle.
"""

from __future__ import annotations

from typing import List, Sequence

import pyarrow as pa


def bio_decode(tokens: Sequence[str], tags: Sequence[str]) -> List[dict]:
    """Decode one (tokens, tags) sequence into entity-span dicts:
    {tok_start, tok_end (exclusive), label, text} in token order."""
    spans: List[dict] = []
    open_start = -1
    open_label = None

    def close(end: int) -> None:
        nonlocal open_start, open_label
        if open_label is not None:
            spans.append(
                {
                    "tok_start": open_start,
                    "tok_end": end,
                    "label": open_label,
                    "text": " ".join(tokens[open_start:end]),
                }
            )
            open_start, open_label = -1, None

    for i, tag in enumerate(tags):
        if tag.startswith("B-"):
            close(i)
            open_start, open_label = i, tag[2:]
        elif tag.startswith("I-"):
            label = tag[2:]
            if open_label != label:
                close(i)
                open_start, open_label = i, label
        else:
            close(i)
    close(len(tags))
    return spans


_ENTITIES_TYPE = pa.list_(
    pa.struct(
        [
            ("tok_start", pa.int32()),
            ("tok_end", pa.int32()),
            ("label", pa.string()),
            ("text", pa.string()),
        ]
    )
)


def bio_decode_batch(batch: pa.Table, tokens_col: str = "tokens",
                     tags_col: str = "tags") -> pa.Table:
    """map_batches UDF: add `entities` (list<struct>) per row."""
    toks = batch.column(tokens_col).to_pylist()
    tags = batch.column(tags_col).to_pylist()
    rows = [bio_decode(t or [], g or []) for t, g in zip(toks, tags)]
    return batch.append_column("entities", pa.array(rows, type=_ENTITIES_TYPE))


def explode_entities(batch: pa.Table, id_col: str = "doc_id",
                     tokens_col: str = "tokens",
                     tags_col: str = "tags") -> pa.Table:
    """map_batches UDF: one output row per decoded entity."""
    ids, eidx, ts, te, lb, tx = [], [], [], [], [], []
    for did, toks, tags in zip(batch.column(id_col).to_pylist(),
                               batch.column(tokens_col).to_pylist(),
                               batch.column(tags_col).to_pylist()):
        for j, e in enumerate(bio_decode(toks or [], tags or [])):
            ids.append(did)
            eidx.append(j)
            ts.append(e["tok_start"])
            te.append(e["tok_end"])
            lb.append(e["label"])
            tx.append(e["text"])
    return pa.table(
        {
            id_col: pa.array(ids, type=pa.int64()),
            "ent_idx": pa.array(eidx, type=pa.int32()),
            "tok_start": pa.array(ts, type=pa.int32()),
            "tok_end": pa.array(te, type=pa.int32()),
            "label": pa.array(lb, type=pa.string()),
            "ent_text": pa.array(tx, type=pa.string()),
        }
    )
