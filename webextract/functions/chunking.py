"""Document chunking: 1 doc -> k token-window rows.

The analog of the reference's VQA chunk expansion (one document becomes
multiple fixed-length token chunks, `layoutlm_transforms.py:315-535`
`VQASerTokenChunk`) — the standard prep step for LLM training corpora.
Deterministic word-window chunks; the DuckDB oracle reproduces the
boundaries exactly (lateral generate_series + list slicing).
"""

from __future__ import annotations

from typing import List

import pyarrow as pa


def chunk_batch(batch: pa.Table, *, max_tokens: int = 64,
                id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Explode each row into ceil(n_words/max_tokens) chunk rows."""
    ids_out: List = []
    idx_out: List[int] = []
    text_out: List[str] = []
    ntok_out: List[int] = []
    id_type = batch.schema.field(id_col).type  # id keeps its source type
    ids = batch.column(id_col).to_pylist()
    for rid, text in zip(ids, batch.column(text_col).to_pylist()):
        words = (text or "").split(" ")
        n = len(words)
        for ci in range((n + max_tokens - 1) // max_tokens):
            lo = ci * max_tokens
            hi = min(lo + max_tokens, n)
            ids_out.append(rid)
            idx_out.append(ci)
            text_out.append(" ".join(words[lo:hi]))
            ntok_out.append(hi - lo)
    return pa.table(
        {
            id_col: pa.array(ids_out, type=id_type),
            "chunk_idx": pa.array(idx_out, type=pa.int32()),
            "chunk_text": pa.array(text_out, type=pa.string()),
            "n_tokens": pa.array(ntok_out, type=pa.int64()),
        }
    )


def chunk_documents(ds, *, max_tokens: int = 64, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Dataset-level chunk explosion (stateless map_batches; no shuffle —
    chunks stay with their source block)."""
    import functools

    return ds.map_batches(
        functools.partial(
            chunk_batch, max_tokens=max_tokens, id_col=id_col, text_col=text_col
        ),
        batch_format="pyarrow",
    )
