"""End-to-end training-data prep: extract -> filter -> chunk.

The composition a 100 TB crawl-to-training-corpus job actually runs:

    pages --extract--> canonical text --quality/lang filter--> kept docs
          --chunk--> fixed-token windows --> write

Every stage is one of this engine's operators; the whole chain stays lazy
and shuffle-free (extraction is per-row, the filter is per-row, chunking
explodes rows in place). Deterministic end-to-end, so the full composition
has a DuckDB oracle (`__ray_entry__.q_training_prep`).
"""

from __future__ import annotations

import functools
from typing import List, Optional


def prep_training_data(
    pages_ds,
    *,
    chunk_tokens: int = 64,
    min_quality: float = 0.5,
    langs: Optional[List[str]] = None,
    id_col: str = "doc_id",
    concurrency=(1, 8),
    batch_size: int = 256,
):
    """pages Dataset -> chunk rows (id, chunk_idx, chunk_text, n_tokens).

    Quarantined rows drop at the status filter; low-quality docs drop at the
    quality filter; `langs` (metadata lang column) optionally restricts.
    """
    from webextract.functions.chunking import chunk_batch
    from webextract.functions.textstats import quality_score_batch
    from webextract.pipelines.extract_pipeline import extract_pages

    ds = extract_pages(pages_ds, concurrency=concurrency, batch_size=batch_size)
    ds = ds.filter(expr="status == 'ok'")
    if langs:
        quoted = ", ".join(f"'{l}'" for l in langs)
        ds = ds.filter(expr=f"lang in [{quoted}]")  # bracket list: paren
        # tuples are rejected by Ray's expression evaluator
    ds = ds.map_batches(quality_score_batch, batch_format="pyarrow")
    ds = ds.filter(expr=f"quality >= {min_quality}")
    return ds.map_batches(
        functools.partial(chunk_batch, max_tokens=chunk_tokens, id_col=id_col),
        batch_format="pyarrow",
    )
