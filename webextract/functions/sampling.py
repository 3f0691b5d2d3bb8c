"""Deterministic stratified sampling by a category column.

Training-data pipelines rebalance sources/languages by sampling each
stratum at its own rate (e.g. the Pile's per-subset epochs, CCNet's
per-language quotas). Two properties matter at 100 TB:

* **Deterministic & key-derived** — the keep decision depends only on
  the row's id, never on RNG state, partitioning, or visit order, so
  re-runs, resumes and the SQL oracle all agree row-for-row.
* **Map-side** — a pure vectorized filter inside ``map_batches``; no
  shuffle, no driver state, no coordination.

The hash is one LCG step over the low 31 bits of the id — SQL-mirrorable
with plain BIGINT arithmetic (no overflow: (2^31-1) * 1103515245 + 12345
< 2^62, within both int64 and numpy int64). An LCG's low bits are weak,
but we threshold the FULL 31-bit state modulo 1000, and sampling only
needs uniformity across ids, not cryptographic quality; the same
constants live in the DuckDB oracle.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pyarrow as pa

_LCG_A = 1103515245
_LCG_C = 12345
_M31 = 1 << 31


def stratified_sample_batch(batch: pa.Table, *, id_col: str = "doc_id",
                            stratum_col: str = "lang",
                            rates_permille: Dict[str, int] = None,
                            default_permille: int = 800) -> pa.Table:
    """Keep rows where ((id % 2^31) * A + C) % 2^31 % 1000 < the stratum's
    permille rate. Strata are O(10) configured values, so the per-stratum
    rate fill is a handful of vectorized masks, not a join."""
    if batch.num_rows == 0:
        return batch
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
        np.int64, copy=False)
    h = ((ids % _M31) * _LCG_A + _LCG_C) % _M31
    bucket = h % 1000
    rate = np.full(len(ids), default_permille, dtype=np.int64)
    langs = np.asarray(batch.column(stratum_col).to_pylist(), dtype=object)
    for lang, r in (rates_permille or {}).items():
        rate[langs == lang] = r
    return batch.filter(pa.array(bucket < rate))
