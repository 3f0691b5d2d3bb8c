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


def shuffle_index(ds, *, id_col: str = "doc_id", prefix_chars: int = 2):
    """Deterministic global training-order shuffle: position of each row
    under ``ORDER BY md5(str(id)), id`` — the seedless, resume-safe
    analog of ``random_shuffle`` for fixing a training data order.

    Scale shape: rows are bucketed by the first `prefix_chars` hex chars
    of the md5 (256 buckets at 2 chars — raise to 3-4 at 10^9+ rows so a
    bucket stays block-sized; md5 uniformity bounds every bucket at
    ~n/16^prefix rows regardless of id skew). Bucket counts fold to the
    driver (16^prefix rows, bounded by construction), prefix-summed into
    offsets, broadcast once via ray.put; each bucket then sorts locally
    and emits ``offset + arange`` — one keys-only groupby total, no
    global sort.

    Mirrored by SQL ``row_number() OVER (ORDER BY md5(id::VARCHAR), id)
    - 1`` (hex md5 compares identically as a string on both sides).
    """
    import hashlib

    import ray
    from ray.data.aggregate import Count

    def keyed(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        hs = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return pa.table({
            id_col: b.column(id_col),
            "h": pa.array(hs, type=pa.string()),
            "bkt": pa.array([h[:prefix_chars] for h in hs],
                            type=pa.string()),
        })

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    counts = keyed_ds.groupby("bkt").aggregate(Count()).take_all()
    counts.sort(key=lambda r: r["bkt"])
    offsets: Dict[str, int] = {}
    cum = 0
    for r in counts:
        offsets[r["bkt"]] = cum
        cum += int(r["count()"])
    ref = ray.put(offsets)

    out_schema = pa.schema([(id_col, pa.int64()), ("pos", pa.int64())])

    def grp(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        off = ray.get(ref)[group.column("bkt")[0].as_py()]
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        hs = np.asarray(group.column("h").to_pylist(), dtype=object)
        order = np.lexsort((ids, hs))
        return pa.table({
            id_col: pa.array(ids[order], type=pa.int64()),
            "pos": pa.array(off + np.arange(len(ids), dtype=np.int64)),
        }, schema=out_schema)

    return keyed_ds.groupby("bkt").map_groups(grp, batch_format="pyarrow")
