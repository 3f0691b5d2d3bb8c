"""Order-invariant table fingerprinting — the whole-table analog of the
per-document verification pass.

The reference's eval harness compares prediction files row by row
(`deploy/eval_utils/eval_pipeline.py`: label dict vs pred dict per image
name); at 10^12 rows nobody ships both tables to one node to diff them.
`table_checksum` reduces any selected column set to ONE (count, sum-of-
row-hashes) pair that is invariant to row order and partitioning, so two
runs / two clusters can be compared by exchanging 16 bytes. A mismatch
localizes by re-running per partition (the lineage manifest already keys
partitions), giving a O(log)-ish drill-down instead of a full diff.

Determinism contract (mirrored by the SQL oracle — keep in lockstep):

* canonical row string = ``'|'.join(str(col_value) ...)`` over the
  selected columns in the given order — identical to DuckDB
  ``concat_ws('|', cols...)`` for int64 + string columns (ints render the
  same in both; do NOT pass float columns, their text render differs).
* row hash = little-endian uint64 of bytes ``[8:16)`` of the MD5 digest
  of the UTF-8 row string — identical to DuckDB ``md5_number_lower``
  (measured: md5_number_lower('abc') == struct.unpack('<Q', digest[8:])).
* checksum = Σ row_hash  mod 2^63 (fits BIGINT; per-batch partials are
  reduced mod 2^63 which is congruence-consistent because each partial
  is an exact integer sum reduced once).

Scale shape: one pass over the data, one 2-int64 row per block, a
repartition(1) of those tiny partials for the fold — no driver-side
state, no shuffle of payload bytes.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Sequence

import numpy as np
import pyarrow as pa

_MOD = 1 << 63

_PARTIAL_SCHEMA = pa.schema([("n_rows", pa.int64()), ("checksum", pa.int64())])


def _row_hashes(batch: pa.Table, cols: Sequence[str]) -> int:
    """Exact Python-int sum of md5_number_lower over canonical row strings."""
    arrays = [batch.column(c).to_pylist() for c in cols]
    total = 0
    md5 = hashlib.md5
    unpack = struct.unpack
    for values in zip(*arrays):
        s = "|".join(str(v) for v in values)
        total += unpack("<Q", md5(s.encode("utf-8")).digest()[8:])[0]
    return total


def table_checksum(ds, cols: Sequence[str]):
    """One-row Dataset ``(n_rows, checksum)`` fingerprinting ``ds[cols]``.

    ``checksum`` is order/partitioning-invariant; equal table contents
    (as multisets of rows) give equal checksums, and any row change,
    insert or delete changes it with overwhelming probability.
    """
    cols = list(cols)

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_rows": pa.array([b.num_rows], type=pa.int64()),
            "checksum": pa.array([_row_hashes(b, cols) % _MOD],
                                 type=pa.int64()),
        }, schema=_PARTIAL_SCHEMA)

    def fold(b: pa.Table) -> pa.Table:
        n = int(np.sum(b.column("n_rows").to_numpy(zero_copy_only=False)))
        total = sum(b.column("checksum").to_pylist()) % _MOD
        return pa.table({
            "n_rows": pa.array([n], type=pa.int64()),
            "checksum": pa.array([total], type=pa.int64()),
        }, schema=_PARTIAL_SCHEMA)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
    )
