"""Temporal joins as Ray Data primitives: as-of join and interval join.

The reference has no relational layer; these are the two temporal join
shapes a 100 TB event/crawl pipeline needs and that `ray.data` lacks
natively (SURVEY.md §2.4 scope note):

* :func:`asof_join` — for every left row, the single most recent right row
  with ``right_ts <= left_ts`` and the same key ("backward" as-of, the
  pandas `merge_asof` / DuckDB `ASOF JOIN` semantics). Implemented with ONE
  hash shuffle: both sides are tagged, padded to a common schema, unioned,
  and ``groupby(key).map_groups`` merges each key partition with a
  vectorized ``np.searchsorted`` — no per-row Python loop, no driver-side
  state. Only the projected columns cross the shuffle; project both sides
  before joining. Scale shape: identical to ``hash_join`` (keys move, one
  all-to-all), except each group emits |left| rows, never a cross product.
* :func:`interval_join` — join rows whose ``ts`` falls inside any interval
  ``[lo, hi)`` of a SMALL interval table (calendar windows, campaigns,
  maintenance blackouts). The interval table is broadcast once via
  ``ray.put`` as sorted numpy arrays; each batch finds candidate intervals
  with two ``searchsorted`` probes bounded by the widest interval, so cost
  is O(rows x max_overlap), not O(rows x intervals). NO shuffle at all.

Determinism contracts:
* ``asof_join`` breaks right-side ``ts`` ties by the natural order of the
  remaining right columns (stable lexicographic sort), so equal-timestamp
  right rows resolve to the row with the greatest payload tuple — mirror
  this in any SQL oracle by pre-aggregating the right side to one row per
  (key, ts).
* ``interval_join`` uses half-open ``lo <= ts < hi`` containment.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _pad_to(schema: pa.Schema, side: int):
    """Batch fn: add null columns for fields missing from `schema`, tag side.

    Emits a correctly-typed (possibly zero-row) table for EVERY input —
    schema-less empties out of a union/groupby subgraph are the round-2
    flaky-crash lesson (VERDICT r2 "What's wrong" #1)."""

    def fn(batch: pa.Table) -> pa.Table:
        arrays = []
        for field in schema:
            if field.name in batch.column_names:
                arrays.append(batch.column(field.name).cast(field.type))
            else:
                arrays.append(pa.nulls(batch.num_rows, type=field.type))
        arrays.append(pa.array([side] * batch.num_rows, type=pa.int8()))
        return pa.table(arrays, schema=schema.append(pa.field("_side", pa.int8())))

    return fn


def asof_join(left, right, *, by: str, left_ts: str, right_ts: str,
              left_schema: pa.Schema, right_schema: pa.Schema,
              how: str = "inner", direction: str = "backward"):
    """As-of join: each left row picks the nearest right row within the
    same ``by`` key — the LATEST with ``right_ts <= left_ts``
    (direction="backward", the default) or the EARLIEST with
    ``right_ts >= left_ts`` (direction="forward"). Backward ties on
    right_ts resolve to the MAX right payload tuple, forward ties to
    the MIN (both are "the row adjacent to the boundary" under the
    ascending sort) — the SQL mirror pre-aggregates the right side per
    (key, ts) with max()/min() accordingly.

    `left_schema` / `right_schema` describe the (already projected) inputs;
    they are passed explicitly because calling ``.schema()`` on a lazy
    shuffle output partially executes it and — under chained renames — can
    return a stale schema (round-3 Ray 2.49 lesson). Right column names
    other than `by` must not collide with left names. ``how`` is "inner"
    (drop unmatched left rows) or "left" (null right payload).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join: unknown how={how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction={direction!r}")
    left_names = list(left_schema.names)
    right_payload = [n for n in right_schema.names if n != by]
    clash = set(left_names) & set(right_payload)
    if clash:
        raise ValueError(f"asof_join: right columns collide with left: {clash}")

    union_fields = list(left_schema) + [right_schema.field(n)
                                        for n in right_payload]
    union_schema = pa.schema(union_fields)
    out_schema = pa.schema(union_fields)

    tagged = (
        left.map_batches(_pad_to(union_schema, 0), batch_format="pyarrow")
        .union(right.map_batches(_pad_to(union_schema, 1),
                                 batch_format="pyarrow"))
    )

    tie_cols = [n for n in right_payload if n != right_ts]

    def merge_part(part: pa.Table) -> pa.Table:
        """Every key of one hash partition in one vectorized pass
        (round-5: the per-key map_groups paid one Python call per key).
        Sort the tagged union by (key, ts, side, ties); the as-of match
        is then a run-confined forward fill (backward direction: the
        latest right row index at or before each position) or backward
        fill (forward direction) over the GLOBAL row index — a filled
        index from a previous key run lands before the run start and is
        rejected, so no per-key slicing is needed."""
        ts_unified = pc.coalesce(part.column(left_ts)
                                 if left_ts in part.column_names else
                                 pa.nulls(part.num_rows, pa.int64()),
                                 part.column(right_ts))
        part = part.append_column("_ts", ts_unified.cast(pa.int64()))
        side_asc = direction == "backward"
        # backward: rights BEFORE lefts at equal ts (right_ts <= left_ts
        # is inclusive); forward: rights AFTER lefts (right_ts >= left_ts)
        idx = pc.sort_indices(part, sort_keys=[
            (by, "ascending"), ("_ts", "ascending"),
            ("_side", "descending" if side_asc else "ascending"),
            (right_ts, "ascending"),
        ] + [(c, "ascending") for c in tie_cols])
        t = part.take(idx)
        n = t.num_rows
        k = t.column(by).to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        pos = np.arange(n, dtype=np.int64)
        run_start = np.zeros(n, dtype=np.int64)
        starts = np.r_[0, np.nonzero(k[1:] != k[:-1])[0] + 1]
        counts = np.r_[starts[1:], n] - starts
        run_start = np.repeat(starts, counts)
        is_right = side == 1
        if direction == "backward":
            fill = np.maximum.accumulate(np.where(is_right, pos, -1))
            matched = (fill >= run_start) & (fill >= 0)
        else:
            run_end = np.repeat(starts + counts, counts)  # exclusive
            rev = np.where(is_right, pos, n + 1)[::-1]
            fill = np.minimum.accumulate(rev)[::-1]
            matched = fill < run_end
        lmask = ~is_right
        if not lmask.any():
            return out_schema.empty_table()
        lsel = np.nonzero(lmask)[0]
        ridx, lmat = fill[lsel], matched[lsel]
        if how == "inner":
            lsel, ridx, lmat = lsel[lmat], ridx[lmat], lmat[lmat]
            if lsel.size == 0:
                return out_schema.empty_table()
        arrays = [t.column(nm).take(pa.array(lsel)) for nm in left_names]
        take_idx = pa.array(np.where(lmat, ridx, 0), type=pa.int64(),
                            mask=~lmat)  # null index -> left-join miss
        for nm in right_payload:
            arrays.append(t.column(nm).take(take_idx))
        return pa.table(arrays, schema=out_schema)

    from webextract.functions.joins import partition_apply

    return partition_apply(
        tagged, merge_part, on=by,
        schema=union_schema.append(pa.field("_side", pa.int8())),
        out_schema=out_schema)


def interval_join(ds, intervals: pa.Table, *, ts: str, lo: str = "lo",
                  hi: str = "hi", keep: Optional[Sequence[str]] = None,
                  concurrency=None):
    """Join each row of `ds` to every interval of the small `intervals`
    table containing its `ts` (half-open ``lo <= ts < hi``; 1-to-many).

    Output columns: ``keep`` (default: all of `ds`'s columns in the first
    batch) followed by the interval table's columns except `lo`/`hi`.
    Intervals may overlap arbitrarily; cost per row is bounded by the
    number of intervals spanning any single point.
    """
    import ray

    order = pc.sort_indices(intervals, sort_keys=[(lo, "ascending")])
    intervals = intervals.take(order)
    lo_np = intervals.column(lo).to_numpy(zero_copy_only=False)
    hi_np = intervals.column(hi).to_numpy(zero_copy_only=False)
    if len(lo_np) and (hi_np < lo_np).any():
        raise ValueError("interval_join: interval with hi < lo")
    max_width = int((hi_np - lo_np).max()) if len(lo_np) else 0
    payload_cols = [c for c in intervals.column_names if c not in (lo, hi)]
    ref = ray.put((lo_np, hi_np, intervals.select(payload_cols)))

    def probe(batch: pa.Table) -> pa.Table:
        # ray.get on a broadcast ref is a local zero-copy lookup after the
        # first fetch per node — no actor pool needed for a stateless probe.
        lo_a, hi_a, payload = ray.get(ref)
        cols = list(keep) if keep is not None else batch.column_names
        t = batch.column(ts).to_numpy(zero_copy_only=False)
        start = np.searchsorted(lo_a, t - max_width, side="left")
        stop = np.searchsorted(lo_a, t, side="right")
        row_parts: List[np.ndarray] = []
        iv_parts: List[np.ndarray] = []
        width = int((stop - start).max()) if len(t) else 0
        for off in range(width):
            j = start + off
            valid = (j < stop)
            jj = np.where(valid, j, 0)
            valid &= (hi_a[jj] > t) & (lo_a[jj] <= t)
            if valid.any():
                row_parts.append(np.nonzero(valid)[0])
                iv_parts.append(jj[valid])
        if row_parts:
            rows = np.concatenate(row_parts)
            ivs = np.concatenate(iv_parts)
            srt = np.lexsort((ivs, rows))
            rows, ivs = rows[srt], ivs[srt]
        else:
            rows = np.empty(0, dtype=np.int64)
            ivs = np.empty(0, dtype=np.int64)
        out = batch.select(cols).take(pa.array(rows, type=pa.int64()))
        for c in payload_cols:
            out = out.append_column(
                c, payload.column(c).take(pa.array(ivs, type=pa.int64())))
        return out

    return ds.map_batches(probe, batch_format="pyarrow",
                          concurrency=concurrency)


def key_lag(ds, *, by: str, ts: str, payload: str):
    """Per-key LAG window: for every row, attach the PREVIOUS row's
    ``payload`` and the time gap within its ``by`` partition, ordered by
    ``(ts, payload)`` (total + deterministic, the `sort_words_by_poly`
    made-total discipline). Rows with no predecessor are dropped, so the
    output needs no nullable columns.

    Output columns: ``(by, ts, payload, prev_<payload>, gap)`` with all of
    ``ts``/``payload`` int64. ONE keys-only shuffle (`groupby(by)`), a
    vectorized lexsort + diff per group — no per-row Python in the group
    body. Scale: group size is bounded by per-key activity, the same bound
    `sessionize` already relies on; payloads larger than one int64 column
    should be re-attached afterwards via `functions.dedup.winner_filter`.
    """
    out_schema = pa.schema([
        (by, pa.int64()), (ts, pa.int64()), (payload, pa.int64()),
        (f"prev_{payload}", pa.int64()), ("gap", pa.int64()),
    ])

    def lag_part(part: pa.Table) -> pa.Table:
        # every key of the partition in one lexsort pass (round-5: the
        # per-key map_groups paid one Python call per key): adjacent
        # rows of the (by, ts, payload) sort are (prev, cur) pairs
        # wherever the key does not change
        u = np.asarray(part.column(by).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        t = np.asarray(part.column(ts).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        p = np.asarray(part.column(payload).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        order = np.lexsort((p, t, u))
        u, t, p = u[order], t[order], p[order]
        same = u[1:] == u[:-1]
        return pa.table({
            by: pa.array(u[1:][same]),
            ts: pa.array(t[1:][same]),
            payload: pa.array(p[1:][same]),
            f"prev_{payload}": pa.array(p[:-1][same]),
            "gap": pa.array((t[1:] - t[:-1])[same]),
        }, schema=out_schema)

    from webextract.functions.joins import partition_apply

    return partition_apply(
        ds, lag_part, on=by,
        schema=pa.schema([(by, pa.int64()), (ts, pa.int64()),
                          (payload, pa.int64())]),
        out_schema=out_schema)


def key_lead(ds, *, by: str, ts: str, payload: str):
    """Per-key LEAD window: for every row, attach the NEXT row's
    ``payload`` and the time gap to it within its ``by`` partition,
    ordered ``(ts, payload)`` (total + deterministic). Rows with no
    successor are dropped, so the output needs no nullable columns.

    Output columns: ``(by, ts, payload, next_<payload>, gap)``, all of
    ``ts``/``payload`` int64. Same scale shape as :func:`key_lag` — ONE
    keys-only shuffle, vectorized lexsort + shift per group.
    """
    out_schema = pa.schema([
        (by, pa.int64()), (ts, pa.int64()), (payload, pa.int64()),
        (f"next_{payload}", pa.int64()), ("gap", pa.int64()),
    ])

    def lead_part(part: pa.Table) -> pa.Table:
        # mirror of key_lag's one-pass partition body (round-5)
        u = np.asarray(part.column(by).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        t = np.asarray(part.column(ts).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        p = np.asarray(part.column(payload).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        order = np.lexsort((p, t, u))
        u, t, p = u[order], t[order], p[order]
        same = u[1:] == u[:-1]
        return pa.table({
            by: pa.array(u[:-1][same]),
            ts: pa.array(t[:-1][same]),
            payload: pa.array(p[:-1][same]),
            f"next_{payload}": pa.array(p[1:][same]),
            "gap": pa.array((t[1:] - t[:-1])[same]),
        }, schema=out_schema)

    from webextract.functions.joins import partition_apply

    return partition_apply(
        ds, lead_part, on=by,
        schema=pa.schema([(by, pa.int64()), (ts, pa.int64()),
                          (payload, pa.int64())]),
        out_schema=out_schema)


def key_ffill(ds, *, by: str, ts: str, order2: str, val: str):
    """Per-key forward fill (SQL ``last_value(val IGNORE NULLS) OVER
    (PARTITION BY by ORDER BY ts, order2 ROWS UNBOUNDED PRECEDING)``):
    every row gets the most recent non-null ``val`` at or before it in
    its partition. Rows before the first non-null value are DROPPED so
    the output's ``filled`` column is non-nullable (the key_lag
    discipline — the SQL mirror is the same query + ``QUALIFY filled IS
    NOT NULL``).

    Output: ``(by, ts, order2, filled)`` with ``filled`` float64. ONE
    keys-only+value shuffle; the group body is a vectorized index
    forward-scan (``np.maximum.accumulate`` over last-valid indices), no
    per-row Python.
    """
    out_schema = pa.schema([
        (by, pa.int64()), (ts, pa.int64()), (order2, pa.int64()),
        ("filled", pa.float64()),
    ])

    def ffill_part(part: pa.Table) -> pa.Table:
        """Every key of the partition in one pass (round-5: per-key
        map_groups replaced): the forward fill runs over the GLOBAL
        sorted index with a run-start floor — a filled index from a
        previous key run lands before the row's run start and the row
        is dropped, exactly the old per-key 'no prior non-null'
        case."""
        n = part.num_rows
        u = np.asarray(part.column(by).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        t = np.asarray(part.column(ts).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        o2 = np.asarray(part.column(order2).to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        col = part.column(val)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        valid = ~np.asarray(pc.is_null(col).to_numpy(zero_copy_only=False))
        order = np.lexsort((o2, t, u))
        u, t, o2, v, valid = (u[order], t[order], o2[order], v[order],
                              valid[order])
        starts = np.r_[0, np.nonzero(u[1:] != u[:-1])[0] + 1]
        counts = np.r_[starts[1:], n] - starts
        run_start = np.repeat(starts, counts)
        last = np.maximum.accumulate(
            np.where(valid, np.arange(n, dtype=np.int64), -1))
        keep = last >= run_start
        return pa.table({
            by: pa.array(u[keep]),
            ts: pa.array(t[keep]),
            order2: pa.array(o2[keep]),
            "filled": pa.array(v[last[keep]]),
        }, schema=out_schema)

    from webextract.functions.joins import partition_apply

    return partition_apply(
        ds, ffill_part, on=by,
        schema=pa.schema([(by, pa.int64()), (ts, pa.int64()),
                          (order2, pa.int64()), (val, pa.float64())]),
        out_schema=out_schema)
