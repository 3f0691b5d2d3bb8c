"""Relational joins as Ray Data primitives.

Two strategies, chosen by side size (SURVEY.md §2.4 — the reference has no
relational joins; a 100 TB pipeline needs them for metadata enrichment):

* :func:`broadcast_join` — small side shipped ONCE via `ray.put`, looked up
  inside `map_batches` (no shuffle at all). Use when one side fits in a
  worker heap.
* :func:`hash_join` — big-big inner join: both sides are tagged, padded to
  a common schema, unioned, and hash-partitioned by key with ONE shuffle
  (`groupby(key).map_groups`); each group emits the per-key cross product.
  The shuffle moves only the selected columns — project before joining.

Skew note: a pathological hot key makes one group giant; `max_group` guards
against quadratic blowup (the salted-repartition op is the mitigation for
such keys upstream).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Hash-partition fan-out for the join combine: equal keys co-locate in
# one of this many groups, each joined in ONE vectorized pass. Equal to
# a typical reduce-side task count; the exchange itself is unchanged
# (the padded key+payload rows move exactly once either way).
_NUM_JOIN_PARTS = 64


def _key_hash_u64(arr) -> "np.ndarray":
    """uint64 hash per key for partition routing — vectorized SplitMix64
    for integer-like keys, polars' vectorized string hash otherwise
    (deterministic for a fixed seed within one run, which is all
    partition routing needs). Falls back to a string cast for exotic
    types."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if (pa.types.is_integer(t) or pa.types.is_date(t)
            or pa.types.is_timestamp(t) or pa.types.is_boolean(t)):
        x = np.asarray(arr.cast(pa.int64())).astype(np.uint64)
        return _splitmix64(x)
    if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
        arr = arr.cast(pa.string())
    try:
        import polars as pl

        return pl.from_arrow(arr).hash(seed=0).to_numpy()
    except ImportError:  # pragma: no cover - polars is baked in
        import zlib

        return _splitmix64(np.fromiter(
            (zlib.crc32(s.encode("utf-8")) if s is not None else 0
             for s in arr.to_pylist()),
            dtype=np.uint64, count=len(arr)))


def _dedup_last_wins(small: pa.Table, key: str) -> pa.Table:
    """Keep only the LAST occurrence of each small-side key (the
    dict-overwrite semantics broadcast_join documents), vectorized:
    dictionary-encode the key column, then a fancy store — for duplicate
    indices numpy keeps the last write — records each code's final row.

    NULL small-side keys are dropped first: SQL join semantics say a
    NULL key matches nothing, and dictionary_encode excludes nulls from
    the dictionary (a null-keyed row would otherwise produce a NaN code
    and crash the fancy store with an opaque IndexError)."""
    import numpy as np

    kcol = small.column(key)
    if kcol.null_count:
        small = small.filter(pc.is_valid(kcol))
    de = pc.dictionary_encode(small.column(key).combine_chunks())
    codes = de.indices.to_numpy(zero_copy_only=False)
    if len(de.dictionary) == len(small):
        return small
    last = np.empty(len(de.dictionary), dtype=np.int64)
    last[codes] = np.arange(len(small), dtype=np.int64)
    return small.take(pa.array(np.sort(last)))


class _BroadcastJoiner:
    """Vectorized probe: pc.index_in against the broadcast key array,
    then take() the value columns (a null index yields a null row — the
    left-join miss), no per-row Python. The broadcast ref resolves
    lazily (zero-copy from local plasma), so the stage runs as plain
    tasks on warm workers."""

    def __init__(self, ref, key, value_cols, how="left"):
        self.ref, self.key, self.value_cols = ref, key, value_cols
        self.how = how
        self._keys = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._keys is None:
            import ray

            small = ray.get(self.ref)
            self._keys = small.column(self.key).combine_chunks()
            self._values = {c: small.column(c).combine_chunks()
                            for c in self.value_cols}
        idx = pc.index_in(batch.column(self.key).combine_chunks(),
                          value_set=self._keys)
        if self.how == "inner":
            # membership-based (not payload-null-based): drop misses
            keep = pc.is_valid(idx)
            batch = batch.filter(keep)
            idx = idx.filter(keep)
        for c in self.value_cols:
            batch = batch.append_column(c, self._values[c].take(idx))
        return batch


def broadcast_join(ds, small_table: pa.Table, *, key: str,
                   value_cols: Optional[List[str]] = None, how: str = "left"):
    """Enrich `ds` rows with columns from `small_table` matched on `key`
    (`how="left"`: misses become nulls; `how="inner"`: misses are
    dropped by key MEMBERSHIP, so SQL INNER JOIN semantics hold even for
    null small-side payload values). Small side crosses the cluster
    once; duplicate small-side keys resolve last-occurrence-wins
    (deduped ONCE on the driver before the broadcast, not per
    consumer); NULL small-side keys are dropped (SQL: NULL matches
    nothing). Runs in TASK mode deliberately (the probe state is a
    lazily-resolved broadcast ref, zero-copy from local plasma) — no
    actor-pool ramp, full width on warm workers; there is no
    concurrency knob because the measured-best config is the
    scheduler's own."""
    import ray

    if how not in ("left", "inner"):
        raise ValueError(f"unknown broadcast_join how={how!r}")
    value_cols = value_cols or [c for c in small_table.column_names if c != key]
    small = _dedup_last_wins(
        small_table.select([key] + value_cols).combine_chunks(), key)
    ref = ray.put(small)
    return ds.map_batches(
        _BroadcastJoiner(ref, key, value_cols, how),
        batch_format="pyarrow",
    )


def broadcast_full_join(left, right_table: pa.Table, *, on: str,
                        left_schema: pa.Schema, right_schema: pa.Schema):
    """FULL OUTER join against a dimension-sized right side with ZERO
    exchange — the broadcast analog of ``hash_join(how="full")`` (the
    CDC merge/upsert shape: a huge base table full-joined to a small
    change set).

    Right keys must be UNIQUE (raises otherwise — SQL full join with
    duplicate dimension keys would need per-key cross products; use
    `hash_join` there). NULL right keys match nothing and are emitted as
    unmatched right rows (NULL left payload); NULL left keys keep NULL
    right payload — identical semantics to `hash_join(how="full")`.

    Scale shape: the right table ships once (`ray.put`). The unmatched
    right set needs to know which right rows matched ANY left row, so
    `left` is consumed TWICE, both passes map-side and exchange-free:

    * a keys-only pass (select_columns([on]) — column-pruned at the
      read) emits ONE matched-row bitmap per block (|right|/8 bytes),
      OR-folded through the two-level tree of `bloom_bits`;
    * the join pass probes the broadcast table per batch
      (`pc.index_in` take — the `_BroadcastJoiner` kernel) and emits
      left rows with right payload; the unmatched right rows join the
      output as one typed driver block.

    Materialize `left` upstream if it is an expensive subgraph rather
    than a scan — the double consumption re-executes it otherwise.
    """
    import ray
    import ray.data as _rd

    payload_l = [c for c in left_schema.names if c != on]
    payload_r = [c for c in right_schema.names if c != on]
    overlap = (set(payload_l) & set(payload_r))
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    out_names = [on] + payload_l + payload_r
    types = {c: left_schema.field(c).type for c in left_schema.names}
    for c in right_schema.names:
        types[c] = right_schema.field(c).type

    rt = right_table.combine_chunks()
    rkey = rt.column(on).combine_chunks()
    null_mask = pc.is_null(rkey)
    r_null = rt.filter(null_mask)        # unmatched by definition
    r = rt.filter(pc.invert(null_mask))
    rkeys = r.column(on).combine_chunks()
    n_right = len(rkeys)
    if n_right != len(pc.unique(rkeys)):
        raise ValueError(
            "broadcast_full_join: duplicate right keys — full-join "
            "fan-out needs the keyed-exchange hash_join")
    ref = ray.put(r)
    n_words = max((n_right + 63) // 64, 1)

    def match_bits(b: pa.Table) -> pa.Table:
        rr = ray.get(ref)
        bits = np.zeros(n_words, dtype=np.uint64)
        idx = pc.index_in(b.column(on).combine_chunks(),
                          value_set=rr.column(on).combine_chunks())
        hit = np.asarray(idx.drop_null()).astype(np.int64)
        if hit.size:
            np.bitwise_or.at(bits, hit >> 6,
                             np.uint64(1) << (hit.astype(np.uint64)
                                              & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.tobytes()],
                                          type=pa.binary())})

    def or_fold(b: pa.Table) -> pa.Table:
        acc = np.zeros(n_words, dtype=np.uint64)
        for blob in b.column("bits").to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()],
                                          type=pa.binary())})

    folded = (
        left.select_columns([on])
        .map_batches(match_bits, batch_format="pyarrow", batch_size=None)
        .repartition(16)
        .map_batches(or_fold, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(or_fold, batch_format="pyarrow", batch_size=None)
        .take(1)
    )
    matched = np.frombuffer(folded[0]["bits"], dtype=np.uint64)
    pos = np.arange(n_right, dtype=np.int64)
    unmatched_mask = (matched[pos >> 6]
                      & (np.uint64(1) << (pos.astype(np.uint64)
                                          & np.uint64(63)))) == 0
    r_unmatched = r.filter(pa.array(unmatched_mask))
    extras = pa.concat_tables([r_unmatched, r_null]) \
        if r_null.num_rows else r_unmatched
    extras_tbl = pa.Table.from_arrays(
        [extras.column(on).cast(types[on])]
        + [pa.nulls(extras.num_rows, type=types[c]) for c in payload_l]
        + [extras.column(c).cast(types[c]) for c in payload_r],
        names=out_names)

    def join_batch(b: pa.Table) -> pa.Table:
        rr = ray.get(ref)
        idx = pc.index_in(b.column(on).combine_chunks(),
                          value_set=rr.column(on).combine_chunks())
        return pa.Table.from_arrays(
            [b.column(on).cast(types[on])]
            + [b.column(c).cast(types[c]) for c in payload_l]
            + [rr.column(c).combine_chunks().take(idx).cast(types[c])
               for c in payload_r],
            names=out_names)

    return (left.map_batches(join_batch, batch_format="pyarrow")
            .union(_rd.from_arrow(extras_tbl)))


# Measured semi/anti broadcast bound: a block-deduped right key set at or
# below this many rows ships as ONE ``ray.put`` array and the existence
# probe runs map-side over the left — ZERO exchanges (the left payload
# never moves at all, which beats even the keys+payload semi shuffle).
# Read at call time so tests can force either path.
_SEMI_BROADCAST_MAX = 1 << 22


def _semi_anti_broadcast(left, right, *, on: str, how: str,
                         lschema: pa.Schema, rschema: pa.Schema,
                         broadcast_max: int):
    """Measured transport for the semi/anti existence probe.

    Block-dedupes the (already keys-only) right side map-side and counts
    it. At or below ``broadcast_max`` rows the deduped key set ships once
    via ``ray.put`` and the probe is one vectorized ``is_in`` filter per
    left batch — no shuffle on either side. Above the bound, returns the
    materialized deduped-keys Dataset so the caller's keyed exchange runs
    over a strictly smaller right side (never a wasted pass).

    NULL-key semantics match the exchange path (SQL EXISTS / NOT EXISTS):
    right NULL keys are dropped from the set; a NULL-keyed left row is
    dropped by semi and KEPT by anti.
    """
    import ray
    import ray.data as _rd

    ktype = rschema.field(on).type

    def blk_unique(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            col = pa.nulls(0, type=ktype)
        else:
            col = pc.unique(
                b.column(on).combine_chunks().cast(ktype).drop_null())
        return pa.Table.from_arrays([col], names=[on])

    keys = right.map_batches(blk_unique, batch_format="pyarrow").materialize()
    if keys.count() > broadcast_max:
        return keys, pa.schema([(on, ktype)])

    parts = [t.column(on).combine_chunks().cast(ktype)
             for t in ray.get(keys.to_arrow_refs()) if t.num_rows]
    vals = (pc.unique(pa.concat_arrays(parts)) if parts
            else pa.nulls(0, type=ktype))
    ref = ray.put(vals)

    payload = [c for c in lschema.names if c != on]
    types = {c: lschema.field(c).type for c in payload}
    out_names = [on] + payload
    keep_in = how == "semi"

    def flt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.nulls(0, type=ktype)]
                + [pa.nulls(0, type=types[c]) for c in payload],
                names=out_names)
        vset = ray.get(ref)  # zero-copy from the node-local plasma segment
        key = batch.column(on).combine_chunks().cast(ktype)
        m = pc.is_in(key, value_set=vset)
        m = pc.fill_null(m if keep_in else pc.invert(m), not keep_in)
        b = batch.filter(m)
        return pa.Table.from_arrays(
            [b.column(on).combine_chunks().cast(ktype)]
            + [b.column(c).cast(types[c]) for c in payload],
            names=out_names)

    # Same all-empty schema anchor as the exchange path: Ray 2.49's fused
    # map operator short-circuits 0-row blocks without invoking the UDF.
    anchor = pa.Table.from_arrays(
        [pa.nulls(0, type=ktype)]
        + [pa.nulls(0, type=types[c]) for c in payload], names=out_names)
    return (left.map_batches(flt, batch_format="pyarrow")
            .union(_rd.from_arrow(anchor)))


def hash_join(left, right, *, on: str, max_group: int = 100_000,
              how: str = "inner",
              left_schema: Optional[pa.Schema] = None,
              right_schema: Optional[pa.Schema] = None,
              semi_broadcast_max: Optional[int] = None):
    """Big-big join on `on`: one hash shuffle, per-key combine.

    `how`:
    * ``"inner"`` — per-key cross product of left x right rows;
    * ``"left"``  — inner plus unmatched left rows with NULL right payload
      (SQL LEFT OUTER JOIN);
    * ``"right"`` — inner plus unmatched RIGHT rows with NULL left payload
      (SQL RIGHT OUTER JOIN);
    * ``"full"``  — left plus unmatched RIGHT rows with NULL left payload
      (SQL FULL OUTER JOIN);
    * ``"semi"``  — left rows whose key EXISTS on the right (payload_r
      columns are not emitted);
    * ``"anti"``  — left rows whose key does NOT exist on the right
      (NOT EXISTS convention: a NULL-keyed left row matches nothing and
      is therefore KEPT).

    NULL join keys follow SQL semantics: NULL never equals NULL, so
    NULL-keyed rows are FILTERED map-side before the shuffle (they can
    never match) and re-emitted as unmatched output where the join shape
    calls for it — left/full/anti keep NULL-keyed left rows (right
    payload NULL), right/full keep NULL-keyed right rows (left payload
    NULL). Those re-emission branches consume the owning side's subgraph
    a second time (cheap map-side scan; project before joining). Without
    this, all NULL keys would collapse into one shuffle group and
    inner-join each other (round-3 ADVICE).

    Semi/anti pick their transport by MEASURE: the right side is
    block-deduped to keys map-side and counted; at or below
    ``semi_broadcast_max`` (default ``_SEMI_BROADCAST_MAX`` = 4M keys,
    read at call time) the key set broadcasts once via ``ray.put`` and
    the probe is a vectorized map-side ``is_in`` over the left — ZERO
    exchanges, the left payload never moves. Above the bound the keyed
    exchange runs over the deduped keys; it moves only key + left
    payload — the existence probe never materializes right payloads per
    match, so a hot right key costs nothing extra (no cross-product term
    at all). Pass ``semi_broadcast_max=0`` to force the exchange.

    Column name collisions (other than the key) must be resolved by the
    caller beforehand (select/rename) — overlapping names raise.

    A key whose cross product exceeds `max_group` RAISES (never a silent
    empty result — "no silent caps"): a hot key that would emit a quadratic
    row blowup is a data/modeling problem the caller must see. Mitigations:
    pre-aggregate one side, broadcast_join if one side is small, or salt
    the hot key upstream (`salted_repartition`) and join on (key, salt).

    ``left_schema`` / ``right_schema``: pass the side's pyarrow schema when
    it is statically known. Without it, ``Dataset.schema()`` is called,
    which (a) partially EXECUTES a lazy shuffle subgraph just to learn its
    columns, and (b) under Ray 2.49's metadata-only schema propagation can
    return a WRONG schema for chained ``rename_columns`` where a later
    rename reintroduces a name an earlier one removed (the round-2 driver
    crash: the pad UDF padded for a column that no longer existed at
    runtime). Explicit schemas sidestep both. The pad step casts each
    column to the declared type, so a declared/actual dtype drift (e.g.
    string vs large_string) converges instead of breaking the union.
    """
    if how not in ("inner", "left", "right", "full", "semi", "anti"):
        raise ValueError(f"unknown join how={how!r}")
    if how in ("semi", "anti"):
        right = right.select_columns([on])
        if right_schema is not None:
            right_schema = pa.schema([right_schema.field(on)])
    lschema = left_schema or left.schema().base_schema
    rschema = right_schema or right.schema().base_schema
    if how in ("semi", "anti"):
        # MEASURED transport switch for the existence probe (mirrors
        # publish_winners / join_dim): a dimension-sized key set
        # broadcasts and the probe runs map-side with ZERO exchanges;
        # larger sets fall through to the keyed exchange below, reusing
        # the already-deduped keys so the measuring pass is never wasted.
        # ``semi_broadcast_max=0`` forces the exchange (parity tests).
        bmax = (_SEMI_BROADCAST_MAX if semi_broadcast_max is None
                else semi_broadcast_max)
        if bmax > 0:
            res = _semi_anti_broadcast(left, right, on=on, how=how,
                                       lschema=lschema, rschema=rschema,
                                       broadcast_max=bmax)
            if not isinstance(res, tuple):
                return res
            right, rschema = res
    lcols = lschema.names
    rcols = rschema.names
    overlap = (set(lcols) & set(rcols)) - {on}
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    payload_l = [c for c in lcols if c != on]
    payload_r = [c for c in rcols if c != on]
    types: Dict[str, pa.DataType] = {}
    for c in lcols:
        types[c] = lschema.field(c).type
    for c in rcols:
        types[c] = rschema.field(c).type

    union_names = [on] + payload_l + payload_r + ["_src"]
    union_types = [types[c] for c in [on] + payload_l + payload_r] + [pa.int8()]

    def pad(side_cols, src):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            if n == 0:
                # Zero-row (possibly schema-LESS) blocks flow out of
                # groupby/union subgraphs under Ray 2.x; emit the typed
                # empty so no ".": empty-schema RefBundle propagates.
                return pa.Table.from_arrays(
                    [pa.nulls(0, type=t) for t in union_types],
                    names=union_names,
                )
            # SQL NULL-key semantics: a NULL key matches nothing — drop
            # such rows before the shuffle (re-emitted as unmatched by
            # the extras branches below where the join shape keeps them)
            key = batch.column(on)
            if key.null_count:
                batch = batch.filter(pc.is_valid(key))
                n = batch.num_rows
                if n == 0:
                    return pa.Table.from_arrays(
                        [pa.nulls(0, type=t) for t in union_types],
                        names=union_names,
                    )
            arrays = [batch.column(on).cast(types[on])]
            for c in payload_l + payload_r:
                arrays.append(
                    batch.column(c).cast(types[c]) if c in side_cols
                    else pa.nulls(n, type=types[c])
                )
            arrays.append(pa.array([src] * n, type=pa.int8()))
            return pa.Table.from_arrays(arrays, names=union_names)

        return fn

    lpad = left.map_batches(pad(payload_l, 0), batch_format="pyarrow")
    rpad = right.map_batches(pad(payload_r, 1), batch_format="pyarrow")
    unioned = lpad.union(rpad)

    out_l_names = [on] + payload_l

    # --- partition-vectorized combine (round-4 rewrite) -------------------
    # groupby(on).map_groups invoked a Python UDF once PER KEY — a
    # 100k-key join paid 100k slice+comprehension rounds. Instead the
    # union is hash-partitioned into `_NUM_JOIN_PARTS` groups (SplitMix64
    # of the key, so equal keys co-locate exactly like the per-key
    # grouping did) and each PARTITION is joined in one vectorized pass:
    # sort by (key, _src), run-length boundaries via one not_equal over
    # adjacent rows, and the per-key cross products materialized with
    # numpy repeat/arange index arithmetic — no per-key Python at all.

    def add_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_part", pa.array([], type=pa.int64()))
        part = (_key_hash_u64(batch.column(on))
                % np.uint64(_NUM_JOIN_PARTS)).astype(np.int64)
        return batch.append_column("_part", pa.array(part, type=pa.int64()))

    out_full_names = [on] + payload_l + payload_r

    def _typed_empty(names):
        return pa.Table.from_arrays(
            [pa.nulls(0, type=types[c]) for c in names], names=names)

    def _gather(t: pa.Table, idx: np.ndarray, *, take_l: bool,
                take_r: bool = False):
        """One side's rows at `idx`, the other side's payload as nulls."""
        ia = pa.array(idx, type=pa.int64())
        arrays = [t.column(on).take(ia)]
        for c in payload_l:
            arrays.append(t.column(c).take(ia) if take_l
                          else pa.nulls(idx.size, type=types[c]))
        names = [on] + payload_l
        if how not in ("semi", "anti"):
            for c in payload_r:
                arrays.append(t.column(c).take(ia) if take_r
                              else pa.nulls(idx.size, type=types[c]))
            names = out_full_names
        return pa.Table.from_arrays(arrays, names=names)

    def _ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
        """Concatenated [s, s+c) ranges, vectorized."""
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64)
        offs = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=offs[1:])
        return (np.repeat(starts, counts)
                + (np.arange(total, dtype=np.int64) - np.repeat(offs, counts)))

    def join_partition(part: pa.Table) -> pa.Table:
        out_names = out_l_names if how in ("semi", "anti") else out_full_names
        if part.num_rows == 0:
            return _typed_empty(out_names)
        order = pc.sort_indices(
            part, sort_keys=[(on, "ascending"), ("_src", "ascending")])
        t = part.take(order)
        n = t.num_rows
        key = t.column(on).combine_chunks()
        src = np.asarray(t.column("_src").combine_chunks(), dtype=np.int64)
        if n == 1:
            neq = np.empty(0, dtype=bool)
        else:
            neq = np.asarray(pc.not_equal(key.slice(1), key.slice(0, n - 1)))
        starts = np.r_[0, np.nonzero(neq)[0] + 1].astype(np.int64)
        ends = np.r_[starts[1:], n].astype(np.int64)
        csum = np.r_[0, np.cumsum(src)]
        r_cnt = csum[ends] - csum[starts]
        l_cnt = (ends - starts) - r_cnt
        l_start, r_start = starts, starts + l_cnt

        if how in ("semi", "anti"):
            keep = (l_cnt > 0) & ((r_cnt > 0) == (how == "semi"))
            idx = _ranges(l_start[keep], l_cnt[keep])
            return _gather(t, idx, take_l=True)

        matched = (l_cnt > 0) & (r_cnt > 0)
        nout = l_cnt[matched] * r_cnt[matched]
        bad = np.nonzero(nout > max_group)[0]
        if bad.size:
            run = np.nonzero(matched)[0][bad[0]]
            raise ValueError(
                f"hash_join: key {key[int(l_start[run])].as_py()!r} cross "
                f"product {int(l_cnt[run])}x{int(r_cnt[run])} exceeds "
                f"max_group={max_group}; pre-aggregate a side, use "
                "broadcast_join, or salt the key")
        pieces = []
        total = int(nout.sum())
        if total:
            offs = np.zeros(len(nout), dtype=np.int64)
            np.cumsum(nout[:-1], out=offs[1:])
            jg = (np.arange(total, dtype=np.int64) - np.repeat(offs, nout))
            rcr = np.repeat(r_cnt[matched], nout)
            idx_l = np.repeat(l_start[matched], nout) + jg // rcr
            idx_r = np.repeat(r_start[matched], nout) + jg % rcr
            ia_l = pa.array(idx_l, type=pa.int64())
            ia_r = pa.array(idx_r, type=pa.int64())
            arrays = [t.column(on).take(ia_l)]
            for c in payload_l:
                arrays.append(t.column(c).take(ia_l))
            for c in payload_r:
                arrays.append(t.column(c).take(ia_r))
            pieces.append(pa.Table.from_arrays(arrays, names=out_full_names))
        if how in ("left", "full"):
            lx = (l_cnt > 0) & (r_cnt == 0)
            if lx.any():
                pieces.append(_gather(t, _ranges(l_start[lx], l_cnt[lx]),
                                      take_l=True))
        if how in ("right", "full"):
            rx = (r_cnt > 0) & (l_cnt == 0)
            if rx.any():
                pieces.append(_gather(t, _ranges(r_start[rx], r_cnt[rx]),
                                      take_l=False, take_r=True))
        if not pieces:
            return _typed_empty(out_names)
        return pa.concat_tables(pieces) if len(pieces) > 1 else pieces[0]

    joined = (unioned.map_batches(add_part, batch_format="pyarrow")
              .groupby("_part")
              .map_groups(join_partition, batch_format="pyarrow"))

    # Unmatched NULL-keyed rows for the join shapes that keep them.
    semi_shape = how in ("semi", "anti")
    out_names = out_l_names if semi_shape else [on] + payload_l + payload_r

    # Schema anchor for the ALL-EMPTY join result: Ray 2.49's fused map
    # operator short-circuits 0-row blocks to SCHEMA-LESS output without
    # invoking the UDF (measured — a trailing "retype" map_batches never
    # sees them, so it cannot pin anything), and when every group returns
    # 0 rows the naked blocks poison downstream schema resolution — an
    # all-empty join result then loses its columns entirely. The
    # guarantee has to come from a block no map ever touches: one 0-row
    # `from_arrow` block unioned onto the output (the same pattern as
    # `partition_apply` below). Non-empty results are unaffected.
    import ray.data as _rd

    joined = joined.union(_rd.from_arrow(pa.Table.from_arrays(
        [pa.nulls(0, type=types[c]) for c in out_names], names=out_names)))

    def null_rows(side_payload):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch.column(on)
            b = batch.filter(pc.is_null(key)) if batch.num_rows else batch
            n = b.num_rows
            arrays = []
            for c in out_names:
                if n and c in side_payload:
                    arrays.append(b.column(c).cast(types[c]))
                else:
                    arrays.append(pa.nulls(n, type=types[c]))
            return pa.Table.from_arrays(arrays, names=out_names)

        return fn

    if how in ("left", "full", "anti") and lschema.field(on).nullable:
        joined = joined.union(
            left.map_batches(null_rows(set(payload_l)),
                             batch_format="pyarrow"))
    if how in ("right", "full") and rschema.field(on).nullable:
        joined = joined.union(
            right.map_batches(null_rows(set(payload_r)),
                              batch_format="pyarrow"))
    return joined


def partition_apply(ds, fn, *, on: str, schema: pa.Schema,
                    out_schema: pa.Schema):
    """Hash-partition `ds` by `on` and run a VECTORIZED per-partition
    UDF: one all-to-all exchange (same SplitMix64 routing as
    :func:`hash_join`, so equal keys co-locate in exactly one
    partition), then ``fn(pa.Table) -> pa.Table`` over each whole
    partition — the building block for windowed/grouped rewrites that
    would otherwise pay a groupby PLUS a join-back exchange.

    `fn` sees the partition WITHOUT the routing column and must be
    key-local (derive its output only from rows sharing a key — any
    key's full row set is present, but which keys share a partition is
    a hash accident). It must handle a 0-row table (return a typed
    empty). Unlike ``groupby(on).map_groups(fn)`` — one Python call PER
    KEY — `fn` runs once per partition over all its keys, so per-key
    work can be numpy/Arrow-vectorized (the hash_join combine
    discipline).

    NULL keys follow SQL WINDOW semantics (they co-locate like any
    other key value), not join semantics.

    ``on`` may be a LIST of columns: routing then hashes the composite
    (SplitMix64-chained per column), so equal tuples co-locate — the
    (key, bucket) shape hot-key-spreading phases use.

    ``schema``/``out_schema`` are explicit for the same Ray 2.49
    metadata-propagation reasons as ``hash_join``; empty partitions are
    re-typed to ``out_schema`` so no schema-less block poisons
    downstream resolution.
    """
    names = list(schema.names)
    on_cols = [on] if isinstance(on, str) else list(on)

    def add_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # typed empty so no schema-less block flows into the groupby
            return pa.Table.from_arrays(
                [pa.nulls(0, type=schema.field(c).type) for c in names]
                + [pa.array([], type=pa.int64())],
                names=names + ["_part"])
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for col_name in on_cols:
            key = batch.column(col_name)
            if key.null_count:
                # route NULLs like any fixed value (hash_join filters
                # NULLs map-side so _key_hash_u64 never sees them;
                # window semantics keep them): fill with an arbitrary
                # constant — a collision only CO-LOCATES rows, `fn`
                # still groups on the true values.
                fill = ("" if pa.types.is_string(key.type)
                        or pa.types.is_large_string(key.type) else 0)
                key = pc.fill_null(key, fill)
            h = _splitmix64(h ^ _key_hash_u64(key))
        part = (h % np.uint64(_NUM_JOIN_PARTS)).astype(np.int64)
        return batch.select(names).append_column(
            "_part", pa.array(part, type=pa.int64()))

    def apply(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        return fn(part.drop_columns(["_part"]))

    import ray.data

    # Schema anchor for the ALL-EMPTY result: Ray 2.49's fused
    # map-operator short-circuits 0-row blocks to SCHEMA-LESS output
    # (a trailing "retype" map_batches therefore DESTROYS the typed
    # empties map_groups emits — measured, not hypothetical), so the
    # guarantee has to come from a block no map ever touches: one
    # 0-row `from_arrow` block unioned onto the output. Non-empty
    # results are unaffected (one extra empty block).
    anchor = ray.data.from_arrow(out_schema.empty_table())
    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(apply, batch_format="pyarrow")
            .union(anchor))


def pairs_within_key(ds, *, on: str, item: str, out_a: str, out_b: str,
                     schema: pa.Schema, max_group: int = 100_000,
                     what: str = "pairs_within_key",
                     max_group_label: str = "max_group"):
    """All ``item_1 < item_2`` pairs of DISTINCT `item` values sharing a
    key — the co-occurrence / candidate-bucket primitive — in ONE
    `partition_apply` exchange with the pair indices generated by the
    hash_join repeat/arange arithmetic (no per-key Python; the old
    ``groupby(key).map_groups`` + ``combinations`` shape paid one Python
    call AND an O(pairs) interpreter loop per key). A key with more
    than ``max_group`` distinct items RAISES (no silent caps)."""
    item_type = schema.field(item).type
    out_schema = pa.schema([(out_a, item_type), (out_b, item_type)])

    def fn(part: pa.Table) -> pa.Table:
        idx = pc.sort_indices(part, sort_keys=[
            (on, "ascending"), (item, "ascending")])
        t = part.take(idx)
        k = t.column(on)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        it = t.column(item)
        if isinstance(it, pa.ChunkedArray):
            it = it.combine_chunks()
        n = t.num_rows
        if n > 1:
            kne = np.asarray(pc.not_equal(k.slice(1), k.slice(0, n - 1)))
            ine = np.asarray(pc.not_equal(it.slice(1), it.slice(0, n - 1)))
            first = np.r_[True, kne | ine]  # distinct (key, item)
        else:
            first = np.ones(n, dtype=bool)
        keep_idx = np.nonzero(first)[0]
        k = k.take(pa.array(keep_idx))
        it = it.take(pa.array(keep_idx))
        n = len(keep_idx)
        if n > 1:
            kne = np.asarray(pc.not_equal(k.slice(1), k.slice(0, n - 1)))
            starts = np.r_[0, np.nonzero(kne)[0] + 1].astype(np.int64)
        else:
            starts = np.zeros(min(n, 1), dtype=np.int64)
        m = (np.r_[starts[1:], n] - starts).astype(np.int64)
        bad = np.nonzero(m > max_group)[0]
        if bad.size:
            raise ValueError(
                f"{what}: key {k[int(starts[bad[0]])].as_py()!r} has "
                f"{int(m[bad[0]])} distinct items > "
                f"{max_group_label}={max_group}")
        sel = m >= 2
        ms, ss = m[sel], starts[sel]
        nout = ms * ms
        total = int(nout.sum())
        if total == 0:
            return out_schema.empty_table()
        offs = np.zeros(len(nout), dtype=np.int64)
        np.cumsum(nout[:-1], out=offs[1:])
        jg = np.arange(total, dtype=np.int64) - np.repeat(offs, nout)
        mr = np.repeat(ms, nout)
        idx_i = np.repeat(ss, nout) + jg // mr
        idx_j = np.repeat(ss, nout) + jg % mr
        keep = idx_i < idx_j  # items sorted within run -> item_1 < item_2
        return pa.table({
            out_a: it.take(pa.array(idx_i[keep])),
            out_b: it.take(pa.array(idx_j[keep])),
        }, schema=out_schema)

    return partition_apply(ds, fn, on=on, schema=schema,
                           out_schema=out_schema)


def attach_group_size(ds, *, on: str, schema: pa.Schema,
                      out: str = "group_n"):
    """``COUNT(*) OVER (PARTITION BY on)`` in ONE hash exchange: append
    each row's group size over `on` without a groupby + join-back.

    The naive relational shape (``groupby(on).count()`` then
    ``hash_join`` the counts back) executes the input subgraph TWICE
    and moves it through TWO all-to-all exchanges. Here
    :func:`partition_apply` co-locates equal keys once and each
    partition computes sizes vectorized — dictionary-encode the key,
    ``bincount`` the codes, gather — no per-key Python, no second scan.
    NULL keys form ONE group (SQL window semantics).
    """
    if out in schema.names:
        raise ValueError(f"output column {out!r} already in input schema")
    out_schema = pa.schema(
        [(c, schema.field(c).type) for c in schema.names]
        + [(out, pa.int64())])

    def sized(part: pa.Table) -> pa.Table:
        key = part.column(on)
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        enc = key.dictionary_encode()
        codes = np.asarray(enc.indices.fill_null(len(enc.dictionary)))
        counts = np.bincount(codes, minlength=len(enc.dictionary) + 1)
        return part.append_column(
            out, pa.array(counts[codes], type=pa.int64()))

    return partition_apply(ds, sized, on=on, schema=schema,
                           out_schema=out_schema)


def _splitmix64(x):
    """Vectorized SplitMix64 over a uint64 numpy array (the corpus.mix
    constant schedule) — deterministic, no RNG state."""
    import numpy as np

    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def salted_hash_join(left, right, *, on: str, salt_from: str,
                     n_salt: int = 8, max_group: int = 100_000,
                     left_schema: pa.Schema, right_schema: pa.Schema):
    """Skew-defeating inner hash join: a hot key whose cross product would
    blow `hash_join`'s `max_group` guard is SPLIT across ``n_salt``
    sub-keys.

    The big/skewed LEFT side gets a deterministic per-row salt
    (SplitMix64 of its ``salt_from`` int column, so reruns produce
    identical partitioning — no RNG); the RIGHT side is replicated once
    per salt (xN_salt row blowup — keep the right side the smaller one).
    Both then join on the composite ``key#salt`` string with the normal
    one-shuffle `hash_join`; each hot-key group shrinks by ~n_salt. Output
    columns match ``hash_join(how="inner")`` (the composite key is
    dropped).

    Scale shape: right-side replication costs n_salt x |right| shuffled
    rows — the classic salting trade (pay a bounded fan-out to bound the
    per-group cross product). For a small right side prefer
    `broadcast_join`; salting is for big-big joins with hot keys.
    """
    import numpy as np

    if n_salt < 1:
        raise ValueError("n_salt must be >= 1")
    key_t = left_schema.field(on).type

    def salt_left(batch: pa.Table) -> pa.Table:
        sv = np.asarray(batch.column(salt_from).cast(pa.int64())
                        .to_numpy(zero_copy_only=False)).astype(np.uint64)
        salt = (_splitmix64(sv) % np.uint64(n_salt)).astype(np.int64)
        ks = pc.binary_join_element_wise(
            pc.cast(batch.column(on), pa.string()),
            pc.cast(pa.array(salt), pa.string()), "#")
        return batch.append_column("_ks", ks)

    def explode_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), n_salt))
        rep = batch.take(idx)
        salts = np.tile(np.arange(n_salt, dtype=np.int64), n)
        ks = pc.binary_join_element_wise(
            pc.cast(rep.column(on), pa.string()),
            pc.cast(pa.array(salts), pa.string()), "#")
        return rep.append_column("_ks", ks)

    lsalted = left.map_batches(salt_left, batch_format="pyarrow")
    rsalted = (right.map_batches(explode_right, batch_format="pyarrow")
               .drop_columns([on]))
    ls = left_schema.append(pa.field("_ks", pa.string()))
    rs = pa.schema([f for f in right_schema if f.name != on]).append(
        pa.field("_ks", pa.string()))
    joined = hash_join(lsalted, rsalted, on="_ks", max_group=max_group,
                       left_schema=ls, right_schema=rs)
    return joined.drop_columns(["_ks"])


# --------------------------------------------------------------------------
# Bloom-prefilter semi join — the 100 TB shape for "big table ∩ medium keys"
# --------------------------------------------------------------------------


def bloom_bits(keys_ds, *, on: str, m_bits: int = 1 << 20,
               n_hashes: int = 4):
    """Build a Bloom filter bitmap over an int64 key column, distributed.

    Per-block partial bitmaps (packed uint64 words, ``m_bits/8`` bytes
    each) are OR-folded through a ``repartition(1)`` of the tiny partials
    — no driver-side accumulation, no shuffle of the key rows themselves.
    Hash family: ``SplitMix64(key * GOLDEN + i)`` for i in [0, n_hashes),
    deterministic and identical across runs/cluster layouts.

    Returns the folded numpy uint64 array (length ``m_bits // 64``).
    ``m_bits`` must be a power of two. Memory: the bitmap itself —
    2^20 bits = 128 KiB; size to ~10 bits/key for ~1% false positives.
    """
    import numpy as np

    if m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two")
    n_words = m_bits // 64
    mask = np.uint64(m_bits - 1)

    def _hashes(keys: "np.ndarray"):
        k = keys.astype(np.uint64)
        with np.errstate(over="ignore"):
            for i in range(n_hashes):
                yield _splitmix64(k * np.uint64(0x9E3779B97F4A7C15)
                                  + np.uint64(i)) & mask

    def partial(b: pa.Table) -> pa.Table:
        import numpy as np

        bits = np.zeros(n_words, dtype=np.uint64)
        keys = b.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        for h in _hashes(keys):
            np.bitwise_or.at(bits, (h >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (h & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.tobytes()], type=pa.binary())})

    def fold(b: pa.Table) -> pa.Table:
        import numpy as np

        acc = np.zeros(n_words, dtype=np.uint64)
        for blob in b.column("bits").to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()], type=pa.binary())})

    # batch_size=None: ONE partial bitmap per input block, not per
    # 1024-row default batch. Two-level tree fold: at 10^6 blocks the
    # partials are ~m_bits/8 x n_blocks bytes — OR them 16-ways first so
    # no single task ingests them all.
    partials = (
        keys_ds.select_columns([on])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
    )
    folded = (
        partials.repartition(16)
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
        .take(1)
    )
    import numpy as np

    return np.frombuffer(folded[0]["bits"], dtype=np.uint64), mask, n_hashes


def bloom_semi_join(left, right, *, on: str, m_bits: int = 1 << 20,
                    n_hashes: int = 4, max_group: int = 100_000,
                    left_schema: Optional[pa.Schema] = None,
                    right_schema: Optional[pa.Schema] = None):
    """EXACT semi join with a Bloom prefilter on the big left side.

    Scale shape: `hash_join(how="semi")` already ships only key + left
    payload through its shuffle — but at 10^12 left rows that is still an
    all-to-all of the full left table. The Bloom bitmap (built once from
    the right side, broadcast via ``ray.put``, read zero-copy in every
    probe task) eliminates definite non-matches BEFORE the shuffle, so
    the exchange carries ~|matches| + fp-rate x |left| rows instead of
    |left|. Bloom filters have no false negatives, so the follow-up exact
    semi join returns precisely SQL ``WHERE key IN (SELECT ...)``.

    The probe is one fused vectorized map_batches: n_hashes SplitMix64
    evaluations + bitmap gathers per batch, no Python row loop.
    """
    import numpy as np
    import ray

    bits, mask, k = bloom_bits(right, on=on, m_bits=m_bits,
                               n_hashes=n_hashes)
    bits_ref = ray.put(bits)

    class BloomProbe:
        def __init__(self, ref, on, mask, n_hashes):
            self.bits = ray.get(ref)
            self.on = on
            self.mask = mask
            self.n = n_hashes

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            keys = (batch.column(self.on)
                    .to_numpy(zero_copy_only=False).astype(np.uint64))
            hit = np.ones(len(keys), dtype=bool)
            with np.errstate(over="ignore"):
                for i in range(self.n):
                    h = _splitmix64(keys * np.uint64(0x9E3779B97F4A7C15)
                                    + np.uint64(i)) & self.mask
                    word = self.bits[(h >> np.uint64(6)).astype(np.int64)]
                    hit &= (word >> (h & np.uint64(63))) & np.uint64(1) != 0
            return batch.filter(pa.array(hit))

    survivors = left.map_batches(
        BloomProbe, fn_constructor_args=(bits_ref, on, mask, k),
        batch_format="pyarrow", concurrency=(1, 8))
    return hash_join(survivors, right, on=on, how="semi",
                     max_group=max_group, left_schema=left_schema,
                     right_schema=right_schema)


def hash_join_on(left, right, *, on: "List[str]", how: str = "inner",
                 max_group: int = 100_000,
                 left_schema: pa.Schema, right_schema: pa.Schema):
    """Composite-key (multi-column) hash join: pack the key columns into
    one ``\\x1f``-separated string key and delegate to :func:`hash_join`.

    The packed key is exact for int64/string key columns (decimal int
    rendering is unambiguous; the unit separator never appears in the
    corpus's key strings — a key string containing ``\\x1f`` would need
    caller-side escaping). A composite key with ANY null component packs
    to NULL (binary_join_element_wise) and follows `hash_join`'s SQL
    NULL-key semantics: it matches nothing (dropped for inner/semi, kept
    for anti). The LEFT side's original key columns ride
    along as payload and are re-emitted; the right side's are dropped
    (they are equal by definition). ``how`` is limited to the shapes
    where that equality holds for every output row: inner / semi / anti.

    Scale shape: identical to `hash_join` — one hash exchange on the
    packed key; the pack adds one vectorized cast+join kernel per side.
    """
    if how not in ("inner", "semi", "anti"):
        raise ValueError("hash_join_on supports inner/semi/anti only")
    if len(on) < 2:
        raise ValueError("hash_join_on needs >= 2 key columns")

    def pack(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("_ck", pa.array([], type=pa.string()))
        parts = [pc.cast(batch.column(c), pa.string()) for c in on]
        ck = pc.binary_join_element_wise(*parts, "\x1f")
        return batch.append_column("_ck", ck)

    lpacked = left.map_batches(pack, batch_format="pyarrow")
    rpacked = (right.map_batches(pack, batch_format="pyarrow")
               .drop_columns(list(on)))
    ls = left_schema.append(pa.field("_ck", pa.string()))
    rs = pa.schema([f for f in right_schema if f.name not in on]).append(
        pa.field("_ck", pa.string()))
    joined = hash_join(lpacked, rpacked, on="_ck", how=how,
                       max_group=max_group, left_schema=ls, right_schema=rs)
    return joined.drop_columns(["_ck"])


def attach_pair_texts(cand, docs, *, cand_schema: pa.Schema,
                      id_col: str = "doc_id", text_col: str = "text",
                      broadcast_max: int = 1 << 16,
                      max_group: int = 100_000):
    """Attach ``text_a``/``text_b`` payload columns to a candidate-pair
    Dataset ``cand(id_a, id_b)`` from the ``docs(id, text)`` table — the
    shared verify-side transport of the pair-dedup family (ssjoin,
    LSH-exact verify).

    MEASURED switch: when ``docs`` has at most ``broadcast_max`` rows
    (parquet-metadata-cheap ``count()``), the (id, text) table ships once
    as a broadcast object-store block and each candidate batch gathers
    its texts map-side with two sorted ``searchsorted`` takes — ZERO join
    exchanges. Above the bound, two `hash_join` exchanges retrieve the
    texts — the only shape that holds when the text table itself is the
    100 TB side. Both paths emit the same (id_a, id_b, text_a, text_b)
    rows (pytest-pinned parity at the call sites). Candidate ids that
    don't exist in ``docs`` are dropped by the join path; the broadcast
    path asserts instead (candidates are generated FROM docs, so a miss
    is a bug, not data).
    """
    import numpy as np

    if docs.count() <= broadcast_max:
        import ray

        parts = [tb for tb in ray.get(docs.select_columns(
            [id_col, text_col]).to_arrow_refs()) if tb.num_rows]
        if parts:
            tt = pa.concat_tables(parts)
            all_ids = np.asarray(
                tt.column(id_col).cast(pa.int64()).combine_chunks())
            order = np.argsort(all_ids, kind="stable")
            ids_sorted = all_ids[order]
            texts_sorted = (tt.column(text_col).combine_chunks()
                            .take(pa.array(order)))
        else:
            ids_sorted = np.empty(0, dtype=np.int64)
            texts_sorted = pa.array([], type=pa.string())
        ref = ray.put((ids_sorted, texts_sorted))
        out_schema = cand_schema.append(
            pa.field("text_a", pa.string())).append(
            pa.field("text_b", pa.string()))

        def gather(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return out_schema.empty_table()
            ids_s, texts_s = ray.get(ref)
            a = np.asarray(b.column("id_a").combine_chunks())
            bb = np.asarray(b.column("id_b").combine_chunks())
            pa_idx = np.searchsorted(ids_s, a)
            pb_idx = np.searchsorted(ids_s, bb)
            if ids_s.size == 0 or not (
                np.array_equal(ids_s[np.clip(pa_idx, 0, ids_s.size - 1)], a)
                and np.array_equal(
                    ids_s[np.clip(pb_idx, 0, ids_s.size - 1)], bb)):
                raise ValueError(
                    "attach_pair_texts: candidate id missing from docs")
            return (b.append_column("text_a", texts_s.take(pa.array(pa_idx)))
                     .append_column("text_b", texts_s.take(pa.array(pb_idx))))

        return cand.map_batches(gather, batch_format="pyarrow")

    texts_a = docs.select_columns([id_col, text_col]).rename_columns(
        {id_col: "id_a", text_col: "text_a"})
    texts_b = docs.select_columns([id_col, text_col]).rename_columns(
        {id_col: "id_b", text_col: "text_b"})
    s_ta = pa.schema([("id_a", pa.int64()), ("text_a", pa.string())])
    s_tb = pa.schema([("id_b", pa.int64()), ("text_b", pa.string())])
    j1 = hash_join(cand, texts_a, on="id_a", max_group=max_group,
                   left_schema=cand_schema, right_schema=s_ta)
    s_j1 = pa.schema(list(cand_schema) + [pa.field("text_a", pa.string())])
    return hash_join(j1, texts_b, on="id_b", max_group=max_group,
                     left_schema=s_j1, right_schema=s_tb)
