"""Distributed aggregate extensions: exact per-group COUNT(DISTINCT),
variance/stddev from integer partial sums, ordered string_agg, set
INTERSECT/EXCEPT over derived key sets, and deterministic hash-priority
per-group sampling.

All follow the reference's partial+final discipline (`RecMetric` partial
counters + AllReduce — mindocr/metrics/rec_metrics.py:16-170): per-batch
or per-group partials, ONE keys-only shuffle, small finish. No stage
materializes payload-sized data on the driver.

Float determinism: variance/stddev are computed from EXACT int64 partial
sums with a single final IEEE-double expression — write the SQL oracle as
the SAME literal expression over the same integer aggregates and the
doubles are bit-identical (the tfidf integer-ratio discipline; int64
overflow bound: sum(x^2) must stay < 2^63 — holds to ~1e12 rows of
x <= 3e5, i.e. crawl scale with room).
"""

from __future__ import annotations

import hashlib
import math
from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def count_distinct_by(ds, *, by: str, of: str, out_name: str = "n_distinct"):
    """Exact COUNT(DISTINCT of) per `by` group in two keys-only stages:
    dedup (by, of) pairs with one groupby, then count pairs per key. Only
    key columns ever cross a shuffle; no payload, no driver state."""
    from ray.data.aggregate import Count

    pairs = ds.groupby([by, of]).aggregate(Count())
    return (
        pairs.groupby(by).aggregate(Count())
        .rename_columns({"count()": out_name})
    )


def moments_by(ds, *, by: str, val: str):
    """Per-group sample variance + stddev from integer partial sums:
    ``var = (n*Σx² − (Σx)²) / (n*(n−1))``, ``std = sqrt(var)`` — one
    groupby of three int64 partials, one double division + sqrt at the
    end (round-only-at-end, det_base_postprocess.py:110-128 discipline).

    Output: ``(by, n, var_samp, std_samp)``; groups with n < 2 emit null
    variance (SQL var_samp convention).
    """
    from ray.data.aggregate import Count, Sum

    def add_sq(b: pa.Table) -> pa.Table:
        x = b.column(val).cast(pa.int64())
        return b.append_column("_x2", pc.multiply_checked(x, x))

    agg = (
        ds.map_batches(add_sq, batch_format="pyarrow")
        .groupby(by)
        .aggregate(Sum(val, alias_name="sx"),
                   Sum("_x2", alias_name="sxx"),
                   Count())
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("count()").to_numpy(zero_copy_only=False).astype(np.int64)
        sx = b.column("sx").to_numpy(zero_copy_only=False).astype(np.int64)
        sxx = b.column("sxx").to_numpy(zero_copy_only=False).astype(np.int64)
        num = n * sxx - sx * sx
        den = n * (n - 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            var = num.astype(np.float64) / den.astype(np.float64)
        valid = n >= 2
        var_arr = pa.array(var, type=pa.float64(), mask=~valid)
        std_arr = pa.array(np.sqrt(var), type=pa.float64(), mask=~valid)
        return pa.table({
            by: b.column(by),
            "n": pa.array(n),
            "var_samp": var_arr,
            "std_samp": std_arr,
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def collect_sorted(ds, *, by: str, val: str, sep: str = ",",
                   out_name: str = "vals", max_group: int = 100_000):
    """Ordered per-group string_agg: sort each group by `val` ascending and
    join the stringified values with `sep` (SQL
    ``string_agg(val, sep ORDER BY val)``). Inherently a per-key gather —
    a group materializes in one task, so `max_group` RAISES on groups
    beyond the cap (no silent truncation); filter/pre-aggregate upstream
    to bound group size."""
    out_schema = pa.schema([(by, pa.string()), (out_name, pa.string())])

    def grp_part(part: pa.Table) -> pa.Table:
        """Every group of the partition in one pass (round-5: per-key
        map_groups + a per-value str join replaced by one (key, val)
        sort and one C-level list-array ``binary_join``)."""
        idx = pc.sort_indices(part, sort_keys=[
            (by, "ascending"), (val, "ascending")])
        t = part.take(idx)
        k = t.column(by)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        n = t.num_rows
        neq = np.asarray(pc.not_equal(k.slice(1), k.slice(0, n - 1))) \
            if n > 1 else np.empty(0, dtype=bool)
        starts = np.r_[0, np.nonzero(neq)[0] + 1].astype(np.int64)
        counts = np.r_[starts[1:], n] - starts
        big = np.nonzero(counts > max_group)[0]
        if big.size:
            raise ValueError(
                f"collect_sorted: group {k[int(starts[big[0]])].as_py()!r} "
                f"has {int(counts[big[0]])} rows > max_group={max_group}")
        vals_str = pc.cast(t.column(val).cast(pa.int64()),
                           pa.string()).combine_chunks()
        lists = pa.ListArray.from_arrays(
            pa.array(np.r_[starts, n], type=pa.int32()), vals_str)
        return pa.table({
            by: k.take(pa.array(starts)),
            out_name: pc.binary_join(lists, sep),
        }, schema=out_schema)

    from webextract.functions.joins import partition_apply

    return partition_apply(
        ds.select_columns([by, val]), grp_part, on=by,
        schema=pa.schema([(by, pa.string()), (val, pa.int64())]),
        out_schema=out_schema)


def first_row_per_key(ds, *, on: str, sort_keys, schema: pa.Schema):
    """SQL ``QUALIFY row_number() OVER (PARTITION BY on ORDER BY
    sort_keys) = 1`` in ONE exchange, vectorized: hash-partition by
    `on` (equal keys co-locate), Arrow-sort each partition by
    ``(on, *sort_keys)``, and take the run-start rows — no per-key
    Python (the former per-group map_groups shape paid one call per
    distinct key). ``sort_keys`` is a list of (column, "ascending" |
    "descending"); ties beyond it follow Arrow's stable sort of the
    partition. Output schema == input ``schema``."""
    from webextract.functions.joins import partition_apply

    def fn(part: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            part, sort_keys=[(on, "ascending"), *sort_keys])
        t = part.take(idx)
        k = t.column(on)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        n = t.num_rows
        neq = np.asarray(pc.not_equal(k.slice(1), k.slice(0, n - 1))) \
            if n > 1 else np.empty(0, dtype=bool)
        starts = np.r_[0, np.nonzero(neq)[0] + 1].astype(np.int64)
        return t.take(pa.array(starts))

    return partition_apply(ds, fn, on=on, schema=schema,
                           out_schema=schema)


def _key_setop(left, right, *, on: str, key_type: pa.DataType, mode: str):
    """Shared INTERSECT/EXCEPT engine: ONE `partition_apply` exchange
    over the tagged union replaces the old two distinct groupbys + a
    semi/anti hash_join (three all-to-alls). Each side batch-local
    DISTINCTs before the exchange (a block contributes each key once),
    equal keys co-locate, and the partition classifies its keys with a
    dictionary-encode + two bincounts. NULL keys follow SQL SET
    semantics (NULL treated as one value on both sides), which is what
    INTERSECT/EXCEPT specify — unlike join-key semantics."""
    import numpy as np

    from webextract.functions.joins import partition_apply

    def tag(src: int):
        def fn(b: pa.Table) -> pa.Table:
            u = pc.unique(b.column(on))
            return pa.table({
                on: u.cast(key_type),
                "_src": pa.array(
                    np.full(len(u), src, dtype=np.int8), type=pa.int8()),
            })
        return fn

    lt = left.map_batches(tag(0), batch_format="pyarrow")
    rt = right.map_batches(tag(1), batch_format="pyarrow")
    out_schema = pa.schema([(on, key_type)])

    def classify(t: pa.Table) -> pa.Table:
        k = t.column(on)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        enc = k.dictionary_encode()
        nk = len(enc.dictionary)
        codes = np.asarray(enc.indices.fill_null(nk))  # NULL = own group
        src = np.asarray(t.column("_src").to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        in_l = np.bincount(codes[src == 0], minlength=nk + 1) > 0
        in_r = np.bincount(codes[src == 1], minlength=nk + 1) > 0
        sel = (in_l & in_r) if mode == "intersect" else (in_l & ~in_r)
        keys = enc.dictionary.filter(pa.array(sel[:nk]))
        if sel[nk]:
            keys = pa.concat_arrays(
                [keys.combine_chunks() if isinstance(keys, pa.ChunkedArray)
                 else keys, pa.nulls(1, type=keys.type)])
        return pa.table({on: keys.cast(key_type)}, schema=out_schema)

    return partition_apply(
        lt.union(rt), classify, on=on,
        schema=pa.schema([(on, key_type), ("_src", pa.int8())]),
        out_schema=out_schema)


def key_intersect(left, right, *, on: str,
                  left_schema: pa.Schema, right_schema: pa.Schema):
    """SQL INTERSECT over single-column key sets: distinct keys present
    on BOTH sides — one keys-only exchange (see :func:`_key_setop`)."""
    return _key_setop(left, right, on=on,
                      key_type=left_schema.field(on).type, mode="intersect")


def key_except(left, right, *, on: str,
               left_schema: pa.Schema, right_schema: pa.Schema):
    """SQL EXCEPT over single-column key sets: distinct left keys absent
    from the right — one keys-only exchange (see :func:`_key_setop`)."""
    return _key_setop(left, right, on=on,
                      key_type=left_schema.field(on).type, mode="except")


def hash_sample_per_group(ds, *, by: str, id_col: str, k: int):
    """Deterministic pseudo-uniform k-sample per group: priority =
    ``md5(str(id))`` hex digest, keep the k smallest per group — a
    rerun-stable "random" sample whose SQL mirror is
    ``QUALIFY row_number() OVER (PARTITION BY by ORDER BY
    md5(id::VARCHAR), id) <= k``.

    Scale shape: a per-BATCH partial top-k per group first (each block
    emits at most k rows per group it contains), so the final
    ``groupby(by)`` shuffles <= k x n_blocks tiny rows — never the table.
    """
    out_schema = pa.schema([
        (by, pa.string()), (id_col, pa.int64()), ("_pri", pa.string())])

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).cast(pa.int64()).to_pylist()
        pri = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        t = pa.table({
            by: b.column(by).cast(pa.string()),
            id_col: pa.array(ids, type=pa.int64()),
            "_pri": pa.array(pri, type=pa.string()),
        }, schema=out_schema)
        idx = pc.sort_indices(t, sort_keys=[(by, "ascending"),
                                            ("_pri", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        keep: List[int] = []
        seen = {}
        col = t.column(by).to_pylist()
        for i, g in enumerate(col):
            c = seen.get(g, 0)
            if c < k:
                keep.append(i)
                seen[g] = c + 1
        return t.take(pa.array(keep, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("_pri", "ascending"),
                                                (id_col, "ascending")])
        return group.take(idx[:k]).select([by, id_col])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(by)
        .map_groups(final, batch_format="pyarrow")
    )


def first_by(ds, *, by: str, order: Sequence[str]):
    """Per-group ARG-MIN: the single row of each ``by`` group that is
    lexicographically smallest under ``order`` (SQL
    ``min_by`` / ``QUALIFY row_number() OVER (... ORDER BY order) = 1``).

    Two stages, combiner-first: a per-batch partial keeps ONE candidate
    row per key in the batch (vectorized lexsort + unique-first, no
    Python row loop), then ``groupby(by).map_groups`` picks the winner
    among <= n_blocks candidates per key. Only ``(by, *order)`` int64
    columns exist in the stream, so the shuffle is keys-only and the
    per-key group is bounded by the block count, not the key's row count
    — the `RecMetric` partial+AllReduce shape.
    """
    cols = [by, *order]
    out_schema = pa.schema([(c, pa.int64()) for c in cols])

    def _argmin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        arrays = [np.asarray(t.column(c).to_numpy(zero_copy_only=False),
                             dtype=np.int64) for c in cols]
        # lexsort: last key is primary -> sort by (by, *order)
        sort_keys = tuple(reversed(arrays))
        perm = np.lexsort(sort_keys)
        keys_sorted = arrays[0][perm]
        _, first_idx = np.unique(keys_sorted, return_index=True)
        take = perm[first_idx]
        return pa.table(
            {c: pa.array(a[take]) for c, a in zip(cols, arrays)},
            schema=out_schema)

    def partial(b: pa.Table) -> pa.Table:
        return _argmin(b.select(cols))

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(by)
        .map_groups(_argmin, batch_format="pyarrow")
    )


def corr_by(ds, *, by: str, x: str, y: str):
    """Per-group sample covariance + Pearson correlation from exact int64
    partial sums: one groupby of five integer partials
    ``(Σx, Σy, Σx², Σy², Σxy)`` + Count, then a single final
    IEEE-double expression per group (round-only-at-end):

    ``covar_samp = (n·Σxy − Σx·Σy) / (n·(n−1))``
    ``corr = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))``

    Write the SQL oracle as the SAME literal expression over the same
    integer aggregates and both doubles are bit-identical. Groups with
    n < 2 or zero variance in either column emit nulls (SQL convention).

    Output: ``(by, n, covar_samp, corr)``.
    """
    from ray.data.aggregate import Count, Sum

    def partials(b: pa.Table) -> pa.Table:
        xs = b.column(x).cast(pa.int64())
        ys = b.column(y).cast(pa.int64())
        return pa.table({
            by: b.column(by),
            "_x": xs, "_y": ys,
            "_xx": pc.multiply_checked(xs, xs),
            "_yy": pc.multiply_checked(ys, ys),
            "_xy": pc.multiply_checked(xs, ys),
        })

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(by)
        .aggregate(Sum("_x", alias_name="sx"), Sum("_y", alias_name="sy"),
                   Sum("_xx", alias_name="sxx"), Sum("_yy", alias_name="syy"),
                   Sum("_xy", alias_name="sxy"), Count())
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("count()").to_numpy(zero_copy_only=False).astype(np.int64)
        sx = b.column("sx").to_numpy(zero_copy_only=False).astype(np.int64)
        sy = b.column("sy").to_numpy(zero_copy_only=False).astype(np.int64)
        sxx = b.column("sxx").to_numpy(zero_copy_only=False).astype(np.int64)
        syy = b.column("syy").to_numpy(zero_copy_only=False).astype(np.int64)
        sxy = b.column("sxy").to_numpy(zero_copy_only=False).astype(np.int64)
        num = n * sxy - sx * sy
        denx = n * sxx - sx * sx
        deny = n * syy - sy * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            covar = num.astype(np.float64) / (n * (n - 1)).astype(np.float64)
            corr = num.astype(np.float64) / (
                np.sqrt(denx.astype(np.float64))
                * np.sqrt(deny.astype(np.float64)))
        ok_cov = n >= 2
        ok_corr = ok_cov & (denx > 0) & (deny > 0)
        return pa.table({
            by: b.column(by),
            "n": pa.array(n),
            "covar_samp": pa.array(covar, type=pa.float64(), mask=~ok_cov),
            "corr": pa.array(corr, type=pa.float64(), mask=~ok_corr),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
