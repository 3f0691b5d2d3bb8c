"""Distributed k-means over an embedding column + SemDeDup-style
cluster-bucketed near-duplicate detection.

The reference has no clustering (its nearest analog is the IVF coarse
quantizer in `functions/similarity.py`, whose k-means runs driver-side
over a bounded 4096-row sample). This module is the FULL-DATA scale
path a 100 TB embedding table needs:

* :func:`kmeans_fit` — Lloyd's iterations where every pass is one
  `map_batches` over the whole dataset: centroids are broadcast once per
  iteration (`ray.put`), each batch emits ONE partial row (k x d float64
  sums + k counts), and the partial fold is MEASURED (the `_guarded_agg`
  discipline): block-count-bounded row sets fold driver-side in the same
  execution, anything larger goes through the distributed `Sum`
  aggregate — driver state stays one k x d matrix either way.
* :func:`kmeans_assign` — final assignment pass, (id, cluster) rows.
* :func:`cluster_neardup` — SemDeDup (Abbas et al., 2023,
  arXiv:2303.09540) shape: k-means buckets replace LSH buckets, pairwise
  cosine within a cluster only (`groupby(cluster).map_groups`), oversized
  clusters RAISE (no silent caps — re-run with larger k).

Determinism: seeds are the k globally-smallest SplitMix64(id) rows
(distributed partial top-k then a k-row sort — no RNG); iteration count
is fixed (no data-dependent stopping); assignment ties break to the
lowest cluster index. Float64 accumulation order across blocks can vary
at the ulp level, which flips a point only if two centroids are closer
than one ulp — the planted-blob pytest pins exact recovery.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .joins import _splitmix64
#: Single-execution driver-fold ceiling for the per-pass partial rows.
#: Partials are <= k (seeding) / exactly 1 (Lloyd's) rows PER BLOCK, so
#: this bounds by BLOCK COUNT — 64k blocks is far beyond any real
#: cluster's block count for one table; above it the distributed
#: aggregate finish runs instead (no silent caps).
_DRIVER_FOLD_MAX = 1 << 16

#: Row ceiling for the in-process Lloyd's path: 64k rows x d=64 float64
#: is ~32 MB — a dimension-sized table whose per-pass Ray execution
#: overhead would dwarf the matmul. Above it, the distributed per-pass
#: map_batches + measured fold runs.
_KMEANS_LOCAL_MAX = 1 << 16


def _batch_vectors(batch: pa.Table, col: str) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (d fixed per table)."""
    arr = batch.column(col)
    if arr.num_chunks == 1:
        la = arr.chunk(0)
    else:
        la = arr.combine_chunks()
    flat = np.asarray(la.values.to_numpy(zero_copy_only=False),
                      dtype=np.float64)
    offs = np.asarray(la.offsets.to_numpy(zero_copy_only=False))
    widths = np.diff(offs)
    if len(widths) == 0:
        return flat.reshape(0, 0)
    if not (widths == widths[0]).all():
        raise ValueError("embedding column is ragged; fixed d required")
    d = int(widths[0])
    # honor a sliced array: offsets need not start at 0
    return flat[offs[0]:offs[-1]].reshape(-1, d)


def _assign(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_c ||x - c||^2 via the expanded form; ties -> lowest index
    (np.argmin convention)."""
    # ||x||^2 is constant per row — argmin needs only -2 x.c + ||c||^2
    scores = -2.0 * (vecs @ cents.T) + (cents * cents).sum(axis=1)
    return np.argmin(scores, axis=1)


def kmeans_fit(ds, *, col: str = "embedding", id_col: str = "vec_id",
               k: int = 8, n_iter: int = 5,
               local_max: int | None = None) -> np.ndarray:
    """Fit k centroids with `n_iter` full-data Lloyd's passes; returns the
    (k, d) float64 centroid matrix.

    Seeding: priority = SplitMix64(id); each block nominates its k
    smallest-priority vectors (<= k rows leave any block), the nomination
    dataset is sorted distributed-ly and the global k smallest are the
    seeds — deterministic under any partitioning, no RNG
    (mindocr analog: none; IVF trainer in functions/similarity.py uses a
    driver-side sample instead).

    Scale shape picked from the MEASURED row count (free — the input
    materializes for iterative reuse anyway): a dimension-sized vector
    table (<= ``local_max`` rows, default `_KMEANS_LOCAL_MAX`) gathers
    once and runs every Lloyd's pass in-process — iterative barriers
    cost one Ray execution EACH, so at that size the per-pass fixed
    cost dominates the math by orders of magnitude. Above the bound the
    distributed path runs: one map_batches per pass, one partial row
    per block, measured fold. Same seeds either way; centroid floats
    can differ at the ulp level between paths (accumulation order), the
    caveat already pinned in the module docstring.
    """
    import ray
    from ray.data.aggregate import Sum

    def nominate(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).cast(pa.int64())
                         .to_numpy(zero_copy_only=False)).astype(np.uint64)
        prio = _splitmix64(ids).astype(np.int64)  # two's-complement order
        # int64 reinterpret keeps uniqueness; sort order differs from
        # uint64 but any deterministic total order works for seeding.
        take = np.argsort(prio, kind="stable")[:k]
        vecs = _batch_vectors(batch, col)[take]
        return pa.table({
            "_prio": pa.array(prio[take]),
            "_vec": pa.array(list(vecs), type=pa.list_(pa.float64())),
        })

    # iterative consumption: cache the input blocks ONCE — every Lloyd's
    # pass (and the assignment pass the caller usually runs next) re-reads
    # object-store blocks instead of re-executing the read subgraph
    ds = ds.materialize()

    if local_max is None:
        local_max = _KMEANS_LOCAL_MAX
    if ds.count() <= local_max:
        tbl = pa.concat_tables(
            t for t in ray.get(ds.to_arrow_refs()) if t.num_columns)
        vecs = _batch_vectors(tbl.select([col]), col)
        ids = np.asarray(tbl.column(id_col).cast(pa.int64())
                         .to_numpy(zero_copy_only=False)).astype(np.uint64)
        prio = _splitmix64(ids).astype(np.int64)
        take = np.argsort(prio, kind="stable")[:k]
        cents = vecs[take].astype(np.float64)
        if cents.shape[0] < k:
            raise ValueError(f"k={k} but only {cents.shape[0]} rows")
        kd = cents.shape[1]
        for _ in range(n_iter):
            lab = _assign(vecs, cents)
            sums = np.zeros((k, kd), dtype=np.float64)
            np.add.at(sums, lab, vecs)
            counts = np.bincount(lab, minlength=k).astype(np.int64)
            nz = counts > 0
            cents = cents.copy()
            cents[nz] = sums[nz] / counts[nz, None]
        return cents

    # nominations are <= k rows per block — the fold is bounded by the
    # BLOCK COUNT (cluster size), not data size. Measure it in the
    # object store and fold driver-side when it fits (one Ray execution
    # per pass instead of the tree's materialize + 2-exchange finish);
    # above the bound, the distributed sort/aggregate finish.
    nom = ds.map_batches(nominate, batch_format="pyarrow").materialize()
    if nom.count() > _DRIVER_FOLD_MAX:
        seeds_tbl = nom.sort("_prio").limit(k).take_all()
    else:
        seeds_tbl = nom.take_all()
    seeds_tbl.sort(key=lambda r: r["_prio"])
    seeds_tbl = seeds_tbl[:k]
    cents = np.asarray([r["_vec"] for r in seeds_tbl], dtype=np.float64)
    if cents.shape[0] < k:
        raise ValueError(f"k={k} but only {cents.shape[0]} rows")
    d = cents.shape[1]

    sum_names = [f"s{i}" for i in range(k * d)]
    cnt_names = [f"n{c}" for c in range(k)]

    for _ in range(n_iter):
        ref = ray.put(cents)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            cen = ray.get(_ref)
            vecs = _batch_vectors(batch, col)
            lab = _assign(vecs, cen)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, lab, vecs)
            counts = np.bincount(lab, minlength=k).astype(np.int64)
            row = {nm: pa.array([sums.ravel()[i]])
                   for i, nm in enumerate(sum_names)}
            row.update({nm: pa.array([int(counts[c])])
                        for c, nm in enumerate(cnt_names)})
            return pa.table(row)

        def sum_rows(t: pa.Table) -> pa.Table:
            if t.num_rows <= 1:
                return t
            cols = {}
            for nm in sum_names:
                cols[nm] = pa.array(
                    [pc.sum(t.column(nm)).as_py() or 0.0],
                    type=pa.float64())
            for nm in cnt_names:
                cols[nm] = pa.array(
                    [pc.sum(t.column(nm)).as_py() or 0],
                    type=pa.int64())
            return pa.table(cols)

        def agg_fb(p):
            import ray.data

            a = p.aggregate(
                *[Sum(nm, alias_name=nm) for nm in sum_names + cnt_names])
            return ray.data.from_arrow(pa.table(
                {nm: pa.array([a[nm] or 0.0], type=pa.float64())
                 for nm in sum_names}
                | {nm: pa.array([a[nm] or 0], type=pa.int64())
                   for nm in cnt_names}))

        # the partials are ONE row per block — bounded by the block
        # count, not data size. Measured driver fold (blocks are already
        # materialized, take_all is a plain ray.get — ONE execution per
        # Lloyd's pass, no exchange at all); above the bound the
        # fallback is the original distributed Sum aggregate.
        p = ds.map_batches(partial, batch_format="pyarrow").materialize()
        if p.count() > _DRIVER_FOLD_MAX:
            rows = agg_fb(p).take_all()
        else:
            rows = p.take_all()
        agg = {nm: sum(r[nm] for r in rows)
               for nm in sum_names + cnt_names}
        sums = np.array([float(agg[nm] or 0.0) for nm in sum_names],
                        dtype=np.float64).reshape(k, d)
        counts = np.array([int(agg[nm] or 0) for nm in cnt_names],
                          dtype=np.int64)
        nonzero = counts > 0
        cents = cents.copy()
        cents[nonzero] = sums[nonzero] / counts[nonzero, None]
        # empty cluster: keep previous centroid (deterministic)
    return cents


def kmeans_assign(ds, centroids: np.ndarray, *, col: str = "embedding",
                  id_col: str = "vec_id"):
    """Assignment pass: (id_col, cluster:int64) one row per input row."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        cen = ray.get(ref)
        vecs = _batch_vectors(batch, col)
        lab = _assign(vecs, cen).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "cluster": pa.array(lab),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def cluster_neardup(ds, centroids: np.ndarray, *, col: str = "embedding",
                    id_col: str = "vec_id", threshold: float = 0.9,
                    max_cluster: int = 20_000,
                    counter: Optional[object] = None):
    """SemDeDup-style near-duplicate pairs: cosine >= threshold computed
    ONLY within a k-means cluster (candidate generation by semantic
    bucket instead of LSH). Output: (id_a, id_b, cosine) with
    id_a < id_b; ordered deterministically within each cluster group.

    A cluster larger than `max_cluster` RAISES (quadratic blowup is a
    modeling problem — increase k), mirroring `hash_join.max_group`
    ("no silent caps").
    """
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))
    out_schema = pa.schema([
        ("id_a", pa.int64()), ("id_b", pa.int64()), ("cosine", pa.float64()),
    ])

    def tag(batch: pa.Table) -> pa.Table:
        cen = ray.get(ref)
        vecs = _batch_vectors(batch, col)
        lab = _assign(vecs, cen).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            col: batch.column(col),
            "cluster": pa.array(lab),
        })

    def pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return out_schema.empty_table()
        if n > max_cluster:
            raise ValueError(
                f"cluster {group.column('cluster')[0].as_py()} has {n} rows "
                f"> max_cluster={max_cluster}; increase k")
        ids = np.asarray(group.column(id_col).to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        vecs = _batch_vectors(group, col)[order]
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        cos = unit @ unit.T
        iu = np.triu_indices(n, k=1)
        keep = cos[iu] >= threshold
        return pa.table({
            "id_a": pa.array(ids[iu[0][keep]]),
            "id_b": pa.array(ids[iu[1][keep]]),
            "cosine": pa.array(cos[iu][keep].astype(np.float64)),
        }, schema=out_schema)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(pairs, batch_format="pyarrow"))
