"""Similarity search over an embedding column (list<float>).

* :func:`topk_cosine` — brute-force cosine top-k: the query matrix is
  broadcast ONCE (`ray.put` in the driver, captured by the batch UDF —
  never re-shipped per batch), each batch does one float64 matmul and emits
  only its local top-k, then a tiny global sort/limit finishes — the
  partial-top-k pattern, so the shuffle moves k rows per block, not the
  corpus.
* :class:`LshAnn` — scale path: seeded random-hyperplane LSH buckets;
  query probes only its own bucket (and optional multi-probe neighbors).
* :func:`embedding_neardup` — near-duplicate detection by cosine >= tau
  within LSH buckets.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webextract.corpus import mix


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (one copy, vectorized)."""
    arr = batch.column(col)
    if arr.num_chunks == 1:
        chunk = arr.chunk(0)
    else:
        chunk = arr.combine_chunks()
    flat = np.asarray(chunk.flatten(), dtype=np.float64)
    n = len(chunk)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _TopKScorer:
    """Batch UDF: cosine vs the broadcast query vector, local top-k only.

    Emits FULL-PRECISION scores — the global sort must order by the exact
    value (the oracle's ORDER BY uses the unrounded score); rounding happens
    only in the final projection. Round-before-sort can flip membership at
    the k boundary for vectors whose true scores differ past the rounding
    precision ("round only at the end", det_base_postprocess.py:110-128).
    """

    def __init__(self, query_ref, k: int, id_col: str, vec_col: str):
        self.query_ref = query_ref
        self.k, self.id_col, self.vec_col = k, id_col, vec_col
        self._q = None  # broadcast ref resolved lazily (zero-copy local
        # plasma read), so the instance pickles into plain TASKS — no
        # actor-pool spin-up for a stage whose only state is one ref

    def _query(self) -> np.ndarray:
        if self._q is None:
            import ray

            q = (ray.get(self.query_ref)
                 if not isinstance(self.query_ref, np.ndarray)
                 else self.query_ref)
            q = np.asarray(q, dtype=np.float64)
            self._q = q / (np.linalg.norm(q) or 1.0)
        return self._q

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.vec_col))
        scores = m @ self._query()
        k = min(self.k, len(scores))
        idx = np.argpartition(-scores, k - 1)[:k] if k else np.array([], dtype=int)
        ids = batch.column(self.id_col).take(pa.array(idx)).cast(pa.int64())
        return pa.table(
            {
                self.id_col: ids,
                "score": pa.array(scores[idx], type=pa.float64()),
            }
        )


def topk_cosine(ds, query: np.ndarray, k: int = 10, *, id_col: str = "vec_id",
                vec_col: str = "embedding", round_to: int = 6, concurrency=(1, 4)):
    """Brute-force cosine top-k (the ANN baseline). Returns (id, score)."""
    import pyarrow.compute as pc
    import ray

    query_ref = ray.put(np.asarray(query, dtype=np.float64))
    partial = ds.map_batches(
        _TopKScorer(query_ref, k, id_col, vec_col),
        batch_format="pyarrow",
    )

    # Global finish over <= k * n_blocks rows: top-k is associative under a
    # fixed ordering (EXACT score desc, id asc tie-break), so the finish is
    # the MEASURED tree combine (treeagg.tree_combine: materialize+count the
    # partial rows, two narrow repartition + whole-block local top-k levels
    # when they fit one task, distributed sort().limit(k) above the bound)
    # — same rows, ~2 s less fixed cost than the sort-based AllToAll at
    # bench scale. batch_size=None is pinned inside tree_combine: the
    # combine is only correct over ENTIRE blocks. Round only in the final
    # projection ("round only at the end", det_base_postprocess.py:110-128).
    def local_topk(b: pa.Table) -> pa.Table:
        # always sort (tiny tables): the final level's output keeps the
        # score-descending order the top-k contract promises
        idx = pc.sort_indices(
            b, sort_keys=[("score", "descending"), (id_col, "ascending")])
        return b.take(idx.slice(0, min(k, b.num_rows)))

    from webextract.functions.treeagg import tree_combine

    out = tree_combine(
        partial, local_topk,
        agg_fallback=lambda p: p.sort(
            ["score", id_col], descending=[True, False]).limit(k),
        what="topk_cosine")

    def rnd(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("score")
        return b.set_column(
            i, "score",
            pc.round(b.column("score"), ndigits=round_to).cast(pa.float64()),
        )

    return out.map_batches(rnd, batch_format="pyarrow")


# --- LSH-bucketed ANN (scale path) ------------------------------------------


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Seeded deterministic hyperplanes (Box-Muller over SplitMix64 streams)."""
    u = np.array(
        [[(mix(i * n_planes + j, 7) % (1 << 53)) / (1 << 53) for j in range(dim)]
         for i in range(n_planes)],
        dtype=np.float64,
    )
    v = np.array(
        [[(mix(i * n_planes + j, 8) % (1 << 53)) / (1 << 53) for j in range(dim)]
         for i in range(n_planes)],
        dtype=np.float64,
    )
    u = np.clip(u, 1e-12, 1.0)
    return np.sqrt(-2.0 * np.log(u)) * np.cos(2.0 * np.pi * v)


def lsh_bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-pattern bucket id per row: int64 in [0, 2^n_planes)."""
    signs = (vecs @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return signs.astype(np.int64) @ weights


class LshBucketer:
    """Batch UDF: add `bucket` column from seeded hyperplane LSH.

    Hyperplanes are derived deterministically from (dim, n_planes), built
    lazily once per worker process — identical everywhere without any
    broadcast traffic, and cheap enough that the stage runs as plain
    tasks (pass an instance).
    """

    def __init__(self, dim: int, n_planes: int = 8, vec_col: str = "embedding"):
        self.dim, self.n_planes = dim, n_planes
        self.vec_col = vec_col
        self._planes = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._planes is None:
            self._planes = _hyperplanes(self.dim, self.n_planes)
        m = _batch_matrix(batch, self.vec_col)
        buckets = lsh_bucket_of(m, self._planes) if len(m) else np.array([], dtype=np.int64)
        return batch.append_column("bucket", pa.array(buckets, type=pa.int64()))


def topk_cosine_lsh(ds, query: np.ndarray, k: int = 10, *, dim: Optional[int] = None,
                    n_planes: int = 8, nprobe: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    round_to: int = 6, concurrency=(1, 4)):
    """ANN: score only rows in the query's LSH bucket and its `nprobe - 1`
    MULTI-PROBE neighbors — the buckets reached by flipping the hyperplane
    bits with the smallest projection margins (the planes the query sits
    closest to, where true neighbors most likely fall on the other side).
    Single-probe (`nprobe=1`) has a recall cliff at bucket boundaries;
    multi-probe recovers most of it for a bounded extra scan. Approximate
    by construction either way.
    """
    q = np.asarray(query, dtype=np.float64)
    dim = dim or len(q)
    planes = _hyperplanes(dim, n_planes)
    qbucket = int(lsh_bucket_of(q.reshape(1, -1), planes)[0])
    margins = np.abs(planes @ q)  # distance of q to each cutting plane
    flips = np.argsort(margins)[: max(0, nprobe - 1)]
    probe = [qbucket] + [qbucket ^ (1 << int(i)) for i in flips]
    expr = f"bucket in [{', '.join(str(b) for b in sorted(set(probe)))}]"
    bucketed = ds.map_batches(
        LshBucketer(dim=dim, n_planes=n_planes, vec_col=vec_col),
        batch_format="pyarrow",
    ).filter(expr=expr)
    return topk_cosine(bucketed, q, k, id_col=id_col, vec_col=vec_col,
                       round_to=round_to, concurrency=concurrency)


# --- IVF (inverted-file) ANN -------------------------------------------------


def kmeans_centroids(sample: np.ndarray, k: int, iters: int = 5) -> np.ndarray:
    """Deterministic Lloyd k-means: init = first k distinct sample rows,
    fixed iteration count, ties to the lowest centroid index."""
    sample = np.asarray(sample, dtype=np.float64)
    cent = sample[:k].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


class IvfBucketer:
    """Batch UDF: add `centroid` = nearest-centroid index per row.

    Centroids are broadcast ONCE via ray.put (never re-shipped per batch);
    the ref resolves lazily per worker so the stage runs as plain tasks.
    """

    def __init__(self, centroids_ref, vec_col: str = "embedding"):
        self.centroids_ref = centroids_ref
        self.vec_col = vec_col
        self._centroids = None

    @property
    def centroids(self) -> np.ndarray:
        if self._centroids is None:
            import ray

            self._centroids = (
                self.centroids_ref
                if isinstance(self.centroids_ref, np.ndarray)
                else ray.get(self.centroids_ref)
            )
        return self._centroids

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.vec_col)
        if len(m):
            d = ((m[:, None, :] - self.centroids[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1).astype(np.int64)
        else:
            assign = np.array([], dtype=np.int64)
        return batch.append_column("centroid", pa.array(assign, type=pa.int64()))


def topk_cosine_ivf(ds, query: np.ndarray, k: int = 10, *, n_centroids: int = 16,
                    nprobe: int = 2, sample_size: int = 4096,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    round_to: int = 6, concurrency=(1, 4)):
    """IVF ANN: train centroids on a bounded head sample (driver-side, tiny),
    bucket every row by nearest centroid (one map pass), then brute-force
    only the `nprobe` buckets nearest the query.

    The scale path when LSH bucket balance is poor: centroids adapt to the
    data distribution. Approximate by construction.
    """
    import ray

    q = np.asarray(query, dtype=np.float64)
    # centroid training sample: stride WITHIN each block (every 7th row)
    # before the bounded limit, so the sample spans ~7x more of the stream
    # than a plain head take for the same cost; streaming still terminates
    # early (no full scan just to train centroids). Residual block-order
    # bias is the documented trade-off vs a full-pass random_sample.

    def stride(batch: pa.Table) -> pa.Table:
        return batch.take(pa.array(range(0, batch.num_rows, 7)))

    head = ds.map_batches(stride, batch_format="pyarrow").limit(
        sample_size
    ).take_all()
    sample = np.asarray([r[vec_col] for r in head], dtype=np.float64)
    cent = kmeans_centroids(sample, min(n_centroids, len(sample)))
    cent_ref = ray.put(cent)
    qd = ((cent - q[None, :]) ** 2).sum(axis=1)
    probe = np.argsort(qd)[:nprobe].tolist()
    bucketed = ds.map_batches(
        IvfBucketer(cent_ref, vec_col=vec_col),
        batch_format="pyarrow",
    ).filter(expr=f"centroid in [{', '.join(str(int(p)) for p in probe)}]")
    return topk_cosine(bucketed, q, k, id_col=id_col, vec_col=vec_col,
                       round_to=round_to, concurrency=concurrency)


# --- IVF-PQ: product-quantization ADC, the COMPRESSED scale path ------------
#
# Jégou, Douze, Schmid 2011, "Product Quantization for Nearest Neighbor
# Search" (IEEE TPAMI) — the IVFADC index family. At 100 TB the raw
# float32 embedding column is the storage/shuffle bottleneck (d=64 floats
# = 256 B/vector); PQ encodes each L2-normalized vector as `m` uint8
# codebook indices (m=8 -> 8 B/vector, 32x smaller), and search scores
# candidates with one per-query lookup table (ADC: score = sum over
# subspaces of LUT[sub, code]) — no float vector ever leaves the encode
# pass. Approximate by construction; the optional exact re-rank pass
# (IVFADC+R) restores recall by brute-forcing only the top candidates
# against the raw column via a broadcast id semi-filter.


def pq_train(sample: np.ndarray, *, m: int = 8, n_codes: int = 16,
             iters: int = 5):
    """Train per-subspace codebooks on a (driver-side, bounded) sample.

    Returns a list of `m` (n_codes, d_sub) float64 arrays. Vectors are
    L2-normalized BEFORE the subspace split so ADC inner products
    approximate cosine; `np.array_split` handles d % m != 0
    deterministically. Reuses the deterministic Lloyd trainer
    (`kmeans_centroids`: init = first k distinct rows, fixed iters)."""
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    return [kmeans_centroids(s, min(n_codes, len(s)), iters)
            for s in np.array_split(sample, m, axis=1)]


class PqEncoder:
    """Batch UDF: append `pq_code` (FixedSizeList<uint8>[m]) and DROP the
    raw vector column (the point of the compression) unless `keep_vec`.

    Codebooks are broadcast once via ray.put; the ref resolves lazily per
    worker so the stage runs as plain tasks (no actor pool)."""

    def __init__(self, codebooks_ref, vec_col: str = "embedding",
                 out_col: str = "pq_code", keep_vec: bool = False):
        self.codebooks_ref = codebooks_ref
        self.vec_col, self.out_col, self.keep_vec = vec_col, out_col, keep_vec
        self._cb = None

    @property
    def codebooks(self):
        if self._cb is None:
            import ray

            self._cb = (self.codebooks_ref
                        if isinstance(self.codebooks_ref, list)
                        else ray.get(self.codebooks_ref))
        return self._cb

    def __call__(self, batch: pa.Table) -> pa.Table:
        cb = self.codebooks
        m = len(cb)
        v = _normalize(_batch_matrix(batch, self.vec_col))
        if len(v):
            subs = np.array_split(v, m, axis=1)
            codes = np.stack(
                [((s[:, None, :] - cb[i][None, :, :]) ** 2).sum(axis=2)
                 .argmin(axis=1) for i, s in enumerate(subs)],
                axis=1).astype(np.uint8)
        else:
            codes = np.empty((0, m), dtype=np.uint8)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel(), type=pa.uint8()), m)
        out = batch.append_column(self.out_col, arr)
        if not self.keep_vec:
            out = out.drop_columns([self.vec_col])
        return out


class _PqAdcScorer:
    """Batch UDF: ADC partial top-k over the code column — one fancy-index
    gather + row sum per batch against the per-query LUT, no per-row
    Python. Emits (id, score) like `_TopKScorer` so the same measured
    tree-combine finish applies."""

    def __init__(self, lut_ref, k: int, id_col: str, code_col: str):
        self.lut_ref = lut_ref
        self.k, self.id_col, self.code_col = k, id_col, code_col
        self._lut = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._lut is None:
            import ray

            self._lut = (self.lut_ref
                         if isinstance(self.lut_ref, np.ndarray)
                         else ray.get(self.lut_ref))
        lut = self._lut  # (m, n_codes)
        m = lut.shape[0]
        col = batch.column(self.code_col).combine_chunks()
        codes = col.flatten().to_numpy(zero_copy_only=False).reshape(-1, m)
        scores = lut[np.arange(m)[None, :], codes.astype(np.int64)].sum(axis=1)
        k = min(self.k, len(scores))
        idx = (np.argpartition(-scores, k - 1)[:k]
               if k else np.array([], dtype=int))
        return pa.table({
            self.id_col: batch.column(self.id_col).take(pa.array(idx))
            .cast(pa.int64()),
            "score": pa.array(scores[idx], type=pa.float64()),
        })


def pq_encode(ds, codebooks, *, vec_col: str = "embedding",
              out_col: str = "pq_code", keep_vec: bool = False):
    """One streaming encode pass: raw vectors in, (…, pq_code) out. The
    encoded Dataset is what a 100 TB deployment would persist as the
    search index (write_parquet) — `m` bytes per vector."""
    import ray

    ref = ray.put(codebooks)
    return ds.map_batches(
        PqEncoder(ref, vec_col=vec_col, out_col=out_col, keep_vec=keep_vec),
        batch_format="pyarrow")


def topk_cosine_ivfpq(ds, query: np.ndarray, k: int = 10, *,
                      n_centroids: int = 16, nprobe: int = 2,
                      m: int = 8, n_codes: int = 16,
                      sample_size: int = 4096, sample_stride: int = 7,
                      rerank: int = 0,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      round_to: int = 6, concurrency=(1, 4)):
    """IVF + PQ ADC top-k (IVFADC): train IVF centroids AND PQ codebooks
    on one bounded strided sample, bucket + encode in a single streaming
    pass, ADC-score only the `nprobe` probed buckets, finish with the
    measured tree combine. With `rerank` > 0, the top `rerank` ADC
    candidates (small, broadcast as a sorted id array) are re-scored
    EXACTLY against the raw vector column and the final top-k comes from
    those exact scores (IVFADC+R) — at any scale the re-rank side is
    `rerank` rows, never the corpus."""
    import pyarrow.compute as pc
    import ray

    from webextract.functions.treeagg import tree_combine

    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)

    def stride(batch: pa.Table) -> pa.Table:
        return batch.take(pa.array(range(0, batch.num_rows, sample_stride)))

    head = ds.map_batches(stride, batch_format="pyarrow").limit(
        sample_size).take_all()
    sample = np.asarray([r[vec_col] for r in head], dtype=np.float64)
    cent = kmeans_centroids(sample, min(n_centroids, len(sample)))
    cbs = pq_train(sample, m=m, n_codes=n_codes)
    lut = np.stack([
        qs @ cb.T for qs, cb in zip(np.array_split(qn, m), cbs)
    ])  # (m, n_codes) inner-product tables

    cent_ref = ray.put(cent)
    cb_ref = ray.put(cbs)
    qd = ((cent - q[None, :]) ** 2).sum(axis=1)
    probe = np.argsort(qd)[:nprobe].tolist()
    encoded = (
        ds.map_batches(IvfBucketer(cent_ref, vec_col=vec_col),
                       batch_format="pyarrow")
        .filter(expr=f"centroid in [{', '.join(str(int(p)) for p in probe)}]")
        .map_batches(PqEncoder(cb_ref, vec_col=vec_col), batch_format="pyarrow")
    )
    n_out = max(k, rerank)
    partial = encoded.map_batches(
        _PqAdcScorer(ray.put(lut), n_out, id_col, "pq_code"),
        batch_format="pyarrow")

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("score", "descending"), (id_col, "ascending")])
        return b.take(idx.slice(0, min(n_out, b.num_rows)))

    cand = tree_combine(
        partial, local_topk,
        agg_fallback=lambda p: p.sort(
            ["score", id_col], descending=[True, False]).limit(n_out),
        what="topk_cosine_ivfpq")

    if rerank:
        ids = np.unique(np.asarray(
            [r[id_col] for r in cand.take_all()], dtype=np.int64))
        from webextract.functions.dedup import ArrayIndex, semi_filter_by_index

        exact_side = semi_filter_by_index(
            ds, ArrayIndex(ray.put(ids), int(ids.size)), id_col)
        return topk_cosine(exact_side, q, k, id_col=id_col, vec_col=vec_col,
                           round_to=round_to, concurrency=concurrency)

    def rnd(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("score")
        return b.set_column(
            i, "score",
            pc.round(b.column("score"), ndigits=round_to).cast(pa.float64()))

    # trim the n_out-wide candidate list back to k rows; both finish paths
    # emit score-descending dataset order, so limit(k) is the top k
    return cand.limit(k).map_batches(rnd, batch_format="pyarrow")


def embedding_neardup(ds, *, tau: float = 0.95, dim: int, n_planes: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      concurrency=(1, 4), max_bucket: int = 2000):
    """Embedding-cosine near-dup pairs within LSH buckets (id_a < id_b)."""

    def bucket_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        a_col, b_col, s_col = [], [], []
        if n > max_bucket:
            # No silent caps: a skipped bucket must be visible in the log
            # AND the run report's counters.
            import logging

            from webextract.state.counters import incr

            logging.getLogger("webextract.similarity").warning(
                "embedding_neardup: skipping LSH bucket %s of %d rows "
                "(> max_bucket=%d) — pairs in it are LOST. Raise n_planes "
                "or max_bucket for this data.",
                group.column("bucket")[0].as_py(), n, max_bucket,
            )
            incr("embedding_lsh_buckets_skipped")
            incr("embedding_lsh_rows_in_skipped_buckets", n)
        if 2 <= n <= max_bucket:
            ids = group.column(id_col).to_pylist()
            m = _normalize(_batch_matrix(group, vec_col))
            sims = m @ m.T
            xs, ys = np.where(np.triu(sims, 1) >= tau)
            for x, y in zip(xs, ys):
                lo, hi = sorted((ids[x], ids[y]))
                a_col.append(lo)
                b_col.append(hi)
                s_col.append(round(float(sims[x, y]), 6))
        return pa.table(
            {
                "id_a": pa.array(a_col, type=pa.int64()),
                "id_b": pa.array(b_col, type=pa.int64()),
                "cosine": pa.array(s_col, type=pa.float64()),
            }
        )

    out_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                            ("cosine", pa.float64())])

    def bucket_pairs_part(part: pa.Table) -> pa.Table:
        """Every LSH bucket of one hash partition, vectorized across
        buckets (round-5: per-bucket map_groups + a per-pair Python zip
        replaced by repeat/arange pair indices and one einsum)."""
        import logging

        from webextract.state.counters import incr

        idx = pc.sort_indices(part, sort_keys=[
            ("bucket", "ascending"), (id_col, "ascending")])
        t = part.take(idx)
        bk = t.column("bucket").to_numpy(zero_copy_only=False)
        n = t.num_rows
        starts = np.r_[0, np.nonzero(bk[1:] != bk[:-1])[0] + 1].astype(
            np.int64)
        m = (np.r_[starts[1:], n] - starts).astype(np.int64)
        for r in np.nonzero(m > max_bucket)[0]:
            # No silent caps: a skipped bucket must be visible in the
            # log AND the run report's counters.
            logging.getLogger("webextract.similarity").warning(
                "embedding_neardup: skipping LSH bucket %s of %d rows "
                "(> max_bucket=%d) — pairs in it are LOST. Raise "
                "n_planes or max_bucket for this data.",
                int(bk[starts[r]]), int(m[r]), max_bucket)
            incr("embedding_lsh_buckets_skipped")
            incr("embedding_lsh_rows_in_skipped_buckets", int(m[r]))
        sel = (m >= 2) & (m <= max_bucket)
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
        keep = idx_i < idx_j
        idx_i, idx_j = idx_i[keep], idx_j[keep]
        unit = _normalize(_batch_matrix(t, vec_col))
        sims = np.einsum("ij,ij->i", unit[idx_i], unit[idx_j])
        good = sims >= tau
        if not good.any():
            return out_schema.empty_table()
        ids = np.asarray(t.column(id_col).cast(pa.int64()).combine_chunks())
        ia, ib = ids[idx_i[good]], ids[idx_j[good]]
        return pa.table({
            "id_a": pa.array(np.minimum(ia, ib), type=pa.int64()),
            "id_b": pa.array(np.maximum(ia, ib), type=pa.int64()),
            "cosine": pa.array(np.round(sims[good], 6), type=pa.float64()),
        }, schema=out_schema)

    from webextract.functions.joins import partition_apply

    _ = bucket_pairs  # single-bucket reference path (pytest parity)
    bucketed = ds.map_batches(
        LshBucketer(dim=dim, n_planes=n_planes, vec_col=vec_col),
        batch_format="pyarrow",
    )
    pairs = partition_apply(
        bucketed, bucket_pairs_part, on="bucket",
        schema=pa.schema([(id_col, pa.int64()),
                          (vec_col, pa.list_(pa.float32())),
                          ("bucket", pa.int64())]),
        out_schema=out_schema)
    import ray.data

    # schema anchor: the groupby aggregate loses its columns entirely on
    # an all-empty input (near-orthogonal corpora legitimately yield 0
    # pairs) — union one 0-row typed block so the result keeps its shape
    return pairs.groupby(["id_a", "id_b"]).max("cosine").rename_columns(
        {"max(cosine)": "cosine"}
    ).union(ray.data.from_arrow(out_schema.empty_table()))


def knn_label_stats(ds, *, id_col: str = "vec_id",
                    vec_col: str = "embedding", label_col: str = "label"):
    """1-NN classifier evaluation over a labeled embedding table: for
    every vector, its nearest other vector by cosine; per label, how
    often the neighbor's label agrees.

    Scale shape: the REFERENCE side (normalized matrix + ids + labels,
    sorted by id) is broadcast once via ray.put and probed with one
    float64 matmul per batch — the brute-force ANN baseline; at corpus
    scale the reference side is IVF/LSH-bucketed first (see LshAnn) and
    the probe matmul runs per bucket. The output is integer counts
    only — ranking is decided by similarity GAPS (>=1e-6 here), far
    above cross-engine float noise, and ties break on the smaller
    neighbor id (argmax-first over the id-sorted reference), mirroring
    the oracle's ORDER BY sim DESC, vec_id.
    """
    import ray
    from ray.data.aggregate import Count, Sum

    ref_tbl = ds.select_columns([id_col, vec_col, label_col])
    # the reference side must be materialized once to broadcast; it is
    # the *small* side by contract (same role as topk_cosine's query).
    # Local sort_by(id) pins argmax-first == smallest-id tie-break
    # regardless of block arrival order.
    ref = ref_tbl.to_arrow_refs()
    parts = [pa.Table.from_batches(t.to_batches())
             for t in ray.get(ref)]
    full = pa.concat_tables(
        [p for p in parts if p.num_rows]).sort_by(id_col)
    ids = np.asarray(full.column(id_col).to_pylist(), dtype=np.int64)
    labels = np.asarray(full.column(label_col).to_pylist(), dtype=np.int64)
    mat = _normalize(_batch_matrix(full, vec_col))
    bref = ray.put((ids, labels, mat))

    class Probe:
        def __init__(self, bref):
            self.bref = bref
            self.ids = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.ids is None:  # lazy broadcast resolve -> task-based
                self.ids, self.labels, self.mat = ray.get(self.bref)
            m = _normalize(_batch_matrix(batch, vec_col))
            bids = np.asarray(batch.column(id_col).to_pylist(),
                              dtype=np.int64)
            blab = np.asarray(batch.column(label_col).to_pylist(),
                              dtype=np.int64)
            if not len(bids):
                return pa.table({"label": pa.array([], type=pa.int64()),
                                 "is_match": pa.array([], type=pa.int64())})
            s = m @ self.mat.T
            # mask self-matches by id (reference is the full table)
            s[bids[:, None] == self.ids[None, :]] = -2.0
            nn = np.argmax(s, axis=1)  # first max = smallest ref id
            match = (self.labels[nn] == blab).astype(np.int64)
            return pa.table({
                "label": pa.array(blab, type=pa.int64()),
                "is_match": pa.array(match, type=pa.int64()),
            })

    probed = ds.select_columns([id_col, vec_col, label_col]).map_batches(
        Probe(bref), batch_format="pyarrow",
    )
    return (
        probed.groupby("label")
        .aggregate(Count(), Sum("is_match", alias_name="n_correct"))
        .rename_columns({"count()": "n_vecs"})
    )
