"""Full-data distributed k-means + SemDeDup-style cluster near-dup
(webextract/functions/clustering.py).

Planted-blob recovery is the correctness pin: three well-separated
centers, every point within distance 0.1 of its center, k-means with
k=3 and fixed iterations must recover the exact membership regardless
of block layout.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from webextract.functions.clustering import (cluster_neardup, kmeans_assign,
                                             kmeans_fit)


def _blob_table(n_per=40, d=8, spread=0.05):
    """3 deterministic blobs around orthogonal-ish centers (no RNG:
    offsets from a SplitMix-style integer schedule)."""
    centers = np.zeros((3, d))
    centers[0, 0] = 10.0
    centers[1, 1] = -10.0
    centers[2, 2] = 10.0
    ids, vecs, labels = [], [], []
    x = 0x9E3779B97F4A7C15
    for c in range(3):
        for i in range(n_per):
            off = np.empty(d)
            for j in range(d):
                x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
                off[j] = ((x >> 11) / float(1 << 53) - 0.5) * 2 * spread
            ids.append(c * n_per + i)
            vecs.append(centers[c] + off)
            labels.append(c)
    return pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    }), np.array(labels)


def test_kmeans_recovers_planted_blobs(ray_session):
    t, labels = _blob_table()
    ds = ray.data.from_arrow(t).repartition(5)
    cents = kmeans_fit(ds, k=3, n_iter=4)
    assert cents.shape == (3, 8)
    asn = kmeans_assign(ds, cents).to_pandas().sort_values(
        "vec_id", ignore_index=True)
    got = asn.cluster.to_numpy()
    # cluster ids are arbitrary; membership partition must match exactly
    mapping = {}
    for g, l in zip(got, labels):
        mapping.setdefault(l, g)
        assert mapping[l] == g, "a planted blob was split across clusters"
    assert len(set(mapping.values())) == 3
    # centroids sit on the blob centers (within the planted spread)
    for l, g in mapping.items():
        center = {0: (0, 10.0), 1: (1, -10.0), 2: (2, 10.0)}[l]
        assert abs(cents[g][center[0]] - center[1]) < 0.1


def test_kmeans_layout_invariant(ray_session):
    """Same data, different block layouts -> identical centroids (the
    distributed Sum fold is order-insensitive for these magnitudes)."""
    t, _ = _blob_table(n_per=20)
    c1 = kmeans_fit(ray.data.from_arrow(t).repartition(2), k=3, n_iter=3)
    c2 = kmeans_fit(ray.data.from_arrow(t).repartition(7), k=3, n_iter=3)
    assert np.allclose(np.sort(c1, axis=0), np.sort(c2, axis=0), atol=1e-9)


def test_kmeans_transport_parity(ray_session):
    """The measured in-process path (default for dimension-sized tables)
    and the forced distributed per-pass path (local_max=0) must produce
    the same centroids — identical seeds by construction, fp-identical
    updates at these magnitudes."""
    t, _ = _blob_table(n_per=25)
    ds = ray.data.from_arrow(t).repartition(4)
    local = kmeans_fit(ds, k=3, n_iter=3)            # in-process path
    dist = kmeans_fit(ds, k=3, n_iter=3, local_max=0)  # distributed path
    assert np.allclose(local, dist, atol=1e-9)


def test_kmeans_k_exceeds_rows_raises(ray_session):
    t = pa.table({
        "vec_id": pa.array([1, 2], type=pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                              type=pa.list_(pa.float32())),
    })
    with pytest.raises(ValueError, match="only 2 rows"):
        kmeans_fit(ray.data.from_arrow(t), k=5, n_iter=1)


def test_cluster_neardup_finds_planted_pairs(ray_session):
    t, _ = _blob_table(n_per=10, spread=0.01)
    # plant two exact duplicates of vec_id 0 inside blob 0
    emb = t.column("embedding").to_pylist()
    ids = t.column("vec_id").to_pylist()
    dup = emb[0]
    t2 = pa.table({
        "vec_id": pa.array(ids + [1000, 1001], type=pa.int64()),
        "embedding": pa.array(emb + [dup, dup], type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t2).repartition(4)
    cents = kmeans_fit(ds, k=3, n_iter=3)
    pairs = cluster_neardup(ds, cents, threshold=0.999999).to_pandas()
    got = sorted(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (0, 1000) in got and (0, 1001) in got and (1000, 1001) in got
    # blob members at spread 0.01 around a distance-10 center are all
    # near-parallel -> pairs only WITHIN clusters, never across
    asn = kmeans_assign(ds, cents).to_pandas().set_index("vec_id").cluster
    for a, b in got:
        assert asn[a] == asn[b]


def test_cluster_neardup_max_cluster_raises(ray_session):
    t, _ = _blob_table(n_per=30)
    ds = ray.data.from_arrow(t)
    cents = kmeans_fit(ds, k=3, n_iter=2)
    with pytest.raises(Exception, match="max_cluster"):
        cluster_neardup(ds, cents, threshold=0.5,
                        max_cluster=10).to_pandas()


def test_ragged_embedding_raises(ray_session):
    t = pa.table({
        "vec_id": pa.array([1, 2], type=pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0, 2.0]],
                              type=pa.list_(pa.float32())),
    })
    with pytest.raises(Exception, match="ragged"):
        kmeans_fit(ray.data.from_arrow(t), k=2, n_iter=1)
