"""Similarity-search operator tests."""

import numpy as np
import pyarrow as pa
import ray.data

from webextract.functions.similarity import (
    LshBucketer,
    _hyperplanes,
    embedding_neardup,
    lsh_bucket_of,
    topk_cosine,
    topk_cosine_lsh,
)


def _embeddings(n=50, d=8, seed_stream=0):
    from webextract.corpus import mix

    vecs = np.array(
        [[(mix(i * d + j, seed_stream) % 1000) / 1000.0 - 0.5 for j in range(d)]
         for i in range(n)]
    )
    return pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  type=pa.list_(pa.float32())),
        }
    ), vecs


def test_topk_cosine_matches_numpy():
    t, vecs = _embeddings()
    q = vecs[0]
    out = topk_cosine(ray.data.from_arrow(t), q, k=5, concurrency=1).take_all()
    # numpy reference (float32 storage round-trip like the table)
    m = vecs.astype(np.float32).astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    scores = mn @ qn
    expect = list(np.argsort([(-s, i) for i, s in enumerate(scores)], axis=0)[:, 0][:5])
    got_ids = [r["vec_id"] for r in out]
    assert got_ids[0] == 0  # query vector itself is its own nearest
    assert set(got_ids) == set(int(i) for i in np.argsort(-scores)[:5])
    assert out[0]["score"] >= out[-1]["score"]


def test_hyperplanes_deterministic():
    assert np.array_equal(_hyperplanes(8, 4), _hyperplanes(8, 4))


def test_lsh_bucket_consistency():
    planes = _hyperplanes(8, 4)
    v = np.ones((1, 8))
    b1 = lsh_bucket_of(v, planes)
    assert 0 <= b1[0] < 16
    assert lsh_bucket_of(v, planes)[0] == b1[0]


def test_topk_lsh_contains_query_vector():
    t, vecs = _embeddings()
    out = topk_cosine_lsh(
        ray.data.from_arrow(t), vecs[0], k=3, n_planes=3, concurrency=1
    ).take_all()
    assert [r["vec_id"] for r in out][0] == 0


def test_embedding_neardup_finds_planted_pair():
    t, vecs = _embeddings(n=20)
    # plant an exact duplicate of vec 0 as vec 99
    dup = pa.table(
        {
            "vec_id": pa.array([99], type=pa.int64()),
            "embedding": pa.array([vecs[0].astype(np.float32).tolist()],
                                  type=pa.list_(pa.float32())),
        }
    )
    full = pa.concat_tables([t, dup])
    pairs = embedding_neardup(
        ray.data.from_arrow(full), tau=0.999, dim=8, n_planes=4, concurrency=1
    ).take_all()
    assert {(p["id_a"], p["id_b"]) for p in pairs} >= {(0, 99)}


def test_kmeans_deterministic():
    from webextract.functions.similarity import kmeans_centroids

    _, vecs = _embeddings(n=40)
    c1 = kmeans_centroids(vecs, 4)
    c2 = kmeans_centroids(vecs, 4)
    assert np.array_equal(c1, c2)
    assert c1.shape == (4, 8)


def test_topk_ivf_contains_query_vector(ray_session):
    from webextract.functions.similarity import topk_cosine_ivf

    t, vecs = _embeddings(n=60)
    out = topk_cosine_ivf(
        ray.data.from_arrow(t), vecs[0], k=3, n_centroids=4, nprobe=2,
        concurrency=1,
    ).take_all()
    assert out[0]["vec_id"] == 0


def test_lsh_multiprobe_improves_recall(ray_session):
    """Multi-probe must recover neighbors that single-probe misses, and its
    result set must contain the single-probe result."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from webextract.functions.similarity import topk_cosine, topk_cosine_lsh

    rng_vecs = []
    for i in range(400):
        from webextract.corpus import mix

        v = np.array([(mix(i, 40 + j) % 10_000) / 5_000.0 - 1.0
                      for j in range(8)])
        rng_vecs.append(v / np.linalg.norm(v))
    t = pa.table(
        {
            "vec_id": pa.array(range(400), type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in rng_vecs],
                                  type=pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(t)
    q = rng_vecs[7]
    exact = {r["vec_id"] for r in topk_cosine(ds, q, k=10).take_all()}
    single = {r["vec_id"]
              for r in topk_cosine_lsh(ds, q, k=10, n_planes=6,
                                       nprobe=1).take_all()}
    multi = {r["vec_id"]
             for r in topk_cosine_lsh(ds, q, k=10, n_planes=6,
                                      nprobe=4).take_all()}
    assert len(multi & exact) >= len(single & exact)
    assert len(multi) >= len(single)


# ------------------------------------------------------- knn_label_stats


def test_knn_label_stats_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from webextract.functions.similarity import knn_label_stats

    # two tight clusters + one off-axis point (no symmetric ties)
    vecs = [
        [1.0, 0.0], [0.99, 0.01],          # label 0 cluster (mutual NNs)
        [0.0, 1.0], [0.01, 0.99],          # label 1 cluster (mutual NNs)
        [0.8, 0.6],                        # label 0, nearest in cluster 0
    ]
    labels = [0, 0, 1, 1, 0]
    t = pa.table({
        "vec_id": pa.array(range(5), type=pa.int64()),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    })
    got = (
        knn_label_stats(ray.data.from_arrow(t).repartition(2))
        .to_pandas().set_index("label").sort_index()
    )
    # brute-force expectation FROM THE float32-ROUNDED values the engine
    # actually reads (the storage type is list<float>)
    m = np.array(vecs, dtype=np.float32).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    s = m @ m.T
    np.fill_diagonal(s, -2)
    nn = np.argmax(s, axis=1)
    lab = np.array(labels)
    for l in (0, 1):
        mask = lab == l
        assert got.loc[l, "n_vecs"] == mask.sum()
        assert got.loc[l, "n_correct"] == (lab[nn[mask]] == l).sum()


# ---------------------------------------------------------------- IVF-PQ


def test_pq_train_shapes_and_determinism():
    from webextract.functions.similarity import pq_train

    _, vecs = _embeddings(n=60, d=8)
    cb1 = pq_train(vecs, m=4, n_codes=8)
    cb2 = pq_train(vecs, m=4, n_codes=8)
    assert len(cb1) == 4
    for a, b in zip(cb1, cb2):
        assert a.shape == (8, 2)
        assert np.array_equal(a, b)


def test_pq_encode_drops_vector_and_compresses(ray_session):
    import ray

    from webextract.functions.similarity import pq_encode, pq_train

    t, vecs = _embeddings(n=40, d=8)
    cbs = pq_train(vecs, m=4, n_codes=8)
    enc = pq_encode(ray.data.from_arrow(t), cbs).take_all()
    assert len(enc) == 40
    row = enc[0]
    assert "embedding" not in row
    code = row["pq_code"]
    assert len(code) == 4
    assert all(0 <= c < 8 for c in code)


def test_pq_adc_exact_when_vectors_on_codebook(ray_session):
    """Vectors drawn exactly from a small set of per-subspace patterns
    reconstruct exactly (enough codes to cover every pattern), so
    ADC-only top-k == brute-force top-k. The 16 rows enumerate all
    (pattern_a, pattern_b) combos once, subspace 2 weighted 2x, giving
    distinct score tiers 1.0 / 0.8 / 0.2 / 0.0 — top-4 = one exact
    match + the three b-matches, a strict gap at the k boundary (no
    tie-break ambiguity between the two partial-topk selections)."""
    from webextract.functions.similarity import topk_cosine, topk_cosine_ivfpq

    pats = np.eye(4)
    rows = [np.concatenate([pats[i % 4], 2.0 * pats[i // 4]])
            for i in range(16)]
    vecs = np.asarray(rows)
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    q = vecs[5]  # (pattern 1, pattern 1)
    ds = ray.data.from_arrow(t).repartition(3)
    exact = [r["vec_id"] for r in topk_cosine(ds, q, k=4).take_all()]
    approx = [r["vec_id"] for r in topk_cosine_ivfpq(
        ds, q, k=4, n_centroids=1, nprobe=1, m=2, n_codes=8,
        sample_size=64, sample_stride=1).take_all()]
    assert approx == exact
    assert set(exact) == {5, 4, 6, 7}  # 1.0 then the three 0.8-tier rows
    assert exact[0] == 5


def test_pq_rerank_recall(ray_session):
    """IVFADC+R with a wide re-rank recovers the exact top-k on the
    deterministic pseudo-random embeddings."""
    from webextract.functions.similarity import topk_cosine, topk_cosine_ivfpq

    t, vecs = _embeddings(n=120, d=8)
    q = vecs[7]
    ds = ray.data.from_arrow(t).repartition(4)
    exact = {r["vec_id"] for r in topk_cosine(ds, q, k=10).take_all()}
    got = topk_cosine_ivfpq(ds, q, k=10, n_centroids=1, nprobe=1, m=2,
                            n_codes=16, sample_size=128, sample_stride=1,
                            rerank=60).take_all()
    ids = {r["vec_id"] for r in got}
    assert len(got) == 10
    recall = len(ids & exact) / 10
    assert recall >= 0.9, (recall, sorted(ids), sorted(exact))
