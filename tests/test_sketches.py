"""HLL distinct sketch + exact 2-pass heavy hitters."""

import numpy as np
import pyarrow as pa
import ray.data

from webextract.functions.sketches import HllSketch, misra_gries, top_k_words


def test_hll_accuracy_and_determinism():
    vals = [f"url-{i}" for i in range(50_000)]
    est1 = HllSketch().add(vals).estimate()
    est2 = HllSketch().add(vals).estimate()
    assert est1 == est2  # deterministic
    assert abs(est1 - 50_000) / 50_000 < 0.05


def test_hll_merge_equals_union():
    a = HllSketch().add([f"a{i}" for i in range(10_000)])
    b = HllSketch().add([f"a{i}" for i in range(5_000, 15_000)])
    merged = a.merge(b).estimate()
    direct = HllSketch().add([f"a{i}" for i in range(15_000)]).estimate()
    assert merged == direct  # register-max merge == union sketch


def test_hll_small_cardinality_linear_counting():
    est = HllSketch().add([f"x{i}" for i in range(100)] * 50).estimate()
    assert abs(est - 100) / 100 < 0.1


def test_misra_gries_guarantee():
    # frequency > n/(capacity+1) must survive
    stream = ["hot"] * 50 + [f"cold{i}" for i in range(100)]
    summary = misra_gries(stream, capacity=10)
    assert "hot" in summary


def test_top_k_words_exact(ray_session):
    import collections

    import ray.data

    texts = [
        "alpha beta alpha gamma", "beta alpha delta", "alpha beta beta",
        "epsilon zeta eta theta", "gamma gamma delta",
    ] * 4
    exact = collections.Counter(w for t in texts for w in t.split(" "))
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    ds = ray.data.from_arrow(pa.table({"text": texts}))
    got = [(r["word"], r["n"]) for r in top_k_words(ds, k=3).take_all()]
    assert got == want


def test_approx_distinct_dataset(ray_session):
    import ray.data

    from webextract.functions.sketches import approx_distinct

    ds = ray.data.from_arrow(
        pa.table({"k": [f"v{i % 2000}" for i in range(20_000)]})
    ).repartition(8)
    est = approx_distinct(ds, "k")
    assert abs(est - 2000) / 2000 < 0.1


def test_top_k_exact_below_mg_floor(ray_session):
    """Round-3 guarantee: a true top-k word BELOW the per-batch MG survival
    floor in every batch still surfaces (residual-sum prefilter, no
    frequency floor). capacity=10 + 3000 distinct fillers would evict
    'target' from every per-batch summary under the round-2 scheme."""
    fillers = [f"w{i}" for i in range(3000)]
    texts = ["target " + " ".join(fillers[i:i + 30]) for i in range(0, 3000, 30)]
    # 'target' appears 100x; each filler appears ~1x
    ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(4)
    got = [(r["word"], r["n"]) for r in
           top_k_words(ds, k=1, capacity=10).take_all()]
    assert got == [("target", 100)]


def test_top_k_driver_state_bounded_many_blocks(ray_session):
    # 64 tiny blocks: the candidate set reaching the driver stays O(k-ish),
    # not O(capacity * n_blocks) — and max_candidates raises if violated
    texts = [f"common common common unique{i}" for i in range(64)]
    ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(64)
    got = [(r["word"], r["n"]) for r in
           top_k_words(ds, k=1, capacity=4096).take_all()]
    assert got == [("common", 192)]
    # tied counts keep 5 words above the certified threshold -> the
    # max_candidates guard raises instead of silently truncating
    tied = ray.data.from_arrow(
        pa.table({"text": ["a b c d e"] * 64})
    ).repartition(8)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_candidates"):
        top_k_words(tied, k=1, capacity=4096, max_candidates=2).take_all()


def test_approx_distinct_folds_partials(ray_session):
    from webextract.functions.sketches import approx_distinct

    vals = [f"v{i % 500}" for i in range(2000)]
    ds = ray.data.from_arrow(pa.table({"k": vals})).repartition(32)
    est = approx_distinct(ds, "k")
    assert abs(est - 500) / 500 < 0.05
