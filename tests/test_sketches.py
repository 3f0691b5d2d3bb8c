"""HLL distinct sketch + exact 2-pass heavy hitters."""

import numpy as np
import pyarrow as pa

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
