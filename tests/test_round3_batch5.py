"""Round-3 batch-5 operators: url canonicalization/dedup, unigram-LM
scoring, per-key lag windows, count-min sketch."""

import numpy as np
import pyarrow as pa
import ray.data

from webextract.functions.lm import corpus_token_count, unigram_lm_scores
from webextract.functions.sketches import CmsSketch, cms_word_counts
from webextract.functions.temporal import key_lag
from webextract.functions.urls import (
    canonicalize_url,
    dedup_by_url,
)


def _ds(table: pa.Table, blocks: int = 2):
    return ray.data.from_arrow(table).repartition(blocks)


# --- url canonicalization ---------------------------------------------------


def test_canonicalize_rules():
    c = canonicalize_url
    # fragment strip + scheme/host case folding
    assert c("HTTPS://Host1.Example/a#frag") == "https://host1.example/a"
    # default ports drop only for the matching scheme
    assert c("https://h.example:443/a") == "https://h.example/a"
    assert c("http://h.example:80/a") == "http://h.example/a"
    assert c("http://h.example:443/a") == "http://h.example:443/a"
    assert c("https://h.example:8443/a") == "https://h.example:8443/a"
    # empty path -> /
    assert c("https://h.example") == "https://h.example/"
    # utm_* and empty params drop, order of the rest preserved
    assert (c("https://h.example/a?utm_source=x&b=2&a=1&utm_medium=y")
            == "https://h.example/a?b=2&a=1")
    # query that empties out loses its '?'
    assert c("https://h.example/a?utm_source=x") == "https://h.example/a"
    assert c("https://h.example/a?") == "https://h.example/a"
    # non-absolute input: fragment-stripped only
    assert c("mailto:x@y.example#z") == "mailto:x@y.example"
    # host-only url WITH a query: hostport ends at the earliest of '/'
    # and '?' (round-3 ADVICE fix — the query must not fold into the host)
    assert c("https://Host?utm_source=x") == "https://host/"
    assert c("https://Host.Example?a=1&utm_b=2#f") == "https://host.example/?a=1"
    assert c("https://Host:443?a=1") == "https://host/?a=1"


def test_dedup_by_url_keeps_newest():
    t = pa.table({
        "url": [
            "https://A.example/p",          # canon https://a.example/p
            "HTTPS://a.example:443/p#x",    # same canonical
            "https://a.example/p?utm_source=f",  # same canonical
            "https://b.example/q",
        ],
        "doc_id": [1, 7, 3, 2],
    })
    out = dedup_by_url(_ds(t), order_col="doc_id", keep="max").to_pandas()
    got = dict(zip(out["canon_url"], out["doc_id"]))
    assert got == {"https://a.example/p": 7, "https://b.example/q": 2}


# --- unigram LM scoring -----------------------------------------------------


def test_unigram_lm_scores_hand_computed():
    # corpus: "a a b" + "a c" -> N=5; cnt: a=3, b=1, c=1
    # bits(w) = bit_length(N // cnt): a -> (5//3=1) -> 1; b,c -> 5 -> 3
    t = pa.table({"doc_id": [0, 1], "text": ["a a b", "a c"]})
    ds = _ds(t)
    n = corpus_token_count(ds)
    assert n == 5
    out = unigram_lm_scores(ds, total_tokens=n).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert out.loc[0, "n_tokens"] == 3
    assert out.loc[0, "lm_bits"] == 2 * 1 + 3  # a,a + b
    assert out.loc[0, "avg_bits"] == 5 / 3
    assert out.loc[1, "lm_bits"] == 1 + 3  # a + c
    assert out.loc[1, "avg_bits"] == 2.0
    # rarer vocabulary scores strictly higher
    assert out.loc[1, "avg_bits"] > out.loc[0, "avg_bits"]


# --- per-key lag ------------------------------------------------------------


def test_key_lag_orders_and_drops_first():
    t = pa.table({
        "k": [1, 1, 1, 2, 3],
        "ts": [10, 5, 10, 7, 4],
        "pid": [100, 101, 99, 102, 103],
    })
    out = key_lag(_ds(t), by="k", ts="ts", payload="pid").to_pandas()
    rows = {(int(r.k), int(r.pid)): (int(r.prev_pid), int(r.gap))
            for r in out.itertuples()}
    # k=1 order by (ts,pid): (5,101) -> (10,99) -> (10,100)
    assert rows == {(1, 99): (101, 5), (1, 100): (99, 0)}
    # singleton keys emit nothing
    assert 2 not in set(out["k"]) and 3 not in set(out["k"])


# --- count-min sketch -------------------------------------------------------


def test_cms_never_undercounts_and_bounds_error():
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in rng.integers(0, 500, size=20_000)]
    words += ["heavy"] * 3_000
    sk = CmsSketch(d=4, w=2048).add(words)
    from collections import Counter

    true = Counter(words)
    n = len(words)
    eps = np.e / 2048
    for w in ["heavy", "w0", "w17", "w499"]:
        est = sk.estimate(w)
        assert est >= true[w]
        assert est - true[w] <= 3 * eps * n  # 3x slack on the w.h.p. bound
    assert sk.estimate("absent") <= 3 * eps * n


def test_cms_merge_equals_single_pass():
    a = CmsSketch().add(["x", "y", "x"])
    b = CmsSketch().add(["x", "z"])
    one = CmsSketch().add(["x", "y", "x", "x", "z"])
    merged = a.merge(b)
    assert np.array_equal(merged.table, one.table)
    assert merged.estimate("x") == one.estimate("x") >= 3


def test_cms_word_counts_distributed_matches_local():
    texts = ["alpha beta alpha", "beta gamma", "alpha delta"] * 40
    t = pa.table({"text": texts})
    out = cms_word_counts(_ds(t, blocks=6), ["alpha", "beta", "absent"])
    got = dict(zip(out.column("word").to_pylist(),
                   out.column("est").to_pylist()))
    # exact on this tiny vocabulary (no collisions at w=2048)
    assert got["alpha"] == 120
    assert got["beta"] == 80
    assert got["absent"] == 0
    # sorted-by-word output contract
    assert out.column("word").to_pylist() == sorted(["absent", "alpha",
                                                     "beta"])
