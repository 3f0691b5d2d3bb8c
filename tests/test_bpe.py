"""Pins for distributed BPE training (functions/bpe.py): exact
equivalence with a canonical symbol-list reference implementation (so
the textual-replace merge provably has no cross-boundary collisions on
this corpus), plus a hand-checked micro case."""

from collections import Counter

import pyarrow as pa
import ray.data

from webextract.functions.bpe import bpe_train


def _canonical_bpe(word_freqs, n_merges):
    """Reference BPE on symbol LISTS (Sennrich et al.), greedy
    left-to-right non-overlapping merge inside each word."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    out = []
    for step in range(1, n_merges + 1):
        counts = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, a, b, n))
        new_vocab = {}
        for syms, f in vocab.items():
            merged = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_vocab[tuple(merged)] = new_vocab.get(tuple(merged), 0) + f
        vocab = new_vocab
    return out


def test_bpe_micro_case(ray_session):
    # freq: "aab" x3, "ab" x2 -> step1 pair ('a','b') n=5;
    # step2 ('a','ab') n=3
    texts = ["aab aab ab", "aab ab"]
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts)})).repartition(2)
    got = bpe_train(ds, n_merges=2).to_pylist()
    assert got == [
        {"step": 1, "l_sym": "a", "r_sym": "b", "n": 5},
        {"step": 2, "l_sym": "a", "r_sym": "ab", "n": 3},
    ]


def test_bpe_matches_canonical_on_corpus(ray_session):
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["text"])
    freqs = Counter()
    for txt in t.column("text").to_pylist():
        freqs.update(txt.split(" "))
    expect = _canonical_bpe(dict(freqs), 5)
    got = bpe_train(ray.data.from_arrow(t).repartition(3),
                    n_merges=5).to_pylist()
    assert [(r["step"], r["l_sym"], r["r_sym"], r["n"]) for r in got] \
        == expect
