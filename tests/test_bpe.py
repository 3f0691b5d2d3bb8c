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


def test_merge_rep_no_cross_boundary_merge():
    """Round-3 ADVICE regression: with an existing symbol 'ya', the rep
    'ya b' textually contains 'a b' — a bare str.replace would produce
    'yab'. The symbol scan must leave it alone."""
    from webextract.functions.bpe import merge_rep

    assert merge_rep("ya b", "a", "b", "ab") == "ya b"
    assert merge_rep("a b ya b a b", "a", "b", "ab") == "ab ya b ab"
    # left-to-right non-overlap: 'a a a' merges the FIRST pair only
    assert merge_rep("a a a", "a", "a", "aa") == "aa a"
    assert merge_rep("a a a a", "a", "a", "aa") == "aa aa"


def _islands_parity_merge(rep, left, right, merged):
    """Python model of the SQL oracle's merge rule (__ray_entry__
    `_bpe_ctes`): find match-start positions, keep even offsets within
    each island of CONSECUTIVE positions (gaps-and-islands), emit merged
    at kept positions and drop the consumed right-symbol positions."""
    syms = rep.split(" ")
    matches = [i for i in range(len(syms) - 1)
               if syms[i] == left and syms[i + 1] == right]
    kept = set()
    island_start = None
    prev = None
    for i in matches:
        if prev is None or i != prev + 1:
            island_start = i
        if (i - island_start) % 2 == 0:
            kept.add(i)
        prev = i
    out = []
    for i, s in enumerate(syms):
        if i in kept:
            out.append(merged)
        elif (i - 1) not in kept:
            out.append(s)
    return " ".join(out)


def test_oracle_islands_parity_equals_symbol_scan():
    """Property: the SQL oracle's islands-parity rule (keep even offsets
    within runs of consecutive match positions) is exactly the greedy
    left-to-right symbol scan. Exhaustive over small symbol alphabets
    covers adjacent/overlapping-occurrence geometry — including ≥5-runs
    of a self-overlapping pair, where a padded textual replace() picks a
    DIFFERENT maximal matching ('a a a a a' -> 'aa a aa', not the
    Sennrich 'aa aa a')."""
    from itertools import product

    from webextract.functions.bpe import merge_rep

    for n in range(1, 7):
        for syms in product(["a", "b", "ab", "ya"], repeat=n):
            rep = " ".join(syms)
            for left, right in [("a", "b"), ("a", "a"), ("a", "ab"),
                                ("ab", "a"), ("b", "ya")]:
                merged = left + right
                assert (_islands_parity_merge(rep, left, right, merged)
                        == merge_rep(rep, left, right, merged)), \
                    (rep, left, right)


def test_bpe_train_transport_parity(ray_session):
    """The measured in-process merge loop (default for dimension-sized
    vocabularies) and the forced distributed per-step loop (local_max=0)
    must learn identical merges — same kernels, same argmax total
    order."""
    import ray.data

    from webextract.functions.bpe import bpe_train

    t = pa.table({"text": [
        "low lower lowest", "low low newer", "newer newest wider",
        None, "wide wide wider low",
    ]})
    ds = ray.data.from_arrow(t).repartition(3)
    local = bpe_train(ds, n_merges=4).to_pydict()
    dist = bpe_train(ds, n_merges=4, local_max=0).to_pydict()
    assert local == dist
    assert len(local["step"]) == 4
