"""Property-based pins for the round-3 session operators: FastSS
completeness/soundness vs brute force, run-length vs naive scan, line
filter byte-identity, and deletion-variant counting — all pure-Python
kernels, no Ray."""

from itertools import combinations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from webextract.functions.fuzzy import _del_variants, levenshtein
from webextract.functions.ngrams import (
    doc_distinct_ngrams_batch,
    line_filter_batch,
)

word = st.text(alphabet="abcdez", min_size=1, max_size=6)


@settings(max_examples=150, deadline=None)
@given(st.lists(word, min_size=2, max_size=8, unique=True))
def test_fastss_candidates_cover_all_close_pairs(words):
    # FastSS guarantee: lev(a,b) <= 2 => depth-2 deletion neighborhoods
    # intersect. Soundness comes from the DP verify; completeness is
    # what the bucketing must never lose.
    for a, b in combinations(words, 2):
        if levenshtein(a, b) <= 2:
            assert _del_variants(a, 2) & _del_variants(b, 2), (a, b)


@settings(max_examples=200, deadline=None)
@given(word, word)
def test_levenshtein_metric_properties(a, b):
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)
    assert (d == 0) == (a == b)
    assert d <= max(len(a), len(b))
    assert d >= abs(len(a) - len(b))


@settings(max_examples=150, deadline=None)
@given(st.lists(st.sampled_from("ab"), min_size=1, max_size=30))
def test_longest_run_matches_naive(chars):
    # mirror of __ray_entry__.q_docs_longest_run's numpy kernel
    import numpy as np

    words = list(chars)
    arr = np.asarray(words, dtype=object)
    if len(arr) <= 1:
        got = len(arr)
    else:
        brk = np.nonzero(arr[1:] != arr[:-1])[0]
        edges = np.concatenate(([-1], brk, [len(arr) - 1]))
        got = int(np.diff(edges).max())
    best = cur = 1
    for x, y in zip(words, words[1:]):
        cur = cur + 1 if x == y else 1
        best = max(best, cur)
    assert got == best


@settings(max_examples=150, deadline=None)
@given(st.lists(  # docs -> lines -> words
    st.lists(st.lists(word, min_size=1, max_size=8),
             min_size=1, max_size=4),
    min_size=1, max_size=3))
def test_line_filter_survivors_are_verbatim_lines(docs):
    texts = ["\n".join(" ".join(ws) for ws in doc) for doc in docs]
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    out = line_filter_batch(t, min_words=3, must_contain="a")
    for src, kept, n_lines, n_kept in zip(
        texts, out.column("text").to_pylist(),
        out.column("n_lines").to_pylist(),
        out.column("n_kept").to_pylist(),
    ):
        lines = [ln for ln in src.split("\n") if ln]
        assert n_lines == len(lines)
        kept_lines = [ln for ln in kept.split("\n") if ln]
        assert n_kept == len(kept_lines)
        for ln in kept_lines:
            assert ln in lines  # byte-identical survivors
            assert len(ln.split(" ")) >= 3 and "a" in ln.split(" ")


@settings(max_examples=150, deadline=None)
@given(st.lists(word, min_size=1, max_size=6))
def test_distinct_ngrams_subset_of_sliding_windows(words):
    text = " ".join(words)
    t = pa.table({"text": pa.array([text], type=pa.string())})
    out = doc_distinct_ngrams_batch(t, n=2)
    got = set(out.column("ngram").to_pylist())
    expect = {" ".join(words[i:i + 2]) for i in range(len(words) - 1)}
    assert got == expect
