"""Pins for the FastSS fuzzy vocabulary join (functions/fuzzy.py)."""

from itertools import combinations

import pyarrow as pa
import ray.data

from webextract.functions.fuzzy import (
    _del_variants,
    fuzzy_vocab_pairs,
    levenshtein,
)


def test_levenshtein_basics():
    assert levenshtein("cat", "cat") == 0
    assert levenshtein("cat", "cot") == 1
    assert levenshtein("cat", "cats") == 1
    assert levenshtein("cat", "dog") == 3
    assert levenshtein("", "ab") == 2
    assert levenshtein("kitten", "sitting") == 3


def test_del_variants_depth():
    vs = _del_variants("abc", 1)
    assert vs == {"abc", "bc", "ac", "ab"}
    vs2 = _del_variants("abc", 2)
    assert {"a", "b", "c"} <= vs2 and "abc" in vs2


def test_fastss_complete_vs_bruteforce(ray_session):
    words = ["spark", "spork", "sprk", "stark", "park", "dark", "dog",
             "dig", "digs", "query", "quern", "berry"]
    # one doc per word keeps the vocabulary exactly this set
    t = pa.table({"text": pa.array(words)})
    got = fuzzy_vocab_pairs(
        ray.data.from_arrow(t).repartition(3), max_dist=2
    ).to_pandas()
    got_pairs = {(r.w1, r.w2, r.d) for r in got.itertuples()}
    expect = {
        (a, b, levenshtein(a, b))
        for a, b in combinations(sorted(words), 2)
        if levenshtein(a, b) <= 2
    }
    assert got_pairs == expect
    assert all(w1 < w2 for (w1, w2, _) in got_pairs)
