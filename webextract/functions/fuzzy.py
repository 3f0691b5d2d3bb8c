"""Fuzzy string matching over the corpus vocabulary — the FastSS
deletion-neighborhood algorithm (Bocek et al. 2007, "Fast Similarity
Search in Large Dictionaries"): two strings within edit distance k
share at least one member of their depth-k deletion neighborhoods, so
candidate generation is a keys-only groupby on deletion variants —
never an O(|V|^2) cross product — and only candidates pay the DP
verification.

Scale shape: the vocabulary is the DISTINCT word set (keys-only
groupby over the corpus, |V| << corpus size); each vocab word fans out
to O(len^k) variants map-side; bucket sizes are bounded by variant
collision counts (a pathological hub variant raises via max_group in
the pair step, no silent truncation).
"""

from __future__ import annotations

from itertools import combinations
from typing import List, Set

import pyarrow as pa


def levenshtein(a: str, b: str) -> int:
    """Plain O(len(a)*len(b)) DP — verification runs only on FastSS
    candidates, so the quadratic cost is per candidate pair, not per
    vocab pair."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _del_variants(w: str, k: int) -> Set[str]:
    """All strings reachable by deleting up to k characters (incl. w)."""
    out = {w}
    frontier = {w}
    for _ in range(k):
        nxt = set()
        for s in frontier:
            for i in range(len(s)):
                nxt.add(s[:i] + s[i + 1:])
        out |= nxt
        frontier = nxt
    return out


def fuzzy_vocab_pairs(ds, *, text_col: str = "text", max_dist: int = 2,
                      max_group: int = 10_000):
    """All vocabulary word pairs within `max_dist` edits, with the
    distance. Pipeline: distinct words (keys-only) -> deletion-variant
    explode (map-side) -> variant-bucket pair candidates (keys-only
    groupby, FastSS completeness guarantees no missed pair) ->
    candidate dedup (keys-only) -> per-pair DP verify (map-side)."""
    from ray.data.aggregate import Count

    def words(b: pa.Table) -> pa.Table:
        out: Set[str] = set()
        for t in b.column(text_col).to_pylist():
            out.update((t or "").split(" "))
        return pa.table({"w": pa.array(sorted(out), type=pa.string())})

    def variants(b: pa.Table) -> pa.Table:
        vs: List[str] = []
        ws: List[str] = []
        for w in b.column("w").to_pylist():
            for v in _del_variants(w, max_dist):
                vs.append(v)
                ws.append(w)
        return pa.table({"v": pa.array(vs, type=pa.string()),
                         "w": pa.array(ws, type=pa.string())})

    from webextract.functions.joins import pairs_within_key

    # round-5: per-variant-bucket map_groups + combinations replaced by
    # the shared vectorized pair primitive (one exchange, no per-bucket
    # Python)
    candidates = (
        pairs_within_key(
            ds.map_batches(words, batch_format="pyarrow")
            .groupby("w").aggregate(Count()).select_columns(["w"])
            .map_batches(variants, batch_format="pyarrow"),
            on="v", item="w", out_a="w1", out_b="w2",
            schema=pa.schema([("v", pa.string()), ("w", pa.string())]),
            max_group=max_group, what="fuzzy_vocab_pairs")
        .groupby(["w1", "w2"])
        .aggregate(Count())
        .select_columns(["w1", "w2"])
    )

    out_schema = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                            ("d", pa.int64())])

    def verify(b: pa.Table) -> pa.Table:
        w1s: List[str] = []
        w2s: List[str] = []
        ds_: List[int] = []
        for w1, w2 in zip(b.column("w1").to_pylist(),
                          b.column("w2").to_pylist()):
            d = levenshtein(w1, w2)
            if d <= max_dist:
                w1s.append(w1)
                w2s.append(w2)
                ds_.append(d)
        return pa.table({"w1": pa.array(w1s, type=pa.string()),
                         "w2": pa.array(w2s, type=pa.string()),
                         "d": pa.array(ds_, type=pa.int64())},
                        schema=out_schema)

    return candidates.map_batches(verify, batch_format="pyarrow")
