"""Co-occurrence pair counting — the market-basket / pointwise-mutual-
information primitive (word pairs within documents, event-type pairs
within users, co-cited links within pages).

Two shapes, picked by where a group's items live:

* :func:`text_pair_counts` — the items are already co-located in one
  row (a document's words), so the pair explode is MAP-SIDE: no
  shuffle before the keys-only pair groupby.
* :func:`group_item_pairs` — items are scattered rows (a user's
  events), so one groupby gathers each group, pairs explode inside
  `map_groups`, and a second keys-only groupby counts. Group size is
  the DISTINCT item count per group (5 event types -> <=10 pairs), not
  the raw row count — `max_items` raises on unbounded item sets rather
  than silently exploding O(m^2) pairs.
"""

from __future__ import annotations

from itertools import combinations
from typing import List

import pyarrow as pa


def text_pair_counts(ds, *, text_col: str = "text", k: int = 20):
    """Top-k co-occurring DISTINCT word pairs across documents.

    Pairs are emitted map-side per document (w1 < w2, deduped within
    the doc), then ONE keys-only groupby counts document frequency;
    the k-cut follows the total order (n DESC, w1 ASC, w2 ASC). The
    pair count per doc is C(|vocab(doc)|, 2) — vocabulary-bounded, not
    length-bounded."""
    from ray.data.aggregate import Count

    def explode(batch: pa.Table) -> pa.Table:
        """Per-doc distinct word pairs, VECTORIZED (round-5: the per-doc
        sorted-set + combinations loop becomes one split, one Arrow
        (doc, word) hash-distinct + sort, and the repeat/arange pair
        index arithmetic over doc runs)."""
        import numpy as np
        import pyarrow.compute as pc

        from webextract.functions.ngrams import _flat_ngram_strings

        doc_idx, words = _flat_ngram_strings(batch.column(text_col), 1)
        empty = pa.table({"w1": pa.array([], type=pa.string()),
                          "w2": pa.array([], type=pa.string())})
        if doc_idx.size == 0:
            return empty
        distinct = pa.table({
            "_d": pa.array(doc_idx, type=pa.int64()), "w": words,
        }).group_by(["_d", "w"], use_threads=False).aggregate([])
        idx = pc.sort_indices(distinct, sort_keys=[
            ("_d", "ascending"), ("w", "ascending")])
        dt = distinct.take(idx)
        d = np.asarray(dt.column("_d"))
        n = dt.num_rows
        starts = np.r_[0, np.nonzero(d[1:] != d[:-1])[0] + 1].astype(np.int64)
        m = np.r_[starts[1:], n].astype(np.int64) - starts
        sel = m >= 2
        ms, ss = m[sel], starts[sel]
        nout = ms * ms
        total = int(nout.sum())
        if total == 0:
            return empty
        offs = np.zeros(len(nout), dtype=np.int64)
        np.cumsum(nout[:-1], out=offs[1:])
        jg = np.arange(total, dtype=np.int64) - np.repeat(offs, nout)
        mr = np.repeat(ms, nout)
        idx_i = np.repeat(ss, nout) + jg // mr
        idx_j = np.repeat(ss, nout) + jg % mr
        keep = idx_i < idx_j  # words sorted within doc -> w1 < w2
        w = dt.column("w")
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        return pa.table({
            "w1": w.take(pa.array(idx_i[keep])),
            "w2": w.take(pa.array(idx_j[keep])),
        })

    counts = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Count())
        .rename_columns({"count()": "n"})
    )
    return counts.sort(["n", "w1", "w2"],
                       descending=[True, False, False]).limit(k)


def group_item_pairs(ds, *, by: str, item: str, max_items: int = 1000,
                     by_type: pa.DataType = pa.int64()):
    """Pairs of DISTINCT `item` values co-occurring under the same `by`
    key, counted across keys (t1 < t2). Round-5: the per-key
    map_groups + combinations shape is the shared vectorized
    `pairs_within_key` primitive (one exchange, no per-key Python);
    the pair count groupby moves keys only."""
    from ray.data.aggregate import Count

    from webextract.functions.joins import pairs_within_key

    return (
        pairs_within_key(
            ds.select_columns([by, item]), on=by, item=item,
            out_a="t1", out_b="t2",
            schema=pa.schema([(by, by_type), (item, pa.string())]),
            max_group=max_items, what="group_item_pairs",
            max_group_label="max_items")
        .groupby(["t1", "t2"])
        .aggregate(Count())
        .rename_columns({"count()": "n_keys"})
    )
