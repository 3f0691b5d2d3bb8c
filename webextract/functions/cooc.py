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
        a: List[str] = []
        b: List[str] = []
        for t in batch.column(text_col).to_pylist():
            for w1, w2 in combinations(sorted(set((t or "").split(" "))), 2):
                a.append(w1)
                b.append(w2)
        return pa.table({
            "w1": pa.array(a, type=pa.string()),
            "w2": pa.array(b, type=pa.string()),
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
