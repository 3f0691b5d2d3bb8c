"""Pins for the co-occurrence pair primitives (functions/cooc.py)."""

import pyarrow as pa
import pytest
import ray.data

from webextract.functions.cooc import group_item_pairs, text_pair_counts


def test_text_pair_counts_dedups_within_doc(ray_session):
    docs = pa.table({"text": pa.array(["a b a b", "b c a"])})
    ds = ray.data.from_arrow(docs).repartition(2)
    got = text_pair_counts(ds, k=10).to_pandas()
    rows = {(r.w1, r.w2): r.n for r in got.itertuples()}
    # ("a","b") appears in both docs but only once per doc
    assert rows[("a", "b")] == 2
    assert rows[("a", "c")] == 1
    assert rows[("b", "c")] == 1
    # pair order always w1 < w2
    assert all(w1 < w2 for (w1, w2) in rows)


def test_text_pair_counts_k_cut_total_order(ray_session):
    docs = pa.table({"text": pa.array(["a b c d"])})
    got = text_pair_counts(ray.data.from_arrow(docs), k=3).to_pandas()
    # all six pairs tie at n=1 -> lexicographic cut
    assert list(zip(got.w1, got.w2)) == [("a", "b"), ("a", "c"), ("a", "d")]


def test_group_item_pairs_counts_keys(ray_session):
    t = pa.table({
        "u": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
        "it": pa.array(["x", "y", "x", "x", "y", "x"]),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    got = group_item_pairs(ds, by="u", item="it").to_pandas()
    assert len(got) == 1
    assert got.iloc[0].t1 == "x" and got.iloc[0].t2 == "y"
    assert got.iloc[0].n_keys == 2  # users 1 and 2; singleton user 3 absent


def test_group_item_pairs_max_items_raises(ray_session):
    t = pa.table({
        "u": pa.array([1] * 5, type=pa.int64()),
        "it": pa.array([f"i{j}" for j in range(5)]),
    })
    with pytest.raises(Exception, match="max_items"):
        group_item_pairs(ray.data.from_arrow(t), by="u", item="it",
                         max_items=3).to_pandas()
