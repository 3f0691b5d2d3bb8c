"""Round-5 partition primitives: first_row_per_key, pairs_within_key,
composite-key partition_apply routing — direct unit coverage (the query
layer exercises them end-to-end; these pin the primitive contracts)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from webextract.functions.agg import first_row_per_key
from webextract.functions.joins import pairs_within_key, partition_apply


def test_first_row_per_key_matches_qualify(ray_session):
    t = pa.table({
        "k": [1, 1, 2, 2, 2, 3],
        "a": [5, 3, 9, 9, 1, 7],
        "b": [1, 2, 3, 4, 5, 6],
    })
    out = first_row_per_key(
        ray.data.from_arrow(t).repartition(3), on="k",
        sort_keys=[("a", "descending"), ("b", "ascending")],
        schema=pa.schema([("k", pa.int64()), ("a", pa.int64()),
                          ("b", pa.int64())]),
    ).to_pandas().sort_values("k", ignore_index=True)
    # k=1: max a=5 (b=1); k=2: a=9 tie -> b=3; k=3: single row
    assert out.k.tolist() == [1, 2, 3]
    assert out.a.tolist() == [5, 9, 7]
    assert out.b.tolist() == [1, 3, 6]


def test_pairs_within_key_distinct_items_and_order(ray_session):
    t = pa.table({
        "g": ["x", "x", "x", "y", "y", "z"],
        "w": ["b", "a", "a", "c", "a", "q"],  # dup (x, a) collapses
    })
    out = pairs_within_key(
        ray.data.from_arrow(t).repartition(2), on="g", item="w",
        out_a="w1", out_b="w2",
        schema=pa.schema([("g", pa.string()), ("w", pa.string())]),
    ).to_pandas().sort_values(["w1", "w2"], ignore_index=True)
    # x -> (a, b); y -> (a, c); z singleton -> nothing
    assert list(zip(out.w1, out.w2)) == [("a", "b"), ("a", "c")]


def test_pairs_within_key_max_group_raises(ray_session):
    t = pa.table({"g": ["x"] * 5, "w": [f"w{i}" for i in range(5)]})
    with pytest.raises(Exception, match="max_group"):
        pairs_within_key(
            ray.data.from_arrow(t), on="g", item="w",
            out_a="a", out_b="b",
            schema=pa.schema([("g", pa.string()), ("w", pa.string())]),
            max_group=3).to_pandas()


def test_partition_apply_composite_key_colocates(ray_session):
    # every (k, b) tuple must land in exactly one partition: group sizes
    # computed per partition must equal the global sizes
    ks = [i % 5 for i in range(60)]
    bs = [i % 3 for i in range(60)]
    t = pa.table({"k": ks, "b": bs, "v": list(range(60))})
    out_schema = pa.schema([("k", pa.int64()), ("b", pa.int64()),
                            ("n", pa.int64())])

    def sizes(part: pa.Table) -> pa.Table:
        k = np.asarray(part.column("k").to_numpy(zero_copy_only=False))
        b = np.asarray(part.column("b").to_numpy(zero_copy_only=False))
        comp = k * 100 + b
        u, c = np.unique(comp, return_counts=True)
        return pa.table({
            "k": pa.array(u // 100, type=pa.int64()),
            "b": pa.array(u % 100, type=pa.int64()),
            "n": pa.array(c, type=pa.int64()),
        }, schema=out_schema)

    out = partition_apply(
        ray.data.from_arrow(t).repartition(4), sizes, on=["k", "b"],
        schema=pa.schema([("k", pa.int64()), ("b", pa.int64()),
                          ("v", pa.int64())]),
        out_schema=out_schema).to_pandas()
    # one output row per (k, b) across ALL partitions => tuples co-located
    assert len(out) == 15
    import collections
    expected = collections.Counter(zip(ks, bs))
    got = {(r.k, r.b): r.n for r in out.itertuples()}
    assert got == dict(expected)
