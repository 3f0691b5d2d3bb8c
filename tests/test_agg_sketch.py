"""Unit tests for aggregate extensions (functions/agg.py) and the KLL
quantile sketch (functions/sketches.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from webextract.functions.agg import (collect_sorted, count_distinct_by,
                                      hash_sample_per_group, key_except,
                                      key_intersect, moments_by)
from webextract.functions.sketches import KllSketch, approx_quantiles


def _ds(table: pa.Table, blocks: int = 3):
    return ray.data.from_arrow(table).repartition(blocks)


def test_count_distinct_by():
    t = pa.table({"g": pa.array(["a", "a", "a", "b", "b"]),
                  "u": pa.array([1, 1, 2, 7, 7], type=pa.int64())})
    out = count_distinct_by(_ds(t), by="g", of="u").to_pandas()
    got = dict(zip(out.g, out.n_distinct.astype(int)))
    assert got == {"a": 2, "b": 1}


def test_moments_match_numpy():
    vals = [3, 7, 7, 19, 24, 1, 1, 1]
    t = pa.table({"g": pa.array(["x"] * 5 + ["y"] * 3),
                  "v": pa.array(vals, type=pa.int64())})
    out = moments_by(_ds(t), by="g", val="v").to_pandas().set_index("g")
    assert np.isclose(out.loc["x", "var_samp"],
                      np.var(vals[:5], ddof=1), rtol=1e-12)
    assert np.isclose(out.loc["x", "std_samp"],
                      np.std(vals[:5], ddof=1), rtol=1e-12)
    assert out.loc["y", "var_samp"] == 0.0


def test_moments_singleton_group_null():
    t = pa.table({"g": pa.array(["solo"]),
                  "v": pa.array([5], type=pa.int64())})
    out = moments_by(_ds(t, 1), by="g", val="v").to_pandas()
    assert out.var_samp.isna().all() and out.std_samp.isna().all()


def test_collect_sorted_orders_and_caps():
    t = pa.table({"g": pa.array(["a", "a", "b", "a"]),
                  "v": pa.array([30, 10, 5, 20], type=pa.int64())})
    out = collect_sorted(_ds(t), by="g", val="v").to_pandas()
    got = dict(zip(out.g, out.vals))
    assert got == {"a": "10,20,30", "b": "5"}
    with pytest.raises(Exception):
        collect_sorted(_ds(t), by="g", val="v", max_group=2).to_pandas()


def test_set_ops():
    ks = pa.schema([("k", pa.int64())])
    left = pa.table({"k": pa.array([1, 1, 2, 3], type=pa.int64())})
    right = pa.table({"k": pa.array([2, 3, 3, 4], type=pa.int64())})
    inter = key_intersect(_ds(left), _ds(right), on="k",
                          left_schema=ks, right_schema=ks).to_pandas()
    assert sorted(inter.k) == [2, 3]
    exc = key_except(_ds(left), _ds(right), on="k",
                     left_schema=ks, right_schema=ks).to_pandas()
    assert sorted(exc.k) == [1]


def test_hash_sample_deterministic_and_matches_sql():
    import duckdb

    n = 300
    t = pa.table({"g": pa.array(["g%d" % (i % 4) for i in range(n)]),
                  "id": pa.array(range(n), type=pa.int64())})
    out1 = hash_sample_per_group(_ds(t, 5), by="g", id_col="id",
                                 k=3).to_pandas()
    out2 = hash_sample_per_group(_ds(t, 2), by="g", id_col="id",
                                 k=3).to_pandas()
    s1 = set(zip(out1.g, out1.id.astype(int)))
    assert s1 == set(zip(out2.g, out2.id.astype(int)))  # layout-invariant
    ref = duckdb.connect().execute(
        "SELECT g, id FROM t QUALIFY row_number() OVER "
        "(PARTITION BY g ORDER BY md5(id::VARCHAR), id) <= 3").df()
    assert s1 == set(zip(ref.g, ref.id.astype(int)))


# ------------------------------------------------------------------- KLL


def test_kll_rank_error_bound():
    # adversarial-ish: sorted input (worst case for naive sampling)
    n = 50_000
    vals = np.arange(n, dtype=np.int64)
    sk = KllSketch(k=256).add(vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = sk.quantile(q)
        assert abs(est - q * n) <= 0.02 * n, (q, est)


def test_kll_merge_equivalence():
    a = KllSketch(k=128).add(np.arange(0, 10_000, dtype=np.int64))
    b = KllSketch(k=128).add(np.arange(10_000, 20_000, dtype=np.int64))
    a.merge(b)
    assert abs(a.quantile(0.5) - 10_000) <= 0.03 * 20_000
    # total weight is preserved exactly by compaction
    _, wts = a.items()
    assert wts.sum() == 20_000


def test_approx_quantiles_dataset_op():
    n = 20_000
    t = pa.table({"v": pa.array(np.arange(n), type=pa.int64())})
    out = approx_quantiles(_ds(t, 8), "v", (0.5, 0.9)).to_pandas()
    got = dict(zip(out.q, out.value.astype(int)))
    assert abs(got[0.5] - 0.5 * n) <= 0.02 * n
    assert abs(got[0.9] - 0.9 * n) <= 0.02 * n


def test_set_ops_null_sql_set_semantics():
    """INTERSECT/EXCEPT treat NULL as ONE value on both sides (SQL set
    semantics — unlike join keys, where NULL never equals NULL)."""
    ks = pa.schema([("k", pa.int64())])
    left = pa.table({"k": pa.array([1, None, None, 2], type=pa.int64())})
    right = pa.table({"k": pa.array([2, None, 4], type=pa.int64())})
    inter = key_intersect(_ds(left), _ds(right), on="k",
                          left_schema=ks, right_schema=ks).to_pandas()
    vals = sorted(inter.k.tolist(), key=lambda x: (x != x, x))
    assert len(inter) == 2 and 2.0 in inter.k.values  # {2, NULL}
    assert inter.k.isna().sum() == 1
    exc = key_except(_ds(left), _ds(right), on="k",
                     left_schema=ks, right_schema=ks).to_pandas()
    assert exc.k.tolist() == [1]  # NULL present on both sides -> dropped


def test_set_ops_string_keys():
    ks = pa.schema([("k", pa.string())])
    left = pa.table({"k": pa.array(["a", "b", "b", "c"])})
    right = pa.table({"k": pa.array(["b", "d"])})
    inter = key_intersect(_ds(left), _ds(right), on="k",
                          left_schema=ks, right_schema=ks).to_pandas()
    assert sorted(inter.k) == ["b"]
    exc = key_except(_ds(left), _ds(right), on="k",
                     left_schema=ks, right_schema=ks).to_pandas()
    assert sorted(exc.k) == ["a", "c"]
