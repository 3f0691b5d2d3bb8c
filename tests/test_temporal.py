"""Unit tests for the temporal joins (functions/temporal.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from webextract.functions.temporal import asof_join, interval_join


def _ds(table: pa.Table, blocks: int = 2):
    return ray.data.from_arrow(table).repartition(blocks)


L_SCHEMA = pa.schema([("k", pa.int64()), ("t", pa.int64()),
                      ("lid", pa.int64())])
R_SCHEMA = pa.schema([("k", pa.int64()), ("rt", pa.int64()),
                      ("rid", pa.int64())])


def _left():
    return pa.table({"k": [1, 1, 1, 2, 3], "t": [5, 10, 2, 7, 4],
                     "lid": [0, 1, 2, 3, 4]}, schema=L_SCHEMA)


def _right():
    # k=1: rows at rt 3 and 8; k=2: row at rt 7 (tie with left t);
    # k=3: no right rows at all.
    return pa.table({"k": [1, 1, 2], "rt": [3, 8, 7], "rid": [10, 11, 12]},
                    schema=R_SCHEMA)


def test_asof_inner_backward():
    out = asof_join(_ds(_left()), _ds(_right()), by="k", left_ts="t",
                    right_ts="rt", left_schema=L_SCHEMA,
                    right_schema=R_SCHEMA).to_pandas()
    got = {int(r.lid): int(r.rid) for r in out.itertuples()}
    # t=5 -> rt=3; t=10 -> rt=8; t=2 -> no match (dropped);
    # t=7 matches rt=7 (<= is inclusive); k=3 has no right rows.
    assert got == {0: 10, 1: 11, 3: 12}


def test_asof_left_nulls():
    out = asof_join(_ds(_left()), _ds(_right()), by="k", left_ts="t",
                    right_ts="rt", left_schema=L_SCHEMA,
                    right_schema=R_SCHEMA, how="left").to_pandas()
    assert len(out) == 5
    misses = out[out.rid.isna()]
    assert sorted(misses.lid) == [2, 4]  # t=2 before all; k=3 empty right


def test_asof_tie_breaks_to_max_payload():
    right = pa.table({"k": [1, 1], "rt": [3, 3], "rid": [7, 9]},
                     schema=R_SCHEMA)
    left = pa.table({"k": [1], "t": [4], "lid": [0]}, schema=L_SCHEMA)
    out = asof_join(_ds(left, 1), _ds(right, 1), by="k", left_ts="t",
                    right_ts="rt", left_schema=L_SCHEMA,
                    right_schema=R_SCHEMA).to_pandas()
    assert list(out.rid) == [9]


def test_asof_rejects_colliding_names():
    with pytest.raises(ValueError, match="collide"):
        asof_join(_ds(_left()), _ds(_left()), by="k", left_ts="t",
                  right_ts="t", left_schema=L_SCHEMA, right_schema=L_SCHEMA)


def _intervals():
    # Overlapping: [0,10), [5,15), [20,25); plus a zero-width [30,30).
    return pa.table({"interval_id": pa.array([0, 1, 2, 3], pa.int64()),
                     "lo": pa.array([0, 5, 20, 30], pa.int64()),
                     "hi": pa.array([10, 15, 25, 30], pa.int64())})


def test_interval_join_overlap_and_bounds():
    rows = pa.table({"id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                     "ts": pa.array([7, 4, 10, 24, 30], pa.int64())})
    out = interval_join(_ds(rows), _intervals(), ts="ts").to_pandas()
    pairs = sorted(zip(out.id, out.interval_id))
    # ts=7 in both [0,10) and [5,15); ts=4 only [0,10); ts=10 excluded
    # from [0,10) (half-open) but in [5,15); ts=24 in [20,25); ts=30
    # matches nothing (zero-width interval is empty).
    assert pairs == [(0, 0), (0, 1), (1, 0), (2, 1), (3, 2)]


def test_interval_join_empty_batches_and_no_match():
    rows = pa.table({"id": pa.array([0], pa.int64()),
                     "ts": pa.array([99], pa.int64())})
    out_ds = interval_join(_ds(rows, 3), _intervals(), ts="ts")
    # schema survives on the Dataset even when every block is empty
    # (to_pandas() of an all-empty Dataset drops columns — Ray quirk)
    assert out_ds.schema().names == ["id", "ts", "interval_id"]
    assert out_ds.count() == 0


def test_interval_join_rejects_inverted():
    bad = pa.table({"interval_id": pa.array([0], pa.int64()),
                    "lo": pa.array([5], pa.int64()),
                    "hi": pa.array([1], pa.int64())})
    rows = pa.table({"id": pa.array([0], pa.int64()),
                     "ts": pa.array([3], pa.int64())})
    with pytest.raises(ValueError, match="hi < lo"):
        interval_join(_ds(rows, 1), bad, ts="ts")


def test_asof_matches_numpy_reference():
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    lt = pa.table({"k": rng.integers(0, 8, n_l), "t": rng.integers(0, 1000, n_l),
                   "lid": np.arange(n_l, dtype=np.int64)})
    rt_tab = pa.table({"k": rng.integers(0, 8, n_r),
                       "rt": rng.integers(0, 1000, n_r),
                       "rid": np.arange(n_r, dtype=np.int64)})
    lt = lt.cast(L_SCHEMA)
    rt_tab = rt_tab.cast(R_SCHEMA)
    out = asof_join(_ds(lt, 4), _ds(rt_tab, 4), by="k", left_ts="t",
                    right_ts="rt", left_schema=L_SCHEMA,
                    right_schema=R_SCHEMA, how="left").to_pandas()
    assert len(out) == n_l
    # reference: brute force, tie -> max (rt, rid)
    rk = rt_tab.column("k").to_numpy()
    rr = rt_tab.column("rt").to_numpy()
    ri = rt_tab.column("rid").to_numpy()
    expect = {}
    for k, t, lid in zip(lt.column("k").to_numpy(), lt.column("t").to_numpy(),
                         lt.column("lid").to_numpy()):
        cand = [(rr[j], ri[j]) for j in range(n_r) if rk[j] == k and rr[j] <= t]
        expect[int(lid)] = max(cand)[1] if cand else None
    got = {int(r.lid): (None if np.isnan(r.rid) else int(r.rid))
           for r in out.itertuples()}
    assert got == expect


def test_asof_join_forward_picks_earliest_at_or_after(ray_session):
    import pyarrow as pa
    import ray.data

    from webextract.functions.temporal import asof_join

    left = pa.table({
        "k": pa.array([1, 1, 1], type=pa.int64()),
        "lt": pa.array([10, 25, 90], type=pa.int64()),
        "lid": pa.array([100, 101, 102], type=pa.int64()),
    })
    right = pa.table({
        "k": pa.array([1, 1, 1, 1], type=pa.int64()),
        "rt": pa.array([5, 25, 25, 40], type=pa.int64()),
        "rid": pa.array([7, 9, 8, 6], type=pa.int64()),
    })
    ls = pa.schema([("k", pa.int64()), ("lt", pa.int64()),
                    ("lid", pa.int64())])
    rs = pa.schema([("k", pa.int64()), ("rt", pa.int64()),
                    ("rid", pa.int64())])
    got = asof_join(
        ray.data.from_arrow(left).repartition(2),
        ray.data.from_arrow(right).repartition(2),
        by="k", left_ts="lt", right_ts="rt",
        left_schema=ls, right_schema=rs, how="inner",
        direction="forward",
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    # lt=10 -> earliest rt>=10 is 25; tie at 25 resolves to MIN rid=8
    # lt=25 -> rt=25, rid=8; lt=90 -> no right row at/after -> dropped
    assert got.lid.tolist() == [100, 101]
    assert got.rt.tolist() == [25, 25]
    assert got.rid.tolist() == [8, 8]
