"""Join operator tests: broadcast and big-big hash join."""

import pyarrow as pa
import pytest
import ray.data

from webextract.functions.joins import broadcast_join, hash_join


def test_broadcast_join_left_semantics(ray_session):
    big = ray.data.from_arrow(pa.table({"k": [1, 2, 3, 2], "v": ["a", "b", "c", "d"]}))
    small = pa.table({"k": [1, 2], "name": ["one", "two"], "rank": [10, 20]})
    out = broadcast_join(big, small, key="k").to_pandas()
    out = out.sort_values("v", ignore_index=True)
    assert out.name.tolist() == ["one", "two", None, "two"]
    assert out["rank"].tolist()[0] == 10


def test_hash_join_inner(ray_session):
    left = ray.data.from_arrow(pa.table({"k": [1, 1, 2, 4], "lv": ["a", "b", "c", "z"]}))
    right = ray.data.from_arrow(pa.table({"k": [1, 2, 2, 3], "rv": [10, 20, 21, 30]}))
    rows = hash_join(left, right, on="k").take_all()
    got = sorted((r["k"], r["lv"], r["rv"]) for r in rows)
    assert got == [
        (1, "a", 10), (1, "b", 10),
        (2, "c", 20), (2, "c", 21),
    ]  # k=4 and k=3 have no match -> dropped (inner)


def test_hash_join_rejects_overlap(ray_session):
    left = ray.data.from_arrow(pa.table({"k": [1], "v": [1]}))
    right = ray.data.from_arrow(pa.table({"k": [1], "v": [2]}))
    with pytest.raises(ValueError, match="overlapping"):
        hash_join(left, right, on="k")


def test_hash_join_max_group_guard(ray_session):
    # 400 > 100: the hot key RAISES (no silent empty result — round-2 fix)
    left = ray.data.from_arrow(pa.table({"k": [1] * 20, "lv": list(range(20))}))
    right = ray.data.from_arrow(pa.table({"k": [1] * 20, "rv": list(range(20))}))
    with pytest.raises(Exception, match="exceeds max_group"):
        hash_join(left, right, on="k", max_group=100).take_all()


def test_semi_and_anti_join(ray_session):
    left = ray.data.from_arrow(
        pa.table({"k": [1, 2, 3, 4], "lv": [10, 20, 30, 40]})
    )
    right = ray.data.from_arrow(pa.table({"k": [2, 2, 4], "rv": [0, 0, 0]}))
    semi = sorted(
        (r["k"], r["lv"])
        for r in hash_join(left, right, on="k", how="semi").take_all()
    )
    anti = sorted(
        (r["k"], r["lv"])
        for r in hash_join(left, right, on="k", how="anti").take_all()
    )
    assert semi == [(2, 20), (4, 40)]
    assert anti == [(1, 10), (3, 30)]
    # duplicate right keys never multiply left rows (existence, not product)
    assert len(semi) == 2


def test_hash_join_explicit_schemas(ray_session):
    """Explicit left/right schemas bypass Dataset.schema() inference —
    the round-2 driver crash: Ray 2.49 metadata schema propagation
    mis-composes chained renames (doc_id->id_a then id_b->doc_id), so the
    pad UDF was built for a column that did not exist at runtime."""
    left = ray.data.from_arrow(pa.table({"k": [1, 2], "lv": ["a", "b"]}))
    right = ray.data.from_arrow(pa.table({"k": [2, 3], "rv": [20, 30]}))
    out = hash_join(
        left, right, on="k",
        left_schema=pa.schema([("k", pa.int64()), ("lv", pa.string())]),
        right_schema=pa.schema([("k", pa.int64()), ("rv", pa.int64())]),
    ).take_all()
    assert sorted((r["k"], r["lv"], r["rv"]) for r in out) == [(2, "b", 20)]


def test_hash_join_explicit_schema_casts_drift(ray_session):
    # declared string vs actual large_string converges via the pad cast
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], type=pa.int64()),
                  "lv": pa.array(["a", "b"], type=pa.large_string())})
    )
    right = ray.data.from_arrow(pa.table({"k": [1], "rv": [5]}))
    out = hash_join(
        left, right, on="k",
        left_schema=pa.schema([("k", pa.int64()), ("lv", pa.string())]),
        right_schema=pa.schema([("k", pa.int64()), ("rv", pa.int64())]),
    ).take_all()
    assert [(r["k"], r["lv"], r["rv"]) for r in out] == [(1, "a", 5)]


def test_hash_join_empty_side(ray_session):
    # zero-row (and post-filter schema-degraded) inputs produce a typed
    # empty result, not a crash — the flaky-empty-block hardening
    left = ray.data.from_arrow(
        pa.table({"k": [1, 2], "lv": ["a", "b"]})
    ).filter(lambda r: False)
    right = ray.data.from_arrow(pa.table({"k": [1], "rv": [5]}))
    out = hash_join(
        left, right, on="k",
        left_schema=pa.schema([("k", pa.int64()), ("lv", pa.string())]),
        right_schema=pa.schema([("k", pa.int64()), ("rv", pa.int64())]),
    )
    assert out.count() == 0
    semi = hash_join(
        right, left, on="k", how="semi",
        left_schema=pa.schema([("k", pa.int64()), ("rv", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("lv", pa.string())]),
    )
    assert semi.count() == 0


def test_hash_join_null_keys_sql_semantics(ray_session):
    """NULL never equals NULL (round-3 ADVICE): null-keyed rows must not
    inner-join each other; left/full/anti keep them as unmatched; semi
    drops them."""
    from webextract.functions.joins import hash_join

    ls = pa.schema([("k", pa.int64()), ("lv", pa.string())])
    rs = pa.schema([("k", pa.int64()), ("rv", pa.string())])
    lt = pa.table({"k": [1, None, 2, None], "lv": ["a", "b", "c", "d"]})
    rt = pa.table({"k": [1, None, 3], "rv": ["x", "y", "z"]})

    def mk():
        return (ray.data.from_arrow(lt).repartition(2),
                ray.data.from_arrow(rt).repartition(2))

    l, r = mk()
    inner = hash_join(l, r, on="k", left_schema=ls, right_schema=rs).take_all()
    assert sorted((row["k"], row["lv"], row["rv"]) for row in inner) \
        == [(1, "a", "x")]

    l, r = mk()
    left = hash_join(l, r, on="k", how="left",
                     left_schema=ls, right_schema=rs).take_all()
    assert sorted(((row["k"] or 0), row["lv"], (row["rv"] or ""))
                  for row in left) \
        == [(0, "b", ""), (0, "d", ""), (1, "a", "x"), (2, "c", "")]

    l, r = mk()
    full = hash_join(l, r, on="k", how="full",
                     left_schema=ls, right_schema=rs).take_all()
    got = sorted(((row["k"] or 0), (row["lv"] or ""), (row["rv"] or ""))
                 for row in full)
    assert got == [(0, "", "y"), (0, "b", ""), (0, "d", ""),
                   (1, "a", "x"), (2, "c", ""), (3, "", "z")]

    l, r = mk()
    anti = hash_join(l, r, on="k", how="anti",
                     left_schema=ls, right_schema=rs).take_all()
    assert sorted((row["k"] or 0, row["lv"]) for row in anti) \
        == [(0, "b"), (0, "d"), (2, "c")]  # NOT EXISTS keeps null keys

    l, r = mk()
    semi = hash_join(l, r, on="k", how="semi",
                     left_schema=ls, right_schema=rs).take_all()
    assert sorted((row["k"], row["lv"]) for row in semi) == [(1, "a")]


def test_hash_join_on_null_component_drops_row(ray_session):
    """A composite key with any NULL component packs to NULL and must not
    match anything (inner)."""
    from webextract.functions.joins import hash_join_on

    ls = pa.schema([("a", pa.int64()), ("b", pa.string()),
                    ("lv", pa.string())])
    rs = pa.schema([("a", pa.int64()), ("b", pa.string()),
                    ("rv", pa.string())])
    lt = pa.table({"a": [1, None, 2], "b": ["x", "x", None],
                   "lv": ["p", "q", "r"]})
    rt = pa.table({"a": [1, None, 2], "b": ["x", "x", None],
                   "rv": ["u", "v", "w"]})
    out = hash_join_on(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                       on=["a", "b"], left_schema=ls,
                       right_schema=rs).take_all()
    assert sorted((row["a"], row["b"], row["lv"], row["rv"])
                  for row in out) == [(1, "x", "p", "u")]


def test_broadcast_join_inner_drops_misses(ray_session):
    """how='inner' drops misses by key MEMBERSHIP — a null dim payload
    value on a MATCHED key is kept (SQL INNER JOIN semantics)."""
    from webextract.functions.joins import broadcast_join

    fact = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], type=pa.int64()),
        "v": pa.array([10, 20, 30, 40], type=pa.int64()),
    }))
    dim = pa.table({
        "k": pa.array([1, 3], type=pa.int64()),
        "name": pa.array(["a", None], type=pa.string()),
    })
    out = sorted((r["k"], r["v"], r["name"]) for r in
                 broadcast_join(fact, dim, key="k", how="inner").take_all())
    assert out == [(1, 10, "a"), (3, 30, None)]
    left = sorted((r["k"], r["name"]) for r in
                  broadcast_join(fact, dim, key="k").take_all())
    assert left == [(1, "a"), (2, None), (3, None), (4, None)]


def test_join_dim_paths_identical(ray_session, tmp_path):
    """The measured broadcast path and the hash_join fallback of
    queries/_shared.join_dim return identical rows."""
    import pyarrow.parquet as pq

    from webextract.queries._shared import join_dim

    dim_path = str(tmp_path / "dim.parquet")
    pq.write_table(pa.table({
        "k": pa.array([1, 2, 3], type=pa.int64()),
        "name": pa.array(["a", "b", "c"], type=pa.string()),
    }), dim_path)
    fs = pa.schema([("k", pa.int64()), ("v", pa.int64())])

    def fact():
        return ray.data.from_arrow(pa.table({
            "k": pa.array([1, 1, 3, 9], type=pa.int64()),
            "v": pa.array([10, 11, 30, 90], type=pa.int64()),
        })).repartition(2)

    rows_b = sorted((r["k"], r["v"], r["name"]) for r in join_dim(
        fact(), dim_path, key="k", cols=["name"],
        fact_schema=fs).take_all())
    rows_h = sorted((r["k"], r["v"], r["name"]) for r in join_dim(
        fact(), dim_path, key="k", cols=["name"], fact_schema=fs,
        max_rows=0).take_all())
    assert rows_b == rows_h == [(1, 10, "a"), (1, 11, "a"), (3, 30, "c")]


def test_attach_group_size_matches_naive(ray_session):
    """attach_group_size == COUNT(*) OVER (PARTITION BY k) on a mixed
    int-key table spread over several blocks."""
    import collections

    from webextract.functions.joins import attach_group_size

    keys = [i % 7 for i in range(50)] + [99] * 3
    vals = list(range(len(keys)))
    expected = collections.Counter(keys)
    ds = ray.data.from_arrow(
        pa.table({"k": keys, "v": vals})).repartition(5)
    out = attach_group_size(
        ds, on="k",
        schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
        out="n").to_pandas().sort_values("v", ignore_index=True)
    assert out["v"].tolist() == vals  # every row survives, payload intact
    assert out["n"].tolist() == [expected[k] for k in keys]


def test_attach_group_size_string_keys_and_nulls(ray_session):
    """String keys hash-route correctly; NULL keys form ONE group
    (SQL window PARTITION BY semantics, not join semantics)."""
    from webextract.functions.joins import attach_group_size

    ds = ray.data.from_arrow(pa.table({
        "k": ["a", "b", "a", None, None, "c", None],
        "i": [0, 1, 2, 3, 4, 5, 6],
    })).repartition(3)
    out = attach_group_size(
        ds, on="k",
        schema=pa.schema([("k", pa.string()), ("i", pa.int64())]),
        out="n").to_pandas().sort_values("i", ignore_index=True)
    assert out["n"].tolist() == [2, 1, 2, 3, 3, 1, 3]


def test_attach_group_size_rejects_column_collision(ray_session):
    from webextract.functions.joins import attach_group_size

    ds = ray.data.from_arrow(pa.table({"k": [1], "n": [1]}))
    with pytest.raises(ValueError, match="already in input schema"):
        attach_group_size(
            ds, on="k",
            schema=pa.schema([("k", pa.int64()), ("n", pa.int64())]),
            out="n")


def test_attach_group_size_int_null_keys(ray_session):
    from webextract.functions.joins import attach_group_size

    ds = ray.data.from_arrow(pa.table(
        {"k": [1, None, 1, None, 2], "i": [0, 1, 2, 3, 4]})).repartition(3)
    out = attach_group_size(
        ds, on="k",
        schema=pa.schema([("k", pa.int64()), ("i", pa.int64())]),
        out="n").to_pandas().sort_values("i", ignore_index=True)
    assert out["n"].tolist() == [2, 2, 2, 2, 1]


def test_partition_apply_all_empty_keeps_schema(ray_session):
    """An all-empty partition_apply result must keep its output schema
    (Ray 2.49's fused map operator short-circuits 0-row blocks to
    schema-less output; the from_arrow anchor block is the guarantee)."""
    import pyarrow.compute as pc_

    from webextract.functions.joins import partition_apply

    ds = ray.data.from_arrow(pa.table({"k": [1, 2, 3], "v": [1, 2, 3]}))
    out_schema = pa.schema([("k", pa.int64())])

    def nothing(t: pa.Table) -> pa.Table:
        return out_schema.empty_table()

    out = partition_apply(
        ds, nothing, on="k",
        schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
        out_schema=out_schema)
    tbls = [t for t in ray.get(out.to_arrow_refs()) if t.num_columns]
    assert tbls, "no typed block survived an all-empty result"
    merged = pa.concat_tables(tbls, promote_options="default")
    assert merged.num_rows == 0
    assert merged.schema.names == ["k"]


def test_hash_join_all_empty_result_keeps_schema(ray_session):
    """Review fix: an inner join with NO matching keys must still carry
    its output schema (Ray 2.49's fused map short-circuits 0-row blocks
    past any trailing retype map_batches, so the guarantee comes from a
    schema-anchor union)."""
    import ray
    import ray.data

    from webextract.functions.joins import hash_join

    l = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()), "a": pa.array(["x", "y"])}))
    r = ray.data.from_arrow(pa.table({
        "k": pa.array([8, 9], pa.int64()), "b": pa.array([1.0, 2.0])}))
    j = hash_join(
        l, r, on="k",
        left_schema=pa.schema([("k", pa.int64()), ("a", pa.string())]),
        right_schema=pa.schema([("k", pa.int64()), ("b", pa.float64())]))
    assert j.take_all() == []
    tbls = [t for t in ray.get(j.to_arrow_refs()) if t.num_columns]
    assert tbls, "no typed block survived an all-empty join"
    merged = pa.concat_tables(tbls, promote_options="default")
    assert merged.schema.names == ["k", "a", "b"]


def test_hash_join_all_empty_semi_anti_keep_schema(ray_session):
    """The schema-anchor union must also cover the semi/anti output
    shape (left columns only, no right payload)."""
    import ray
    import ray.data

    from webextract.functions.joins import hash_join

    lt = pa.table({"k": pa.array([1, 2], pa.int64()),
                   "a": pa.array(["x", "y"])})
    ls = pa.schema([("k", pa.int64()), ("a", pa.string())])
    rs = pa.schema([("k", pa.int64()), ("b", pa.float64())])

    # semi vs a right side sharing NO keys -> 0 rows, left schema
    semi = hash_join(
        ray.data.from_arrow(lt),
        ray.data.from_arrow(pa.table({
            "k": pa.array([8], pa.int64()), "b": pa.array([1.0])})),
        on="k", how="semi", left_schema=ls, right_schema=rs)
    assert semi.take_all() == []
    tbls = [t for t in ray.get(semi.to_arrow_refs()) if t.num_columns]
    assert pa.concat_tables(
        tbls, promote_options="default").schema.names == ["k", "a"]

    # anti vs a right side covering ALL keys -> 0 rows, left schema
    anti = hash_join(
        ray.data.from_arrow(lt),
        ray.data.from_arrow(pa.table({
            "k": pa.array([1, 2], pa.int64()),
            "b": pa.array([1.0, 2.0])})),
        on="k", how="anti", left_schema=ls, right_schema=rs)
    assert anti.take_all() == []
    tbls = [t for t in ray.get(anti.to_arrow_refs()) if t.num_columns]
    assert pa.concat_tables(
        tbls, promote_options="default").schema.names == ["k", "a"]


def test_broadcast_join_null_dim_key_dropped(ray_session):
    """Review fix: a NULL dimension key must not crash the last-wins
    dedup (NaN dictionary code -> IndexError) — SQL semantics drop it."""
    import ray.data

    from webextract.functions.joins import broadcast_join

    big = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, None], pa.int64()),
        "v": pa.array(["a", "b", "c"])}))
    dim = pa.table({"k": pa.array([1, None], pa.int64()),
                    "name": pa.array(["one", "ghost"])})
    left = sorted(
        ((r["v"], r["name"]) for r in
         broadcast_join(big, dim, key="k").take_all()))
    assert left == [("a", "one"), ("b", None), ("c", None)]
    inner = sorted(
        ((r["v"], r["name"]) for r in
         broadcast_join(big, dim, key="k", how="inner").take_all()))
    assert inner == [("a", "one")]


def test_hash_join_duplicate_keys_both_sides_with_nulls(ray_session):
    """Cartesian-per-key fan-out with duplicate keys on BOTH sides plus
    NULL keys on both sides: left keeps null-keyed left rows unmatched,
    full additionally keeps null-keyed right rows."""
    import ray.data

    from webextract.functions.joins import hash_join

    ls = pa.schema([("k", pa.int64()), ("a", pa.string())])
    rs = pa.schema([("k", pa.int64()), ("b", pa.int64())])

    def sides():
        l = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 1, None, 2], pa.int64()),
            "a": pa.array(["p", "q", "r", "s"])}))
        r = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 1, 3, None], pa.int64()),
            "b": pa.array([10, 20, 30, 40], pa.int64())}))
        return l, r

    l, r = sides()
    out = sorted((x["a"], x["b"]) for x in hash_join(
        l, r, on="k", how="left",
        left_schema=ls, right_schema=rs).take_all())
    assert out == sorted([("p", 10), ("p", 20), ("q", 10), ("q", 20),
                          ("r", None), ("s", None)])

    l, r = sides()
    out = sorted((str(x["a"]), str(x["b"])) for x in hash_join(
        l, r, on="k", how="full",
        left_schema=ls, right_schema=rs).take_all())
    assert out == sorted([("p", "10"), ("p", "20"), ("q", "10"),
                          ("q", "20"), ("r", "None"), ("s", "None"),
                          ("None", "30"), ("None", "40")])


def test_broadcast_join_empty_and_all_null_dim(ray_session):
    """A 0-row dimension (or one whose keys are ALL null, which the
    null-key filter reduces to 0 rows) must behave like a dim with no
    matches — left fills nulls, inner drops everything."""
    import ray.data

    from webextract.functions.joins import broadcast_join

    big = lambda: ray.data.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()), "v": pa.array(["a"])}))
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "name": pa.array([], pa.string())})
    allnull = pa.table({"k": pa.array([None, None], pa.int64()),
                        "name": pa.array(["x", "y"])})
    for dim in (empty, allnull):
        assert broadcast_join(big(), dim, key="k").take_all() == [
            {"k": 1, "v": "a", "name": None}]
        assert broadcast_join(big(), dim, key="k",
                              how="inner").take_all() == []


def test_broadcast_full_join_parity_with_hash_join(ray_session):
    """broadcast_full_join must match hash_join(how="full") exactly on
    a case mixing duplicate LEFT keys, NULL keys on both sides, and
    right-only keys (unique right keys — the broadcast contract)."""
    import ray.data

    from webextract.functions.joins import broadcast_full_join, hash_join

    ls = pa.schema([("k", pa.int64()), ("a", pa.string())])
    rs = pa.schema([("k", pa.int64()), ("b", pa.int64())])
    lt = pa.table({"k": pa.array([1, 1, None, 2, 5], pa.int64()),
                   "a": pa.array(["p", "q", "r", "s", "t"])})
    rt = pa.table({"k": pa.array([1, 3, None], pa.int64()),
                   "b": pa.array([10, 30, 40], pa.int64())})

    def norm(rows):
        return sorted((str(x["k"]), str(x["a"]), str(x["b"]))
                      for x in rows)

    got_b = norm(broadcast_full_join(
        ray.data.from_arrow(lt).repartition(3), rt, on="k",
        left_schema=ls, right_schema=rs).take_all())
    got_h = norm(hash_join(
        ray.data.from_arrow(lt).repartition(3),
        ray.data.from_arrow(rt), on="k", how="full",
        left_schema=ls, right_schema=rs).take_all())
    assert got_b == got_h
    # every left row present; right-only key 3 and NULL-keyed right row
    # emitted with NULL left payload
    assert ("3", "None", "30") in got_b
    assert ("None", "None", "40") in got_b


def test_broadcast_full_join_duplicate_right_keys_raise(ray_session):
    import ray.data

    from webextract.functions.joins import broadcast_full_join

    ls = pa.schema([("k", pa.int64()), ("a", pa.string())])
    rs = pa.schema([("k", pa.int64()), ("b", pa.int64())])
    lt = pa.table({"k": pa.array([1], pa.int64()), "a": pa.array(["p"])})
    rt = pa.table({"k": pa.array([1, 1], pa.int64()),
                   "b": pa.array([10, 11], pa.int64())})
    with pytest.raises(ValueError, match="duplicate right keys"):
        broadcast_full_join(ray.data.from_arrow(lt), rt, on="k",
                            left_schema=ls, right_schema=rs)


def test_broadcast_full_join_empty_right(ray_session):
    """A 0-row right side degrades to the identity-with-null-payload
    shape (every left row, b=NULL) with no extras block."""
    import ray.data

    from webextract.functions.joins import broadcast_full_join

    ls = pa.schema([("k", pa.int64()), ("a", pa.string())])
    rs = pa.schema([("k", pa.int64()), ("b", pa.int64())])
    lt = pa.table({"k": pa.array([1, None], pa.int64()),
                   "a": pa.array(["p", "q"])})
    rt = pa.table({"k": pa.array([], pa.int64()),
                   "b": pa.array([], pa.int64())})
    got = sorted((str(x["k"]), x["a"], x["b"]) for x in broadcast_full_join(
        ray.data.from_arrow(lt), rt, on="k",
        left_schema=ls, right_schema=rs).take_all())
    assert got == [("1", "p", None), ("None", "q", None)]


def test_semi_anti_transport_parity(ray_session):
    """The measured semi/anti broadcast path, the forced keyed exchange,
    and the forced broadcast-overflow fallback (exchange over the
    block-deduped keys) must return identical rows — int and string
    keys, NULLs and duplicates on both sides."""
    import ray.data

    from webextract.functions.joins import hash_join

    ls = pa.schema([("k", pa.int64()), ("lv", pa.string())])
    rs = pa.schema([("k", pa.int64()), ("rv", pa.string())])
    lt = pa.table({"k": [1, None, 2, 2, 5, None], "lv": list("abccde")})
    rt = pa.table({"k": [2, 2, None, 5, 7], "rv": list("vwxyz")})

    def run(how, bmax):
        got = hash_join(
            ray.data.from_arrow(lt).repartition(3),
            ray.data.from_arrow(rt).repartition(2),
            on="k", how=how, left_schema=ls, right_schema=rs,
            semi_broadcast_max=bmax).take_all()
        return sorted((str(r["k"]), r["lv"]) for r in got)

    for how in ("semi", "anti"):
        bcast, exch, spill = run(how, None), run(how, 0), run(how, 1)
        assert bcast == exch == spill
    assert run("semi", None) == [("2", "c"), ("2", "c"), ("5", "d")]
    assert run("anti", None) == [("1", "a"), ("None", "b"), ("None", "e")]

    # string keys through all three transports
    ls2 = pa.schema([("k", pa.string()), ("lv", pa.int64())])
    rs2 = pa.schema([("k", pa.string())])
    lt2 = pa.table({"k": ["a", None, "b", "a"], "lv": [1, 2, 3, 4]})
    rt2 = pa.table({"k": ["a", "z", None]})

    def run2(how, bmax):
        got = hash_join(
            ray.data.from_arrow(lt2), ray.data.from_arrow(rt2),
            on="k", how=how, left_schema=ls2, right_schema=rs2,
            semi_broadcast_max=bmax).take_all()
        return sorted((str(r["k"]), r["lv"]) for r in got)

    for how in ("semi", "anti"):
        assert run2(how, None) == run2(how, 0) == run2(how, 1)
    assert run2("semi", None) == [("a", 1), ("a", 4)]
    assert run2("anti", None) == [("None", 2), ("b", 3)]


def test_semi_anti_broadcast_empty_right(ray_session):
    """Empty right set: semi keeps nothing, anti keeps everything
    (including NULL-keyed lefts) — on the broadcast path."""
    import ray.data

    from webextract.functions.joins import hash_join

    ls = pa.schema([("k", pa.int64()), ("lv", pa.string())])
    rs = pa.schema([("k", pa.int64())])
    lt = pa.table({"k": [1, None], "lv": ["a", "b"]})
    rt = pa.table({"k": pa.array([], pa.int64())})
    semi = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                     on="k", how="semi", left_schema=ls, right_schema=rs)
    assert semi.take_all() == []
    anti = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                     on="k", how="anti", left_schema=ls, right_schema=rs)
    assert sorted(str(r["k"]) for r in anti.take_all()) == ["1", "None"]
