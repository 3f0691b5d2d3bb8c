"""Connected components by min-label propagation."""

import pyarrow as pa
import ray.data

from webextract.functions.graph import connected_components


def _components(pairs):
    edges = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in pairs], type=pa.int64()),
                "id_b": pa.array([b for _, b in pairs], type=pa.int64()),
            }
        )
    )
    out = connected_components(edges)
    return {r["node"]: r["component"] for r in out.take_all()}


def test_two_cliques(ray_session):
    comp = _components([(1, 2), (2, 3), (10, 11)])
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(ray_session):
    # chain 0-1-2-3-4: needs multiple propagation rounds
    comp = _components([(i, i + 1) for i in range(4)])
    assert set(comp.values()) == {0}
    assert len(comp) == 5


def test_cross_linked_components_merge(ray_session):
    comp = _components([(1, 2), (3, 4), (2, 3), (7, 8)])
    assert comp[4] == 1 and comp[8] == 7


# ---------------------------------------------------------------- khop


def test_khop_distances_bfs(ray_session):
    import pyarrow as pa
    import ray.data

    from webextract.functions.graph import khop_distances

    # 0 -> 1 -> 2 -> 3 -> 4 (chain) plus a shortcut 0 -> 2 and a cycle
    edges = pa.table({
        "src": pa.array([0, 1, 2, 3, 0, 4], type=pa.int64()),
        "dst": pa.array([1, 2, 3, 4, 2, 0], type=pa.int64()),
    })
    got = (
        khop_distances(ray.data.from_arrow(edges).repartition(2),
                       source=0, k=3)
        .to_pandas().set_index("node")["dist"].to_dict()
    )
    # shortest paths win (2 via shortcut, not via 1); node 4 is 3 hops
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_khop_stops_on_empty_frontier(ray_session):
    import pyarrow as pa
    import ray.data

    from webextract.functions.graph import khop_distances

    edges = pa.table({
        "src": pa.array([0], type=pa.int64()),
        "dst": pa.array([1], type=pa.int64()),
    })
    got = (
        khop_distances(ray.data.from_arrow(edges), source=0, k=5)
        .to_pandas().set_index("node")["dist"].to_dict()
    )
    assert got == {0: 0, 1: 1}
