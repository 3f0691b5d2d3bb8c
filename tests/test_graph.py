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


def test_khop_spill_path_matches_broadcast(ray_session):
    """The keyed-exchange spill path (broadcast_max exceeded) must return
    exactly what the broadcast-frontier path returns — including a
    MID-WALK spill (bound crossed at round 2, after a broadcast round)."""
    import pyarrow as pa
    import ray.data

    from webextract.functions.graph import khop_distances

    # fan-out graph: 0 -> {1..4}, each i -> {10i..10i+3}, plus back edges
    src, dst = [], []
    for i in range(1, 5):
        src.append(0); dst.append(i)
        for j in range(4):
            src.append(i); dst.append(10 * i + j)
            src.append(10 * i + j); dst.append(0)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, type=pa.int64()),
        "dst": pa.array(dst, type=pa.int64()),
    })).repartition(3)

    def run(bmax):
        return (khop_distances(edges, source=0, k=3, broadcast_max=bmax)
                .to_pandas().set_index("node")["dist"].to_dict())

    broadcast = run(None)          # never spills (tiny graph)
    spill_r1 = run(1)              # overflows immediately
    spill_r2 = run(5)              # round 1 fits (1+4 keys), round 2 spills
    assert broadcast == spill_r1 == spill_r2
    assert broadcast[0] == 0
    assert all(broadcast[i] == 1 for i in range(1, 5))
    assert all(broadcast[10 * i + j] == 2
               for i in range(1, 5) for j in range(4))
