"""Distributed connected components over a near-dup pair table.

The step AFTER near-duplicate pair mining: pairs (id_a, id_b) form a graph
whose connected components are the duplicate CLUSTERS — keep one document
per component, drop the rest. (The reference's closest analog is the
repeated-box reduction in its table matcher, `matcher.py:288-296`; at crawl
scale this is the dedup clustering every LLM-corpus pipeline runs.)

Algorithm: iterative min-label propagation (the dataset-parallel stand-in
for union-find):

1. every node starts labeled with itself;
2. each round, every node takes the MIN of its own label and its
   neighbors' labels (one hash-join of labels onto bidirectional edges +
   one `groupby(node).min()`);
3. stop when a round changes nothing (checked with a tiny join) — at most
   O(graph diameter) rounds. Near-dup graphs are unions of small cliques,
   so 2-3 rounds in practice.

Each round shuffles only (node, label) pairs — never document payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def connected_components(edges, *, a_col: str = "id_a", b_col: str = "id_b",
                         max_iters: int = 25):
    """edges Dataset -> (node, component) Dataset; component = min node id
    reachable. Nodes are every id appearing in any edge."""
    from ray.data.aggregate import Min

    from webextract.functions.joins import hash_join

    def bidir(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "peer": pa.array([], type=pa.int64()),
                }
            )
        a = batch.column(a_col).cast(pa.int64()).combine_chunks()
        b = batch.column(b_col).cast(pa.int64()).combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([a, b]),
                "peer": pa.concat_arrays([b, a]),
            }
        )

    # Materialize the (small) edge list once: every propagation round joins
    # against it, and without this the whole upstream pair-mining subgraph
    # (LSH + exact verify at crawl scale) would re-execute per round.
    ebidir = edges.map_batches(bidir, batch_format="pyarrow").materialize()
    # Bound the shuffle width. The upstream pair miner leaves hundreds of
    # near-empty blocks; left alone, each round's union+groupby MULTIPLIES
    # block count (192 -> 576 -> 1344 measured at 50 edges) and per-block
    # overhead dwarfs the work. Size partitions to the edge count and
    # re-bound labels every round so round cost stays O(nparts).
    n_edges = ebidir.count()
    nparts = max(1, min(512, n_edges // 500_000 + 1))
    ebidir = ebidir.repartition(nparts).materialize()
    _S_EBIDIR = pa.schema([("node", pa.int64()), ("peer", pa.int64())])
    _S_PLABELS = pa.schema([("peer", pa.int64()), ("plabel", pa.int64())])
    # labels: node -> current component label, seeded with the node itself
    labels = (
        ebidir.groupby("node").min("node")
        .rename_columns({"min(node)": "label"})
        .repartition(nparts)
    )
    # (groupby("node").min("node") is just "distinct node, label=node" —
    # one shuffle builds the node set)

    labels = labels.materialize()
    prev_sum = labels.sum("label")
    for _ in range(max_iters):
        # neighbor messages: peer's label delivered to node
        peer_labels = labels.rename_columns({"node": "peer", "label": "plabel"})
        msgs = hash_join(
            ebidir, peer_labels, on="peer",
            left_schema=_S_EBIDIR, right_schema=_S_PLABELS,
        ).select_columns(["node", "plabel"]).rename_columns(
            {"plabel": "label"}
        )
        labels = (
            msgs.union(labels)
            .groupby("node")
            .aggregate(Min("label"))
            .rename_columns({"min(label)": "label"})
            .repartition(nparts)
        ).materialize()
        # convergence: labels only ever DECREASE, so the label sum is a
        # strictly-monotone progress measure — an unchanged sum means a
        # fixpoint (no per-node join needed to detect it)
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.rename_columns({"label": "component"})


def degree_stats(edges, *, src_col: str = "src", dst_col: str = "dst"):
    """Exact per-node (out_deg, in_deg) over an edge Dataset.

    The host_stats combiner discipline: each batch pre-aggregates its
    (node -> out, in) partial counts, so the single groupby shuffles one
    row per (block, node) — never one per edge. Returns a Dataset
    (node, out_deg, in_deg) with int64 counts.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        # vectorized (round-5): one unique over src+dst, two bincounts
        # over the inverse codes — no per-edge Python dict
        import numpy as np

        s = np.asarray(batch.column(src_col).cast(pa.int64())
                       .combine_chunks(), dtype=np.int64)
        d = np.asarray(batch.column(dst_col).cast(pa.int64())
                       .combine_chunks(), dtype=np.int64)
        nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
        out_part = np.bincount(inv[:s.size], minlength=nodes.size)
        in_part = np.bincount(inv[s.size:], minlength=nodes.size)
        return pa.table({
            "node": pa.array(nodes, type=pa.int64()),
            "out_part": pa.array(out_part.astype(np.int64)),
            "in_part": pa.array(in_part.astype(np.int64)),
        })

    return (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("out_part"), Sum("in_part"))
        .rename_columns({"sum(out_part)": "out_deg",
                         "sum(in_part)": "in_deg"})
    )


_S_RANKS = pa.schema([("src", pa.int64()), ("rank", pa.float64())])


def _pagerank_inprocess(e, *, n_iter: int, damping: float):
    """One-task power iteration for a DIMENSION-SIZED edge set (the
    in-process Lloyd's / fused-triangle discipline): gather the already-
    materialized (src, dst) blocks, integer-code the node set once, and
    run every iteration as two ``np.bincount`` kernels — no per-round
    joins, groupbys, or materializations. Bit-for-bit this differs from
    the distributed path only in float summation order (both are
    rows-only-tolerance ops)."""
    import ray
    import ray.data

    tbls = [t for t in ray.get(e.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.float64())}))
    t = pa.concat_tables(tbls)
    src = np.asarray(t.column("src").combine_chunks(), dtype=np.int64)
    dst = np.asarray(t.column("dst").combine_chunks(), dtype=np.int64)
    nodes, codes = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = int(nodes.size)
    sc, dc = codes[:src.size], codes[src.size:]
    out_deg = np.bincount(sc, minlength=n).astype(np.float64)
    dangling = out_deg == 0.0
    rank = np.full(n, 1.0 / n, dtype=np.float64)
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        dm = float(rank[dangling].sum())
        contrib = rank[sc] / out_deg[sc]
        inmass = np.bincount(dc, weights=contrib, minlength=n)
        rank = damping * inmass + (base + damping * dm / n)
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes, type=pa.int64()),
        "rank": pa.array(rank, type=pa.float64())}))


def pagerank(edges, *, n_iter: int = 10, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst",
             broadcast_max: int | None = None):
    """Distributed PageRank by power iteration over an edge Dataset
    (DISTINCT edges; multi-edges should be deduped upstream).

    Per iteration: ONE hash join delivers rank(src)/out_deg(src) to each
    edge, ONE groupby(dst) sums the inbound mass, and ONE union+groupby
    re-bases every node (including in-degree-0 nodes) at
    ``(1-d)/n + d*(in_mass + dangling/n)``. Every shuffle moves only
    (node, double) pairs — the connected_components discipline. Ranks are
    materialized per round (the iteration-reuse rule) and repartitioned to
    a bounded width so block count cannot multiply across rounds.

    Dangling-node mass (out-degree 0) is redistributed uniformly: the
    dangling node SET is computed once (tiny anti join); its per-round
    mass is one scalar. Float sums across blocks are order-dependent, so
    ranks are approximate at the last bit — validate against a local
    reference within tolerance (rows-only op, like the LSH/IVF family).

    Scale shape picked from the MEASURED distinct-edge count (the same
    measure-then-pick contract as `triangle_count` / `khop_distances`):
    an edge set at or below ``broadcast_max`` (default
    `dedup._SMALL_WINNERS_MAX` = 4M rows) runs the whole iteration
    in-process as bincount kernels; larger graphs take the per-round
    keyed exchanges below. ``broadcast_max=0`` forces the distributed
    path (parity tests).
    """
    from ray.data.aggregate import Sum

    from webextract.functions.joins import hash_join

    def eprep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": batch.column(src_col).cast(pa.int64()),
            "dst": batch.column(dst_col).cast(pa.int64()),
        })

    e = edges.map_batches(eprep, batch_format="pyarrow").materialize()
    n_edges = e.count()

    # MEASURED scale switch (the e.count() above is free — the edge set
    # materializes for iteration reuse anyway): a dimension-sized edge
    # set (host graphs, site link graphs) runs the whole power iteration
    # in ONE process — two bincount kernels per round instead of a join,
    # two groupbys and a materialize. The distributed path below is the
    # web-graph shape (billions of (node, double) pairs per exchange).
    if broadcast_max is None:
        from webextract.functions.dedup import _SMALL_WINNERS_MAX
        broadcast_max = _SMALL_WINNERS_MAX
    if n_edges <= broadcast_max:
        return _pagerank_inprocess(e, n_iter=n_iter, damping=damping)

    nparts = max(2, min(64, n_edges // 4096 + 1))
    e = e.repartition(nparts).materialize()

    # out-degree per src, attached to the edge list ONCE (rank/out_deg is
    # then a per-edge division each round, no second join). ONE
    # attach_group_size exchange — vectorized, no per-node Python
    # (round-5: the per-src map_groups paid one call per node)
    from .joins import attach_group_size

    edeg = (
        attach_group_size(
            e, on="src",
            schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
            out="out_deg")
        .repartition(nparts).materialize()
    )
    _s_edeg = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                         ("out_deg", pa.int64())])

    # node set = distinct(src) ∪ distinct(dst); dangling = nodes - srcs
    def halves(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks()
        d = batch.column("dst").combine_chunks()
        return pa.table({"node": pa.concat_arrays([s, d])})

    # distinct via groupby().count() projections — keys-only exchanges
    # with no per-distinct-key Python (the map_groups(first) shape paid
    # one UDF call per node)
    nodes = (
        e.map_batches(halves, batch_format="pyarrow")
        .groupby("node").count().select_columns(["node"])
        .repartition(nparts).materialize()
    )
    n = nodes.count()
    srcs = e.groupby("src").count() \
        .select_columns(["src"]).rename_columns({"src": "node"})
    dangling = hash_join(
        nodes, srcs, on="node", how="anti",
        left_schema=pa.schema([("node", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64())]),
    ).materialize()
    n_dangling = dangling.count()

    base = (1.0 - damping) / n

    def init_ranks(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": batch.column("node"),
            "rank": pa.array([1.0 / n] * batch.num_rows, type=pa.float64()),
        }, schema=_S_RANKS)

    ranks = nodes.map_batches(init_ranks,
                              batch_format="pyarrow").materialize()

    for _ in range(n_iter):
        dm = 0.0
        if n_dangling:
            dr = hash_join(
                ranks.rename_columns({"src": "node"}), dangling, on="node",
                how="semi",
                left_schema=pa.schema([("node", pa.int64()),
                                       ("rank", pa.float64())]),
                right_schema=pa.schema([("node", pa.int64())]),
            )
            dm = float(dr.sum("rank") or 0.0)

        def contrib(batch: pa.Table) -> pa.Table:
            import numpy as np

            r = batch.column("rank").to_numpy(zero_copy_only=False)
            d = batch.column("out_deg").to_numpy(zero_copy_only=False)
            return pa.table({
                "node": batch.column("dst"),
                "mass": pa.array(r / d, type=pa.float64()),
            })

        joined = hash_join(edeg, ranks, on="src",
                           left_schema=_s_edeg, right_schema=_S_RANKS)
        inmass = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .groupby("node").aggregate(Sum("mass"))
            .rename_columns({"sum(mass)": "mass"})
        )

        extra = base + damping * dm / n

        def rebase(batch: pa.Table) -> pa.Table:
            import numpy as np

            m = batch.column("mass").to_numpy(zero_copy_only=False)
            return pa.table({
                "src": batch.column("node"),
                "rank": pa.array(damping * m + extra, type=pa.float64()),
            }, schema=_S_RANKS)

        # nodes with no in-edges have no inmass group: union a zero row
        # per node so every node re-bases
        zeros = nodes.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "mass": pa.array([0.0] * b.num_rows,
                                                 type=pa.float64())}),
            batch_format="pyarrow")
        ranks = (
            inmass.union(zeros)
            .groupby("node").aggregate(Sum("mass"))
            .rename_columns({"sum(mass)": "mass"})
            .map_batches(rebase, batch_format="pyarrow")
            .repartition(nparts)
        ).materialize()

    return ranks.rename_columns({"src": "node"})


def triangle_count(edges, *, src_col: str = "src", dst_col: str = "dst",
                   max_group: int = 100_000,
                   broadcast_max: int | None = None):
    """Exact triangle count of the UNDIRECTED graph induced by an edge
    list — the classic two-join formulation (node-iterator with the
    degree-free apex orientation):

    1. canonicalize: drop self-loops, orient every edge ``u < v``, dedup
       — one keys-only groupby;
    2. wedges: self-join the oriented edges on the apex ``u`` with
       ``v1 < v2`` — each unordered vertex triple is generated at most
       once (apex = its minimum vertex), so no over/undercount factor;
    3. closure: semi join the wedge endpoints ``(v1, v2)`` (encoded as a
       single int64 composite key, both sides) against the oriented edge
       set, then count.

    Scale shape picked from the MEASURED distinct-edge count (the
    oriented set materializes for reuse anyway, so the count is free —
    the same measure-then-pick contract as `khop_distances` /
    `dedup.publish_winners`):

    * oriented set fits one block (`broadcast_max` edges, default
      `dedup._SMALL_WINNERS_MAX`): steps 2+3 fuse into ONE single-task
      map — chunked vectorized cross product per apex group + sorted
      searchsorted closure probe — skipping BOTH hash_join exchanges.
    * otherwise the distributed two-join path: two `hash_join`
      exchanges over (int64, int64) rows — keys only, never payload.

    Either way the wedge step is quadratic in the apex's oriented
    degree; a power-law hub exceeds ``max_group`` and RAISES (no silent
    caps) — mitigate upstream by degree-capping or salting, as with any
    skewed hash join.

    Returns a one-row Dataset ``(n_triangles,)``.
    """
    import numpy as np
    import pyarrow.compute as pc

    from .joins import hash_join

    canon_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        # batch-local dedup BEFORE the exchange (each block contributes
        # an edge once): composite (u << 31 | v) unique — node ids are
        # < 2^31 by the module contract (same guard as pair_key below,
        # enforced here too since the pack happens here first)
        if len(s) and (s.max() >= (1 << 31) or d.max() >= (1 << 31)
                       or s.min() < 0 or d.min() < 0):
            raise ValueError("triangle_count: node ids must fit in 31 bits")
        comp = np.unique(np.minimum(s, d) * (1 << 31) + np.maximum(s, d))
        return pa.table({"u": pa.array(comp >> 31),
                         "v": pa.array(comp & ((1 << 31) - 1))},
                        schema=canon_schema)

    # distinct via groupby().count() + projection — a vectorized
    # keys-only exchange (map_groups would invoke Python once PER
    # distinct edge; there is no payload to carry, so count-and-drop
    # is the same rows at C speed)
    oriented = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["u", "v"]).count().select_columns(["u", "v"])
    ).materialize()

    if broadcast_max is None:
        from webextract.functions.dedup import _SMALL_WINNERS_MAX
        broadcast_max = _SMALL_WINNERS_MAX

    count_schema = pa.schema([("n_triangles", pa.int64())])

    if oriented.count() <= broadcast_max:
        def local_count(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"n_triangles": pa.array([0], pa.int64())},
                                schema=count_schema)
            u = b.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
            v = b.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.lexsort((v, u))
            u, v = u[order], v[order]
            pk = u * (1 << 31) + v  # ascending (lexsort by (u, v))
            starts = np.nonzero(np.r_[True, u[1:] != u[:-1]])[0]
            m = np.diff(np.r_[starts, len(u)]).astype(np.int64)
            if int(m.max()) > max_group:
                hub = int(starts[int(np.argmax(m))])
                raise ValueError(
                    f"triangle_count: apex {int(u[hub])} has "
                    f"{int(m.max())} oriented neighbors > max_group="
                    f"{max_group}; degree-cap or salt upstream")
            total = 0
            # chunk apex groups so each chunk's cross product (sum m^2)
            # stays bounded — vectorized within the chunk, never per-row
            msq = m * m
            cum = np.cumsum(msq)
            lim = 1 << 24
            gs = 0
            while gs < len(m):
                base = int(cum[gs] - msq[gs])
                ge = max(int(np.searchsorted(cum, base + lim,
                                             side="right")), gs + 1)
                mm, ss = m[gs:ge], starts[gs:ge]
                M2 = mm * mm
                off2 = np.cumsum(M2) - M2
                t = np.arange(int(M2.sum()), dtype=np.int64)
                gi = np.repeat(np.arange(len(mm)), M2)
                loc = t - off2[gi]
                li = ss[gi] + loc // mm[gi]
                ri = ss[gi] + loc % mm[gi]
                v1, v2 = v[li], v[ri]
                keep = v1 < v2
                wpk = v1[keep] * (1 << 31) + v2[keep]
                pos = np.searchsorted(pk, wpk)
                pos[pos >= len(pk)] = len(pk) - 1
                total += int((pk[pos] == wpk).sum())
                gs = ge
            return pa.table(
                {"n_triangles": pa.array([total], pa.int64())},
                schema=count_schema)

        return oriented.repartition(1).map_batches(
            local_count, batch_format="pyarrow", batch_size=None)

    wedges = hash_join(
        oriented, oriented.rename_columns({"v": "v2"}),
        on="u", max_group=max_group,
        left_schema=canon_schema,
        right_schema=pa.schema([("u", pa.int64()), ("v2", pa.int64())]),
    )

    # encode the (lo, hi) endpoint pair as one int64 composite key:
    # lo * 2^31 + hi — node ids must fit in 31 bits (crawl-host graphs
    # key by host hash bucket; raise loudly if violated).
    def pair_key(a: pa.Table, lo: str, hi: str) -> pa.Table:
        x = a.column(lo).to_numpy(zero_copy_only=False).astype(np.int64)
        y = a.column(hi).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) and (x.max() >= (1 << 31) or y.max() >= (1 << 31)):
            raise ValueError("triangle_count: node ids must fit in 31 bits")
        return pa.table({"pk": pa.array(x * (1 << 31) + y)},
                        schema=pa.schema([("pk", pa.int64())]))

    def wedge_keys(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("pk", pa.int64())]).empty_table()
        v1 = b.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        v2 = b.column("v2").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = v1 < v2
        t = pa.table({"v": pa.array(v1[keep]), "v2": pa.array(v2[keep])})
        return pair_key(t, "v", "v2")

    wk = wedges.map_batches(wedge_keys, batch_format="pyarrow")
    ek = oriented.map_batches(lambda b: pair_key(b, "u", "v"),
                              batch_format="pyarrow")

    closed = hash_join(
        wk, ek, on="pk", how="semi", max_group=max_group,
        left_schema=pa.schema([("pk", pa.int64())]),
        right_schema=pa.schema([("pk", pa.int64())]),
    )

    def to_count(b: pa.Table) -> pa.Table:
        return pa.table({"n_triangles": pa.array([b.num_rows],
                                                 type=pa.int64())})

    # A triangle-free graph leaves `closed` with ZERO blocks, and a fold
    # over no blocks emits no rows at all — union a constant 0 sentinel so
    # the result is always exactly one row (the empty-RefBundle lesson).
    import ray.data

    zero = ray.data.from_arrow(
        pa.table({"n_triangles": pa.array([0], type=pa.int64())}))
    return (
        closed.map_batches(to_count, batch_format="pyarrow")
        .union(zero)
        .repartition(1)
        .map_batches(
            lambda b: pa.table({"n_triangles": pa.array(
                [int(sum(b.column("n_triangles").to_pylist()))],
                type=pa.int64())}),
            batch_format="pyarrow", batch_size=None)
    )


class _AntiFilter:
    """Map-side NOT-IN filter against a broadcast node index (the
    inverse of dedup.SemiFilter — same sorted-array searchsorted probe,
    same int64 key contract)."""

    def __init__(self, index, key_col: str):
        self.index = index
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        import numpy as np

        keys = np.asarray(batch.column(self.key_col).cast(pa.int64())
                          .combine_chunks())
        return batch.filter(pa.array(~self.index.allowed(keys)))


def khop_distances(edges, *, source: int, k: int = 3,
                   src_col: str = "src", dst_col: str = "dst",
                   broadcast_max: int | None = None):
    """BFS shortest-path distances from `source` within `k` hops over a
    directed edge list — the bounded-depth reachability probe (link
    spam-neighborhood checks, crawl frontier scoping).

    Scale shape, picked per round from the MEASURED frontier size (the
    frontier materializes each round anyway, so the count is free —
    the same measure-then-pick contract as `dedup.publish_winners` and
    `treeagg.tree_combine`):

    * frontier + visited fit one broadcast block (`broadcast_max` keys,
      default `dedup._SMALL_WINNERS_MAX` = 4M ids = 32 MB): the edge
      table NEVER shuffles — a map-side task filter (sorted-array
      searchsorted probe via `dedup.ArrayIndex`/`SemiFilter`) keeps
      frontier-source edges, a map-side `_AntiFilter` drops
      already-visited destinations BEFORE the exchange, and one
      keys-only `groupby(node)` distinct is the only shuffle per hop.
      Distances accumulate driver-side (bounded by `broadcast_max`).
    * the first round that would overflow the bound SPILLS permanently
      to the keyed-exchange path: semi hash join (keys + dst through
      the shuffle) + keys-only distinct + anti hash join against the
      visited set — all keys-only exchanges, no driver state.
    """
    import numpy as np
    import ray
    import ray.data

    from webextract.functions.dedup import (
        _SMALL_WINNERS_MAX, ArrayIndex, SemiFilter, _winners_to_array)
    from webextract.functions.joins import hash_join

    if broadcast_max is None:
        broadcast_max = _SMALL_WINNERS_MAX

    node_schema = pa.schema([("node", pa.int64())])
    # materialize ONCE: every hop filters/joins against `e`, and an
    # unmaterialized edge pipeline would re-execute its whole upstream
    # subgraph k times (the same iteration-reuse rule as
    # connected_components above)
    e = edges.rename_columns(
        {src_col: "node", dst_col: "_dst"}).materialize()
    e_schema = pa.schema([("node", pa.int64()), ("_dst", pa.int64())])

    # broadcast-mode driver state (sorted int64 arrays, <= broadcast_max)
    visited_arr = np.array([source], dtype=np.int64)
    frontier_arr = visited_arr
    dist_tables = [pa.table({
        "node": pa.array([source], type=pa.int64()),
        "dist": pa.array([0], type=pa.int64()),
    })]
    spilled = False
    visited = frontier = None  # Dataset-path state, set on spill

    def stamp(b: pa.Table, dist: int) -> pa.Table:
        return pa.table({
            "node": b.column("node"),
            "dist": pa.array([dist] * b.num_rows, type=pa.int64()),
        })

    for r in range(1, k + 1):
        if not spilled:
            fidx = ArrayIndex(ray.put(frontier_arr), int(frontier_arr.size))
            vidx = ArrayIndex(ray.put(visited_arr), int(visited_arr.size))
            new = (
                e.map_batches(SemiFilter(fidx, "node"),
                              batch_format="pyarrow")
                .select_columns(["_dst"])
                .rename_columns({"_dst": "node"})
                .map_batches(_AntiFilter(vidx, "node"),
                             batch_format="pyarrow")
                .groupby("node").count().select_columns(["node"])
                .materialize()
            )
            n_new = new.count()
            if n_new == 0:
                break
            if n_new + visited_arr.size > broadcast_max:
                # spill to the keyed-exchange path for the REST of the
                # walk: rebuild visited/frontier as Datasets
                spilled = True
                stamped = new.map_batches(
                    lambda b, dist=r: stamp(b, dist),
                    batch_format="pyarrow")
                visited = (ray.data.from_arrow(pa.concat_tables(dist_tables))
                           .union(stamped).repartition(4).materialize())
                frontier = stamped.select_columns(["node"]).materialize()
                continue
            new_arr = _winners_to_array(new, "node")
            dist_tables.append(pa.table({
                "node": pa.array(new_arr, type=pa.int64()),
                "dist": pa.array(np.full(new_arr.size, r), type=pa.int64()),
            }))
            visited_arr = np.union1d(visited_arr, new_arr)
            frontier_arr = new_arr
            continue

        hit = hash_join(e, frontier, on="node", how="semi",
                        left_schema=e_schema, right_schema=node_schema)
        cand = (
            hit.select_columns(["_dst"])
            .rename_columns({"_dst": "node"})
            .groupby("node").count().select_columns(["node"])
        )
        new = hash_join(
            cand, visited.select_columns(["node"]), on="node", how="anti",
            left_schema=node_schema, right_schema=node_schema,
        )
        new = new.map_batches(lambda b, dist=r: stamp(b, dist),
                              batch_format="pyarrow").materialize()
        if new.count() == 0:
            break
        visited = visited.union(new).repartition(4).materialize()
        frontier = new.select_columns(["node"]).materialize()
    if not spilled:
        return ray.data.from_arrow(pa.concat_tables(dist_tables))
    return visited
