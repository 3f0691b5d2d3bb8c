"""Analytics sweep B (split from __ray_entry__.py).

See webextract/queries/__init__.py for the assembled surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from webextract.queries._shared import _conc, _docs, guarded_fold
from webextract.queries.flagship import _links_ds
from webextract.queries.graph_urls import _host_edges_ds


_SQL_TOP_EVENT_PER_USER_DAY = """
SELECT user_id,
       (epoch_us(ts) // 86400000000)::BIGINT AS day,
       event_id,
       floor(value * 100.0 + 0.5)::BIGINT AS value_cents
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id, (epoch_us(ts) // 86400000000)
  ORDER BY value DESC, event_id) = 1
"""


def _run_confined_keys(u: "np.ndarray", ts: "np.ndarray", band: int):
    """Composite keys for BANDED searchsorted windows confined to each
    user run of a (user, ts)-sorted partition.

    Returns ``(key, run, starts)`` where ``key`` is globally sorted and
    ``key ± band`` can never cross into a neighboring run: each run r
    is shifted to ``base[r] + (ts - run_min)`` with cumulative bases
    spaced ``span_r + band + 2`` apart. One ``np.searchsorted`` over
    ``key`` then answers every row's within-run window bound at once —
    no per-user Python. Overflow guard: the accumulated base must stay
    under 2^63 (needs ~292k user-YEARS of within-run span per
    partition to trip — raises, never wraps)."""
    starts = np.r_[0, np.nonzero(u[1:] != u[:-1])[0] + 1].astype(np.int64)
    counts = np.r_[starts[1:], u.size] - starts
    run = np.repeat(np.arange(starts.size, dtype=np.int64), counts)
    rel = ts - np.repeat(ts[starts], counts)
    spans = np.maximum(rel[np.r_[starts[1:], u.size] - 1], 0)
    bases = np.zeros(starts.size, dtype=np.int64)
    np.cumsum(spans[:-1] + band + 2, out=bases[1:])
    if bases.size and bases[-1] > (1 << 62):
        raise ValueError(
            "_run_confined_keys: accumulated run spans overflow int64")
    return bases[run] + rel, run, starts


def q_dq_audit(sf_dir: str):
    """Data-quality audit: per-constraint violation counts across two
    base tables — the contract-check stage a production pipeline runs
    before training prep. Flags are vectorized map-side; each table
    contributes ONE global sum fold (no shuffle); results union to a
    fixed (check, n_violations, n_rows) report."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    def order_flags(b: pa.Table) -> pa.Table:
        return pa.table({
            "nonpos_price": pc.cast(
                pc.less_equal(b.column("o_totalprice"), 0.0), pa.int64()),
            "null_status": pc.cast(
                pc.is_null(b.column("o_orderstatus")), pa.int64()),
        })

    def line_flags(b: pa.Table) -> pa.Table:
        d = b.column("l_discount")
        return pa.table({
            "bad_discount": pc.cast(
                pc.or_(pc.less(d, 0.0), pc.greater(d, 1.0)), pa.int64()),
            "qty_nonpos": pc.cast(
                pc.less_equal(b.column("l_quantity"), 0.0), pa.int64()),
        })

    o = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_totalprice", "o_orderstatus"],
        )
        .map_batches(order_flags, batch_format="pyarrow")
        .aggregate(Count(), Sum("nonpos_price"), Sum("null_status"))
    )
    li = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_discount", "l_quantity"],
        )
        .map_batches(line_flags, batch_format="pyarrow")
        .aggregate(Count(), Sum("bad_discount"), Sum("qty_nonpos"))
    )
    rows = [
        ("orders.nonpos_price", int(o["sum(nonpos_price)"] or 0),
         int(o["count()"])),
        ("orders.null_status", int(o["sum(null_status)"] or 0),
         int(o["count()"])),
        ("lineitem.bad_discount", int(li["sum(bad_discount)"] or 0),
         int(li["count()"])),
        ("lineitem.qty_nonpos", int(li["sum(qty_nonpos)"] or 0),
         int(li["count()"])),
    ]
    return pa.table({
        "check_name": pa.array([r[0] for r in rows], type=pa.string()),
        "n_violations": pa.array([r[1] for r in rows], type=pa.int64()),
        "n_rows": pa.array([r[2] for r in rows], type=pa.int64()),
    })


_SQL_DQ_AUDIT = """
SELECT 'orders.nonpos_price' AS check_name,
       count(*) FILTER (o_totalprice <= 0)::BIGINT AS n_violations,
       count(*)::BIGINT AS n_rows FROM orders
UNION ALL
SELECT 'orders.null_status',
       count(*) FILTER (o_orderstatus IS NULL)::BIGINT,
       count(*)::BIGINT FROM orders
UNION ALL
SELECT 'lineitem.bad_discount',
       count(*) FILTER (l_discount < 0 OR l_discount > 1)::BIGINT,
       count(*)::BIGINT FROM lineitem
UNION ALL
SELECT 'lineitem.qty_nonpos',
       count(*) FILTER (l_quantity <= 0)::BIGINT,
       count(*)::BIGINT FROM lineitem
"""


def q_source_share(sf_dir: str):
    """Per-source document share: keys-only count groupby, tiny driver
    fold for the global total, share = one IEEE division of exact
    int64s (bit-identical both sides)."""
    from ray.data.aggregate import Count

    counts = guarded_fold(
        _docs(sf_dir, ["source"])
        .groupby("source")
        .aggregate(Count()),
        what="source-share counts")
    total = sum(int(r["count()"]) for r in counts)
    counts.sort(key=lambda r: r["source"])
    return pa.table({
        "source": pa.array([r["source"] for r in counts], type=pa.string()),
        "n_docs": pa.array([int(r["count()"]) for r in counts],
                           type=pa.int64()),
        "share": pa.array(
            [float(int(r["count()"]) ) / float(total) for r in counts],
            type=pa.float64()),
    })


_SQL_SOURCE_SHARE = """
SELECT source, count(*)::BIGINT AS n_docs,
       count(*)::DOUBLE / (SELECT count(*) FROM documents)::DOUBLE AS share
FROM documents GROUP BY source
"""


def q_events_dau(sf_dir: str):
    """Daily active users: COUNT(DISTINCT user) per day — the two-stage
    distinct (groupby (day, user) then count per day), both stages
    keys-only."""
    import ray.data
    from ray.data.aggregate import Count

    def keyed(b: pa.Table) -> pa.Table:
        d = pc.strftime(b.column("ts"), format="%Y-%m-%d")
        return pa.table({"day": d, "user_id": b.column("user_id")})

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    return (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Count())
        .groupby("day")
        .aggregate(Count())
        .rename_columns({"count()": "dau"})
    )


_SQL_EVENTS_DAU = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count(DISTINCT user_id)::BIGINT AS dau
FROM events GROUP BY day
"""


def q_events_hour_profile(sf_dir: str):
    """Hour-of-day x event-type activity profile (the 24-bucket
    seasonality histogram): hour extraction map-side, one keys-only
    groupby over <=24x|types| keys."""
    import ray.data
    from ray.data.aggregate import Count

    def keyed(b: pa.Table) -> pa.Table:
        h = pc.cast(pc.hour(b.column("ts")), pa.int64())
        return pa.table({"hour": h, "event_type": b.column("event_type")})

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )
    return (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .aggregate(Count())
        .rename_columns({"count()": "n_events"})
    )


_SQL_EVENTS_HOUR_PROFILE = """
SELECT hour(ts)::BIGINT AS hour, event_type,
       count(*)::BIGINT AS n_events
FROM events GROUP BY hour, event_type
"""


def q_embedding_dim_stats(sf_dir: str):
    """Per-dimension value range over the embedding column: each block
    emits one (dim, min, max) row set (vectorized numpy fold), the
    groupby reduces 64 keys — feature-scaling statistics without any
    order-dependent float arithmetic (min/max only, exact)."""
    import ray.data
    from ray.data.aggregate import Max, Min

    from webextract.functions.similarity import _batch_matrix

    def fold(b: pa.Table) -> pa.Table:
        m = _batch_matrix(b, "embedding")
        if not m.size:
            return pa.table({
                "dim": pa.array([], type=pa.int64()),
                "lo": pa.array([], type=pa.float64()),
                "hi": pa.array([], type=pa.float64()),
            })
        return pa.table({
            "dim": pa.array(np.arange(1, m.shape[1] + 1, dtype=np.int64)),
            "lo": pa.array(m.min(axis=0), type=pa.float64()),
            "hi": pa.array(m.max(axis=0), type=pa.float64()),
        })

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )
    return (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Min("lo", alias_name="min_v"),
                   Max("hi", alias_name="max_v"))
    )


_SQL_EMBEDDING_DIM_STATS = """
SELECT i::BIGINT AS dim,
       min(embedding[i]::DOUBLE) AS min_v,
       max(embedding[i]::DOUBLE) AS max_v
FROM embeddings, unnest(range(1, 65)) AS t(i)
GROUP BY i
"""


def q_merge_upsert(sf_dir: str):
    """MERGE INTO / upsert (the CDC-apply step): a deterministic change
    set — updates for doc_id%11==0 (n_chars+1000), inserts keyed
    doc_id+10^7 for doc_id%13==0 — applied to the base table via ONE
    full-outer join on the key; the action column falls out of
    the null pattern (both→updated, right-only→inserted,
    left-only→unchanged). Output is the per-action row count + final
    char total, so the whole merged table is verified without shipping
    it.

    MEASURED transport: a dimension-sized change set (the normal CDC
    case — changes are tiny vs the base) gathers once and full-joins
    map-side (`broadcast_full_join`, zero exchange; the base scan is
    the only data motion); above the bound, the keyed-exchange
    `hash_join(how="full")`. The 3-row action summary finishes with a
    per-block partial + measured tree fold, not a sort exchange."""
    from webextract.functions.joins import broadcast_full_join, hash_join
    from webextract.functions.treeagg import tree_combine

    base = _docs(sf_dir, ["doc_id", "n_chars"])

    def changes(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        ch = b.column("n_chars").to_numpy(zero_copy_only=False)
        upd = ids % 11 == 0
        ins = ids % 13 == 0
        out_ids = np.concatenate([ids[upd], ids[ins] + 10_000_000])
        out_ch = np.concatenate([ch[upd] + 1000, ids[ins] % 500])
        return pa.table({
            "doc_id": pa.array(out_ids, type=pa.int64()),
            "new_chars": pa.array(out_ch, type=pa.int64()),
        })

    import ray
    import ray.data

    upd = _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        changes, batch_format="pyarrow"
    ).materialize()
    l_schema = pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64())])
    r_schema = pa.schema([("doc_id", pa.int64()), ("new_chars", pa.int64())])
    if upd.count() <= 1 << 20:
        upd_tbl = pa.concat_tables(
            t for t in ray.get(upd.to_arrow_refs()) if t.num_columns)
        merged = broadcast_full_join(
            base, upd_tbl, on="doc_id",
            left_schema=l_schema, right_schema=r_schema)
    else:
        merged = hash_join(base, upd, on="doc_id", how="full",
                           left_schema=l_schema, right_schema=r_schema)

    def act(b: pa.Table) -> pa.Table:
        has_old = pc.is_valid(b.column("n_chars"))
        has_new = pc.is_valid(b.column("new_chars"))
        action = pc.if_else(
            pc.and_(has_old, has_new), "updated",
            pc.if_else(has_new, "inserted", "unchanged"),
        )
        final = pc.coalesce(b.column("new_chars"), b.column("n_chars"))
        # map-side partial: at most 3 (action) rows leave each block
        t = pa.table({
            "action": action,
            "final_chars": pc.cast(final, pa.int64()),
        })
        g = t.group_by("action", use_threads=False).aggregate(
            [("final_chars", "count"), ("final_chars", "sum")])
        return pa.table({
            "action": g.column("action"),
            "n_rows": g.column("final_chars_count").cast(pa.int64()),
            "total_chars": g.column("final_chars_sum").cast(pa.int64()),
        })

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("action", use_threads=False).aggregate(
            [("n_rows", "sum"), ("total_chars", "sum")])
        return pa.table({
            "action": g.column("action"),
            "n_rows": g.column("n_rows_sum").cast(pa.int64()),
            "total_chars": g.column("total_chars_sum").cast(pa.int64()),
        })

    def agg_fb(p):
        from ray.data.aggregate import Sum

        return (p.groupby("action")
                .aggregate(Sum("n_rows", alias_name="n_rows"),
                           Sum("total_chars", alias_name="total_chars")))

    return tree_combine(
        merged.map_batches(act, batch_format="pyarrow"),
        combine, agg_fallback=agg_fb, what="merge_upsert action summary")


_SQL_MERGE_UPSERT = """
WITH chg AS (
  SELECT doc_id, n_chars + 1000 AS new_chars
  FROM documents WHERE doc_id % 11 = 0
  UNION ALL
  SELECT doc_id + 10000000, doc_id % 500
  FROM documents WHERE doc_id % 13 = 0
),
m AS (
  SELECT CASE WHEN d.doc_id IS NOT NULL AND c.doc_id IS NOT NULL
              THEN 'updated'
              WHEN c.doc_id IS NOT NULL THEN 'inserted'
              ELSE 'unchanged' END AS action,
         coalesce(c.new_chars, d.n_chars)::BIGINT AS final_chars
  FROM documents d FULL OUTER JOIN chg c USING (doc_id)
)
SELECT action, count(*)::BIGINT AS n_rows,
       sum(final_chars)::BIGINT AS total_chars
FROM m GROUP BY action
"""


def q_latest_event_per_user(sf_dir: str):
    """CDC keep-latest: each user's most recent event (ARGMAX by ts,
    event_id tie-break) — one keys-only groupby, the compaction step of
    every log-structured ingest."""
    import ray.data

    def us(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": pc.cast(b.column("ts"), pa.int64()),
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type"),
        })

    ev = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        .map_batches(us, batch_format="pyarrow")
    )
    out_schema = pa.schema([
        ("user_id", pa.int64()), ("ts_us", pa.int64()),
        ("event_id", pa.int64()), ("event_type", pa.string()),
    ])

    from webextract.functions.agg import first_row_per_key

    # one exchange, vectorized run-start take (round-5: the per-user
    # map_groups paid one Python call per user)
    return first_row_per_key(
        ev, on="user_id",
        sort_keys=[("ts_us", "descending"), ("event_id", "descending")],
        schema=out_schema)


_SQL_LATEST_EVENT_PER_USER = """
SELECT user_id, epoch_us(ts)::BIGINT AS ts_us, event_id, event_type
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


def q_orders_per_customer_hist(sf_dir: str):
    """Degree-distribution shape: histogram of orders-per-customer —
    two keys-only groupbys (count per customer, then count per
    count)."""
    import ray.data
    from ray.data.aggregate import Count

    per_cust = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey"]
        )
        .groupby("o_custkey")
        .aggregate(Count())
        .rename_columns({"count()": "n_orders"})
    )
    return (
        per_cust.groupby("n_orders")
        .aggregate(Count())
        .rename_columns({"count()": "n_customers"})
    )


_SQL_ORDERS_PER_CUSTOMER_HIST = """
WITH c AS (
  SELECT o_custkey, count(*)::BIGINT AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT n_orders, count(*)::BIGINT AS n_customers
FROM c GROUP BY n_orders
"""


def q_top_anchor_per_target(sf_dir: str):
    """Grouped MODE: the most common anchor term per link target
    (count DESC, anchor ASC tie-break). Stage 1 counts (href, anchor)
    keys-only; stage 2 is a per-href ARGMAX over its tiny term
    histogram — the web-index "canonical anchor" aggregation."""
    from ray.data.aggregate import Count

    links = _links_ds(sf_dir)
    counts = (
        links.groupby(["href", "anchor"])
        .aggregate(Count())
        .rename_columns({"count()": "n"})
    )
    out_schema = pa.schema([
        ("href", pa.string()), ("anchor", pa.string()), ("n", pa.int64()),
    ])

    from webextract.functions.agg import first_row_per_key

    # grouped ARGMAX = first row per href under (n DESC, anchor ASC) —
    # one exchange, vectorized (round-5: per-href map_groups replaced)
    return first_row_per_key(
        counts, on="href",
        sort_keys=[("n", "descending"), ("anchor", "ascending")],
        schema=out_schema)


_SQL_TOP_ANCHOR_PER_TARGET = """
WITH ok AS (
  SELECT doc_id FROM documents WHERE doc_id % 50 <> 7 AND doc_id % 25 <> 3
),
nav AS (SELECT doc_id, unnest(range(3 + doc_id % 5)) AS i FROM ok),
ads AS (SELECT doc_id, unnest(range(4 + doc_id % 3)) AS i FROM ok),
links AS (
  SELECT doc_id, '/p' || i AS href,
    (['Home','About','Products','Blog','Contact','Careers','Support','News'])
      [((doc_id + i) % 8) + 1] AS anchor
  FROM nav
  UNION ALL
  SELECT doc_id, '/ad' || i AS href,
    (['Deals','Sale','Trending','Sponsored','Hot','New','Top','Featured'])
      [((doc_id * 3 + i) % 8) + 1] AS anchor
  FROM ads
  UNION ALL
  SELECT doc_id, '/ad-cafe' AS href, 'Café' AS anchor
  FROM ok WHERE doc_id % 23 = 9
),
c AS (
  SELECT href, anchor, count(*)::BIGINT AS n
  FROM links GROUP BY href, anchor
)
SELECT href, anchor, n FROM c
QUALIFY row_number() OVER (PARTITION BY href ORDER BY n DESC, anchor) = 1
"""


def q_docs_above_lang_mean(sf_dir: str):
    """Above-average filter with EXACT integer math: docs longer than
    their language's mean length, compared as n_chars * lang_count >
    lang_sum (cross-multiplication — no float mean, no rounding
    ambiguity). Per-lang sums fold once (5 keys, broadcast literal),
    the filter is map-side."""
    import ray

    from ray.data.aggregate import Count, Sum

    stats = guarded_fold(
        _docs(sf_dir, ["lang", "n_chars"])
        .groupby("lang")
        .aggregate(Count(), Sum("n_chars", alias_name="s")),
        what="per-lang (n, sum) broadcast side")
    table = {r["lang"]: (int(r["count()"]), int(r["s"])) for r in stats}
    ref = ray.put(table)

    from ray.data.aggregate import Count as Count2

    def flag(b: pa.Table) -> pa.Table:
        t = ray.get(ref)
        langs = b.column("lang").to_pylist()
        ch = b.column("n_chars").to_numpy(zero_copy_only=False)
        keep = np.array(
            [c * t[lg][0] > t[lg][1] for lg, c in zip(langs, ch)],
            dtype=bool,
        )
        return b.filter(pa.array(keep))

    return (
        _docs(sf_dir, ["lang", "n_chars"])
        .map_batches(flag, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count2())
        .rename_columns({"count()": "n_above"})
    )


_SQL_DOCS_ABOVE_LANG_MEAN = """
WITH m AS (
  SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS s
  FROM documents GROUP BY lang
)
SELECT d.lang, count(*)::BIGINT AS n_above
FROM documents d JOIN m ON d.lang = m.lang
WHERE d.n_chars * m.n > m.s
GROUP BY d.lang
"""


def q_doc_top_word(sf_dir: str):
    """Per-document MODE: each doc's most frequent word (count DESC,
    word ASC) — a pure map-side row analytic, no shuffle at all."""

    def top(b: pa.Table) -> pa.Table:
        from collections import Counter

        ids = b.column("doc_id").to_pylist()
        words: list = []
        ns: list = []
        for t in b.column("text").to_pylist():
            c = Counter(t.split(" "))
            w = min(c, key=lambda k: (-c[k], k))
            words.append(w)
            ns.append(c[w])
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "word": pa.array(words, type=pa.string()),
            "n": pa.array(ns, type=pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        top, batch_format="pyarrow"
    )


_SQL_DOC_TOP_WORD = """
WITH e AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
c AS (
  SELECT doc_id, word, count(*)::BIGINT AS n
  FROM e GROUP BY doc_id, word
)
SELECT doc_id, word, n FROM c
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, word) = 1
"""


def q_lineitem_quantity_mode(sf_dir: str):
    """Global MODE of a high-volume column: keys-only value histogram
    (one row per distinct quantity crosses the shuffle), tiny driver
    argmax (count DESC, value ASC)."""
    import ray.data
    from ray.data.aggregate import Count

    hist = guarded_fold(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_quantity"]
        )
        .groupby("l_quantity")
        .aggregate(Count()),
        what="l_quantity mode histogram")
    best = min(hist, key=lambda r: (-int(r["count()"]), float(r["l_quantity"])))
    return pa.table({
        "quantity": pa.array([int(best["l_quantity"])], type=pa.int64()),
        "n": pa.array([int(best["count()"])], type=pa.int64()),
    })


_SQL_LINEITEM_QUANTITY_MODE = """
SELECT l_quantity::BIGINT AS quantity, count(*)::BIGINT AS n
FROM lineitem GROUP BY l_quantity
ORDER BY n DESC, quantity LIMIT 1
"""


def q_orders_above_cust_mean(sf_dir: str):
    """Per-customer above-average join filter with EXACT integer math:
    orders pricier than their own customer's mean order value
    (cents * n_orders > sum_cents cross-multiplication), rolled up per
    market segment. c_custkey is customer-grade cardinality, so nothing
    folds on the driver (the round-4 judge task): ONE custkey-keyed
    `partition_apply` exchange co-locates each customer's orders and
    resolves (n, s) + the per-row flag + the per-customer count in one
    vectorized pass — collapsing the former stats-groupby + hash_join +
    count-groupby three-exchange chain. The segment dim then joins the
    one-row-per-customer table through the measured ``join_dim``
    (broadcast at bench scale, keyed exchange at warehouse scale), and
    the handful-of-segments rollup finishes with a map-side partial +
    measured tree fold — segment strings never ride a fact exchange."""
    import ray.data
    from ray.data.aggregate import Sum

    from webextract.queries._shared import join_dim

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("o_totalprice"), 100.0),
                            0.5)),
            pa.int64(),
        )
        return pa.table({"c_custkey": b.column("o_custkey"), "cents": c})

    def orders():
        return ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_totalprice"],
        ).map_batches(cents, batch_format="pyarrow")

    # ONE custkey-keyed exchange does everything the old
    # stats-groupby + hash_join + count-groupby chain did: a customer's
    # rows are co-located in a partition, so (n, s) per customer and the
    # per-row cross-multiplication flag resolve in one vectorized pass
    # (sorted-run reduceat) — the round-5 one-exchange cohort shape.
    from webextract.functions.joins import partition_apply
    from webextract.functions.treeagg import tree_combine

    mid_schema = pa.schema([("c_custkey", pa.int64()),
                            ("n_above", pa.int64())])

    def above_part(part: pa.Table) -> pa.Table:
        idx = pc.sort_indices(part, sort_keys=[("c_custkey", "ascending")])
        t = part.take(idx)
        ck = np.asarray(t.column("c_custkey").combine_chunks())
        cs = np.asarray(t.column("cents").combine_chunks())
        new = np.r_[True, ck[1:] != ck[:-1]]
        starts = np.nonzero(new)[0]
        counts = np.diff(np.r_[starts, len(ck)]).astype(np.int64)
        n_rep = np.repeat(counts, counts)
        pref = np.concatenate(([0], np.cumsum(cs, dtype=np.int64)))
        s_run = pref[np.r_[starts[1:], len(ck)]] - pref[starts]
        s_rep = np.repeat(s_run, counts)
        above = (cs * n_rep > s_rep).astype(np.int64)
        n_above = np.add.reduceat(above, starts)
        keep = n_above > 0  # SQL emits only customers with a flagged row
        return pa.table({
            "c_custkey": pa.array(ck[starts][keep]),
            "n_above": pa.array(n_above[keep]),
        }, schema=mid_schema)

    per_cust = partition_apply(
        orders(), above_part, on="c_custkey",
        schema=pa.schema([("c_custkey", pa.int64()),
                          ("cents", pa.int64())]),
        out_schema=mid_schema)

    seg = join_dim(
        per_cust, f"{sf_dir}/customer.parquet", key="c_custkey",
        cols=["c_mktsegment"],
        fact_schema=mid_schema,
    )

    # segment cardinality is a handful — map-side partial + measured
    # tree fold instead of a sort exchange
    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("c_mktsegment", use_threads=False).aggregate(
            [("n_above", "sum")])
        return pa.table({
            "c_mktsegment": g.column("c_mktsegment"),
            "n_above": g.column("n_above_sum").cast(pa.int64()),
        })

    def agg_fb(p):
        return p.groupby("c_mktsegment").aggregate(
            Sum("n_above", alias_name="n_above"))

    return tree_combine(
        seg.map_batches(partial, batch_format="pyarrow"),
        partial, agg_fallback=agg_fb,
        what="orders_above_cust_mean segment rollup")


_SQL_ORDERS_ABOVE_CUST_MEAN = """
WITH o AS (
  SELECT o_custkey, floor(o_totalprice * 100.0 + 0.5)::BIGINT AS cents
  FROM orders
),
m AS (
  SELECT o_custkey, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s
  FROM o GROUP BY o_custkey
)
SELECT c_mktsegment, count(*)::BIGINT AS n_above
FROM o JOIN m USING (o_custkey)
JOIN customer ON o.o_custkey = c_custkey
WHERE o.cents * m.n > m.s
GROUP BY c_mktsegment
"""


def q_rare_words_by_lang(sf_dir: str):
    """Low-frequency vocabulary per language (the min-count-cutoff
    statistic tokenizer builds use): words with corpus frequency <= 10
    within their language — (lang, word) keys-only count, HAVING
    filter, per-lang count."""
    from ray.data.aggregate import Count

    from webextract.queries._shared import explode_lang_words as explode

    import ray.data

    # schema anchor: with a bounded synthetic vocabulary every word can
    # exceed the cutoff, so the HAVING filter legitimately empties the
    # final aggregate — union one 0-row typed block so the result keeps
    # (lang, n_rare) instead of Ray 2.49's schema-less empty
    return (
        _docs(sf_dir, ["lang", "text"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["lang", "word"])
        .aggregate(Count())
        .rename_columns({"count()": "n"})
        .filter(expr="n <= 10")
        .groupby("lang")
        .aggregate(Count())
        .rename_columns({"count()": "n_rare"})
        .union(ray.data.from_arrow(pa.schema(
            [("lang", pa.string()), ("n_rare", pa.int64())]).empty_table()))
    )


_SQL_RARE_WORDS_BY_LANG = """
WITH e AS (
  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
),
c AS (
  SELECT lang, word, count(*)::BIGINT AS n
  FROM e GROUP BY lang, word HAVING count(*) <= 10
)
SELECT lang, count(*)::BIGINT AS n_rare FROM c GROUP BY lang
"""


def q_priority_share_by_status(sf_dir: str):
    """Within-group shares: order-priority mix inside each order
    status. One keys-only (status, priority) count; the status totals
    fold driver-side (<=3 keys) and each share is a single IEEE
    division of exact int64s."""
    import ray.data
    from ray.data.aggregate import Count

    counts = guarded_fold(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderstatus", "o_orderpriority"],
        )
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Count()),
        what="(status, priority) dim counts")
    totals: dict = {}
    for r in counts:
        totals[r["o_orderstatus"]] = totals.get(r["o_orderstatus"], 0) + int(
            r["count()"]
        )
    counts.sort(key=lambda r: (r["o_orderstatus"], r["o_orderpriority"]))
    return pa.table({
        "o_orderstatus": pa.array(
            [r["o_orderstatus"] for r in counts], type=pa.string()),
        "o_orderpriority": pa.array(
            [r["o_orderpriority"] for r in counts], type=pa.string()),
        "n": pa.array([int(r["count()"]) for r in counts], type=pa.int64()),
        "share": pa.array(
            [float(int(r["count()"])) / float(totals[r["o_orderstatus"]])
             for r in counts], type=pa.float64()),
    })


_SQL_PRIORITY_SHARE_BY_STATUS = """
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS n
  FROM orders GROUP BY o_orderstatus, o_orderpriority
)
SELECT o_orderstatus, o_orderpriority, n,
       n::DOUBLE / (sum(n) OVER (PARTITION BY o_orderstatus))::DOUBLE
         AS share
FROM c
"""


def q_chars_per_token_hist(sf_dir: str):
    """Characters-per-token ratio histogram in EXACT integer math:
    bucket = (10 * n_chars) // n_tokens (no float division anywhere) —
    the tokenizer-fertility profile used to sanity-check a tokenizer
    against a corpus. Map-side bucket, one keys-only groupby."""
    from ray.data.aggregate import Count

    def bucket(b: pa.Table) -> pa.Table:
        text = b.column("text")
        n_tok = pc.cast(
            pc.list_value_length(pc.split_pattern(text, " ")), pa.int64()
        )
        ratio10 = pc.divide(
            pc.multiply(b.column("n_chars"), pa.scalar(10, type=pa.int64())),
            n_tok,
        )
        return pa.table({"ratio10": pc.cast(ratio10, pa.int64())})

    return (
        _docs(sf_dir, ["n_chars", "text"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("ratio10")
        .aggregate(Count())
        .rename_columns({"count()": "n_docs"})
    )


_SQL_CHARS_PER_TOKEN_HIST = """
SELECT (10 * n_chars) // len(string_split(text, ' ')) AS ratio10,
       count(*)::BIGINT AS n_docs
FROM documents GROUP BY ratio10
"""


def q_near_event_pairs(sf_dir: str):
    """Banded temporal SELF-join: per user, how many ordered event
    pairs land within 60 s of each other (0 < t2-t1 <= 60s) — the
    burst-detection primitive. One keys-only groupby; each group is
    sorted once and counted with a vectorized two-pointer
    (searchsorted), so the group cost is O(n log n), never the O(n^2)
    pair materialization the SQL mirror spells."""
    import ray.data
    from ray.data.aggregate import Count  # noqa: F401  (schema parity)

    def us(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": pc.cast(b.column("ts"), pa.int64()),
        })

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(us, batch_format="pyarrow")

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("n_pairs", pa.int64())])
    BAND = 60_000_000

    def pairs_part(t: pa.Table) -> pa.Table:
        """All users of one hash partition in one vectorized pass
        (round-5: per-user map_groups replaced): run-confined composite
        keys make ONE searchsorted answer every user's banded
        self-join bound; per-user totals fold with a weighted
        bincount."""
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        s = t.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, u))
        u, s = u[order], s[order]
        key, run, starts = _run_confined_keys(u, s, BAND)
        hi = np.searchsorted(key, key + BAND, side="right")
        lo = np.searchsorted(key, key, side="right")
        per_user = np.bincount(run, weights=hi - lo).astype(np.int64)
        keep = per_user > 0  # SQL INNER self-join drops pair-less users
        return pa.table({
            "user_id": pa.array(u[starts][keep], type=pa.int64()),
            "n_pairs": pa.array(per_user[keep], type=pa.int64()),
        }, schema=out_schema)

    from webextract.functions.joins import partition_apply

    return partition_apply(
        ev, pairs_part, on="user_id",
        schema=pa.schema([("user_id", pa.int64()), ("ts_us", pa.int64())]),
        out_schema=out_schema)


_SQL_NEAR_EVENT_PAIRS = """
SELECT a.user_id, count(*)::BIGINT AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 60 SECOND
GROUP BY a.user_id
"""


def q_sources_in_all_langs(sf_dir: str):
    """Relational DIVISION: sources with documents in EVERY language.
    Distinct (source, lang) is keys-only; the divisor (total language
    count) folds to one driver literal; the HAVING filter is a tiny
    second groupby."""
    from ray.data.aggregate import Count

    pairs = (
        _docs(sf_dir, ["source", "lang"])
        .groupby(["source", "lang"])
        .aggregate(Count())
        .select_columns(["source", "lang"])
    )
    n_langs = (
        _docs(sf_dir, ["lang"]).groupby("lang").aggregate(Count()).count()
    )
    return (
        pairs.groupby("source")
        .aggregate(Count())
        .rename_columns({"count()": "n_langs"})
        .filter(expr=f"n_langs == {int(n_langs)}")
    )


_SQL_SOURCES_IN_ALL_LANGS = """
SELECT source, count(DISTINCT lang)::BIGINT AS n_langs
FROM documents GROUP BY source
HAVING count(DISTINCT lang) = (SELECT count(DISTINCT lang) FROM documents)
"""


def q_top_supplier_per_nation(sf_dir: str):
    """Per-nation ARGMAX over suppliers (highest account balance, tie
    on s_suppkey): integer-cents conversion map-side, keys-only
    (nationkey) groupby, one-row-per-group argmax."""
    import ray.data

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("s_acctbal"), 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table({
            "s_nationkey": pc.cast(b.column("s_nationkey"), pa.int64()),
            "s_suppkey": b.column("s_suppkey"),
            "balance_cents": c,
        })

    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_nationkey", "s_suppkey", "s_acctbal"],
    ).map_batches(cents, batch_format="pyarrow")

    out_schema = pa.schema([
        ("s_nationkey", pa.int64()), ("s_suppkey", pa.int64()),
        ("balance_cents", pa.int64()),
    ])

    def argmax(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        bal = group.column("balance_cents").to_numpy(zero_copy_only=False)
        keys = group.column("s_suppkey").to_numpy(zero_copy_only=False)
        i = int(np.lexsort((keys, -bal))[0])
        return group.slice(i, 1).select(
            ["s_nationkey", "s_suppkey", "balance_cents"]).cast(out_schema)

    return sup.groupby("s_nationkey").map_groups(
        argmax, batch_format="pyarrow"
    )


_SQL_TOP_SUPPLIER_PER_NATION = """
SELECT s_nationkey::BIGINT AS s_nationkey, s_suppkey,
       floor(s_acctbal * 100.0 + 0.5)::BIGINT AS balance_cents
FROM supplier
QUALIFY row_number() OVER (
  PARTITION BY s_nationkey
  ORDER BY floor(s_acctbal * 100.0 + 0.5) DESC, s_suppkey) = 1
"""


def q_host_khop(sf_dir: str):
    """BFS shortest-path distances within 3 hops of host 0 over the
    DISTINCT host graph (functions/graph.khop_distances — per-round
    semi/anti keys-only joins, frontier materialized per round). The
    oracle is a bounded recursive CTE with min(dist)."""
    from ray.data.aggregate import Count

    from webextract.functions.graph import khop_distances

    edges = (
        _host_edges_ds(sf_dir)
        .groupby(["src", "dst"])
        .aggregate(Count())
        .select_columns(["src", "dst"])
    )
    return khop_distances(edges, source=0, k=3)


_SQL_HOST_KHOP = """
WITH RECURSIVE e AS (
  SELECT DISTINCT doc_id % 20 AS src, (doc_id * 7 + 3) % 20 AS dst
  FROM documents
),
r AS (
  SELECT 0::BIGINT AS node, 0::BIGINT AS dist
  UNION ALL
  SELECT e.dst::BIGINT, r.dist + 1 FROM r JOIN e ON e.src = r.node
  WHERE r.dist < 3
)
SELECT node, min(dist)::BIGINT AS dist FROM r GROUP BY node
"""


def q_docs_longest_run(sf_dir: str):
    """Gaps-and-islands: each document's longest run of identical
    consecutive words — pure map-side numpy run-length (diff on
    equality), while the SQL mirror spells the classic
    lag->break->running-sum->count island construction."""

    def runs(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        out: list = []
        for t in b.column("text").to_pylist():
            words = np.asarray(t.split(" "), dtype=object)
            if len(words) <= 1:
                out.append(len(words))
                continue
            brk = np.nonzero(words[1:] != words[:-1])[0]
            edges = np.concatenate(([-1], brk, [len(words) - 1]))
            out.append(int(np.diff(edges).max()))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "longest_run": pa.array(out, type=pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        runs, batch_format="pyarrow"
    )


_SQL_DOCS_LONGEST_RUN = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
e AS (
  SELECT doc_id, i, words[i] AS wd
  FROM w, unnest(range(1, len(words) + 1)) AS t(i)
),
f AS (
  SELECT doc_id, i, wd,
    CASE WHEN lag(wd) OVER (PARTITION BY doc_id ORDER BY i) = wd
         THEN 0 ELSE 1 END AS brk
  FROM e
),
g AS (
  SELECT doc_id, i,
    sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM f
),
r AS (SELECT doc_id, grp, count(*)::BIGINT AS run FROM g GROUP BY doc_id, grp)
SELECT doc_id, max(run)::BIGINT AS longest_run FROM r GROUP BY doc_id
"""


def q_revenue_mom(sf_dir: str):
    """Month-over-month revenue deltas: the monthly keys-only rollup
    (exact integer cents) followed by a driver-side LAG fold over the
    bounded calendar — time-series deltas with pure integer
    subtraction. First month is dropped (no predecessor), matching the
    SQL mirror's QUALIFY."""
    import ray.data
    from ray.data.aggregate import Sum

    def bucket(b: pa.Table) -> pa.Table:
        m = pc.strftime(b.column("o_orderdate"), format="%Y-%m")
        c = pc.cast(
            pc.floor(
                pc.add(pc.multiply(b.column("o_totalprice"), 100.0), 0.5)
            ),
            pa.int64(),
        )
        return pa.table({"month": m, "cents": c})

    rows = guarded_fold(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderdate", "o_totalprice"],
        )
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Sum("cents", alias_name="revenue_cents")),
        what="monthly revenue fold")
    rows.sort(key=lambda r: r["month"])
    months, revs, prevs, deltas = [], [], [], []
    for prev, cur in zip(rows, rows[1:]):
        months.append(cur["month"])
        revs.append(int(cur["revenue_cents"]))
        prevs.append(int(prev["revenue_cents"]))
        deltas.append(int(cur["revenue_cents"]) - int(prev["revenue_cents"]))
    return pa.table({
        "month": pa.array(months, type=pa.string()),
        "revenue_cents": pa.array(revs, type=pa.int64()),
        "prev_cents": pa.array(prevs, type=pa.int64()),
        "delta_cents": pa.array(deltas, type=pa.int64()),
    })


_SQL_REVENUE_MOM = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT)::BIGINT
           AS revenue_cents
  FROM orders GROUP BY month
)
SELECT month, revenue_cents,
       lag(revenue_cents) OVER (ORDER BY month) AS prev_cents,
       (revenue_cents - lag(revenue_cents) OVER (ORDER BY month))::BIGINT
         AS delta_cents
FROM m
QUALIFY prev_cents IS NOT NULL
"""


def q_lang_flags(sf_dir: str):
    """Boolean aggregates (bool_and / bool_or) per language as Min/Max
    over 0/1 flags — every doc >=100 chars? any doc >=5000 chars? —
    one keys-only groupby."""
    from ray.data.aggregate import Count, Max, Min

    def flags(b: pa.Table) -> pa.Table:
        ch = b.column("n_chars")
        return pa.table({
            "lang": b.column("lang"),
            "ge100": pc.cast(pc.greater_equal(ch, 100), pa.int64()),
            "ge5000": pc.cast(pc.greater_equal(ch, 5000), pa.int64()),
        })

    return (
        _docs(sf_dir, ["lang", "n_chars"])
        .map_batches(flags, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Count(),
            Min("ge100", alias_name="all_ge100"),
            Max("ge5000", alias_name="any_ge5000"),
        )
        .rename_columns({"count()": "n_docs"})
    )


_SQL_LANG_FLAGS = """
SELECT lang, count(*)::BIGINT AS n_docs,
       bool_and(n_chars >= 100)::BIGINT AS all_ge100,
       bool_or(n_chars >= 5000)::BIGINT AS any_ge5000
FROM documents GROUP BY lang
"""


def _extract_text_strategy(sf_dir: str, strategy: str):
    """Byte-identity extraction through an ALTERNATIVE segmentation
    strategy (stages/segment_pse.py kernel-growing or
    stages/segment_east.py dense-proposal + lanms), run as the STAGED
    registry pipeline (segment -> extract -> assemble actor pools — the
    reference's deploy-pipeline topology). Restricted to linear
    (single-column) docs, where all three strategies are pinned
    byte-identical; the multi-column reading-order rules are the DB
    strategy's contract only."""
    from webextract.pipelines.registry import build_pipeline
    from webextract.sources.pages import pages_from_documents

    out = build_pipeline(pages_from_documents(sf_dir), [
        {"op": "segment", "strategy": strategy,
         "concurrency": _conc()},
        {"op": "extract", "concurrency": _conc()},
        {"op": "assemble"},
        {"op": "filter", "expr": "status == 'ok'"},
    ])

    def linear(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (ids % 17 != 5) & (ids % 19 != 11)
        return b.filter(pa.array(keep))

    return out.map_batches(linear, batch_format="pyarrow").select_columns(
        ["doc_id", "text"]
    )


def q_extract_text_pse(sf_dir: str):
    """PSE-strategy extraction, byte-identical on linear docs."""
    return _extract_text_strategy(sf_dir, "pse")


def q_extract_text_east(sf_dir: str):
    """EAST-strategy extraction (dense proposals + locality-aware NMS
    weighted merge), byte-identical on linear docs."""
    return _extract_text_strategy(sf_dir, "east")


_SQL_GOLD_TEXT_LINEAR = r"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         (doc_id % 3 + 1)::INT AS k
  FROM documents
  WHERE doc_id % 17 <> 5 AND doc_id % 19 <> 11
)
SELECT doc_id,
  array_to_string(
    list_filter(
      list_transform(range(0, k), i ->
        array_to_string(words[(i*len(words))//k + 1
                              : ((i+1)*len(words))//k], ' ')
      ), c -> c <> ''), chr(10)) AS text
FROM w
WHERE doc_id % 50 <> 7
"""


def q_extract_text_staged(sf_dir: str):
    """The STAGED (fused=False) extraction topology — separate
    segment / extract / assemble actor pools with object-store hops
    between them (the reference's deploy pipeline_manager shape) —
    against the same full byte-identity oracle as the fused default.
    Proves the two topologies are row-identical at the driver gate,
    not just in pytest."""
    from webextract.pipelines.extract_pipeline import extract_pages
    from webextract.sources.pages import pages_from_documents

    ds = extract_pages(
        pages_from_documents(sf_dir), fused=False, concurrency=_conc()
    ).filter(expr="status == 'ok'")
    return ds.select_columns(["doc_id", "text"])


def q_extract_text_tiered(sf_dir: str):
    """The skew-hardened TIERED topology (extract_pages_tiered):
    payload-size routing splits giant pages into a tiny-batch pool and
    unions the sub-pipelines. giant_bytes is set low enough here that
    BOTH branches execute on real rows; the full gold oracle verifies
    the union is byte-identical to the untiered run."""
    from webextract.pipelines.extract_pipeline import extract_pages_tiered
    from webextract.sources.pages import pages_from_documents

    ds = extract_pages_tiered(
        pages_from_documents(sf_dir), giant_bytes=4000,
        concurrency=_conc(),
    ).filter(expr="status == 'ok'")
    return ds.select_columns(["doc_id", "text"])


def q_image_decode_stats(sf_dir: str):
    """Multimodal image path under the oracle gate: a deterministic PPM
    payload per doc (w = 4+id%5, h = 3+id%4, pixel i = (id*7+i)%256)
    round-trips through the REAL codec (stages/imagecodec.encode_ppm ->
    decode_image) inside map_batches; the query emits integer
    dimensions + pixel sums and the oracle recomputes them from the
    synthesis rule in pure SQL. Binary payloads never leave the task —
    the decode-stage shape for a 100 TB media column."""
    from webextract.stages.imagecodec import decode_image, encode_ppm

    def stats(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        ws, hs, sums = [], [], []
        for did in ids:
            w = 4 + did % 5
            h = 3 + did % 4
            px = ((did * 7 + np.arange(w * h * 3, dtype=np.int64)) % 256
                  ).astype(np.uint8).reshape(h, w, 3)
            img = decode_image(encode_ppm(px))
            assert img.shape == (h, w, 3)
            ws.append(img.shape[1])
            hs.append(img.shape[0])
            sums.append(int(img.astype(np.int64).sum()))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "width": pa.array(ws, type=pa.int64()),
            "height": pa.array(hs, type=pa.int64()),
            "pixel_sum": pa.array(sums, type=pa.int64()),
        })

    return _docs(sf_dir, ["doc_id"]).map_batches(
        stats, batch_format="pyarrow"
    )


_SQL_IMAGE_DECODE_STATS = """
WITH p AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents
)
SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
       (SELECT sum((doc_id * 7 + i) % 256)
        FROM unnest(range(0, w * h * 3)) AS t(i))::BIGINT AS pixel_sum
FROM p
"""


def q_audio_decode_stats(sf_dir: str):
    """Multimodal audio path under the oracle gate: a deterministic
    16-bit PCM RIFF payload per doc (n = 100+id%50 samples, sample i =
    (id*13 + i*77) % 2001 - 1000) decoded by the REAL parser
    (stages/imagecodec.decode_wav); k/2^15 samples are exact dyadic
    floats, so the recovered integer sum is bit-exact against the SQL
    recomputation."""
    import struct

    from webextract.stages.imagecodec import decode_wav

    def stats(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        ns, sums, rates = [], [], []
        for did in ids:
            n = 100 + did % 50
            k = ((did * 13 + 77 * np.arange(n, dtype=np.int64)) % 2001
                 ) - 1000
            pcm = k.astype("<i2").tobytes()
            hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            hdr += b"fmt " + struct.pack(
                "<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
            hdr += b"data" + struct.pack("<I", len(pcm))
            samples, rate = decode_wav(hdr + pcm)
            rec = np.round(samples * 32768.0).astype(np.int64)
            ns.append(len(samples))
            sums.append(int(rec.sum()))
            rates.append(rate)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_samples": pa.array(ns, type=pa.int64()),
            "sample_sum": pa.array(sums, type=pa.int64()),
            "rate": pa.array(rates, type=pa.int64()),
        })

    return _docs(sf_dir, ["doc_id"]).map_batches(
        stats, batch_format="pyarrow"
    )


_SQL_AUDIO_DECODE_STATS = """
WITH p AS (SELECT doc_id, 100 + doc_id % 50 AS n FROM documents)
SELECT doc_id, n::BIGINT AS n_samples,
       (SELECT sum((doc_id * 13 + i * 77) % 2001 - 1000)
        FROM unnest(range(0, n)) AS t(i))::BIGINT AS sample_sum,
       16000::BIGINT AS rate
FROM p
"""


def q_events_range_frame(sf_dir: str):
    """RANGE-frame window (value-range, not row-count): for every
    event, the count and exact-cents sum of the same user's events in
    the trailing 5-minute window (inclusive of self). One keys-only
    groupby; each group sorts once and answers every frame with two
    searchsorted cuts over int64 prefix sums — O(n log n) per group vs
    the SQL mirror's per-row RANGE scan."""
    import ray.data

    def us(b: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("value"), 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": pc.cast(b.column("ts"), pa.int64()),
            "event_id": b.column("event_id"),
            "cents": c,
        })

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    ).map_batches(us, batch_format="pyarrow")

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("event_id", pa.int64()),
        ("n_5min", pa.int64()), ("cents_5min", pa.int64()),
    ])
    BAND = 5 * 60 * 1_000_000

    def frames_part(t: pa.Table) -> pa.Table:
        """All users of one hash partition in one vectorized pass
        (round-5: per-user map_groups replaced): run-confined composite
        keys answer every row's RANGE-frame bounds with two
        searchsorted calls; the cents prefix sum is partition-global
        but the confined (lo, hi) indices never cross a run, so the
        differences are per-user exact."""
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        s = t.column("ts_us").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, s, u))
        u, s, eid, cents = u[order], s[order], eid[order], cents[order]
        key, _, _ = _run_confined_keys(u, s, BAND)
        pref = np.concatenate(([0], np.cumsum(cents, dtype=np.int64)))
        hi = np.searchsorted(key, key, side="right")
        lo = np.searchsorted(key, key - BAND, side="left")
        return pa.table({
            "user_id": pa.array(u, type=pa.int64()),
            "event_id": pa.array(eid, type=pa.int64()),
            "n_5min": pa.array((hi - lo).astype(np.int64)),
            "cents_5min": pa.array(pref[hi] - pref[lo], type=pa.int64()),
        }, schema=out_schema)

    from webextract.functions.joins import partition_apply

    return partition_apply(
        ev, frames_part, on="user_id",
        schema=pa.schema([("user_id", pa.int64()), ("ts_us", pa.int64()),
                          ("event_id", pa.int64()), ("cents", pa.int64())]),
        out_schema=out_schema)


_SQL_EVENTS_RANGE_FRAME = """
SELECT user_id, event_id,
       (count(*) OVER w)::BIGINT AS n_5min,
       (sum(floor(value * 100.0 + 0.5)::BIGINT) OVER w)::BIGINT
         AS cents_5min
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 5 MINUTE PRECEDING AND CURRENT ROW)
"""


def q_customer_rfm(sf_dir: str):
    """RFM segmentation table: Recency (whole days between each
    customer's last order and the corpus max date — two keys-only Max
    folds + exact integer date math), Frequency (order count), Monetary
    (exact integer cents)."""
    import ray.data
    from ray.data.aggregate import Count, Max, Sum

    def prep(b: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("o_totalprice"), 100.0),
                            0.5)),
            pa.int64(),
        )
        return pa.table({
            "c_custkey": b.column("o_custkey"),
            "ts_us": pc.cast(b.column("o_orderdate"), pa.int64()),
            "cents": c,
        })

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(prep, batch_format="pyarrow")
    global_max = int(ds.max("ts_us"))
    agg = (
        ds.groupby("c_custkey")
        .aggregate(
            Count(),
            Max("ts_us", alias_name="last_us"),
            Sum("cents", alias_name="monetary_cents"),
        )
        .rename_columns({"count()": "frequency"})
    )

    def rec(b: pa.Table) -> pa.Table:
        days = pc.divide(
            pc.subtract(pa.scalar(global_max, type=pa.int64()),
                        b.column("last_us")),
            pa.scalar(86_400_000_000, type=pa.int64()),
        )
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "recency_days": pc.cast(days, pa.int64()),
            "frequency": b.column("frequency"),
            "monetary_cents": b.column("monetary_cents"),
        })

    return agg.map_batches(rec, batch_format="pyarrow")


_SQL_CUSTOMER_RFM = """
WITH g AS (SELECT max(o_orderdate) AS mx FROM orders)
SELECT o_custkey AS c_custkey,
       (date_diff('microsecond', max(o_orderdate), any_value(g.mx))
        // 86400000000)::BIGINT AS recency_days,
       count(*)::BIGINT AS frequency,
       sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT)::BIGINT
         AS monetary_cents
FROM orders, g
GROUP BY o_custkey
"""


def q_docs_pushdown_stats(sf_dir: str):
    """Predicate pushdown AT THE READ: the row filter (lang = 'en')
    ships into the parquet scan via `read_parquet(filter=...)`, so
    non-matching row groups never leave storage — paired with the
    column prune, this is the 'prune at the read' discipline the 100 TB
    tier depends on. One keys-only source rollup after."""
    import pyarrow.dataset as pds
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["source", "lang", "n_chars"],
        filter=(pds.field("lang") == "en"),
    )
    return (
        ds.groupby("source")
        .aggregate(Count(), Sum("n_chars", alias_name="total_chars"))
        .rename_columns({"count()": "n_docs"})
    )


_SQL_DOCS_PUSHDOWN_STATS = """
SELECT source, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars
FROM documents WHERE lang = 'en' GROUP BY source
"""


def q_session_length_hist(sf_dir: str):
    """Composition: gap-sessionization -> session-length distribution
    (how many sessions have k events) — the engagement histogram,
    one extra keys-only groupby over the session summaries."""
    import ray.data
    from ray.data.aggregate import Count

    from webextract.functions.sessions import sessionize

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )
    return (
        sessionize(ds, gap_minutes=30)
        .groupby("n_events")
        .aggregate(Count())
        .rename_columns({"count()": "n_sessions"})
    )


_SQL_SESSION_LENGTH_HIST = r"""
WITH o AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, event_id,
    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM o
),
g AS (
  SELECT user_id, session_idx, count(*)::BIGINT AS n_events
  FROM s GROUP BY user_id, session_idx
)
SELECT n_events, count(*)::BIGINT AS n_sessions FROM g GROUP BY n_events
"""


def q_fk_orphans(sf_dir: str):
    """Referential-integrity audit across the schema: orphan counts for
    two foreign keys (orders.o_custkey -> customer, lineitem.l_orderkey
    -> orders). MEASURED transport per FK (the join_dim discipline):
    parents whose parquet metadata row count fits the broadcast bound
    ship their key set ONCE via ray.put and the child scan anti-filters
    map-side (sorted searchsorted probe — ZERO exchanges; the surviving
    orphans are a contract-tiny set folded keys-only); bigger parents
    go through the ANTI hash join with the child side pre-distincted so
    the exchange carries one row per distinct key."""
    import ray
    import ray.data
    from ray.data.aggregate import Count, Sum

    from webextract.functions.joins import hash_join
    from webextract.queries._shared import BROADCAST_DIM_MAX_ROWS

    def orphan_counts(child_path, child_key, parent_path, parent_key,
                      out_key):
        if pq.read_metadata(parent_path).num_rows <= BROADCAST_DIM_MAX_ROWS:
            pk = np.unique(np.asarray(
                pq.read_table(parent_path, columns=[parent_key])
                .column(parent_key).cast(pa.int64()).combine_chunks()))
            ref = ray.put(pk)

            def anti(b: pa.Table) -> pa.Table:
                keys = b.column(child_key).cast(pa.int64())
                ks = np.asarray(keys.combine_chunks())
                arr = ray.get(ref)  # zero-copy from the local plasma seg
                if arr.size == 0:
                    member = np.zeros(ks.size, dtype=bool)
                else:
                    pos = np.clip(np.searchsorted(arr, ks), 0, arr.size - 1)
                    member = arr[pos] == ks
                return pa.table(
                    {out_key: pa.array(ks[~member], type=pa.int64())})

            orphans = ray.data.read_parquet(
                child_path, columns=[child_key]
            ).map_batches(anti, batch_format="pyarrow").materialize()
            n_rows = orphans.count()
            if n_rows == 0:
                return (0, 0)
            n_keys = int(orphans.groupby(out_key).count().count())
            return (n_keys, n_rows)
        child = (
            ray.data.read_parquet(child_path, columns=[child_key])
            .rename_columns({child_key: out_key})
            .groupby(out_key)
            .aggregate(Count())
            .rename_columns({"count()": "n_child"})
        )
        parent = ray.data.read_parquet(
            parent_path, columns=[parent_key]
        ).rename_columns({parent_key: out_key})
        ks = pa.schema([(out_key, pa.int64()), ("n_child", pa.int64())])
        ps = pa.schema([(out_key, pa.int64())])
        orphans = hash_join(child, parent, on=out_key, how="anti",
                            left_schema=ks, right_schema=ps)
        agg = orphans.aggregate(Count(), Sum("n_child"))
        if not agg:  # Ray returns None/{} when the input is empty
            return (0, 0)
        return (int(agg["count()"] or 0), int(agg["sum(n_child)"] or 0))

    o_keys, o_rows = orphan_counts(
        f"{sf_dir}/orders.parquet", "o_custkey",
        f"{sf_dir}/customer.parquet", "c_custkey", "k")
    l_keys, l_rows = orphan_counts(
        f"{sf_dir}/lineitem.parquet", "l_orderkey",
        f"{sf_dir}/orders.parquet", "o_orderkey", "k")
    return pa.table({
        "fk": pa.array(["orders.o_custkey", "lineitem.l_orderkey"],
                       type=pa.string()),
        "orphan_keys": pa.array([o_keys, l_keys], type=pa.int64()),
        "orphan_rows": pa.array([o_rows, l_rows], type=pa.int64()),
    })


_SQL_FK_ORPHANS = """
SELECT 'orders.o_custkey' AS fk,
       count(DISTINCT o_custkey)::BIGINT AS orphan_keys,
       count(*)::BIGINT AS orphan_rows
FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
UNION ALL
SELECT 'lineitem.l_orderkey',
       count(DISTINCT l_orderkey)::BIGINT,
       count(*)::BIGINT
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
"""


def q_consistent_sample(sf_dir: str):
    """Consistent (hash-ordered) fixed-k sample: the 50 docs with the
    smallest md5(doc_id) — stable under appends except at the boundary,
    the dataset-fingerprint sampling trick (MinHash over the id set).
    Per-block partial bottom-k on the hash, then a 50-row global
    finish — k rows per block through the exchange, never the table."""
    import hashlib

    K = 50

    def hashed(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        hs = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        t = pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "h": pa.array(hs, type=pa.string()),
        })
        order = pc.sort_indices(t, sort_keys=[("h", "ascending"),
                                              ("doc_id", "ascending")])
        return t.take(order[:K])

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(hashed, batch_format="pyarrow")
        .sort(["h", "doc_id"])
        .limit(K)
    )


_SQL_CONSISTENT_SAMPLE = """
SELECT doc_id, md5(doc_id::VARCHAR) AS h
FROM documents ORDER BY h, doc_id LIMIT 50
"""


def q_segment_avg_order(sf_dir: str):
    """Grouped weighted average KPI: mean order value per market
    segment — broadcast customer->segment probe inside the orders
    scan, one keys-only groupby, the mean a single IEEE division of
    exact int64 sums."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    from webextract.functions.joins import broadcast_join

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("o_totalprice"), 100.0),
                            0.5)),
            pa.int64(),
        )
        return pa.table({"c_custkey": b.column("o_custkey"), "cents": c})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(cents, batch_format="pyarrow")
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    seg = broadcast_join(orders, cust, key="c_custkey")
    agg = (
        seg.groupby("c_mktsegment")
        .aggregate(Count(), Sum("cents", alias_name="total_cents"))
        .rename_columns({"count()": "n_orders"})
    )

    def mean(b: pa.Table) -> pa.Table:
        m = pc.divide(
            pc.cast(b.column("total_cents"), pa.float64()),
            pc.cast(b.column("n_orders"), pa.float64()),
        )
        return b.append_column("avg_cents", m)

    return agg.map_batches(mean, batch_format="pyarrow")


_SQL_SEGMENT_AVG_ORDER = """
SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
       sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT)::BIGINT
         AS total_cents,
       sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT)::DOUBLE
         / count(*)::DOUBLE AS avg_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_embedding_quantize_checksum(sf_dir: str):
    """Int8 symmetric quantization of the embedding column, verified by
    checksum: q_i = floor(x_i / scale * 127 + 0.5) with scale =
    max|x| per vector — the identical left-to-right IEEE expression on
    both engines, so the per-vector quantized sums are exact. The
    vector-compression prep step (e.g. for an int8 ANN index), pure
    map-side."""
    import ray.data

    from webextract.functions.similarity import _batch_matrix

    def quant(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id")
        m = _batch_matrix(b, "embedding")
        if not m.size:
            return pa.table({
                "vec_id": pa.array([], type=pa.int64()),
                "q_sum": pa.array([], type=pa.int64()),
                "n_dims": pa.array([], type=pa.int64()),
            })
        scale = np.abs(m).max(axis=1, keepdims=True)
        safe = np.where(scale == 0.0, 1.0, scale)
        q = np.floor(m / safe * 127.0 + 0.5)
        q = np.where(scale == 0.0, 0.0, q).astype(np.int64)
        return pa.table({
            "vec_id": ids,
            "q_sum": pa.array(q.sum(axis=1), type=pa.int64()),
            "n_dims": pa.array(
                np.full(m.shape[0], m.shape[1], dtype=np.int64)),
        })

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ds.map_batches(quant, batch_format="pyarrow")
