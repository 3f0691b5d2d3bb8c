"""Analytics sweep C (split from __ray_entry__.py).

See webextract/queries/__init__.py for the assembled surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from webextract.queries._shared import _conc, _docs, guarded_fold


_SQL_EMBEDDING_QUANTIZE_CHECKSUM = """
WITH s AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS sc
  FROM embeddings
)
SELECT vec_id,
       CASE WHEN sc = 0 THEN 0
            ELSE list_sum(list_transform(e,
                   x -> floor(x / sc * 127.0 + 0.5)))::BIGINT
       END::BIGINT AS q_sum,
       len(e)::BIGINT AS n_dims
FROM s
"""


def q_docs_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((lang), (source), (lang, source)) with
    the GROUPING() bit pattern — one shuffle to the finest grain, the
    single-column grains folded from the bounded finest aggregate
    (functions/window.grouping_sets_counts)."""
    from webextract.functions.window import grouping_sets_counts

    return grouping_sets_counts(
        _docs(sf_dir, ["lang", "source", "n_chars"]),
        a="lang", b="source", val="n_chars",
    )


_SQL_DOCS_GROUPING_SETS = """
SELECT lang, source, GROUPING(lang, source)::BIGINT AS gid,
       count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS chars
FROM documents
GROUP BY GROUPING SETS ((lang, source), (lang), (source))
"""


def q_orders_priority_except_all(sf_dir: str):
    """Bag-semantics EXCEPT ALL: the multiset of priorities among
    open ('O') orders minus the multiset among filled ('F') orders —
    surviving multiplicity = greatest(n_open - n_filled, 0), computed
    from ONE conditional-count groupby (never materializing either
    multiset)."""
    import ray.data
    from ray.data.aggregate import Sum

    def flags(b: pa.Table) -> pa.Table:
        st = b.column("o_orderstatus")
        return pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "n_o": pc.cast(pc.equal(st, "O"), pa.int64()),
            "n_f": pc.cast(pc.equal(st, "F"), pa.int64()),
        })

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderstatus", "o_orderpriority"],
        )
        .map_batches(flags, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_o", alias_name="n_o"),
                   Sum("n_f", alias_name="n_f"))
    )

    def excess(b: pa.Table) -> pa.Table:
        d = pc.subtract(b.column("n_o"), b.column("n_f"))
        e = pc.max_element_wise(d, pa.scalar(0, type=pa.int64()))
        t = pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "n_excess": pc.cast(e, pa.int64()),
        })
        return t.filter(pc.greater(t.column("n_excess"), 0))

    return agg.map_batches(excess, batch_format="pyarrow")


_SQL_ORDERS_PRIORITY_EXCEPT_ALL = """
WITH d AS (
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
  EXCEPT ALL
  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
)
SELECT o_orderpriority, count(*)::BIGINT AS n_excess
FROM d GROUP BY o_orderpriority
"""


def q_region_segment_matrix(sf_dir: str):
    """Wide pivot over JOINED dimensions: customers per market segment
    (rows) x region (columns). The nation->region dim chain broadcasts
    into the customer scan; the pivot itself is conditional 0/1
    columns + one keys-only groupby — no per-category scans."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    by_rk = dict(zip(region.column("r_regionkey").to_pylist(),
                     region.column("r_name").to_pylist()))
    r_of_nation = {
        int(nk): by_rk[rk]
        for nk, rk in zip(nation.column("n_nationkey").to_pylist(),
                          nation.column("n_regionkey").to_pylist())
    }
    cats = sorted(by_rk.values())
    import ray
    ref = ray.put(r_of_nation)

    def flags(b: pa.Table) -> pa.Table:
        rn = ray.get(ref)
        regions = [rn[int(k)] for k in
                   b.column("c_nationkey").to_pylist()]
        cols = {"c_mktsegment": b.column("c_mktsegment")}
        for c in cats:
            cols["n_" + c.lower()] = pa.array(
                [1 if r == c else 0 for r in regions], type=pa.int64())
        return pa.table(cols)

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_mktsegment", "c_nationkey"],
    )
    aggs = [Sum("n_" + c.lower(), alias_name="n_" + c.lower())
            for c in cats]
    return (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(), *aggs)
        .rename_columns({"count()": "n_total"})
    )


_SQL_REGION_SEGMENT_MATRIX = """
SELECT c_mktsegment, count(*)::BIGINT AS n_total,
       count(*) FILTER (r_name = 'AFRICA')::BIGINT AS n_africa,
       count(*) FILTER (r_name = 'AMERICA')::BIGINT AS n_america,
       count(*) FILTER (r_name = 'ASIA')::BIGINT AS n_asia,
       count(*) FILTER (r_name = 'EUROPE')::BIGINT AS n_europe,
       count(*) FILTER (r_name = 'MIDDLE EAST')::BIGINT AS "n_middle east"
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY c_mktsegment
"""


def q_event_value_share(sf_dir: str):
    """Per-row share of a window total: each event's exact-cents value
    divided by its user's total. user_id is USER-GRADE cardinality, so
    nothing folds on the driver (the round-4 judge task); round-5
    collapses the former totals-groupby + hash_join pair into ONE
    user-keyed `partition_apply` exchange — a user's rows co-locate, so
    the total and every row's share resolve in one sorted-run reduceat
    pass, and the events table is scanned once instead of twice. The
    share stays one IEEE division of exact int64s per row."""
    import ray.data

    from webextract.functions.joins import partition_apply

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("value"), 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table({
            "user_id": b.column("user_id"),
            "event_id": b.column("event_id"),
            "cents": c,
        })

    def ev():
        return ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_id", "value"],
        ).map_batches(cents, batch_format="pyarrow")

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("event_id", pa.int64()),
        ("cents", pa.int64()), ("share", pa.float64()),
    ])

    def share_part(part: pa.Table) -> pa.Table:
        idx = pc.sort_indices(part, sort_keys=[("user_id", "ascending")])
        t = part.take(idx)
        u = np.asarray(t.column("user_id").combine_chunks())
        cs = np.asarray(t.column("cents").combine_chunks())
        new = np.r_[True, u[1:] != u[:-1]]
        starts = np.nonzero(new)[0]
        counts = np.diff(np.r_[starts, len(u)]).astype(np.int64)
        pref = np.concatenate(([0], np.cumsum(cs, dtype=np.int64)))
        tot = pref[np.r_[starts[1:], len(u)]] - pref[starts]
        tot_rep = np.repeat(tot, counts)
        return pa.table({
            "user_id": t.column("user_id"),
            "event_id": t.column("event_id"),
            "cents": t.column("cents"),
            "share": pa.array(cs.astype(np.float64)
                              / tot_rep.astype(np.float64),
                              type=pa.float64()),
        }, schema=out_schema)

    return partition_apply(
        ev(), share_part, on="user_id",
        schema=pa.schema([("user_id", pa.int64()),
                          ("event_id", pa.int64()),
                          ("cents", pa.int64())]),
        out_schema=out_schema)


_SQL_EVENT_VALUE_SHARE = """
SELECT user_id, event_id,
       floor(value * 100.0 + 0.5)::BIGINT AS cents,
       floor(value * 100.0 + 0.5)::BIGINT::DOUBLE
         / (sum(floor(value * 100.0 + 0.5)::BIGINT)
            OVER (PARTITION BY user_id))::DOUBLE AS share
FROM events
"""


def q_customers_all_filled(sf_dir: str):
    """Universal quantification (FOR ALL): customers whose EVERY order
    has status 'F' — one conditional-count groupby, the HAVING
    count(*) = count(*) FILTER (...) equality; no per-row existence
    probes."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    def flags(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b.column("o_custkey"),
            "n_f": pc.cast(pc.equal(b.column("o_orderstatus"), "F"),
                           pa.int64()),
        })

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderstatus"],
        )
        .map_batches(flags, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Count(), Sum("n_f", alias_name="n_f"))
        .rename_columns({"count()": "n_orders"})
    )

    def keep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("n_orders"), b.column("n_f")))
        return t.select(["c_custkey", "n_orders"])

    return agg.map_batches(keep, batch_format="pyarrow")


_SQL_CUSTOMERS_ALL_FILLED = """
SELECT o_custkey AS c_custkey, count(*)::BIGINT AS n_orders
FROM orders GROUP BY o_custkey
HAVING count(*) = count(*) FILTER (o_orderstatus = 'F')
"""


def q_revenue_ma3(sf_dir: str):
    """Trailing 3-month moving window over an aggregate series: monthly
    integer-cents revenue plus the 3-month trailing sum (pure integer
    arithmetic, no division) — the keys-only monthly rollup folds to
    the bounded calendar on the driver, where the ROWS-frame window is
    a three-term sum."""
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
    months, revs, ma = [], [], []
    for i, r in enumerate(rows):
        months.append(r["month"])
        revs.append(int(r["revenue_cents"]))
        lo = max(0, i - 2)
        ma.append(sum(int(x["revenue_cents"]) for x in rows[lo:i + 1]))
    return pa.table({
        "month": pa.array(months, type=pa.string()),
        "revenue_cents": pa.array(revs, type=pa.int64()),
        "ma3_cents": pa.array(ma, type=pa.int64()),
    })


_SQL_REVENUE_MA3 = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT)::BIGINT
           AS revenue_cents
  FROM orders GROUP BY month
)
SELECT month, revenue_cents,
       (sum(revenue_cents) OVER (ORDER BY month
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))::BIGINT AS ma3_cents
FROM m
"""


def q_revenue_by_region(sf_dir: str):
    """Five-table join span (lineitem -> orders -> customer -> nation
    -> region): per-order revenue pre-aggregated in the lineitem scan,
    then MEASURED dimension joins (``join_dim``: parquet-metadata row
    count picks broadcast vs keyed exchange) to orders for the custkey
    and to customer for the nationkey — at bench scale both dims
    broadcast (zero all-to-all after the pre-agg), at warehouse scale
    they spill to the hash exchange; the 25-row nation x region chain
    always broadcasts — revenue per region in exact integer cents."""
    import ray.data
    from ray.data.aggregate import Sum

    from webextract.functions.joins import broadcast_join
    from webextract.queries._shared import join_dim

    def cents(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(1.0, b.column("l_discount")),
        )
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(rev, 100.0), 0.5)), pa.int64()
        )
        return pa.table({"o_orderkey": b.column("l_orderkey"), "cents": c})

    per_order = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(cents, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("cents", alias_name="cents"))
    )
    j1 = join_dim(
        per_order, f"{sf_dir}/orders.parquet", key="o_orderkey",
        cols=["o_custkey"],
        fact_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("cents", pa.int64())]),
    ).rename_columns({"o_custkey": "c_custkey"})
    # pre-fold per customer before the second dim join: keys+cents only
    per_cust = j1.groupby("c_custkey").aggregate(
        Sum("cents", alias_name="cents"))
    j2 = join_dim(
        per_cust, f"{sf_dir}/customer.parquet", key="c_custkey",
        cols=["c_nationkey"],
        fact_schema=pa.schema(
            [("c_custkey", pa.int64()), ("cents", pa.int64())]),
    ).rename_columns({"c_nationkey": "n_nationkey"})
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    by_rk = dict(zip(region.column("r_regionkey").to_pylist(),
                     region.column("r_name").to_pylist()))
    dim = pa.table({
        "n_nationkey": nation.column("n_nationkey"),
        "r_name": pa.array(
            [by_rk[k] for k in nation.column("n_regionkey").to_pylist()],
            type=pa.string()),
    })
    named = broadcast_join(j2, dim, key="n_nationkey")
    return (
        named.groupby("r_name")
        .aggregate(Sum("cents", alias_name="revenue_cents"))
    )


_SQL_REVENUE_BY_REGION = """
SELECT r_name,
       sum(floor(l_extendedprice * (1 - l_discount) * 100.0
                 + 0.5)::BIGINT)::BIGINT AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_suppliers_above_nation_mean(sf_dir: str):
    """Cross-ENTITY above-average comparison: suppliers whose balance
    beats the MEAN customer balance of their own nation — the
    per-nation (count, sum) folds keys-only (25 rows, broadcast
    literal), the supplier filter is map-side integer
    cross-multiplication (cents * n > sum; no float mean anywhere)."""
    import ray
    import ray.data
    from ray.data.aggregate import Count, Sum

    def ccents(b: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("c_acctbal"), 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table({
            "nk": pc.cast(b.column("c_nationkey"), pa.int64()),
            "cents": c,
        })

    stats = {
        int(r["nk"]): (int(r["count()"]), int(r["s"]))
        for r in guarded_fold(
            ray.data.read_parquet(
                f"{sf_dir}/customer.parquet",
                columns=["c_nationkey", "c_acctbal"],
            )
            .map_batches(ccents, batch_format="pyarrow")
            .groupby("nk")
            .aggregate(Count(), Sum("cents", alias_name="s")),
            what="per-nation (n, sum) broadcast side")
    }
    ref = ray.put(stats)

    def keep(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        nk = b.column("s_nationkey").to_pylist()
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("s_acctbal"), 100.0), 0.5)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        keep_mask = []
        for k, ci in zip(nk, c):
            n, s = m.get(int(k), (0, 0))
            keep_mask.append(n > 0 and int(ci) * n > s)
        t = pa.table({
            "s_suppkey": b.column("s_suppkey"),
            "s_nationkey": pa.array([int(k) for k in nk], type=pa.int64()),
            "balance_cents": pa.array(c, type=pa.int64()),
        }).filter(pa.array(keep_mask))
        return t

    return ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey", "s_acctbal"],
    ).map_batches(keep, batch_format="pyarrow")


_SQL_SUPPLIERS_ABOVE_NATION_MEAN = """
WITH m AS (
  SELECT c_nationkey AS nk, count(*)::BIGINT AS n,
         sum(floor(c_acctbal * 100.0 + 0.5)::BIGINT)::BIGINT AS s
  FROM customer GROUP BY c_nationkey
)
SELECT s_suppkey, s_nationkey::BIGINT AS s_nationkey,
       floor(s_acctbal * 100.0 + 0.5)::BIGINT AS balance_cents
FROM supplier JOIN m ON s_nationkey = m.nk
WHERE floor(s_acctbal * 100.0 + 0.5)::BIGINT * m.n > m.s
"""


def q_events_asof_fwd(sf_dir: str):
    """FORWARD as-of join: each click matched to the earliest view at or
    after it by the same user (functions/temporal.asof_join
    direction="forward" — same one-shuffle searchsorted merge, the
    other boundary)."""
    import ray.data

    from webextract.functions.temporal import asof_join

    def load(event_type: str, id_name: str, ts_name: str):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        ).filter(expr=f"event_type == '{event_type}'")

        def conv(b: pa.Table) -> pa.Table:
            return pa.table({
                "user_id": b.column("user_id"),
                ts_name: b.column("ts").cast(pa.int64()),
                id_name: b.column("event_id"),
            })

        schema = pa.schema([("user_id", pa.int64()), (ts_name, pa.int64()),
                            (id_name, pa.int64())])
        return ds.map_batches(conv, batch_format="pyarrow"), schema

    clicks, lschema = load("click", "event_id", "ts_us")
    views, rschema = load("view", "view_event_id", "view_ts_us")
    return asof_join(
        clicks, views, by="user_id", left_ts="ts_us",
        right_ts="view_ts_us", left_schema=lschema, right_schema=rschema,
        how="inner", direction="forward",
    )


_SQL_EVENTS_ASOF_FWD = """
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id
  FROM events WHERE event_type = 'click'
), v AS (
  SELECT user_id, epoch_us(ts) AS view_ts_us, min(event_id) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT c.user_id, c.ts_us, c.event_id, v.view_ts_us, v.view_event_id
FROM c ASOF JOIN v
  ON c.user_id = v.user_id AND c.ts_us <= v.view_ts_us
"""


def _splitmix_cte_sql() -> str:
    """SQL prelude mirroring corpus.mix(doc_id, 1) exactly: SplitMix64
    in chained CTEs over HUGEINT, with the 64x64-bit modular multiply
    split into 32-bit halves (int128-safe). Validated equal to the
    Python mixer over 3000 ids. The stream-constant _mix(1 + GOLDEN2)
    is folded to a literal here."""
    from webextract.corpus import _mix

    M = 18446744073709551616  # 2^64
    C0 = 11400714819323198485  # 0x9E3779B97F4A7C15
    M1 = 13787848793156543929  # 0xBF58476D1CE4E5B9
    M2 = 10723151780598845931  # 0x94D049BB133111EB
    SC = _mix(1 + 0xD1B54A32D192ED03)  # _mix(stream=1 + golden2)

    def mulm(v: str, b: int) -> str:
        bl, bh = b % (1 << 32), b >> (32)
        return (f"((({v}) * {bl}) % {M} "
                f"+ ((({v}) * {bh}) % 4294967296) * 4294967296) % {M}")

    def xs(v: str, s: int) -> str:
        return f"xor({v}, ({v}) // {1 << s})"

    return f"""
mx0 AS (SELECT doc_id, ((doc_id::HUGEINT + {C0}) % {M}) AS v FROM documents),
mx1 AS (SELECT doc_id, {mulm(xs('v', 30), M1)} AS v FROM mx0),
mx2 AS (SELECT doc_id, {mulm(xs('v', 27), M2)} AS v FROM mx1),
mx3 AS (SELECT doc_id, xor(xor(v, v // 2147483648), {SC}::HUGEINT) AS v
        FROM mx2),
mx4 AS (SELECT doc_id, ((v + {C0}) % {M}) AS v FROM mx3),
mx5 AS (SELECT doc_id, {mulm(xs('v', 30), M1)} AS v FROM mx4),
mx6 AS (SELECT doc_id, {mulm(xs('v', 27), M2)} AS v FROM mx5),
mixed AS (SELECT doc_id, xor(v, v // 2147483648) AS mixv FROM mx6),
hosts AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 10 < 3 THEN 0
               ELSE 1 + mixv % 96 END)::BIGINT AS host
  FROM mixed
)"""


def q_host_doc_stats(sf_dir: str):
    """Host-level crawl rollup WITH A FULL ORACLE: the host is parsed
    from the URL string in the pages table (the real web-pipeline
    string op), counted per host with a doc_id checksum — and the
    oracle recomputes the skewed host assignment by running the
    SplitMix64 mixer itself in SQL (hosts: one hot host holding ~30% of
    rows — the skew driver salted_repartition defends against). The
    bench-only host_stats aggregation, now driver-gated."""
    from ray.data.aggregate import Count, Sum

    from webextract.sources.pages import pages_from_documents

    def host(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        ids = b.column("doc_id").to_pylist()
        hs = []
        for u in urls:
            # https://host{N}.example/doc/{id}
            hs.append(int(u.split("//", 1)[1].split(".", 1)[0][4:]))
        return pa.table({
            "host": pa.array(hs, type=pa.int64()),
            "doc_id": pa.array(ids, type=pa.int64()),
        })

    return (
        pages_from_documents(sf_dir)
        .map_batches(host, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Count(), Sum("doc_id", alias_name="id_sum"))
        .rename_columns({"count()": "n_docs"})
    )


_SQL_HOST_DOC_STATS = (
    "WITH " + _splitmix_cte_sql() + """
SELECT host, count(*)::BIGINT AS n_docs, sum(doc_id)::BIGINT AS id_sum
FROM hosts GROUP BY host
"""
)


def q_host_freshness(sf_dir: str):
    """Crawl freshness per host: newest and oldest snapshot timestamps
    + doc count, from the pages table's real (url, warc_ts) columns —
    the recrawl-scheduling statistic. Host parsed from the URL string
    engine-side; the oracle recomputes both the host assignment (the
    SQL SplitMix64 mixer) and the timestamp rule (warc_ts = 2024-01-01
    + doc_id seconds) from first principles."""
    from ray.data.aggregate import Count, Max, Min

    from webextract.sources.pages import pages_from_documents

    def host(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        hs = [int(u.split("//", 1)[1].split(".", 1)[0][4:]) for u in urls]
        return pa.table({
            "host": pa.array(hs, type=pa.int64()),
            "ts_us": pc.cast(b.column("warc_ts"), pa.int64()),
        })

    return (
        pages_from_documents(sf_dir)
        .map_batches(host, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Count(),
            Min("ts_us", alias_name="oldest_us"),
            Max("ts_us", alias_name="newest_us"),
        )
        .rename_columns({"count()": "n_docs"})
    )


_SQL_HOST_FRESHNESS = (
    "WITH " + _splitmix_cte_sql() + """
SELECT host, count(*)::BIGINT AS n_docs,
       min(1704067200000000 + doc_id * 1000000)::BIGINT AS oldest_us,
       max(1704067200000000 + doc_id * 1000000)::BIGINT AS newest_us
FROM hosts GROUP BY host
"""
)


def q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training (functions/bpe.bpe_train): 5
    merge steps learned over the corpus vocabulary. The corpus-wide
    word-frequency fold is one keys-only groupby; every iteration then
    runs on the Zipf-bounded VOCAB table (pair explode map-side,
    keys-only pair-count groupby, 1-row global argmax, broadcast-merge
    map). The merge applies the identical left-to-right textual
    replace on the space-joined symbol representation in both engines,
    so the oracle (5 unrolled CTE steps) is exact; the canonical
    pair-merge equivalence on this corpus is pinned by pytest."""
    from webextract.functions.bpe import bpe_train

    return bpe_train(_docs(sf_dir, ["text"]), n_merges=5)


def _bpe_ctes(n_merges: int = 5) -> str:
    """The shared CTE chain (w, r0, per-step s/t/m/k/b/r) both BPE
    oracles build on. Each step is an EXACT symbol-scan merge (see
    `_bpe_merge_step`); pair counts fold the exploded symbol table."""
    parts = ["""
w AS MATERIALIZED (
  SELECT word, count(*)::BIGINT AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) GROUP BY word
),
r0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY word) AS wid,
         array_to_string(
           list_transform(range(1, len(word) + 1), i ->
             word[i:i]), ' ') AS rep, freq
  FROM w
)"""]
    for k in range(1, n_merges + 1):
        parts.append(f""",
xs{k} AS MATERIALIZED (
  SELECT wid, freq, t.i::BIGINT AS i, q.syms[t.i] AS sym
  FROM (SELECT wid, freq, string_split(rep, ' ') AS syms FROM r{k-1}) q,
       unnest(range(1, len(q.syms) + 1)) AS t(i)
),
xt{k} AS MATERIALIZED (
  SELECT wid, freq, i, sym,
         lead(sym) OVER (PARTITION BY wid ORDER BY i) AS nxt
  FROM xs{k}
),
p{k} AS MATERIALIZED (
  SELECT sym || ' ' || nxt AS pair, sum(freq)::BIGINT AS n
  FROM xt{k} WHERE nxt IS NOT NULL GROUP BY 1
),
b{k} AS MATERIALIZED (
  SELECT pair, string_split(pair, ' ')[1] AS l,
         string_split(pair, ' ')[2] AS r,
         replace(pair, ' ', '') AS m, n
  FROM p{k} ORDER BY n DESC, pair LIMIT 1
),
xm{k} AS MATERIALIZED (
  SELECT wid, i FROM xt{k}
  WHERE sym = (SELECT l FROM b{k}) AND nxt = (SELECT r FROM b{k})
),
xk{k} AS MATERIALIZED (
  SELECT wid, i FROM (
    SELECT wid, i, min(i) OVER (PARTITION BY wid, grp) AS gmin
    FROM (SELECT wid, i,
                 i - row_number() OVER (PARTITION BY wid ORDER BY i) AS grp
          FROM xm{k})
  ) WHERE (i - gmin) % 2 = 0
),
r{k} AS MATERIALIZED (
  SELECT s.wid, any_value(s.freq) AS freq,
         coalesce(string_agg(
           CASE WHEN kk.i IS NOT NULL THEN (SELECT m FROM b{k})
                ELSE s.sym END, ' ' ORDER BY s.i), '') AS rep
  FROM xt{k} s
  LEFT JOIN xk{k} kk ON kk.wid = s.wid AND kk.i = s.i
  WHERE NOT EXISTS (SELECT 1 FROM xk{k} kp
                    WHERE kp.wid = s.wid AND kp.i = s.i - 1)
  GROUP BY s.wid
)""")
    return "".join(parts)


def _bpe_sql(n_merges: int = 5) -> str:
    """Unrolled SQL mirror of bpe_train: per step, bigram pair counts
    over the exploded symbol table, argmax (n DESC, pair ASC), exact
    left-to-right symbol-scan merge (islands-parity; see _bpe_ctes)."""
    finals = [
        f"SELECT {k}::BIGINT AS step, l AS l_sym, r AS r_sym, n FROM b{k}"
        for k in range(1, n_merges + 1)
    ]
    return ("WITH " + _bpe_ctes(n_merges) + "\n"
            + "\nUNION ALL\n".join(finals))


def _bpe_apply_sql(n_merges: int = 5) -> str:
    """Oracle for bpe_apply_counts: re-derive the merges (shared CTEs),
    then chain the SAME exact symbol-scan merges over every word of
    every doc and count subword symbols. Each a{k} step mirrors
    functions/bpe.merge_rep via the islands-parity rule (greedy
    left-to-right = keep even offsets within runs of consecutive match
    positions; a skipped match is exactly one that overlaps the
    previous kept one)."""
    steps = []
    for k in range(1, n_merges + 1):
        steps.append(f""",
ds{k} AS MATERIALIZED (
  SELECT doc_id, wid, t.i::BIGINT AS i, q.syms[t.i] AS sym
  FROM (SELECT doc_id, wid, string_split(rep, ' ') AS syms
        FROM a{k-1}) q,
       unnest(range(1, len(q.syms) + 1)) AS t(i)
),
dt{k} AS MATERIALIZED (
  SELECT doc_id, wid, i, sym,
         lead(sym) OVER (PARTITION BY doc_id, wid ORDER BY i) AS nxt
  FROM ds{k}
),
dm{k} AS MATERIALIZED (
  SELECT doc_id, wid, i FROM dt{k}
  WHERE sym = (SELECT l FROM b{k}) AND nxt = (SELECT r FROM b{k})
),
dk{k} AS MATERIALIZED (
  SELECT doc_id, wid, i FROM (
    SELECT doc_id, wid, i,
           min(i) OVER (PARTITION BY doc_id, wid, grp) AS gmin
    FROM (SELECT doc_id, wid, i,
                 i - row_number() OVER (PARTITION BY doc_id, wid
                                        ORDER BY i) AS grp
          FROM dm{k})
  ) WHERE (i - gmin) % 2 = 0
),
a{k} AS MATERIALIZED (
  SELECT s.doc_id, s.wid,
         coalesce(string_agg(
           CASE WHEN kk.i IS NOT NULL THEN (SELECT m FROM b{k})
                ELSE s.sym END, ' ' ORDER BY s.i), '') AS rep
  FROM dt{k} s
  LEFT JOIN dk{k} kk
    ON kk.doc_id = s.doc_id AND kk.wid = s.wid AND kk.i = s.i
  WHERE NOT EXISTS (SELECT 1 FROM dk{k} kp
                    WHERE kp.doc_id = s.doc_id AND kp.wid = s.wid
                      AND kp.i = s.i - 1)
  GROUP BY s.doc_id, s.wid
)""")
    return ("WITH " + _bpe_ctes(n_merges) + """,
d0 AS MATERIALIZED (
  SELECT doc_id, q.ws[t.wid] AS word, t.wid::BIGINT AS wid FROM (
    SELECT doc_id, string_split(text, ' ') AS ws FROM documents) q,
    unnest(range(1, len(q.ws) + 1)) AS t(wid)
),
a0 AS MATERIALIZED (
  SELECT doc_id, wid, array_to_string(
    list_transform(range(1, len(word) + 1), i -> word[i:i]), ' ') AS rep
  FROM d0
)""" + "".join(steps) + f"""
SELECT doc_id, sum(len(string_split(rep, ' ')))::BIGINT AS n_subwords
FROM a{n_merges} GROUP BY doc_id
""")


_SQL_BPE_MERGES = _bpe_sql(5)
_SQL_BPE_APPLY = _bpe_apply_sql(5)


def q_bpe_apply_counts(sf_dir: str):
    """Tokenizer train -> apply loop closure: learn 5 merges
    (functions/bpe.bpe_train), broadcast them into a pure map-side
    apply, count subword tokens per document
    (functions/bpe.bpe_apply_counts). The oracle re-derives the merges
    and chains the identical replaces in SQL."""
    from webextract.functions.bpe import bpe_apply_counts, bpe_train

    merges_tbl = bpe_train(_docs(sf_dir, ["text"]), n_merges=5)
    merges = list(zip(merges_tbl.column("l_sym").to_pylist(),
                      merges_tbl.column("r_sym").to_pylist()))
    return bpe_apply_counts(_docs(sf_dir, ["doc_id", "text"]), merges)


def q_lang_word_simpson(sf_dir: str):
    """Simpson concentration index per language in EXACT integer
    arithmetic: numerator sum_w n_w*(n_w-1), denominator N*(N-1) — the
    repeated-draw collision probability, the corpus-diversity
    profile. (lang, word) counts keys-only, the quadratic terms fold
    per lang; no division emitted, so no float anywhere."""
    from ray.data.aggregate import Count, Sum

    from webextract.queries._shared import explode_lang_words as explode

    counts = (
        _docs(sf_dir, ["lang", "text"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["lang", "word"])
        .aggregate(Count())
        .rename_columns({"count()": "n"})
    )

    def quad(b: pa.Table) -> pa.Table:
        n = b.column("n")
        return pa.table({
            "lang": b.column("lang"),
            "q": pc.multiply(n, pc.subtract(n, 1)),
            "n": n,
        })

    return (
        counts.map_batches(quad, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("q", alias_name="simpson_num"),
            Sum("n", alias_name="n_tokens"),
        )
    )


_SQL_LANG_WORD_SIMPSON = """
WITH c AS (
  SELECT lang, word, count(*)::BIGINT AS n FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
  ) GROUP BY lang, word
)
SELECT lang, sum(n * (n - 1))::BIGINT AS simpson_num,
       sum(n)::BIGINT AS n_tokens
FROM c GROUP BY lang
"""


def q_host_doc_gini(sf_dir: str):
    """Gini concentration of documents across hosts — THE skew metric
    the salted repartition defends against — in exact integer
    arithmetic: with per-host counts x_1<=...<=x_n (ties broken by
    host), G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)); numerator
    and denominator are emitted as BIGINTs. Host counts fold keys-only
    (bounded by |hosts|); the rank formula runs on that 95-row table."""
    from ray.data.aggregate import Count

    from webextract.sources.pages import pages_from_documents

    def host(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        hs = [int(u.split("//", 1)[1].split(".", 1)[0][4:]) for u in urls]
        return pa.table({"host": pa.array(hs, type=pa.int64())})

    counts = guarded_fold(
        pages_from_documents(sf_dir)
        .map_batches(host, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Count()),
        what="per-host doc counts")
    xs = sorted((int(r["count()"]), int(r["host"])) for r in counts)
    n = len(xs)
    total = sum(x for x, _ in xs)
    num = 2 * sum(i * x for i, (x, _) in enumerate(xs, 1)) \
        - (n + 1) * total
    return pa.table({
        "n_hosts": pa.array([n], type=pa.int64()),
        "gini_num": pa.array([num], type=pa.int64()),
        "gini_den": pa.array([n * total], type=pa.int64()),
    })


_SQL_HOST_DOC_GINI = (
    "WITH " + _splitmix_cte_sql() + """,
c AS (SELECT host, count(*)::BIGINT AS x FROM hosts GROUP BY host),
r AS (SELECT x, row_number() OVER (ORDER BY x, host) AS i FROM c),
t AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s,
             sum(i * x)::BIGINT AS ix FROM r)
SELECT n AS n_hosts, (2 * ix - (n + 1) * s)::BIGINT AS gini_num,
       (n * s)::BIGINT AS gini_den
FROM t
"""
)


def q_doc_dup_ngram_share(sf_dir: str):
    """Per-document duplication exposure: how many of a doc's distinct
    5-grams also appear in at least one OTHER document — the
    exact-substring contamination score dedup pipelines threshold on.
    Shape (round-5 rewrite): distinct (ngram, doc) explode map-side
    ONCE; ngram doc-frequency attached in the SAME exchange
    (``attach_group_size`` — COUNT OVER PARTITION BY ngram, no
    groupby + join-back); the dup flag and the per-doc (total, dup)
    counts then fold in one keys-only doc_id aggregation. One explode
    pass and two exchanges replace the old three explode passes and
    four exchanges. Integer outputs only."""
    from ray.data.aggregate import Count, Sum

    from webextract.functions.joins import attach_group_size
    from webextract.functions.ngrams import doc_ngram_pairs_batch

    pairs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: doc_ngram_pairs_batch(b, n=5), batch_format="pyarrow")
    sized = attach_group_size(
        pairs, on="ngram", out="df",
        schema=pa.schema([("doc_id", pa.int64()), ("ngram", pa.string())]))

    def flags(b: pa.Table) -> pa.Table:
        # drop the ngram string BEFORE the doc_id exchange: ints only
        dup = pc.cast(pc.greater_equal(b.column("df"), 2), pa.int64())
        return pa.table({"doc_id": b.column("doc_id"), "dup": dup})

    return (
        sized.map_batches(flags, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Count(), Sum("dup", alias_name="n_dup"))
        .rename_columns({"count()": "n_ngrams"})
        .select_columns(["doc_id", "n_ngrams", "n_dup"])
    )


_SQL_DOC_DUP_NGRAM_SHARE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (
  SELECT DISTINCT doc_id, array_to_string(words[i+1:i+5], ' ') AS ngram
  FROM w, unnest(range(0, greatest(len(words)-4, 0))) AS t(i)
),
d AS (SELECT ngram FROM g GROUP BY ngram HAVING count(*) >= 2)
SELECT g.doc_id, count(*)::BIGINT AS n_ngrams,
       count(*) FILTER (g.ngram IN (SELECT ngram FROM d))::BIGINT AS n_dup
FROM g GROUP BY g.doc_id
"""


def q_nation_region_cross(sf_dir: str):
    """CROSS join (bounded small side): every nation x region pair with
    an is_home flag — the enumeration shape for calendar/category
    scaffolds. The 5-row region side is broadcast by value into the
    nation scan; each input row fans out |regions| output rows
    map-side, no shuffle."""
    import ray.data

    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    rks = region.column("r_regionkey").to_pylist()
    rns = region.column("r_name").to_pylist()

    def cross(b: pa.Table) -> pa.Table:
        nk = b.column("n_nationkey").to_pylist()
        nrk = b.column("n_regionkey").to_pylist()
        out_nk: list = []
        out_rn: list = []
        flags: list = []
        for k, hr in zip(nk, nrk):
            for rk, rn in zip(rks, rns):
                out_nk.append(int(k))
                out_rn.append(rn)
                flags.append(1 if rk == hr else 0)
        return pa.table({
            "n_nationkey": pa.array(out_nk, type=pa.int64()),
            "r_name": pa.array(out_rn, type=pa.string()),
            "is_home": pa.array(flags, type=pa.int64()),
        })

    return ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).map_batches(cross, batch_format="pyarrow")


_SQL_NATION_REGION_CROSS = """
SELECT n_nationkey::BIGINT AS n_nationkey, r_name,
       (n_regionkey = r_regionkey)::BIGINT AS is_home
FROM nation CROSS JOIN region
"""


def q_key_overlap_profile(sf_dir: str):
    """Set-membership profile of two key universes (customer vs
    supplier keys): counts in both / customer-only / supplier-only.

    Round-5 shape: ONE `partition_apply` exchange over the tagged
    union (k, side-bit) replaces the old two distinct groupbys + three
    sequential semi/anti hash joins (five all-to-alls). Equal keys
    co-locate, so each partition classifies its keys with a
    dictionary-encode + two bincounts (side-0 seen, side-1 seen) and
    emits three partial counts; the finish folds 3 rows per
    partition."""
    import ray.data
    from ray.data.aggregate import Sum

    from webextract.functions.joins import partition_apply

    def tag(src: int):
        def fn(b: pa.Table) -> pa.Table:
            col = b.column(b.column_names[0]).cast(pa.int64())
            return pa.table({
                "k": col,
                "src": pa.array(
                    np.full(b.num_rows, src, dtype=np.int8),
                    type=pa.int8()),
            })
        return fn

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(tag(0), batch_format="pyarrow")
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey"]
    ).map_batches(tag(1), batch_format="pyarrow")

    out_schema = pa.schema([("membership", pa.string()),
                            ("n_keys", pa.int64())])

    def classify(t: pa.Table) -> pa.Table:
        k = t.column("k")
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        codes = np.asarray(k.dictionary_encode().indices)
        src = np.asarray(t.column("src").to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        nk = int(codes.max()) + 1 if codes.size else 0
        in_c = np.bincount(codes[src == 0], minlength=nk) > 0
        in_s = np.bincount(codes[src == 1], minlength=nk) > 0
        return pa.table({
            "membership": pa.array(
                ["both", "customer_only", "supplier_only"],
                type=pa.string()),
            "n_keys": pa.array(
                [int((in_c & in_s).sum()), int((in_c & ~in_s).sum()),
                 int((~in_c & in_s).sum())], type=pa.int64()),
        }, schema=out_schema)

    return (
        partition_apply(
            cust.union(supp), classify, on="k",
            schema=pa.schema([("k", pa.int64()), ("src", pa.int8())]),
            out_schema=out_schema)
        .groupby("membership")
        .aggregate(Sum("n_keys", alias_name="n_keys"))
    )


_SQL_KEY_OVERLAP_PROFILE = """
WITH c AS (SELECT DISTINCT c_custkey AS k FROM customer),
s AS (SELECT DISTINCT s_suppkey AS k FROM supplier)
SELECT 'both' AS membership,
       (SELECT count(*) FROM c WHERE k IN (SELECT k FROM s))::BIGINT
         AS n_keys
UNION ALL
SELECT 'customer_only',
       (SELECT count(*) FROM c WHERE k NOT IN (SELECT k FROM s))::BIGINT
UNION ALL
SELECT 'supplier_only',
       (SELECT count(*) FROM s WHERE k NOT IN (SELECT k FROM c))::BIGINT
"""


def q_interleave_positions(sf_dir: str):
    """Fair training-mix interleave: round-robin positions across
    languages (pos = per-lang rank * n_langs + lang index) — every
    language appears once per cycle regardless of size, the data-mixing
    schedule multi-source LLM training uses. Per-lang ranks come from
    the bucketed distributed prefix sum (functions/window.running_agg —
    hot-key safe); the 5-entry lang index broadcasts as a literal."""
    import ray
    from ray.data.aggregate import Count

    from webextract.functions.window import running_agg

    langs = sorted(
        r["lang"]
        for r in guarded_fold(
            _docs(sf_dir, ["lang"]).groupby("lang").aggregate(Count()),
            what="lang dim")
    )
    idx = {lg: i for i, lg in enumerate(langs)}
    k = len(langs)
    ref = ray.put(idx)

    ra = running_agg(
        _docs(sf_dir, ["doc_id", "lang", "n_chars"]),
        by="lang", order="doc_id", val="n_chars",
    )

    def pos(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        lgs = b.column("lang").to_pylist()
        rn = b.column("rn").to_numpy(zero_copy_only=False)
        p = (rn - 1) * k + np.array([m[lg] for lg in lgs], dtype=np.int64)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "lang": b.column("lang"),
            "pos": pa.array(p, type=pa.int64()),
        })

    return ra.map_batches(pos, batch_format="pyarrow")


_SQL_INTERLEAVE_POSITIONS = """
WITH n AS (SELECT count(DISTINCT lang)::BIGINT AS k FROM documents)
SELECT doc_id, lang,
       ((row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1) * n.k
        + (dense_rank() OVER (ORDER BY lang) - 1))::BIGINT AS pos
FROM documents, n
"""


def q_top_docs_page2(sf_dir: str):
    """LIMIT/OFFSET pagination: ranks 21-40 by length (n_chars DESC,
    doc_id ASC — total order). The engine fetches the bounded top-40
    (k rows per block through the exchange, the partial-top-k shape)
    and slices the page driver-side; OFFSET never needs more than
    offset+limit rows to materialize."""
    top = guarded_fold(
        _docs(sf_dir, ["doc_id", "n_chars"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(40),
        what="top-40 page fetch (limit-bounded)")
    page = top[20:40]
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in page], type=pa.int64()),
        "n_chars": pa.array([r["n_chars"] for r in page], type=pa.int64()),
    })


_SQL_TOP_DOCS_PAGE2 = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id LIMIT 20 OFFSET 20
"""


def q_corpus_report(sf_dir: str):
    """One-stop corpus health report (the run-summary a 100 TB job
    prints): row-class counts (corrupt / pdf / multi-column layouts),
    char totals, and distinct-language/source/vocabulary cardinalities
    — one flag-fold scan plus three keys-only distinct counts, folded
    to a fixed (metric, value) table."""
    from ray.data.aggregate import Count, Sum

    def flags(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        corrupt = (ids % 50 == 7)
        pdf = (ids % 25 == 3) & ~corrupt
        two = (ids % 17 == 5) & ~(ids % 25 == 3)
        three = (ids % 19 == 11) & ~(ids % 25 == 3) & ~(ids % 17 == 5)
        return pa.table({
            "corrupt": pa.array(corrupt.astype("int64")),
            "pdf": pa.array(pdf.astype("int64")),
            "twocol": pa.array(two.astype("int64")),
            "threecol": pa.array(three.astype("int64")),
            "n_chars": b.column("n_chars"),
        })

    agg = (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .map_batches(flags, batch_format="pyarrow")
        .aggregate(Count(), Sum("corrupt"), Sum("pdf"), Sum("twocol"),
                   Sum("threecol"), Sum("n_chars"))
    )

    def distinct(col):
        from ray.data.aggregate import Count as C

        return int(
            _docs(sf_dir, [col]).groupby(col).aggregate(C()).count()
        )

    from webextract.functions.ngrams import word_doc_pairs_batch

    vocab = int(
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(word_doc_pairs_batch, batch_format="pyarrow")
        .groupby("word").aggregate(Count()).count()
    )
    rows = [
        ("n_docs", int(agg["count()"])),
        ("n_corrupt", int(agg["sum(corrupt)"])),
        ("n_pdf", int(agg["sum(pdf)"])),
        ("n_twocol", int(agg["sum(twocol)"])),
        ("n_threecol", int(agg["sum(threecol)"])),
        ("total_chars", int(agg["sum(n_chars)"])),
        ("n_langs", distinct("lang")),
        ("n_sources", distinct("source")),
        ("vocab_size", vocab),
    ]
    return pa.table({
        "metric": pa.array([r[0] for r in rows], type=pa.string()),
        "value": pa.array([r[1] for r in rows], type=pa.int64()),
    })


_SQL_CORPUS_REPORT = """
SELECT 'n_docs' AS metric, count(*)::BIGINT AS value FROM documents
UNION ALL
SELECT 'n_corrupt', count(*) FILTER (doc_id % 50 = 7)::BIGINT
FROM documents
UNION ALL
SELECT 'n_pdf',
       count(*) FILTER (doc_id % 25 = 3 AND doc_id % 50 <> 7)::BIGINT
FROM documents
UNION ALL
SELECT 'n_twocol',
       count(*) FILTER (doc_id % 17 = 5 AND doc_id % 25 <> 3)::BIGINT
FROM documents
UNION ALL
SELECT 'n_threecol',
       count(*) FILTER (doc_id % 19 = 11 AND doc_id % 25 <> 3
                        AND doc_id % 17 <> 5)::BIGINT
FROM documents
UNION ALL
SELECT 'total_chars', sum(n_chars)::BIGINT FROM documents
UNION ALL
SELECT 'n_langs', count(DISTINCT lang)::BIGINT FROM documents
UNION ALL
SELECT 'n_sources', count(DISTINCT source)::BIGINT FROM documents
UNION ALL
SELECT 'vocab_size', count(DISTINCT word)::BIGINT FROM (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
)
"""


def q_user_median_gap(sf_dir: str):
    """Per-user MEDIAN inter-event gap in whole seconds (quantile_disc
    convention, rank ceil(n/2)-1): gaps computed by one vectorized
    sort+diff per group — group size bounded by per-key activity, the
    sessionize contract. Users with a single event drop (no gap),
    matching the SQL lag filter."""
    import ray.data

    def us(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": pc.cast(b.column("ts"), pa.int64()),
        })

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(us, batch_format="pyarrow")

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("median_gap_s", pa.int64()),
                            ("n_gaps", pa.int64())])

    def med_part(t: pa.Table) -> pa.Table:
        """All users of one hash partition in one vectorized pass
        (round-5: the per-user map_groups paid one Python call per
        user): sort by (user, ts); within-run gaps are the global diff
        masked at user boundaries; per-user gap medians via ONE lexsort
        of (run, gap) and indexed gap-run starts."""
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        s = t.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, u))
        u, s = u[order], s[order]
        same = u[1:] == u[:-1]
        gaps = (np.diff(s) // 1_000_000)[same]
        if gaps.size == 0:
            return out_schema.empty_table()
        run_start_flags = np.r_[0, (~same).astype(np.int64)]
        run = np.cumsum(run_start_flags)  # run id per row
        grun = run[1:][same]              # run id per gap
        go = np.lexsort((gaps, grun))
        grun, gaps = grun[go], gaps[go]
        gstarts = np.r_[0, np.nonzero(grun[1:] != grun[:-1])[0] + 1]
        gcounts = np.r_[gstarts[1:], gaps.size] - gstarts
        # ceil(n/2) - 1 == (n - 1) // 2 for n >= 1
        k = (gcounts - 1) // 2
        row_starts = np.r_[0, np.nonzero(~same)[0] + 1]
        users_per_run = u[row_starts]
        med_users = users_per_run[np.unique(grun)]
        return pa.table({
            "user_id": pa.array(med_users, type=pa.int64()),
            "median_gap_s": pa.array(gaps[gstarts + k], type=pa.int64()),
            "n_gaps": pa.array(gcounts, type=pa.int64()),
        }, schema=out_schema)

    from webextract.functions.joins import partition_apply

    return partition_apply(
        ev, med_part, on="user_id",
        schema=pa.schema([("user_id", pa.int64()), ("ts_us", pa.int64())]),
        out_schema=out_schema)


_SQL_USER_MEDIAN_GAP = """
WITH l AS (
  SELECT user_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts),
                   ts) // 1000000 AS gap_s
  FROM events
)
SELECT user_id, quantile_disc(gap_s, 0.5)::BIGINT AS median_gap_s,
       count(*)::BIGINT AS n_gaps
FROM l WHERE gap_s IS NOT NULL GROUP BY user_id
"""


def q_types_per_user_hist(sf_dir: str):
    """Behavioral-diversity distribution: how many users touch k
    distinct event types — two keys-only groupbys (distinct pairs,
    per-user count, count-of-counts)."""
    import ray.data
    from ray.data.aggregate import Count

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return (
        ev.groupby(["user_id", "event_type"])
        .aggregate(Count())
        .groupby("user_id")
        .aggregate(Count())
        .rename_columns({"count()": "n_types"})
        .groupby("n_types")
        .aggregate(Count())
        .rename_columns({"count()": "n_users"})
    )


_SQL_TYPES_PER_USER_HIST = """
WITH u AS (
  SELECT user_id, count(DISTINCT event_type)::BIGINT AS n_types
  FROM events GROUP BY user_id
)
SELECT n_types, count(*)::BIGINT AS n_users FROM u GROUP BY n_types
"""


def q_doc_type_token(sf_dir: str):
    """Type-token counts per document (the lexical-richness / TTR
    inputs, kept as exact integers — the ratio is the caller's single
    division): pure map-side, no shuffle."""

    def tt(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        types: list = []
        tokens: list = []
        for t in b.column("text").to_pylist():
            ws = t.split(" ")
            tokens.append(len(ws))
            types.append(len(set(ws)))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_types": pa.array(types, type=pa.int64()),
            "n_tokens": pa.array(tokens, type=pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tt, batch_format="pyarrow"
    )


_SQL_DOC_TYPE_TOKEN = """
SELECT doc_id,
       len(list_distinct(string_split(text, ' ')))::BIGINT AS n_types,
       len(string_split(text, ' '))::BIGINT AS n_tokens
FROM documents
"""


def q_cents_log2_hist(sf_dir: str):
    """Log2-bucketed value histogram — the heavy-tail binning for money
    / size columns, in EXACT integer arithmetic: bucket = bit_length(x)
    - 1 (engine int.bit_length, oracle len(bin(x)) — no float log
    anywhere). Map-side bucket, one keys-only groupby."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    def bucket(b: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("value"), 100.0), 0.5)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        buckets = np.array([int(x).bit_length() - 1 if x > 0 else -1
                            for x in c], dtype=np.int64)
        return pa.table({
            "log2_bucket": pa.array(buckets, type=pa.int64()),
            "cents": pa.array(c, type=pa.int64()),
        })

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["value"]
    )
    return (
        ev.map_batches(bucket, batch_format="pyarrow")
        .groupby("log2_bucket")
        .aggregate(Count(), Sum("cents", alias_name="total_cents"))
        .rename_columns({"count()": "n_events"})
    )


_SQL_CENTS_LOG2_HIST = """
WITH c AS (
  SELECT floor(value * 100.0 + 0.5)::BIGINT AS cents FROM events
)
SELECT (CASE WHEN cents > 0 THEN len(bin(cents)) - 1
             ELSE -1 END)::BIGINT AS log2_bucket,
       count(*)::BIGINT AS n_events,
       sum(cents)::BIGINT AS total_cents
FROM c GROUP BY log2_bucket
"""


def q_disc_band_revenue(sf_dir: str):
    """Revenue by discount band (5% buckets): band = floor(d * 20) —
    identical IEEE multiply+floor both sides — with exact integer-cents
    revenue per band."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    def bands(b: pa.Table) -> pa.Table:
        band = pc.cast(
            pc.floor(pc.multiply(b.column("l_discount"), 20.0)), pa.int64()
        )
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(1.0, b.column("l_discount")),
        )
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(rev, 100.0), 0.5)), pa.int64()
        )
        return pa.table({"band": band, "cents": c})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_discount", "l_extendedprice"],
    )
    return (
        li.map_batches(bands, batch_format="pyarrow")
        .groupby("band")
        .aggregate(Count(), Sum("cents", alias_name="revenue_cents"))
        .rename_columns({"count()": "n_lines"})
    )


_SQL_DISC_BAND_REVENUE = """
SELECT floor(l_discount * 20.0)::BIGINT AS band,
       count(*)::BIGINT AS n_lines,
       sum(floor(l_extendedprice * (1 - l_discount) * 100.0
                 + 0.5)::BIGINT)::BIGINT AS revenue_cents
FROM lineitem GROUP BY band
"""


def q_user_daily_dispersion(sf_dir: str):
    """Burstiness inputs per user: over their active days, the count of
    days plus sum and sum-of-squares of daily event counts — exact
    integers (variance-to-mean is the caller's division). Two keys-only
    groupbys: (user, day) counts, then per-user quadratic fold."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    def keyed(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(b.column("ts"), pa.int64())
        day = pc.cast(
            pc.divide(ts_us, pa.scalar(86_400_000_000, type=pa.int64())),
            pa.int64(),
        )
        return pa.table({"user_id": b.column("user_id"), "day": day})

    daily = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(keyed, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Count())
        .rename_columns({"count()": "c"})
    )

    def quad(b: pa.Table) -> pa.Table:
        c = b.column("c")
        return pa.table({
            "user_id": b.column("user_id"),
            "c": c,
            "c2": pc.multiply(c, c),
        })

    return (
        daily.map_batches(quad, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Count(),
            Sum("c", alias_name="sum_c"),
            Sum("c2", alias_name="sum_c2"),
        )
        .rename_columns({"count()": "n_days"})
    )


_SQL_USER_DAILY_DISPERSION = """
WITH d AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         count(*)::BIGINT AS c
  FROM events GROUP BY user_id, day
)
SELECT user_id, count(*)::BIGINT AS n_days, sum(c)::BIGINT AS sum_c,
       sum(c * c)::BIGINT AS sum_c2
FROM d GROUP BY user_id
"""


def q_tax_disc_hist2d(sf_dir: str):
    """Two-dimensional histogram: (tax band, discount band) cell counts
    over lineitem — both bands exact floor(x*20) integer buckets,
    one keys-only pair groupby."""
    import ray.data
    from ray.data.aggregate import Count

    def bands(b: pa.Table) -> pa.Table:
        return pa.table({
            "tax_band": pc.cast(
                pc.floor(pc.multiply(b.column("l_tax"), 20.0)), pa.int64()),
            "disc_band": pc.cast(
                pc.floor(pc.multiply(b.column("l_discount"), 20.0)),
                pa.int64()),
        })

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_tax", "l_discount"]
    )
    return (
        li.map_batches(bands, batch_format="pyarrow")
        .groupby(["tax_band", "disc_band"])
        .aggregate(Count())
        .rename_columns({"count()": "n_lines"})
    )


_SQL_TAX_DISC_HIST2D = """
SELECT floor(l_tax * 20.0)::BIGINT AS tax_band,
       floor(l_discount * 20.0)::BIGINT AS disc_band,
       count(*)::BIGINT AS n_lines
FROM lineitem GROUP BY tax_band, disc_band
"""


def q_word_length_hist(sf_dir: str):
    """Corpus-wide word-length distribution: vectorized explode
    (split_pattern + utf8_length) pre-folded to a per-block histogram,
    so the single keys-only groupby exchanges ~a dozen (wlen, count)
    rows per block instead of one row per word."""
    from ray.data.aggregate import Sum

    def block_hist(b: pa.Table) -> pa.Table:
        texts = b.column("text").combine_chunks()
        lists = pc.split_pattern(pc.fill_null(texts, ""), " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lens = pc.utf8_length(lists.flatten()).cast(pa.int64())
        agg = (pa.table({"wlen": lens})
               .group_by("wlen").aggregate([([], "count_all")]))
        return pa.table({"wlen": agg.column("wlen"),
                         "n_words": agg.column("count_all").cast(pa.int64())})

    return (
        _docs(sf_dir, ["text"])
        .map_batches(block_hist, batch_format="pyarrow")
        .groupby("wlen")
        .aggregate(Sum("n_words", alias_name="n_words"))
    )


_SQL_WORD_LENGTH_HIST = """
SELECT length(word)::BIGINT AS wlen, count(*)::BIGINT AS n_words
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
GROUP BY wlen
"""


def q_lang_xor_checksum(sf_dir: str):
    """Per-group XOR checksum — a CUSTOM aggregate Ray doesn't ship:
    per-batch partial XOR of 60-bit md5(text) prefixes per language
    (the combiner), then a per-lang map_groups XOR of the partials.
    Order-invariant by construction, so layout never matters; the
    audit-grade drift detector per partition key."""
    import hashlib

    def partial(b: pa.Table) -> pa.Table:
        acc: dict = {}
        for lg, t in zip(b.column("lang").to_pylist(),
                         b.column("text").to_pylist()):
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            acc[lg] = acc.get(lg, 0) ^ h
        langs = sorted(acc)
        return pa.table({
            "lang": pa.array(langs, type=pa.string()),
            "x": pa.array([acc[lg] for lg in langs], type=pa.int64()),
        })

    out_schema = pa.schema([("lang", pa.string()),
                            ("checksum", pa.int64())])

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        x = 0
        for v in group.column("x").to_pylist():
            x ^= int(v)
        return pa.table({
            "lang": group.column("lang").slice(0, 1),
            "checksum": pa.array([x], type=pa.int64()),
        }, schema=out_schema)

    return (
        _docs(sf_dir, ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(fold, batch_format="pyarrow")
    )


_SQL_LANG_XOR_CHECKSUM = """
SELECT lang,
       bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT)::BIGINT
         AS checksum
FROM documents GROUP BY lang
"""


def q_lines_per_order_hist(sf_dir: str):
    """Lineitem fan-out distribution: histogram of lines per order —
    two keys-only groupbys over the biggest table."""
    import ray.data
    from ray.data.aggregate import Count

    per_order = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
        )
        .groupby("l_orderkey")
        .aggregate(Count())
        .rename_columns({"count()": "n_lines"})
    )
    return (
        per_order.groupby("n_lines")
        .aggregate(Count())
        .rename_columns({"count()": "n_orders"})
    )


_SQL_LINES_PER_ORDER_HIST = """
WITH o AS (
  SELECT l_orderkey, count(*)::BIGINT AS n_lines
  FROM lineitem GROUP BY l_orderkey
)
SELECT n_lines, count(*)::BIGINT AS n_orders FROM o GROUP BY n_lines
"""


def q_user_decay_score(sf_dir: str):
    """Half-life-decayed per-user activity score — the freshness-weighted
    engagement fold every recency-aware sampler/ranker runs. Each event
    contributes ``floor(1000 * 2^-k + 0.5)`` milli-units where
    ``k = min(age_days // 3, 10)`` against a fixed anchor instant; the
    weight table is exact in IEEE (integer multiples of powers of two),
    so per-row quantize-to-int64 THEN sum is bit-identical to the SQL
    mirror regardless of summation order.

    Scale shape: one vectorized weight kernel per block, a block-local
    (user_id, sum) combiner, then ONE user-keyed keys-only exchange —
    nothing else moves."""
    import numpy as np
    import ray.data
    from ray.data.aggregate import Sum

    anchor_us = 1_706_745_600_000_000  # 2024-02-01 00:00:00 UTC

    def weigh(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.int64())})
        ts = np.asarray(
            b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .combine_chunks())
        k = np.minimum((anchor_us - ts) // 86_400_000_000 // 3, 10)
        w = np.floor(np.ldexp(1000.0, -k.astype(np.int64)) + 0.5) \
            .astype(np.int64)
        blk = pa.table({"user_id": b.column("user_id"),
                        "w": pa.array(w, type=pa.int64())})
        agg = blk.group_by("user_id").aggregate([("w", "sum")])
        return pa.table({"user_id": agg.column("user_id"),
                         "w": agg.column("w_sum")})

    return (
        ray.data.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["user_id", "ts"])
        .map_batches(weigh, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("w", alias_name="decayed_milli"))
    )


_SQL_USER_DECAY_SCORE = """
SELECT user_id,
       sum(CAST(floor(1000.0 * pow(2.0, -least(
             (epoch_us(TIMESTAMP '2024-02-01 00:00:00') - epoch_us(ts))
               // 86400000000 // 3, 10)) + 0.5) AS BIGINT))::BIGINT
         AS decayed_milli
FROM events
GROUP BY user_id
"""
