"""Window/OLAP, aggregate/set extensions, FULL OUTER/CUBE (split from __ray_entry__.py).

See webextract/queries/__init__.py for the assembled surface.
"""

from __future__ import annotations

import pyarrow as pa
from webextract.queries._shared import _docs


# --------------------------------------------------------------------------
# Round-3 batch 7: window/OLAP — running aggregates, rollup, pivot,
# per-group quantiles, funnel, left + salted joins
# --------------------------------------------------------------------------


def q_docs_running(sf_dir: str):
    """Per-language running character totals + row numbers (the SQL
    ``SUM OVER (PARTITION BY lang ORDER BY doc_id)`` pair) via the
    bucketed distributed prefix sum (functions/window.running_agg): group
    size is bounded by bucket density, never by language frequency — the
    hot-key-safe shape a 100 TB per-language scan needs."""
    from webextract.functions.window import running_agg

    return running_agg(
        _docs(sf_dir, ["doc_id", "lang", "n_chars"]),
        by="lang", order="doc_id", val="n_chars", bucket_width=256)


_SQL_DOCS_RUNNING = """
SELECT lang, doc_id, n_chars,
  (sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id))::BIGINT
    AS running_n_chars,
  (row_number() OVER (PARTITION BY lang ORDER BY doc_id))::BIGINT AS rn
FROM documents
"""


def q_docs_rollup(sf_dir: str):
    """GROUP BY ROLLUP(lang, source): finest level is the only full-data
    shuffle; the (lang) and () levels fold the bounded finest aggregate
    (functions/window.rollup_counts)."""
    from webextract.functions.window import rollup_counts

    return rollup_counts(_docs(sf_dir, ["lang", "source", "n_chars"]),
                         a="lang", b="source", val="n_chars")


_SQL_DOCS_ROLLUP = """
SELECT lang, source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS chars
FROM documents GROUP BY ROLLUP(lang, source)
"""


def q_lang_source_pivot(sf_dir: str):
    """Wide pivot: one row per lang, one count column per source
    src0..src4 (closed category list — conditional aggregation, SQL
    FILTER clauses)."""
    from webextract.functions.window import pivot_counts

    return pivot_counts(
        _docs(sf_dir, ["lang", "source", "n_chars"]),
        index="lang", pivot="source",
        categories=[f"src{i}" for i in range(5)], val="n_chars")


_SQL_LANG_SOURCE_PIVOT = """
SELECT lang,
  count(*) FILTER (WHERE source = 'src0')::BIGINT AS src0,
  count(*) FILTER (WHERE source = 'src1')::BIGINT AS src1,
  count(*) FILTER (WHERE source = 'src2')::BIGINT AS src2,
  count(*) FILTER (WHERE source = 'src3')::BIGINT AS src3,
  count(*) FILTER (WHERE source = 'src4')::BIGINT AS src4
FROM documents
WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
GROUP BY lang
"""


def q_doc_length_quantiles_by_lang(sf_dir: str):
    """EXACT per-language quantiles over the bounded-cardinality length
    column: one row per distinct (lang, n_chars) crosses the shuffle
    (functions/window.group_quantiles)."""
    from webextract.functions.window import group_quantiles

    return group_quantiles(_docs(sf_dir, ["lang", "n_chars"]),
                           by="lang", val="n_chars")


_SQL_QUANTILES_BY_LANG = """
SELECT lang, 0.5::DOUBLE AS q, quantile_disc(n_chars, 0.5)::BIGINT AS value
FROM documents GROUP BY lang
UNION ALL
SELECT lang, 0.9::DOUBLE, quantile_disc(n_chars, 0.9)::BIGINT
FROM documents GROUP BY lang
UNION ALL
SELECT lang, 0.99::DOUBLE, quantile_disc(n_chars, 0.99)::BIGINT
FROM documents GROUP BY lang
"""


def q_events_funnel(sf_dir: str):
    """Ordered-step conversion funnel view -> click -> purchase per user
    (functions/window.funnel): step i is reached at the earliest event of
    its type at-or-after step i-1's reach time; per-step user counts are
    summed with one partial+final aggregate."""
    import ray.data

    from webextract.functions.window import funnel

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"])
    return funnel(ds, by="user_id", ts="ts", step_col="event_type",
                  steps=["view", "click", "purchase"])


_SQL_EVENTS_FUNNEL = """
WITH s0 AS (
  SELECT user_id, min(epoch_us(ts)) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s1 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e
  JOIN s0 ON e.user_id = s0.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s0.t
  GROUP BY e.user_id
),
s2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s1.t
  GROUP BY e.user_id
)
SELECT 'view' AS step, (SELECT count(*) FROM s0)::BIGINT AS n_users
UNION ALL
SELECT 'click', (SELECT count(*) FROM s1)::BIGINT
UNION ALL
SELECT 'purchase', (SELECT count(*) FROM s2)::BIGINT
"""


def q_orders_customers_left(sf_dir: str):
    """LEFT OUTER hash join: every order keeps its row; orders whose
    customer is outside the c_custkey <= 500 cut get a NULL c_name
    (functions/joins.hash_join how="left")."""
    import ray.data

    from webextract.functions.joins import hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"]
    ).rename_columns({"o_custkey": "c_custkey"})
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).filter(expr="c_custkey <= 500")
    return hash_join(orders, cust, on="c_custkey", how="left")


_SQL_ORDERS_CUSTOMERS_LEFT = """
SELECT o_custkey AS c_custkey, o_orderkey, c_name
FROM orders LEFT JOIN (
  SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 500
) c ON o_custkey = c.c_custkey
"""


def q_orders_customers_salted(sf_dir: str):
    """The inner orders x customers join through the SKEW-DEFEATING salted
    path (functions/joins.salted_hash_join): left keys split across 4
    deterministic salts, right side replicated per salt — same result as
    the plain hash join, per-group cross products bounded by ~1/4."""
    import ray.data

    from webextract.functions.joins import salted_hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"]
    ).rename_columns({"o_custkey": "c_custkey"})
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    return salted_hash_join(
        orders, cust, on="c_custkey", salt_from="o_orderkey", n_salt=4,
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("o_orderkey", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()),
                                ("c_name", pa.string())]))


# --------------------------------------------------------------------------
# Round-3 batch 8: aggregate/set extensions — exact count-distinct,
# variance from integer partials, ordered string_agg, set ops,
# deterministic hash sampling, KLL quantile sketch
# --------------------------------------------------------------------------


def q_users_per_type(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event type — two keys-only
    groupby stages (functions/agg.count_distinct_by), no payload ever
    shuffled and no driver-side set."""
    import ray.data

    from webextract.functions.agg import count_distinct_by

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    return count_distinct_by(ds, by="event_type", of="user_id")


_SQL_USERS_PER_TYPE = """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_distinct
FROM events GROUP BY event_type
"""


def q_chars_moments_by_lang(sf_dir: str):
    """Per-language sample variance/stddev of doc length from exact int64
    partial sums + ONE final double expression (functions/agg.moments_by)
    — bit-identical to the SQL oracle computing the same literal formula
    over the same integer aggregates (the tfidf integer-ratio
    discipline)."""
    from webextract.functions.agg import moments_by

    return moments_by(_docs(sf_dir, ["lang", "n_chars"]),
                      by="lang", val="n_chars")


_SQL_CHARS_MOMENTS = """
SELECT lang, count(*)::BIGINT AS n,
  (count(*) * sum(n_chars * n_chars) - sum(n_chars) * sum(n_chars))::DOUBLE
    / (count(*) * (count(*) - 1))::DOUBLE AS var_samp,
  sqrt(
    (count(*) * sum(n_chars * n_chars) - sum(n_chars) * sum(n_chars))::DOUBLE
      / (count(*) * (count(*) - 1))::DOUBLE) AS std_samp
FROM documents GROUP BY lang
"""


def q_docs_collect_per_lang(sf_dir: str):
    """Ordered per-group string_agg: doc_ids of long docs (n_chars > 500)
    per language, ascending, comma-joined (functions/agg.collect_sorted;
    group size bounded by the upstream filter, cap raises — no silent
    truncation)."""
    from webextract.functions.agg import collect_sorted

    ds = _docs(sf_dir, ["lang", "doc_id", "n_chars"]).filter(
        expr="n_chars > 500").select_columns(["lang", "doc_id"])
    return collect_sorted(ds, by="lang", val="doc_id")


_SQL_COLLECT_PER_LANG = """
SELECT lang, string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS vals
FROM documents WHERE n_chars > 500 GROUP BY lang
"""


def q_langs_src_intersect(sf_dir: str):
    """SQL INTERSECT over derived key sets: languages appearing in BOTH
    src0 and src1 documents (functions/agg.key_intersect — per-side
    distinct + semi probe, three keys-only shuffles)."""
    from webextract.functions.agg import key_intersect

    ks = pa.schema([("lang", pa.string())])
    left = _docs(sf_dir, ["lang", "source"]).filter(
        expr="source == 'src0'").select_columns(["lang"])
    right = _docs(sf_dir, ["lang", "source"]).filter(
        expr="source == 'src1'").select_columns(["lang"])
    return key_intersect(left, right, on="lang",
                         left_schema=ks, right_schema=ks)


_SQL_LANGS_INTERSECT = """
SELECT lang FROM documents WHERE source = 'src0'
INTERSECT
SELECT lang FROM documents WHERE source = 'src1'
"""


def q_custkeys_except(sf_dir: str):
    """SQL EXCEPT over key sets: customer keys absent from the first 1000
    orderkeys (functions/agg.key_except — distinct + anti probe; the cut
    keeps the result non-trivial, as in `customers_no_orders` — the full
    orders table covers every customer in this synthetic data)."""
    import ray.data

    from webextract.functions.agg import key_except

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])
    orders = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_orderkey"])
        .filter(expr="o_orderkey <= 1000")
        .select_columns(["o_custkey"])
        .rename_columns({"o_custkey": "c_custkey"})
    )
    ks = pa.schema([("c_custkey", pa.int64())])
    return key_except(cust, orders, on="c_custkey",
                      left_schema=ks, right_schema=ks)


_SQL_CUSTKEYS_EXCEPT = """
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderkey <= 1000
"""


def q_docs_sample_per_lang(sf_dir: str):
    """Deterministic pseudo-uniform 3-sample per language: priority =
    md5(doc_id) hex, k smallest per group, per-block partial top-k first
    so the final shuffle moves <= k rows per (block, lang)
    (functions/agg.hash_sample_per_group)."""
    from webextract.functions.agg import hash_sample_per_group

    return hash_sample_per_group(_docs(sf_dir, ["lang", "doc_id"]),
                                 by="lang", id_col="doc_id", k=3)


_SQL_SAMPLE_PER_LANG = """
SELECT lang, doc_id FROM documents
QUALIFY row_number() OVER (
  PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id) <= 3
"""


def q_doc_length_quantiles_sketch(sf_dir: str):
    """KLL-style streaming quantile sketch over doc lengths — the
    UNBOUNDED-cardinality companion to the exact histogram-fold
    quantiles: per-block O(k log) partials, distributed fold, <= 2% rank
    error pinned by pytest (functions/sketches.approx_quantiles).
    Approximate by construction -> rows-only at the driver."""
    from webextract.functions.sketches import approx_quantiles

    return approx_quantiles(_docs(sf_dir, ["n_chars"]), "n_chars",
                            (0.5, 0.9, 0.99))


# --------------------------------------------------------------------------
# Round-3 batch 9: FULL OUTER join, CUBE, interpolated quantiles
# --------------------------------------------------------------------------


def q_orders_customers_full(sf_dir: str):
    """FULL OUTER hash join with misses on BOTH sides: orders cut to
    o_orderkey <= 1000 (their customers partly outside the right cut) vs
    customers cut to c_custkey <= 500 (partly orderless within the left
    cut) — unmatched rows survive from each side with typed NULL payload
    (functions/joins.hash_join how="full")."""
    import ray.data

    from webextract.functions.joins import hash_join

    orders = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_orderkey"])
        .filter(expr="o_orderkey <= 1000")
        .rename_columns({"o_custkey": "c_custkey"})
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).filter(expr="c_custkey <= 500")
    return hash_join(orders, cust, on="c_custkey", how="full")


_SQL_ORDERS_CUSTOMERS_FULL = """
SELECT coalesce(o.o_custkey, c.c_custkey) AS c_custkey, o.o_orderkey, c.c_name
FROM (SELECT o_custkey, o_orderkey FROM orders WHERE o_orderkey <= 1000) o
FULL OUTER JOIN
     (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 500) c
ON o.o_custkey = c.c_custkey
"""


def q_docs_cube(sf_dir: str):
    """GROUP BY CUBE(lang, source): rollup levels plus the source margin,
    all folded from the bounded finest aggregate
    (functions/window.cube_counts)."""
    from webextract.functions.window import cube_counts

    return cube_counts(_docs(sf_dir, ["lang", "source", "n_chars"]),
                       a="lang", b="source", val="n_chars")


_SQL_DOCS_CUBE = """
SELECT lang, source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS chars
FROM documents GROUP BY CUBE(lang, source)
"""


def q_doc_length_quantiles_cont(sf_dir: str):
    """INTERPOLATED per-language quantiles (SQL quantile_cont) from the
    bounded histogram shuffle — bit-identical to DuckDB's
    (1-f)*v_lo + f*v_hi evaluation order
    (functions/window.group_quantiles_cont)."""
    from webextract.functions.window import group_quantiles_cont

    return group_quantiles_cont(_docs(sf_dir, ["lang", "n_chars"]),
                                by="lang", val="n_chars")


_SQL_QUANTILES_CONT = """
SELECT lang, 0.5::DOUBLE AS q, quantile_cont(n_chars, 0.5) AS value
FROM documents GROUP BY lang
UNION ALL
SELECT lang, 0.9::DOUBLE, quantile_cont(n_chars, 0.9)
FROM documents GROUP BY lang
UNION ALL
SELECT lang, 0.99::DOUBLE, quantile_cont(n_chars, 0.99)
FROM documents GROUP BY lang
"""
