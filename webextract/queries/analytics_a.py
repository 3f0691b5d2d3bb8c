"""Analytics sweep A: sequences, retention, profiling (split from __ray_entry__.py).

See webextract/queries/__init__.py for the assembled surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from webextract.queries._shared import _conc, _docs, guarded_fold
from webextract.queries.flagship import _extract_ds, _links_ds
from webextract.queries.dedup import _SQL_DEDUP_CLUSTERS, q_dedup_clusters
from webextract.queries.windows_ml import _events_ts


# --------------------------------------------------------------------------
# Round-3 batch 16: sequence mining + cohort retention
# --------------------------------------------------------------------------


def q_event_transitions(sf_dir: str):
    """Markov transition counts over per-user event sequences: LAG pairs
    (prev_event_type -> event_type) counted corpus-wide — the
    sequence-mining artifact behind session models. Composes key_lag's
    keys-only shuffle with one tiny pair aggregate; event types ride as
    dictionary ints through the lag, decoded only in the final rows."""
    import ray.data
    from ray.data.aggregate import Count

    from webextract.functions.temporal import key_lag

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
    types = sorted(r["event_type"] for r in guarded_fold(
        ds.groupby("event_type").aggregate(Count()),
        what="event_transitions event_type dim"))
    if len(types) > 8:
        raise ValueError("event_transitions: pk packing supports <= 8 "
                         "event types; widen the packing stride")
    t2i = {t: i for i, t in enumerate(types)}

    def conv(b: pa.Table) -> pa.Table:
        import numpy as np

        tids = np.array([t2i[t] for t in
                         b.column("event_type").to_pylist()],
                        dtype=np.int64)
        eids = b.column("event_id").to_numpy(zero_copy_only=False)
        # payload carries (event_id, type) packed so the lag order stays
        # (ts, event_id) — event_id is unique, so packing preserves it
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": b.column("ts").cast(pa.int64()),
            "pk": pa.array(eids * 8 + tids),
        })

    lagged = key_lag(ds.map_batches(conv, batch_format="pyarrow"),
                     by="user_id", ts="ts_us", payload="pk")

    def pairs(b: pa.Table) -> pa.Table:
        import numpy as np

        cur = b.column("pk").to_numpy(zero_copy_only=False) % 8
        prev = b.column("prev_pk").to_numpy(zero_copy_only=False) % 8
        return pa.table({
            "prev_type": pa.array([types[i] for i in prev],
                                  type=pa.string()),
            "event_type": pa.array([types[i] for i in cur],
                                   type=pa.string()),
        })

    return (
        lagged.map_batches(pairs, batch_format="pyarrow")
        .groupby(["prev_type", "event_type"]).aggregate(Count())
        .rename_columns({"count()": "n"})
    )


_SQL_EVENT_TRANSITIONS = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
  FROM events
),
l AS (
  SELECT user_id, event_type,
    lag(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts_us, event_id) AS prev_type
  FROM e
)
SELECT prev_type, event_type, count(*)::BIGINT AS n
FROM l WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


def q_user_retention(sf_dir: str):
    """Cohort retention: users grouped by first-seen day, distinct
    active users per (cohort_day, active_day) — the product-analytics
    staple.

    Round-5 shape: ONE `partition_apply` exchange by user_id replaces
    the old first_by exchange + cohort hash_join + packed-key distinct
    (three all-to-alls). Each partition holds every row of its users,
    so the per-user arg-min cohort AND the distinct active days fall
    out of one numpy lexsort pass (run boundaries + a composite
    (run, day) unique); the emitted (cohort_day, active_day) rows are
    already distinct per user, so the finish is a single keys-only
    two-column count."""
    from ray.data.aggregate import Count

    from webextract.functions.joins import partition_apply

    DAY = 86_400_000_000
    ev = _events_ts(sf_dir)

    out_schema = pa.schema([("cohort_day", pa.int64()),
                            ("active_day", pa.int64())])

    def per_user(t: pa.Table) -> pa.Table:
        uid = np.asarray(t.column("user_id").to_numpy(
            zero_copy_only=False), dtype=np.int64)
        ts = np.asarray(t.column("ts_us").to_numpy(
            zero_copy_only=False), dtype=np.int64)
        eid = np.asarray(t.column("event_id").to_numpy(
            zero_copy_only=False), dtype=np.int64)
        # sort by (user, ts, event_id): run starts are each user's
        # arg-min row -> cohort day; np.lexsort's LAST key is primary
        perm = np.lexsort((eid, ts, uid))
        u, day = uid[perm], ts[perm] // DAY
        starts = np.r_[0, np.nonzero(u[1:] != u[:-1])[0] + 1]
        flags = np.zeros(u.size, dtype=np.int64)
        flags[starts] = 1
        run = np.cumsum(flags) - 1
        # distinct (user-run, active day): days are < 2^31, runs < 2^31
        comp = np.unique(run.astype(np.int64) * (1 << 32) + day)
        r, d = comp >> 32, comp & ((1 << 32) - 1)
        return pa.table({
            "cohort_day": pa.array(day[starts][r], type=pa.int64()),
            "active_day": pa.array(d, type=pa.int64()),
        }, schema=out_schema)

    pairs = partition_apply(
        ev, per_user, on="user_id",
        schema=pa.schema([("user_id", pa.int64()), ("ts_us", pa.int64()),
                          ("event_id", pa.int64())]),
        out_schema=out_schema)
    return (
        pairs.groupby(["cohort_day", "active_day"])
        .aggregate(Count())
        .rename_columns({"count()": "n_users"})
    )


_SQL_USER_RETENTION = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         epoch_us(ts) AS ts_us, event_id
  FROM events
),
c AS (
  SELECT user_id, day AS cohort_day FROM e
  QUALIFY row_number() OVER (PARTITION BY user_id
                             ORDER BY ts_us, event_id) = 1
)
SELECT cohort_day, e.day AS active_day,
       count(DISTINCT e.user_id)::BIGINT AS n_users
FROM e JOIN c ON e.user_id = c.user_id
GROUP BY 1, 2
"""


def q_cluster_size_profile(sf_dir: str):
    """Near-dup cluster-size histogram: how many duplicate clusters have
    exactly k members — the artifact that tells a dedup run its expected
    row reduction. Composes the memoized exact-pair + connected-
    components subgraph with two tiny keys-only aggregates."""
    from ray.data.aggregate import Count

    return (
        q_dedup_clusters(sf_dir)
        .groupby("component").aggregate(Count())
        .rename_columns({"count()": "size"})
        .groupby("size").aggregate(Count())
        .rename_columns({"count()": "n_clusters"})
    )


_SQL_CLUSTER_SIZE_PROFILE = (
    "WITH comp AS (\n" + _SQL_DEDUP_CLUSTERS + "\n)\n"
    + """
SELECT size, count(*)::BIGINT AS n_clusters FROM (
  SELECT component, count(*)::BIGINT AS size FROM comp GROUP BY component
) GROUP BY size
"""
)


def q_host_degree_profile(sf_dir: str):
    """Degree-distribution histogram of the host link graph (the skew
    diagnostic that decides whether a join needs salting): total degree
    -> node count, folded from the exact degree_stats aggregate. Runs on
    the ring+chord+functional edge family (the `host_triangles` graph —
    the base functional graph is regular, which would collapse the
    histogram to one row)."""
    from ray.data.aggregate import Count

    from webextract.functions.graph import degree_stats

    def edges(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        a = (ids % 20).astype(np.int64)
        fams = [((ids * 4 + 1) % 20).astype(np.int64),
                (a + 1) % 20, (a + 2) % 20]
        return pa.table({
            "src": pa.array(np.concatenate([a, a, a])),
            "dst": pa.array(np.concatenate(fams)),
        })

    ds = _docs(sf_dir, ["doc_id"]).map_batches(edges,
                                               batch_format="pyarrow")

    def total(b: pa.Table) -> pa.Table:
        return pa.table({"degree": pc.add(
            b.column("out_deg").cast(pa.int64()),
            b.column("in_deg").cast(pa.int64()))})

    return (
        degree_stats(ds)
        .map_batches(total, batch_format="pyarrow")
        .groupby("degree").aggregate(Count())
        .rename_columns({"count()": "n_nodes"})
    )


_SQL_HOST_DEGREE_PROFILE = """
WITH e AS (
  SELECT doc_id % 20 AS src, (doc_id * 4 + 1) % 20 AS dst FROM documents
  UNION ALL SELECT doc_id % 20, (doc_id % 20 + 1) % 20 FROM documents
  UNION ALL SELECT doc_id % 20, (doc_id % 20 + 2) % 20 FROM documents
),
d AS (
  SELECT node, count(*)::BIGINT AS degree FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst FROM e
  ) GROUP BY node
)
SELECT degree, count(*)::BIGINT AS n_nodes FROM d GROUP BY degree
"""


def q_docs_linreg_per_lang(sf_dir: str):
    """Per-language ordinary-least-squares fit of n_words ~ n_chars —
    grouped regression from the SAME five exact int64 partial sums as
    `corr_by`: slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²), intercept =
    (Σy − slope·Σx)/n, each a literal IEEE expression mirrored in SQL
    (round-only-at-end)."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    import numpy as np

    docs = _docs(sf_dir, ["lang", "text", "n_chars"])

    def prep(b: pa.Table) -> pa.Table:
        x = b.column("n_chars").cast(pa.int64())
        y = pc.add(pc.count_substring(b.column("text"), " "),
                   1).cast(pa.int64())
        return pa.table({"lang": b.column("lang"), "_x": x, "_y": y,
                         "_xx": pc.multiply_checked(x, x),
                         "_xy": pc.multiply_checked(x, y)})

    agg = (
        docs.map_batches(prep, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("_x", alias_name="sx"), Sum("_y", alias_name="sy"),
                   Sum("_xx", alias_name="sxx"),
                   Sum("_xy", alias_name="sxy"), Count())
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("count()").to_numpy(zero_copy_only=False).astype(
            np.int64)
        sx = b.column("sx").to_numpy(zero_copy_only=False).astype(np.int64)
        sy = b.column("sy").to_numpy(zero_copy_only=False).astype(np.int64)
        sxx = b.column("sxx").to_numpy(zero_copy_only=False).astype(np.int64)
        sxy = b.column("sxy").to_numpy(zero_copy_only=False).astype(np.int64)
        slope = (n * sxy - sx * sy).astype(np.float64) \
            / (n * sxx - sx * sx).astype(np.float64)
        intercept = (sy.astype(np.float64) - slope * sx.astype(np.float64)) \
            / n.astype(np.float64)
        return pa.table({"lang": b.column("lang"),
                         "n": pa.array(n),
                         "slope": pa.array(slope),
                         "intercept": pa.array(intercept)})

    return agg.map_batches(finish, batch_format="pyarrow")


_SQL_DOCS_LINREG = """
WITH m AS (
  SELECT lang, n_chars::BIGINT AS x,
         len(string_split(text, ' '))::BIGINT AS y
  FROM documents
),
s AS (
  SELECT lang, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy, sum(x*x)::BIGINT AS sxx,
         sum(x*y)::BIGINT AS sxy
  FROM m GROUP BY lang
)
SELECT lang, n,
  (n*sxy - sx*sy)::DOUBLE / (n*sxx - sx*sx)::DOUBLE AS slope,
  (sy::DOUBLE - ((n*sxy - sx*sy)::DOUBLE / (n*sxx - sx*sx)::DOUBLE)
     * sx::DOUBLE) / n::DOUBLE AS intercept
FROM s
"""


def q_join_size_est(sf_dir: str):
    """Pre-join cardinality estimate of |orders ⋈ customer| WITHOUT
    running the join (functions/sketches.join_size_estimate — CMS
    dot-product, two streaming passes, no shuffle). Never undercounts;
    rows-only (approximate by design; the bound is pytest-pinned and the
    exact answer is the oracle-green `orders_customers_join` row
    count)."""
    import ray.data

    from webextract.functions.sketches import join_size_estimate

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])
    est = join_size_estimate(orders, cust, left_on="o_custkey",
                             right_on="c_custkey", w=8192)
    return pa.table({"est_rows": pa.array([est], type=pa.int64())})


def q_dataset_split(sf_dir: str):
    """Deterministic train/val/test split: multiplicative-hash bucket of
    doc_id (Knuth 2654435761 mod 2^32, then mod 100) -> 80/10/10 —
    membership is a pure function of the row key, so reruns, resumed
    runs, and different cluster layouts assign identically (the lineage
    discipline applied to dataset splits). All-integer math, mirrored
    literally in SQL; emits per-split doc counts + char totals."""
    from ray.data.aggregate import Count, Sum

    def split(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64)
        # int64-exact for ids < 2^33 (the SQL mirror's BIGINT bound);
        # beyond that switch the bucket hash to md5_number_lower % 100
        bucket = (ids * 2654435761) % (1 << 32) % 100
        name = np.where(bucket < 80, "train",
                        np.where(bucket < 90, "val", "test"))
        return pa.table({"split": pa.array(name.tolist(),
                                           type=pa.string()),
                         "n_chars": b.column("n_chars")})

    return (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .map_batches(split, batch_format="pyarrow")
        .groupby("split")
        .aggregate(Count(), Sum("n_chars", alias_name="total_chars"))
        .rename_columns({"count()": "n_docs"})
    )


_SQL_DATASET_SPLIT = """
WITH s AS (
  SELECT CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80
              THEN 'train'
              WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90
              THEN 'val' ELSE 'test' END AS split,
         n_chars
  FROM documents
)
SELECT split, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars
FROM s GROUP BY split
"""


def q_doc_length_quantiles_by_lang_sketch(sf_dir: str):
    """Per-language KLL quantile sketch
    (functions/sketches.approx_quantiles_by) — the unbounded-cardinality
    scale path beside the exact `doc_length_quantiles_by_lang`: one
    O(k log n) sketch row per (key, block) through the shuffle instead
    of one row per distinct value. Approximate -> rows-only; error
    pinned by pytest against the exact per-group quantiles."""
    from webextract.functions.sketches import approx_quantiles_by

    return approx_quantiles_by(_docs(sf_dir, ["lang", "n_chars"]),
                               by="lang", val="n_chars")


def q_crossdoc_ngrams(sf_dir: str):
    """Cross-document duplicated 5-grams: the exact-substring-dedup
    primitive (functions/ngrams.dup_ngram_topk). Distinct n-grams are
    computed per doc inside map_batches (no shuffle), then ONE
    keys-only groupby counts document frequency; top-20 by
    (ndocs DESC, ngram ASC) — a total order, deterministic k-cut."""
    from webextract.functions.ngrams import dup_ngram_topk

    return dup_ngram_topk(_docs(sf_dir, ["text"]), n=5, k=20, min_docs=2)


_SQL_CROSSDOC_NGRAMS = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (
  SELECT DISTINCT doc_id, array_to_string(words[i+1:i+5], ' ') AS ngram
  FROM w, unnest(range(0, greatest(len(words)-4, 0))) AS t(i)
)
SELECT ngram, count(*)::BIGINT AS ndocs
FROM g GROUP BY ngram HAVING count(*) >= 2
ORDER BY ndocs DESC, ngram LIMIT 20
"""


def q_c4_line_filter(sf_dir: str):
    """Extraction composed with C4-style line filtering (Raffel et al.
    2020 §2.2 analog): run the full detect-then-extract pipeline, then
    drop lines with < 20 words or without the word 'the'
    (functions/ngrams.line_filter_batch). Per-row map after the
    extract — no shuffle anywhere; survivors' text stays byte-exact
    (the filter re-joins original lines, never rewrites them)."""
    from webextract.functions.ngrams import line_filter_batch

    ds = _extract_ds(sf_dir).filter(expr="status == 'ok'")
    return ds.select_columns(["doc_id", "text"]).map_batches(
        line_filter_batch, batch_format="pyarrow"
    )


_SQL_C4_LINE_FILTER = r"""
WITH k0 AS (
  SELECT doc_id, text,
         (CASE WHEN doc_id % 19 = 11 AND doc_id % 25 <> 3 AND doc_id % 17 <> 5
               THEN 5 ELSE doc_id % 3 + 1 END)::INT AS k
  FROM documents WHERE doc_id % 50 <> 7
),
g AS (
  SELECT doc_id,
    list_filter(
      list_transform(range(0, k), i ->
        array_to_string(
          string_split(text, ' ')[(i*len(string_split(text, ' ')))//k + 1
                                  : ((i+1)*len(string_split(text, ' ')))//k],
          ' ')
      ), c -> c <> '') AS lines
  FROM k0
),
f AS (
  SELECT doc_id, lines,
    list_filter(lines, ln ->
      len(string_split(ln, ' ')) >= 20
      AND list_contains(string_split(ln, ' '), 'the')) AS kept
  FROM g
)
SELECT doc_id, len(lines)::BIGINT AS n_lines, len(kept)::BIGINT AS n_kept,
       coalesce(array_to_string(kept, chr(10)), '') AS text
FROM f
"""


def q_revenue_by_nation(sf_dir: str):
    """TPC-H Q5-lite three-way join: orders -> customer -> nation,
    revenue per nation. Scale shape: (1) revenue is pre-aggregated per
    customer INSIDE the orders scan before any join (the shuffle moves
    (custkey, cents, count) only — never order rows); (2) the
    orders x customer step is one keys-only hash exchange; (3) the
    25-row nation side broadcasts via ray.put. Money is summed as
    integer cents — floor(x*100 + 0.5) on both sides, identical IEEE
    double ops, so the distributed sum is order-independent and exact."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    from webextract.functions.joins import broadcast_join

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("o_totalprice"), 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table({"c_custkey": b.column("o_custkey"), "cents": c})

    per_cust = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(cents, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("cents", alias_name="cents"), Count())
        .rename_columns({"count()": "n_ord"})
    )
    # measured broadcast-vs-shuffle dimension join (round-5: the
    # customer dim broadcasts at bench scale, spills to the keyed
    # exchange above the bound — segment/nation strings never ride it)
    from webextract.queries._shared import join_dim

    joined = join_dim(
        per_cust, f"{sf_dir}/customer.parquet", key="c_custkey",
        cols=["c_nationkey"],
        fact_schema=pa.schema(
            [("c_custkey", pa.int64()), ("cents", pa.int64()),
             ("n_ord", pa.int64())]),
    ).rename_columns({"c_nationkey": "n_nationkey"})
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    named = broadcast_join(joined, nation, key="n_nationkey")
    return (
        named.groupby("n_name")
        .aggregate(
            Sum("cents", alias_name="revenue_cents"),
            Sum("n_ord", alias_name="n_orders"),
        )
    )


_SQL_REVENUE_BY_NATION = """
SELECT n_name,
       sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT)::BIGINT AS revenue_cents,
       count(*)::BIGINT AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_word_postings(sf_dir: str):
    """Inverted-index construction (functions/ngrams.inverted_index):
    per-doc word dedup inside map_batches, ONE keys-only groupby
    gathering each word's ascending posting list (comma-joined, the
    oracle surface's list encoding) + document frequency. max_group
    raises on stopword-sized lists — no silent truncation."""
    from webextract.functions.ngrams import inverted_index

    return inverted_index(_docs(sf_dir, ["doc_id", "text"]))


_SQL_WORD_POSTINGS = """
WITH e AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
p AS (SELECT DISTINCT doc_id, word FROM e)
SELECT word, count(*)::BIGINT AS df,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
FROM p GROUP BY word
"""


def q_train_shuffle(sf_dir: str):
    """Deterministic global training-order shuffle
    (functions/sampling.shuffle_index): position under ORDER BY
    md5(str(doc_id)) — seedless, resume-safe, layout-invariant. One
    keys-only groupby on 256 md5-prefix buckets; bucket counts (a
    bounded 256-row fold) prefix-sum into offsets broadcast via
    ray.put; no global sort."""
    from webextract.functions.sampling import shuffle_index

    return shuffle_index(_docs(sf_dir, ["doc_id"]))


_SQL_TRAIN_SHUFFLE = """
SELECT doc_id,
       (row_number() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id)
        - 1)::BIGINT AS pos
FROM documents
"""


def q_anchor_terms(sf_dir: str):
    """Anchor-text aggregation — the web-index view of the link
    inventory: for every link target, how each anchor term is used
    across the crawl (stages/links.extract_links -> one keys-only
    groupby on (href, anchor); counts pre-combine per block inside the
    groupby, so hot targets cost one row per (block, term))."""
    from ray.data.aggregate import Count

    links = _links_ds(sf_dir)
    return (
        links.groupby(["href", "anchor"])
        .aggregate(Count())
        .rename_columns({"count()": "n_links"})
    )


_SQL_ANCHOR_TERMS = """
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
)
SELECT href, anchor, count(*)::BIGINT AS n_links
FROM links GROUP BY href, anchor
"""


def q_word_cooccurrence(sf_dir: str):
    """Top-20 co-occurring word pairs across documents
    (functions/cooc.text_pair_counts): map-side pair explode (deduped
    within each doc, w1 < w2), ONE keys-only groupby, total-order k-cut
    (n DESC, w1, w2)."""
    from webextract.functions.cooc import text_pair_counts

    return text_pair_counts(_docs(sf_dir, ["text"]), k=20)


_SQL_WORD_COOCCURRENCE = """
WITH e AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
p AS (SELECT DISTINCT doc_id, word FROM e)
SELECT a.word AS w1, b.word AS w2, count(*)::BIGINT AS n
FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.word < b.word
GROUP BY w1, w2 ORDER BY n DESC, w1, w2 LIMIT 20
"""


def q_event_type_pairs(sf_dir: str):
    """Market-basket pairs: event types co-occurring under the same
    user (functions/cooc.group_item_pairs — per-user distinct-item
    gather, pair explode in map_groups, keys-only pair count; group
    size is the DISTINCT type count, never the user's event count)."""
    import ray.data

    from webextract.functions.cooc import group_item_pairs

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return group_item_pairs(ev, by="user_id", item="event_type")


_SQL_EVENT_TYPE_PAIRS = """
WITH p AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS t1, b.event_type AS t2, count(*)::BIGINT AS n_keys
FROM p a JOIN p b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY t1, t2
"""


def q_length_band_filter(sf_dir: str):
    """Adaptive (data-dependent) filtering: keep documents whose length
    falls in the corpus's own [p10, p90] band, then aggregate per
    language — the two-pass quality-filter shape (RefinedWeb-style
    percentile cuts). Pass 1 folds the DISTINCT-length histogram on the
    driver (bounded by value cardinality, quantile_disc rank
    ceil(q*n)-1 — the same convention as functions/window
    .group_quantiles); pass 2 is a map-side filter with the two literal
    thresholds + one keys-only groupby."""
    import math

    from ray.data.aggregate import Count, Sum

    hist = guarded_fold(
        _docs(sf_dir, ["n_chars"])
        .groupby("n_chars")
        .aggregate(Count()),
        what="length_percentile_filter n_chars histogram")
    hist.sort(key=lambda r: r["n_chars"])
    total = sum(r["count()"] for r in hist)

    def q_at(q: float) -> int:
        target = max(0, math.ceil(q * total) - 1)
        cum = 0
        for r in hist:
            if cum + r["count()"] > target:
                return int(r["n_chars"])
            cum += r["count()"]
        return int(hist[-1]["n_chars"])

    lo, hi = q_at(0.1), q_at(0.9)
    return (
        _docs(sf_dir, ["lang", "n_chars"])
        .filter(expr=f"n_chars >= {lo}")
        .filter(expr=f"n_chars <= {hi}")
        .groupby("lang")
        .aggregate(Count(), Sum("n_chars", alias_name="total_chars"))
        .rename_columns({"count()": "n_docs"})
    )


_SQL_LENGTH_BAND_FILTER = """
WITH t AS (
  SELECT quantile_disc(n_chars, 0.1) AS lo,
         quantile_disc(n_chars, 0.9) AS hi
  FROM documents
)
SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM documents, t
WHERE n_chars BETWEEN lo AND hi
GROUP BY lang
"""


def q_json_props_stats(sf_dir: str):
    """Semi-structured extraction: parse the JSON `props` payload per
    event (real json.loads in the batch UDF — the WARC-metadata /
    JSON-LD analog), pull the numeric field, aggregate per event type.
    Map-side parse, one keys-only groupby; malformed JSON would raise
    (quarantining is the segmenter's job, metadata is contract-clean).
    The oracle mirrors the extraction with a regex so it needs no
    DuckDB JSON extension."""
    import json

    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    def parse(b: pa.Table) -> pa.Table:
        ks = [int(json.loads(p)["k"]) for p in b.column("props").to_pylist()]
        return pa.table({
            "event_type": b.column("event_type"),
            "k": pa.array(ks, type=pa.int64()),
        })

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )
    return (
        ev.map_batches(parse, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(),
            Sum("k", alias_name="k_sum"),
            Min("k", alias_name="k_min"),
            Max("k", alias_name="k_max"),
        )
        .rename_columns({"count()": "n_events"})
    )


_SQL_JSON_PROPS_STATS = r"""
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(regexp_extract(props, '"k": (\d+)', 1)::BIGINT)::BIGINT AS k_sum,
       min(regexp_extract(props, '"k": (\d+)', 1)::BIGINT)::BIGINT AS k_min,
       max(regexp_extract(props, '"k": (\d+)', 1)::BIGINT)::BIGINT AS k_max
FROM events GROUP BY event_type
"""


def q_top_orders_by_revenue(sf_dir: str):
    """TPC-H Q3-lite: per-order lineitem revenue (pre-aggregated INSIDE
    the lineitem scan — the shuffle moves (orderkey, cents), never line
    rows), global top-10 by (revenue DESC, orderkey ASC). Revenue is
    exact integer cents: floor(ext * (1 - disc) * 100 + 0.5), identical
    IEEE ops on both sides, so the distributed sum is order-independent.

    Round-5 shape: the top-10 finishes through the MEASURED tree
    combine (per-block partial top-k, treeagg.tree_combine) instead of
    a global sort, and the priority column is fetched by broadcasting
    the 10 winning keys INTO the orders scan (map-side isin filter) —
    the priority strings never ride an exchange and the orders table
    never shuffles at any scale."""
    import ray.data
    from ray.data.aggregate import Sum

    from webextract.functions.treeagg import tree_combine
    from webextract.queries._shared import guarded_fold

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
        .aggregate(Sum("cents", alias_name="revenue_cents"))
    )

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=[
            ("revenue_cents", "descending"), ("o_orderkey", "ascending")])
        return b.take(idx.slice(0, min(10, b.num_rows)))

    top = guarded_fold(
        tree_combine(
            per_order.map_batches(local_topk, batch_format="pyarrow",
                                  batch_size=None),
            local_topk,
            agg_fallback=lambda p: p.sort(
                ["revenue_cents", "o_orderkey"],
                descending=[True, False]).limit(10),
            what="top_orders_by_revenue"),
        what="top-10 orders")
    keys = sorted(int(r["o_orderkey"]) for r in top)
    pri_rows = guarded_fold(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderpriority"],
        ).map_batches(
            lambda b: b.filter(pc.is_in(
                b.column("o_orderkey"),
                value_set=pa.array(keys, type=pa.int64()))),
            batch_format="pyarrow"),
        what="top-10 order priorities")
    pri = {int(r["o_orderkey"]): r["o_orderpriority"] for r in pri_rows}
    rows = sorted(top, key=lambda r: (-int(r["revenue_cents"]),
                                      int(r["o_orderkey"])))
    return pa.table({
        "o_orderkey": pa.array(
            [int(r["o_orderkey"]) for r in rows], type=pa.int64()),
        "revenue_cents": pa.array(
            [int(r["revenue_cents"]) for r in rows], type=pa.int64()),
        "o_orderpriority": pa.array(
            [pri[int(r["o_orderkey"])] for r in rows], type=pa.string()),
    })


_SQL_TOP_ORDERS_BY_REVENUE = """
WITH r AS (
  SELECT l_orderkey AS o_orderkey,
         sum(floor(l_extendedprice * (1 - l_discount) * 100.0
                   + 0.5)::BIGINT)::BIGINT AS revenue_cents
  FROM lineitem GROUP BY l_orderkey
)
SELECT r.o_orderkey, revenue_cents, o_orderpriority
FROM r JOIN orders USING (o_orderkey)
ORDER BY revenue_cents DESC, o_orderkey LIMIT 10
"""


def q_monthly_revenue(sf_dir: str):
    """Calendar rollup: integer-cents order revenue per YYYY-MM month
    (vectorized pc.strftime truncation map-side; one keys-only groupby
    over ~120 month keys — the time-bucketed aggregate every crawl
    freshness dashboard runs)."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    def bucket(b: pa.Table) -> pa.Table:
        m = pc.strftime(b.column("o_orderdate"), format="%Y-%m")
        c = pc.cast(
            pc.floor(
                pc.add(pc.multiply(b.column("o_totalprice"), 100.0), 0.5)
            ),
            pa.int64(),
        )
        return pa.table({"month": m, "cents": c})

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("month")
        .aggregate(
            Count(), Sum("cents", alias_name="revenue_cents")
        )
        .rename_columns({"count()": "n_orders"})
    )


_SQL_MONTHLY_REVENUE = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       count(*)::BIGINT AS n_orders,
       sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT)::BIGINT AS revenue_cents
FROM orders GROUP BY month
"""


def q_supplier_balance_by_region(sf_dir: str):
    """Dimension-chain broadcast: nation x region pre-joined driver-side
    (25 x 5 rows), shipped once via ray.put, probed vectorized inside
    the supplier scan — zero shuffles end-to-end except the final
    5-key groupby. Account balances summed as exact integer cents
    (floor(x*100+0.5) handles negatives identically on both sides)."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    from webextract.functions.joins import broadcast_join

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    rn = region.column("r_name").to_pylist()
    rk = region.column("r_regionkey").to_pylist()
    by_rk = dict(zip(rk, rn))
    dim = pa.table({
        "s_nationkey": nation.column("n_nationkey"),
        "r_name": pa.array(
            [by_rk[k] for k in nation.column("n_regionkey").to_pylist()],
            type=pa.string(),
        ),
    })

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("s_acctbal"), 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table({"s_nationkey": b.column("s_nationkey"), "cents": c})

    sup = (
        ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
        )
        .map_batches(cents, batch_format="pyarrow")
    )
    named = broadcast_join(sup, dim, key="s_nationkey")
    return (
        named.groupby("r_name")
        .aggregate(Count(), Sum("cents", alias_name="balance_cents"))
        .rename_columns({"count()": "n_suppliers"})
    )


_SQL_SUPPLIER_BALANCE_BY_REGION = """
SELECT r_name, count(*)::BIGINT AS n_suppliers,
       sum(floor(s_acctbal * 100.0 + 0.5)::BIGINT)::BIGINT AS balance_cents
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_brand_revenue(sf_dir: str):
    """Q14-flavored big-big join on the part key: lineitem revenue
    pre-aggregated per partkey inside the scan (keys+cents through the
    shuffle), one hash exchange against part, then a keys-only brand
    rollup. Covers the one base table (part) no other query touches."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    def cents(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(1.0, b.column("l_discount")),
        )
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(rev, 100.0), 0.5)), pa.int64()
        )
        return pa.table({"p_partkey": b.column("l_partkey"), "cents": c})

    per_part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(cents, batch_format="pyarrow")
        .groupby("p_partkey")
        .aggregate(Sum("cents", alias_name="cents"), Count())
        .rename_columns({"count()": "n_lines"})
    )
    from webextract.queries._shared import join_dim

    joined = join_dim(
        per_part, f"{sf_dir}/part.parquet", key="p_partkey",
        cols=["p_brand"],
        fact_schema=pa.schema([
            ("p_partkey", pa.int64()), ("cents", pa.int64()),
            ("n_lines", pa.int64()),
        ]),
    )
    return (
        joined.groupby("p_brand")
        .aggregate(
            Sum("cents", alias_name="revenue_cents"),
            Sum("n_lines", alias_name="n_lines"),
        )
    )


_SQL_BRAND_REVENUE = """
SELECT p_brand,
       sum(floor(l_extendedprice * (1 - l_discount) * 100.0
                 + 0.5)::BIGINT)::BIGINT AS revenue_cents,
       count(*)::BIGINT AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_vocab_by_lang(sf_dir: str):
    """COUNT(DISTINCT word) per language — vocabulary size, the Heaps'-
    law corpus profile. Per-doc word dedup map-side, then TWO keys-only
    shuffles: distinct on (lang, word), count per lang. No payload ever
    moves."""
    from ray.data.aggregate import Count

    from webextract.functions.ngrams import _flat_ngram_strings

    def explode(b: pa.Table) -> pa.Table:
        doc_idx, words = _flat_ngram_strings(b.column("text"), 1)
        distinct = pa.table({
            "_d": pa.array(doc_idx, type=pa.int64()), "word": words,
        }).group_by(["_d", "word"], use_threads=False).aggregate([])
        langs = b.column("lang").combine_chunks()
        return pa.table({
            "lang": langs.take(distinct.column("_d")),
            "word": distinct.column("word"),
        })

    return (
        _docs(sf_dir, ["lang", "text"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["lang", "word"])
        .aggregate(Count())
        .groupby("lang")
        .aggregate(Count())
        .rename_columns({"count()": "n_words"})
    )


_SQL_VOCAB_BY_LANG = """
WITH e AS (
  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT lang, count(DISTINCT word)::BIGINT AS n_words
FROM e GROUP BY lang
"""


def q_lang_metrics_unpivot(sf_dir: str):
    """UNPIVOT/melt: the per-language wide aggregate row folded into
    (lang, metric, value) long form — the inverse of
    `lang_source_pivot`. The melt is a map-side row explode AFTER the
    keys-only aggregate, so it costs nothing extra at scale."""
    from ray.data.aggregate import Count, Max, Sum

    wide = (
        _docs(sf_dir, ["lang", "n_chars"])
        .groupby("lang")
        .aggregate(
            Count(),
            Sum("n_chars", alias_name="total_chars"),
            Max("n_chars", alias_name="max_chars"),
        )
        .rename_columns({"count()": "n_docs"})
    )

    def melt(b: pa.Table) -> pa.Table:
        langs: list = []
        metrics: list = []
        values: list = []
        for i in range(b.num_rows):
            lg = b.column("lang")[i].as_py()
            for m in ("n_docs", "total_chars", "max_chars"):
                langs.append(lg)
                metrics.append(m)
                values.append(int(b.column(m)[i].as_py()))
        return pa.table({
            "lang": pa.array(langs, type=pa.string()),
            "metric": pa.array(metrics, type=pa.string()),
            "value": pa.array(values, type=pa.int64()),
        })

    return wide.map_batches(melt, batch_format="pyarrow")


_SQL_LANG_METRICS_UNPIVOT = """
WITH w AS (
  SELECT lang, count(*)::BIGINT AS n_docs,
         sum(n_chars)::BIGINT AS total_chars,
         max(n_chars)::BIGINT AS max_chars
  FROM documents GROUP BY lang
)
SELECT lang, 'n_docs' AS metric, n_docs AS value FROM w
UNION ALL
SELECT lang, 'total_chars' AS metric, total_chars AS value FROM w
UNION ALL
SELECT lang, 'max_chars' AS metric, max_chars AS value FROM w
"""


def q_events_conditional_agg(sf_dir: str):
    """SQL FILTER-clause aggregates: per user, counts of two event
    types plus purchase value summed as exact integer cents — the
    conditional columns become 0/1 (or cents/0) map-side, so ONE
    keys-only groupby carries all three aggregates (no per-condition
    scans)."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    def flags(b: pa.Table) -> pa.Table:
        et = b.column("event_type")
        is_click = pc.cast(pc.equal(et, "click"), pa.int64())
        is_view = pc.cast(pc.equal(et, "view"), pa.int64())
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("value"), 100.0), 0.5)),
            pa.int64(),
        )
        pur = pc.if_else(pc.equal(et, "purchase"), cents,
                         pa.scalar(0, type=pa.int64()))
        return pa.table({
            "user_id": b.column("user_id"),
            "is_click": is_click,
            "is_view": is_view,
            "purchase_cents": pur,
        })

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"],
    )
    return (
        ev.map_batches(flags, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Count(),
            Sum("is_click", alias_name="n_clicks"),
            Sum("is_view", alias_name="n_views"),
            Sum("purchase_cents", alias_name="purchase_cents"),
        )
        .rename_columns({"count()": "n_events"})
    )


_SQL_EVENTS_CONDITIONAL_AGG = """
SELECT user_id, count(*)::BIGINT AS n_events,
       count(*) FILTER (event_type = 'click')::BIGINT AS n_clicks,
       count(*) FILTER (event_type = 'view')::BIGINT AS n_views,
       coalesce(sum(floor(value * 100.0 + 0.5)::BIGINT)
                FILTER (event_type = 'purchase'), 0)::BIGINT
         AS purchase_cents
FROM events GROUP BY user_id
"""


def q_docs_mad_per_lang(sf_dir: str):
    """Robust spread: per-language median + median-absolute-deviation
    of doc length. ONE distinct-value histogram crosses the shuffle
    (the group_quantiles contract); the driver derives BOTH medians
    from that histogram with exact integer math — the |x - med|
    histogram is a fold of the original, never a second scan.
    quantile_disc convention: rank ceil(q*n)-1."""
    import math

    from ray.data.aggregate import Count

    hist = guarded_fold(
        _docs(sf_dir, ["lang", "n_chars"])
        .groupby(["lang", "n_chars"])
        .aggregate(Count()),
        what="per-lang n_chars histogram")
    groups: dict = {}
    for r in hist:
        groups.setdefault(r["lang"], []).append(
            (int(r["n_chars"]), int(r["count()"]))
        )

    def disc_median(pairs):
        total = sum(n for _, n in pairs)
        target = max(0, math.ceil(0.5 * total) - 1)
        cum = 0
        for v, n in sorted(pairs):
            if cum + n > target:
                return v
            cum += n
        return sorted(pairs)[-1][0]

    langs, meds, mads = [], [], []
    for lg in sorted(groups):
        pairs = groups[lg]
        med = disc_median(pairs)
        folded: dict = {}
        for v, n in pairs:
            d = abs(v - med)
            folded[d] = folded.get(d, 0) + n
        langs.append(lg)
        meds.append(med)
        mads.append(disc_median(list(folded.items())))
    return pa.table({
        "lang": pa.array(langs, type=pa.string()),
        "median_chars": pa.array(meds, type=pa.int64()),
        "mad_chars": pa.array(mads, type=pa.int64()),
    })


_SQL_DOCS_MAD_PER_LANG = """
WITH m AS (
  SELECT lang, quantile_disc(n_chars, 0.5) AS med
  FROM documents GROUP BY lang
)
SELECT d.lang, any_value(m.med)::BIGINT AS median_chars,
       quantile_disc(abs(d.n_chars - m.med), 0.5)::BIGINT AS mad_chars
FROM documents d JOIN m ON d.lang = m.lang
GROUP BY d.lang
"""


def q_user_span(sf_dir: str):
    """Per-user activity span in whole seconds: timestamps cast to
    int64 microseconds MAP-SIDE (sidestepping Ray's groupby
    timestamp-unit downcast), Min/Max in one keys-only groupby, exact
    integer subtraction after."""
    import ray.data
    from ray.data.aggregate import Count, Max, Min

    def us(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": pc.cast(b.column("ts"), pa.int64()),
        })

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    agg = (
        ev.map_batches(us, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Count(),
            Min("ts_us", alias_name="t0"),
            Max("ts_us", alias_name="t1"),
        )
        .rename_columns({"count()": "n_events"})
    )

    def span(b: pa.Table) -> pa.Table:
        s = pc.divide(
            pc.subtract(b.column("t1"), b.column("t0")),
            pa.scalar(1_000_000, type=pa.int64()),
        )
        return pa.table({
            "user_id": b.column("user_id"),
            "n_events": b.column("n_events"),
            "span_s": pc.cast(s, pa.int64()),
        })

    return agg.map_batches(span, batch_format="pyarrow")


_SQL_USER_SPAN = """
SELECT user_id, count(*)::BIGINT AS n_events,
       (date_diff('microsecond', min(ts), max(ts)) // 1000000)::BIGINT
         AS span_s
FROM events GROUP BY user_id
"""


def q_promo_share_monthly(sf_dir: str):
    """TPC-H Q14 analog: monthly promo revenue share, transport picked
    by the part table's parquet-METADATA row count (the `join_dim`
    measure):

    * dimension-sized part table: the (partkey -> is-promo) flag ships
      once as a broadcast sorted array, each lineitem block folds to
      (month, promo_cents, cents) partials map-side, and the only
      exchange is the calendar-bounded month rollup — the
      (partkey, month) pre-aggregate exchange disappears entirely;
    * huge part table: lineitem cents pre-aggregate per
      (partkey, month) in-scan, ONE hash exchange joins the part type,
      then the same month rollup.

    Either way the share is a single IEEE division of two exact int64
    sums (cast to double, both exactly representable) — bit-identical
    to the SQL mirror."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from webextract.queries._shared import BROADCAST_DIM_MAX_ROWS, join_dim

    part_path = f"{sf_dir}/part.parquet"
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"],
    )

    def cents_cols(b: pa.Table):
        rev = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(1.0, b.column("l_discount")),
        )
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(rev, 100.0), 0.5)), pa.int64()
        )
        return c, pc.strftime(b.column("l_shipdate"), format="%Y-%m")

    if pq.read_metadata(part_path).num_rows <= BROADCAST_DIM_MAX_ROWS:
        pt = pq.read_table(part_path, columns=["p_partkey", "p_type"])
        keys = np.asarray(pt.column("p_partkey").combine_chunks(),
                          dtype=np.int64)
        promo = np.asarray(
            pc.equal(pt.column("p_type").combine_chunks(), "PROMO"))
        order = np.argsort(keys)
        ref = ray.put((keys[order], promo[order]))

        def fold(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({
                    "month": pa.array([], type=pa.string()),
                    "promo_cents": pa.array([], type=pa.int64()),
                    "cents": pa.array([], type=pa.int64()),
                })
            k, flags = ray.get(ref)
            c, month = cents_cols(b)
            lk = np.asarray(b.column("l_partkey").combine_chunks(),
                            dtype=np.int64)
            pos = np.clip(np.searchsorted(k, lk), 0, k.size - 1)
            is_promo = flags[pos] & (k[pos] == lk)  # FK always present
            cn = np.asarray(c)
            blk = pa.table({
                "month": month,
                "promo_cents": pa.array(np.where(is_promo, cn, 0),
                                        type=pa.int64()),
                "cents": c,
            })
            agg = blk.group_by("month").aggregate(
                [("promo_cents", "sum"), ("cents", "sum")])
            # select BY NAME — pyarrow versions disagree on whether the
            # group key or the aggregates come first (round-4 ADVICE)
            return pa.table({
                "month": agg.column("month"),
                "promo_cents": agg.column("promo_cents_sum"),
                "cents": agg.column("cents_sum"),
            })

        split_src = lineitem.map_batches(fold, batch_format="pyarrow")
    else:
        def cents(b: pa.Table) -> pa.Table:
            c, month = cents_cols(b)
            return pa.table({
                "p_partkey": b.column("l_partkey"),
                "month": month,
                "cents": c,
            })

        per_pm = (
            lineitem.map_batches(cents, batch_format="pyarrow")
            .groupby(["p_partkey", "month"])
            .aggregate(Sum("cents", alias_name="cents"))
        )
        joined = join_dim(
            per_pm, part_path, key="p_partkey",
            cols=["p_type"],
            fact_schema=pa.schema([
                ("p_partkey", pa.int64()), ("month", pa.string()),
                ("cents", pa.int64()),
            ]),
        )

        def split(b: pa.Table) -> pa.Table:
            promo = pc.if_else(
                pc.equal(b.column("p_type"), "PROMO"),
                b.column("cents"), pa.scalar(0, type=pa.int64()),
            )
            return pa.table({
                "month": b.column("month"),
                "promo_cents": promo,
                "cents": b.column("cents"),
            })

        split_src = joined.map_batches(split, batch_format="pyarrow")

    monthly = (
        split_src
        .groupby("month")
        .aggregate(
            Sum("promo_cents", alias_name="promo_cents"),
            Sum("cents", alias_name="total_cents"),
        )
    )

    def share(b: pa.Table) -> pa.Table:
        s = pc.divide(
            pc.cast(b.column("promo_cents"), pa.float64()),
            pc.cast(b.column("total_cents"), pa.float64()),
        )
        return b.append_column("promo_share", s)

    return monthly.map_batches(share, batch_format="pyarrow")


_SQL_PROMO_SHARE_MONTHLY = """
WITH m AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         sum(CASE WHEN p_type = 'PROMO'
                  THEN floor(l_extendedprice * (1 - l_discount) * 100.0
                             + 0.5)::BIGINT ELSE 0 END)::BIGINT
           AS promo_cents,
         sum(floor(l_extendedprice * (1 - l_discount) * 100.0
                   + 0.5)::BIGINT)::BIGINT AS total_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY month
)
SELECT month, promo_cents, total_cents,
       promo_cents::DOUBLE / total_cents::DOUBLE AS promo_share
FROM m
"""


def q_new_users_cohort(sf_dir: str):
    """Cohort arrival curve: users by FIRST-SEEN hour plus the
    cumulative user count. First-seen is a keys-only Min groupby; the
    hourly counts fold on the driver (bounded by the calendar) into
    the running total — the accumulating-snapshot shape."""
    import ray.data
    from ray.data.aggregate import Count, Min

    def us(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": pc.cast(b.column("ts"), pa.int64()),
        })

    first = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(us, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("ts_us", alias_name="t0"))
    )

    def hour(b: pa.Table) -> pa.Table:
        h = pc.strftime(
            pc.cast(b.column("t0"), pa.timestamp("us")), format="%Y-%m-%d %H"
        )
        return pa.table({"hour": h})

    counts = guarded_fold(
        first.map_batches(hour, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Count()),
        what="per-hour counts")
    counts.sort(key=lambda r: r["hour"])
    hours, news, cums = [], [], []
    cum = 0
    for r in counts:
        cum += int(r["count()"])
        hours.append(r["hour"])
        news.append(int(r["count()"]))
        cums.append(cum)
    return pa.table({
        "hour": pa.array(hours, type=pa.string()),
        "n_new": pa.array(news, type=pa.int64()),
        "cum_users": pa.array(cums, type=pa.int64()),
    })


_SQL_NEW_USERS_COHORT = """
WITH f AS (
  SELECT user_id, strftime(min(ts), '%Y-%m-%d %H') AS hour
  FROM events GROUP BY user_id
),
c AS (SELECT hour, count(*)::BIGINT AS n_new FROM f GROUP BY hour)
SELECT hour, n_new,
       (sum(n_new) OVER (ORDER BY hour))::BIGINT AS cum_users
FROM c
"""


def q_vocab_fuzzy_pairs(sf_dir: str):
    """Fuzzy string join over the corpus vocabulary: all word pairs
    within 2 edits (functions/fuzzy.fuzzy_vocab_pairs — FastSS deletion
    neighborhoods, keys-only candidate buckets, DP verify only on
    candidates; never an O(|V|^2) cross product)."""
    from webextract.functions.fuzzy import fuzzy_vocab_pairs

    return fuzzy_vocab_pairs(_docs(sf_dir, ["text"]), max_dist=2)


_SQL_VOCAB_FUZZY_PAIRS = """
WITH v AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM documents
)
SELECT a.w AS w1, b.w AS w2, levenshtein(a.w, b.w)::BIGINT AS d
FROM v a JOIN v b ON a.w < b.w AND levenshtein(a.w, b.w) <= 2
"""


def q_span_corruption(sf_dir: str):
    """T5-style span-corruption prep: deterministically mask every
    token at position (i + doc_id) % 7 == 0 with the sentinel '<X>',
    emitting the corrupted text and the comma-joined mask targets in
    order. Pure map-side row rewrite (the denoising-objective analog
    of chunk_documents); the mask rule is key-derived, so re-runs and
    the SQL mirror agree token-for-token."""

    def corrupt(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        corrupted: list = []
        targets: list = []
        for did, t in zip(ids, texts):
            words = t.split(" ")
            out: list = []
            tgt: list = []
            for i, w in enumerate(words):
                if (i + did) % 7 == 0:
                    out.append("<X>")
                    tgt.append(w)
                else:
                    out.append(w)
            corrupted.append(" ".join(out))
            targets.append(",".join(tgt))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "corrupted": pa.array(corrupted, type=pa.string()),
            "targets": pa.array(targets, type=pa.string()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        corrupt, batch_format="pyarrow"
    )


_SQL_SPAN_CORRUPTION = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
SELECT doc_id,
  array_to_string(
    list_transform(range(1, len(words) + 1), i ->
      CASE WHEN (i - 1 + doc_id) % 7 = 0 THEN '<X>' ELSE words[i] END),
    ' ') AS corrupted,
  coalesce(array_to_string(
    list_filter(
      list_transform(range(1, len(words) + 1), i ->
        CASE WHEN (i - 1 + doc_id) % 7 = 0 THEN words[i] END),
      x -> x IS NOT NULL),
    ','), '') AS targets
FROM w
"""


def q_length_histogram(sf_dir: str):
    """Equi-width histogram of document lengths (bin 100 chars) with
    per-bin exact mean: bin assignment map-side, ONE keys-only groupby,
    mean = single IEEE division of exact int sums."""
    from ray.data.aggregate import Count, Sum

    def bins(b: pa.Table) -> pa.Table:
        lo = pc.multiply(
            pc.divide(b.column("n_chars"), pa.scalar(100, type=pa.int64())),
            pa.scalar(100, type=pa.int64()),
        )
        return pa.table({
            "bin_lo": pc.cast(lo, pa.int64()),
            "n_chars": b.column("n_chars"),
        })

    agg = (
        _docs(sf_dir, ["n_chars"])
        .map_batches(bins, batch_format="pyarrow")
        .groupby("bin_lo")
        .aggregate(Count(), Sum("n_chars", alias_name="sum_chars"))
        .rename_columns({"count()": "n_docs"})
    )

    def mean(b: pa.Table) -> pa.Table:
        m = pc.divide(
            pc.cast(b.column("sum_chars"), pa.float64()),
            pc.cast(b.column("n_docs"), pa.float64()),
        )
        return b.append_column("mean_chars", m)

    return agg.map_batches(mean, batch_format="pyarrow")


_SQL_LENGTH_HISTOGRAM = """
SELECT (n_chars // 100 * 100)::BIGINT AS bin_lo,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars,
       sum(n_chars)::DOUBLE / count(*)::DOUBLE AS mean_chars
FROM documents GROUP BY bin_lo
"""


def q_knn_label_accuracy(sf_dir: str):
    """1-NN classifier evaluation over the labeled embeddings
    (functions/similarity.knn_label_stats): reference matrix broadcast
    once, one float64 matmul per batch, integer-count output only —
    rank gaps (>=5e-6 at this sf) dwarf cross-engine float noise, ties
    break on the smaller neighbor id on both sides."""
    import ray.data

    from webextract.functions.similarity import knn_label_stats

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )
    return knn_label_stats(ds)


_SQL_KNN_LABEL_ACCURACY = """
WITH nn AS (
  SELECT a.vec_id, a.label AS lab,
         (SELECT b.label FROM embeddings b WHERE b.vec_id <> a.vec_id
          ORDER BY list_cosine_similarity(b.embedding::DOUBLE[],
                                          a.embedding::DOUBLE[]) DESC,
                   b.vec_id
          LIMIT 1) AS nn_label
  FROM embeddings a
)
SELECT lab AS label, count(*)::BIGINT AS n_vecs,
       sum(CASE WHEN nn_label = lab THEN 1 ELSE 0 END)::BIGINT AS n_correct
FROM nn GROUP BY lab
"""


def q_event_gap_histogram(sf_dir: str):
    """Inter-event-gap distribution: per-user LAG gaps
    (functions/temporal.key_lag — one keys-only shuffle, vectorized
    lexsort+diff per group), bucketed to whole minutes map-side, one
    tiny keys-only histogram groupby."""
    import ray.data
    from ray.data.aggregate import Count

    from webextract.functions.temporal import key_lag

    def us(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": pc.cast(b.column("ts"), pa.int64()),
            "eid": b.column("event_id"),
        })

    ev = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
        )
        .map_batches(us, batch_format="pyarrow")
    )
    lagged = key_lag(ev, by="user_id", ts="ts_us", payload="eid")

    def bucket(b: pa.Table) -> pa.Table:
        mins = pc.divide(b.column("gap"), pa.scalar(60_000_000,
                                                    type=pa.int64()))
        return pa.table({"gap_min": pc.cast(mins, pa.int64())})

    return (
        lagged.map_batches(bucket, batch_format="pyarrow")
        .groupby("gap_min")
        .aggregate(Count())
        .rename_columns({"count()": "n_gaps"})
    )


_SQL_EVENT_GAP_HISTOGRAM = """
WITH l AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT (date_diff('microsecond', prev_ts, ts) // 60000000)::BIGINT
         AS gap_min,
       count(*)::BIGINT AS n_gaps
FROM l WHERE prev_ts IS NOT NULL
GROUP BY gap_min
"""


def q_order_status_monthly(sf_dir: str):
    """Month x status snapshot: conditional status flags map-side, one
    keys-only month groupby — the wide (pivoted) form of a two-key
    rollup."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    def flags(b: pa.Table) -> pa.Table:
        st = b.column("o_orderstatus")
        return pa.table({
            "month": pc.strftime(b.column("o_orderdate"), format="%Y-%m"),
            "n_open": pc.cast(pc.equal(st, "O"), pa.int64()),
            "n_filled": pc.cast(pc.equal(st, "F"), pa.int64()),
            "n_pending": pc.cast(pc.equal(st, "P"), pa.int64()),
        })

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_orderstatus"]
    )
    return (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("month")
        .aggregate(
            Count(),
            Sum("n_open", alias_name="n_open"),
            Sum("n_filled", alias_name="n_filled"),
            Sum("n_pending", alias_name="n_pending"),
        )
        .rename_columns({"count()": "n_orders"})
    )


_SQL_ORDER_STATUS_MONTHLY = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       count(*)::BIGINT AS n_orders,
       count(*) FILTER (o_orderstatus = 'O')::BIGINT AS n_open,
       count(*) FILTER (o_orderstatus = 'F')::BIGINT AS n_filled,
       count(*) FILTER (o_orderstatus = 'P')::BIGINT AS n_pending
FROM orders GROUP BY month
"""


def q_top_event_per_user_day(sf_dir: str):
    """Per-(user, day) ARGMAX: the highest-value event in each user-day,
    tie-broken by event_id — the composite-key window-rank shape
    (QUALIFY row_number() = 1). One keys-only groupby on the packed
    (user, day) key; ordering uses the RAW stored doubles (identical
    bits on both engines), the emitted value is exact integer cents."""
    import ray.data

    def keyed(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(b.column("ts"), pa.int64())
        day = pc.divide(ts_us, pa.scalar(86_400_000_000, type=pa.int64()))
        return pa.table({
            "user_id": b.column("user_id"),
            "day": pc.cast(day, pa.int64()),
            "event_id": b.column("event_id"),
            "value": b.column("value"),
        })

    ev = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "value"],
        )
        .map_batches(keyed, batch_format="pyarrow")
    )

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("day", pa.int64()),
        ("event_id", pa.int64()), ("value_cents", pa.int64()),
    ])

    def argmax_part(t: pa.Table) -> pa.Table:
        """Composite-key ARGMAX over one hash partition, vectorized
        (round-5: the per-(user, day) map_groups paid one Python call
        per user-day; here the partition routes on user_id alone — a
        user's days all co-locate — and one Arrow sort + run-start take
        picks every (user, day) winner at once)."""
        idx = pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("day", "ascending"),
            ("value", "descending"), ("event_id", "ascending")])
        s = t.take(idx)
        u = s.column("user_id").to_numpy(zero_copy_only=False)
        d = s.column("day").to_numpy(zero_copy_only=False)
        firsts = np.r_[0, np.nonzero(
            (u[1:] != u[:-1]) | (d[1:] != d[:-1]))[0] + 1]
        w = s.take(pa.array(firsts))
        vals = w.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": w.column("user_id").cast(pa.int64()),
            "day": w.column("day"),
            "event_id": w.column("event_id").cast(pa.int64()),
            "value_cents": pa.array(
                np.floor(vals * 100.0 + 0.5).astype(np.int64),
                type=pa.int64()),
        }, schema=out_schema)

    from webextract.functions.joins import partition_apply

    return partition_apply(
        ev, argmax_part, on="user_id",
        schema=pa.schema([("user_id", pa.int64()), ("day", pa.int64()),
                          ("event_id", pa.int64()),
                          ("value", pa.float64())]),
        out_schema=out_schema)
