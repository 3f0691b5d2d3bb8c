"""Relational coverage: groupby/agg, joins, sort/limit, windows (split from __ray_entry__.py).

See webextract/queries/__init__.py for the assembled surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from webextract.queries._shared import _conc, _docs, guarded_fold


# --------------------------------------------------------------------------
# Relational coverage (groupby/agg, broadcast join, sort/limit, window)
# --------------------------------------------------------------------------


def q_pricing_summary(sf_dir: str):
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity"), Count()
    )
    out = out.rename_columns(
        {"sum(l_quantity)": "sum_qty", "count()": "count_order"}
    )

    def rnd(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("sum_qty")
        return b.set_column(i, "sum_qty", pc.round(b.column("sum_qty"), ndigits=2))

    return out.map_batches(rnd, batch_format="pyarrow")


def q_orders_by_segment(sf_dir: str):
    """Broadcast join: small customer side shipped once via ray.put,
    probed with vectorized pc.index_in + take (no per-row Python)
    (functions/joins.broadcast_join)."""
    import ray.data
    from ray.data.aggregate import Count

    from webextract.functions.joins import broadcast_join

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).rename_columns({"o_custkey": "c_custkey"})
    joined = broadcast_join(orders, cust, key="c_custkey")
    return (
        joined.groupby("c_mktsegment")
        .aggregate(Count())
        .rename_columns({"count()": "n_orders"})
    )


def q_orders_customers_join(sf_dir: str):
    """Big-big hash join (one shuffle, per-key cross product)."""
    import ray.data

    from webextract.functions.joins import hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"]
    ).rename_columns({"o_custkey": "c_custkey"})
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    return hash_join(orders, cust, on="c_custkey")


def q_customers_no_orders(sf_dir: str):
    """ANTI join: customers with no order among the first 1000 orderkeys —
    the existence probe ships only keys through the shuffle (no
    cross-product term for hot keys). (The full orders table covers every
    customer in this synthetic data, which would make the anti side empty;
    the orderkey cut keeps the result non-trivial.)"""
    import ray.data

    from webextract.functions.joins import hash_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    orders = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"]
        )
        .filter(expr="o_orderkey <= 1000")
        .select_columns(["o_custkey"])
        .rename_columns({"o_custkey": "c_custkey"})
    )
    return hash_join(cust, orders, on="c_custkey", how="anti")


def q_customers_with_orders(sf_dir: str):
    """SEMI join: customers having at least one order."""
    import ray.data

    from webextract.functions.joins import hash_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).rename_columns({"o_custkey": "c_custkey"})
    return hash_join(cust, orders, on="c_custkey", how="semi")


def q_events_sliding_window(sf_dir: str):
    """SLIDING window (1h width, 30min slide): each event lands in exactly
    two windows — rows duplicated in map_batches (flat explode), then one
    groupby; no per-window scans."""
    import ray.data
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def explode(b: pa.Table) -> pa.Table:
        base = pc.floor_temporal(b.column("ts"), multiple=30, unit="minute")
        prev = pc.add(base, pa.scalar(-1_800_000_000, type=pa.duration("us")))
        et = b.column("event_type")
        return pa.table(
            {
                "event_type": pa.concat_arrays(
                    [et.combine_chunks(), et.combine_chunks()]
                ),
                "window_start": pa.concat_arrays(
                    [base.combine_chunks().cast(pa.timestamp("us")),
                     prev.combine_chunks().cast(pa.timestamp("us"))]
                ),
            }
        )

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count())
        .rename_columns({"count()": "n_events"})
    )

    def recast(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("window_start")
        return b.set_column(
            i, "window_start", b.column("window_start").cast(pa.timestamp("us"))
        )

    return out.map_batches(recast, batch_format="pyarrow")


_SQL_SLIDING = """
SELECT event_type, ws AS window_start, count(*) AS n_events
FROM (
  SELECT event_type,
         unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                 time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS ws
  FROM events
)
GROUP BY event_type, ws
"""


def q_top_docs_per_lang(sf_dir: str):
    """Top-k per group: 2 longest docs per language — per-group sort+head
    inside map_groups; only the group shuffle is global."""

    def head2(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("n_chars", "descending"), ("doc_id", "ascending")]
        )
        return g.take(idx[:2])

    return (
        _docs(sf_dir, ["lang", "doc_id", "n_chars"])
        .groupby("lang")
        .map_groups(head2, batch_format="pyarrow")
    )


_SQL_TOP_PER_LANG = """
SELECT lang, doc_id, n_chars FROM documents
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY n_chars DESC, doc_id) <= 2
"""


def q_pii_recall(sf_dir: str):
    """PII RECALL on planted entities: deterministic injections (email /
    ssn-like / ipv4 keyed on doc_id % 4) must each be found exactly once.
    Complements `pii_scan` (precision on clean text)."""
    from webextract.functions.pii import PiiScanner

    def plant(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out = []
        for i, t in zip(ids, texts):
            if i % 4 == 1:
                out.append(f"{t} reach me at user{i}@example.com")
            elif i % 4 == 2:
                out.append(f"{t} id 123-45-6789")
            elif i % 4 == 3:
                out.append(f"{t} from 10.1.2.{i % 250}")
            else:
                out.append(t or "")
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(out, type=pa.string()),
            }
        )

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        plant, batch_format="pyarrow"
    ).map_batches(
        PiiScanner(redact_col=False), batch_format="pyarrow",
    )

    def project(b: pa.Table) -> pa.Table:
        spans = b.column("pii_spans").to_pylist()
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_pii": pa.array([len(s) for s in spans], type=pa.int64()),
                "kind": pa.array(
                    [s[0]["kind"] if s else "" for s in spans],
                    type=pa.string(),
                ),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


_SQL_PII_RECALL = """
SELECT doc_id,
  CASE WHEN doc_id % 4 = 0 THEN 0 ELSE 1 END::BIGINT AS n_pii,
  CASE doc_id % 4 WHEN 1 THEN 'email' WHEN 2 THEN 'ssn_like'
                  WHEN 3 THEN 'ipv4' ELSE '' END AS kind
FROM documents
"""


def q_doc_length_quantiles(sf_dir: str):
    """EXACT distributed quantiles over a bounded-cardinality int column:
    groupby(value).count() shuffles one row per DISTINCT length, the driver
    folds the tiny histogram — never a global sort of the data. Matches
    DuckDB quantile_disc (v[floor(q*(n-1))])."""
    from ray.data.aggregate import Count

    hist = guarded_fold(
        _docs(sf_dir, ["n_chars"])
        .groupby("n_chars")
        .aggregate(Count())
        .rename_columns({"count()": "n"}),
        what="doc_length_quantiles n_chars histogram")
    hist.sort(key=lambda r: r["n_chars"])
    total = sum(r["n"] for r in hist)
    qs = [0.5, 0.9, 0.99]
    targets = [int(q * (total - 1)) for q in qs]  # 0-based rank
    vals = []
    cum = 0
    it = iter(hist)
    row = next(it)
    for t in targets:
        while cum + row["n"] <= t:
            cum += row["n"]
            row = next(it)
        vals.append(row["n_chars"])
    return pa.table(
        {
            "q": pa.array(qs, type=pa.float64()),
            "value": pa.array(vals, type=pa.int64()),
        }
    )


_SQL_QUANTILES = """
SELECT 0.5::DOUBLE AS q, quantile_disc(n_chars, 0.5)::BIGINT AS value FROM documents
UNION ALL
SELECT 0.9::DOUBLE, quantile_disc(n_chars, 0.9)::BIGINT FROM documents
UNION ALL
SELECT 0.99::DOUBLE, quantile_disc(n_chars, 0.99)::BIGINT FROM documents
"""


def q_top_words(sf_dir: str):
    """EXACT distributed heavy hitters: Misra-Gries nomination per block +
    broadcast-filtered exact second pass (functions/sketches.py)."""
    from webextract.functions.sketches import top_k_words

    return top_k_words(_docs(sf_dir, ["text"]), k=10)


_SQL_TOP_WORDS = """
SELECT word, count(*)::BIGINT AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
GROUP BY word
ORDER BY n DESC, word
LIMIT 10
"""


def q_approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT user_id): per-block 4 KB
    register partials, driver-side register-max merge. Approximate by
    construction -> rows-only check; the error bound is pinned by pytest."""
    import ray.data

    from webextract.functions.sketches import approx_distinct

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    return pa.table({"estimate": pa.array([float(est)], type=pa.float64())})


def q_distinct_langs(sf_dir: str):
    """Set op: distinct values via Ray `unique` (shuffle on the key only)."""
    langs = sorted(_docs(sf_dir, ["lang"]).unique("lang"))
    return pa.table({"lang": pa.array(langs, type=pa.string())})


def q_top_docs_by_len(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(20)


def q_events_window(sf_dir: str):
    """Tumbling 1h window per event_type (count + int bounds; no float sums).

    Count/min/max are associative, so the finish is the MEASURED tree
    combine (functions/treeagg.tree_combine): map-side partial groupby,
    a materialize+count of the tiny partial output, then either the
    two-level narrow-repartition tree (distinct key set fits one task —
    event-types x hours here) or the distributed hash aggregate over the
    same partials (unbounded keys) — same rows either way, no
    caller-trusted heap contract.
    """
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "event_id"]
    )
    keys = ["event_type", "window_start"]
    # aggregate output column names from pa.Table.group_by — selecting BY
    # NAME (not position) so key/aggregate column ordering differences
    # across pyarrow versions cannot silently shuffle data between columns
    agg_cols = ["n_events_sum", "first_event_min", "last_event_max"]
    out_cols = ["n_events", "first_event", "last_event"]

    def _regroup(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(
            [("n_events", "sum"), ("first_event", "min"),
             ("last_event", "max")])
        return g.select(keys + agg_cols).rename_columns(keys + out_cols)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": b.column("event_type"),
            "window_start": pc.floor_temporal(
                b.column("ts"), unit="hour").cast(pa.timestamp("us")),
            "n_events": pa.array(
                np.ones(b.num_rows, dtype=np.int64)),
            "first_event": b.column("event_id"),
            "last_event": b.column("event_id"),
        })
        return _regroup(t)

    def agg_fallback(p):
        from ray.data.aggregate import Max, Min, Sum

        return p.groupby(keys).aggregate(
            Sum("n_events", alias_name="n_events"),
            Min("first_event", alias_name="first_event"),
            Max("last_event", alias_name="last_event"))

    from webextract.functions.treeagg import tree_combine

    return tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        _regroup, agg_fallback=agg_fallback, what="q_events_window")


def q_chunk_documents(sf_dir: str):
    """LLM-prep chunking: 1 doc -> k 64-token windows (VQA-chunk analog)."""
    from webextract.functions.chunking import chunk_documents

    return chunk_documents(_docs(sf_dir, ["doc_id", "text"]), max_tokens=64)


_SQL_CHUNKS = r"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
e AS (
  SELECT doc_id, words,
    unnest(range(0, (len(words)-1)//64 + 1)) AS i
  FROM w
)
SELECT doc_id, i::INT AS chunk_idx,
  array_to_string(words[i*64 + 1 : least((i+1)*64, len(words))], ' ') AS chunk_text,
  (least((i+1)*64, len(words)) - i*64)::BIGINT AS n_tokens
FROM e
"""


def q_tfidf_topk(sf_dir: str):
    """Top-3 TF-IDF terms per doc (functions/tfidf.py — two keys-only
    shuffles, idf as an exact integer ratio so doubles match the oracle)."""
    from webextract.functions.tfidf import tfidf_topk

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return tfidf_topk(_docs(sf_dir, ["doc_id", "text"]), n_docs=n_docs, k=3)


_SQL_TFIDF = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf FROM w GROUP BY 1, 2),
df AS (SELECT word, count(DISTINCT doc_id)::BIGINT AS df FROM w GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS n FROM documents)
SELECT doc_id, tf.word, tf, df, (tf * n.n)::DOUBLE / df AS score
FROM tf JOIN df USING (word), n
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, tf.word) <= 3
"""


def q_events_asof(sf_dir: str):
    """Backward as-of join: each click matched to the latest prior (or
    simultaneous) view by the same user (functions/temporal.asof_join —
    one keys+ids shuffle, vectorized searchsorted merge per user)."""
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
        clicks, views, by="user_id", left_ts="ts_us", right_ts="view_ts_us",
        left_schema=lschema, right_schema=rschema, how="inner",
    )


# Right-side ts ties resolve to the max view_event_id in the engine (stable
# tie-break sort on the payload column) — the GROUP BY here mirrors that.
_SQL_EVENTS_ASOF = """
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id
  FROM events WHERE event_type = 'click'
), v AS (
  SELECT user_id, epoch_us(ts) AS view_ts_us, max(event_id) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT c.user_id, c.ts_us, c.event_id, v.view_ts_us, v.view_event_id
FROM c ASOF JOIN v
  ON c.user_id = v.user_id AND c.ts_us >= v.view_ts_us
"""


# 50 deterministic overlapping windows: lo_i = 2024-01-01 + i*37 min,
# width 53 min (overlap factor 53/37), shared by engine and oracle.
_IV_BASE_US = 1_704_067_200_000_000  # epoch_us('2024-01-01')
_IV_STEP_US = 37 * 60 * 1_000_000
_IV_WIDTH_US = 53 * 60 * 1_000_000
_IV_N = 50


def q_events_interval(sf_dir: str):
    """Interval (range) join: events against 50 overlapping time windows,
    broadcast probe with no shuffle (functions/temporal.interval_join)."""
    import ray.data

    from webextract.functions.temporal import interval_join

    intervals = pa.table({
        "interval_id": pa.array(range(_IV_N), type=pa.int64()),
        "lo": pa.array([_IV_BASE_US + i * _IV_STEP_US for i in range(_IV_N)],
                       type=pa.int64()),
        "hi": pa.array(
            [_IV_BASE_US + i * _IV_STEP_US + _IV_WIDTH_US
             for i in range(_IV_N)], type=pa.int64()),
    })
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"])

    def conv(b: pa.Table) -> pa.Table:
        return pa.table({"event_id": b.column("event_id"),
                         "ts_us": b.column("ts").cast(pa.int64())})

    ds = ds.map_batches(conv, batch_format="pyarrow")
    return interval_join(ds, intervals, ts="ts_us")


_SQL_EVENTS_INTERVAL = f"""
WITH iv AS (
  SELECT i AS interval_id,
         {_IV_BASE_US} + i * {_IV_STEP_US} AS lo,
         {_IV_BASE_US} + i * {_IV_STEP_US} + {_IV_WIDTH_US} AS hi
  FROM range({_IV_N}) t(i)
)
SELECT e.event_id, epoch_us(e.ts) AS ts_us, iv.interval_id
FROM events e JOIN iv ON epoch_us(e.ts) >= iv.lo AND epoch_us(e.ts) < iv.hi
"""


def q_sessionize(sf_dir: str):
    """Gap-based sessionization per user (30-minute gap)."""
    import ray.data

    from webextract.functions.sessions import sessionize

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )
    return sessionize(ds, gap_minutes=30)


_SQL_SESSIONS = r"""
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
)
SELECT user_id, session_idx::BIGINT AS session_idx, count(*)::BIGINT AS n_events,
       min(event_id) AS first_event, max(event_id) AS last_event
FROM s GROUP BY user_id, session_idx
"""


def q_entity_spans(sf_dir: str):
    """BIO tag-sequence -> entity spans (kie_ser_postprocess.py:10-83
    analog): deterministic tags over the token stream (i%7==0 -> B-ENT,
    i%7==1 -> I-ENT, else O) decode to 2-token entity spans."""
    from webextract.functions.entities import explode_entities

    def tag(b: pa.Table) -> pa.Table:
        toks = [(t or "").split(" ") for t in b.column("text").to_pylist()]
        tags = [
            ["B-ENT" if i % 7 == 0 else ("I-ENT" if i % 7 == 1 else "O")
             for i in range(len(ts))]
            for ts in toks
        ]
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "tokens": pa.array(toks, type=pa.list_(pa.string())),
                "tags": pa.array(tags, type=pa.list_(pa.string())),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(tag, batch_format="pyarrow")
        .map_batches(explode_entities, batch_format="pyarrow")
    )


_SQL_ENTITY_SPANS = r"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
e AS (
  SELECT doc_id, words, len(words) AS n,
         unnest(range(0, (len(words) + 6) // 7)) AS j
  FROM w
)
SELECT doc_id, j::INT AS ent_idx, (j*7)::INT AS tok_start,
       least(j*7 + 2, n)::INT AS tok_end, 'ENT' AS label,
       CASE WHEN j*7 + 1 < n THEN words[j*7 + 1] || ' ' || words[j*7 + 2]
            ELSE words[j*7 + 1] END AS ent_text
FROM e
"""


def q_entity_relations(sf_dir: str):
    """KIE relation extraction (VQAReTokenRelation,
    layoutlm_transforms.py:418-463 analog): SER-style BIO tags place a
    QUESTION entity at token 14m (2 tokens) and an ANSWER at 14m+7;
    candidate pairs are fed in REVERSED (answer_id, question_id) order and
    the op normalizes question->head, computing the relation span as the
    min/max over both entity spans' bounds."""
    from webextract.functions.entities import explode_relations

    def tag(b: pa.Table) -> pa.Table:
        toks = [(t or "").split(" ") for t in b.column("text").to_pylist()]
        tags, cands = [], []
        for ts in toks:
            row = []
            for i in range(len(ts)):
                m = i % 14
                row.append("B-QUESTION" if m == 0 else
                           "I-QUESTION" if m == 1 else
                           "B-ANSWER" if m == 7 else
                           "I-ANSWER" if m == 8 else "O")
            tags.append(row)
            n_ent = sum(1 for i in range(len(ts)) if i % 14 in (0, 7))
            cands.append([[j + 1, j] for j in range(0, n_ent - 1, 2)])
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "tokens": pa.array(toks, type=pa.list_(pa.string())),
                "tags": pa.array(tags, type=pa.list_(pa.string())),
                "rel_candidates": pa.array(
                    cands, type=pa.list_(pa.list_(pa.int32()))),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(tag, batch_format="pyarrow")
        .map_batches(explode_relations, batch_format="pyarrow")
    )


_SQL_ENTITY_RELATIONS = r"""
WITH w AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
),
r AS (
  SELECT doc_id, n,
         unnest(range(0, greatest((n - 8) // 14 + 1, 0))) AS m
  FROM w WHERE n >= 8
)
SELECT doc_id, (2*m)::INT AS head, (2*m + 1)::INT AS tail,
       (14*m)::INT AS start_index, least(14*m + 9, n)::INT AS end_index
FROM r
"""


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition quality signals (duplicate-line fractions +
    top word-2-gram character coverage) — raw IEEE ratios, SQL-mirrored."""
    from webextract.functions.textstats import repetition_stats_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        repetition_stats_batch, batch_format="pyarrow"
    ).select_columns(
        ["doc_id", "dup_line_frac", "dup_line_char_frac",
         "top_2gram_char_frac"]
    )


_SQL_REPETITION = r"""
WITH lx AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents
),
lc AS (
  SELECT doc_id, line, count(*) AS c FROM lx GROUP BY doc_id, line
),
lagg AS (
  SELECT doc_id,
    sum(c) AS n_lines,
    sum(c * length(line)) AS total_chars,
    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_lines,
    sum(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END) AS dup_chars
  FROM lc GROUP BY doc_id
),
w AS (
  SELECT doc_id, length(text) AS n,
    list_filter(regexp_split_to_array(text, '[\s\x{0b}]+'),
                x -> x <> '') AS words
  FROM documents
),
g AS (
  SELECT doc_id, n, words[i+1] || ' ' || words[i+2] AS gram
  FROM w, unnest(range(0, greatest(len(words) - 1, 0))) AS t(i)
),
gc AS (
  SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY doc_id, n, gram
),
topg AS (
  SELECT doc_id, n, c * length(gram) AS cov,
    row_number() OVER (PARTITION BY doc_id
                       ORDER BY c DESC, gram ASC) AS rn
  FROM gc
)
SELECT d.doc_id,
  CASE WHEN la.n_lines > 0
       THEN la.dup_lines::DOUBLE / la.n_lines ELSE 0.0 END AS dup_line_frac,
  CASE WHEN la.total_chars > 0
       THEN la.dup_chars::DOUBLE / la.total_chars
       ELSE 0.0 END AS dup_line_char_frac,
  coalesce(CASE WHEN t.n > 0 THEN t.cov::DOUBLE / t.n END,
           0.0) AS top_2gram_char_frac
FROM documents d
LEFT JOIN lagg la ON la.doc_id = d.doc_id
LEFT JOIN (SELECT * FROM topg WHERE rn = 1) t ON t.doc_id = d.doc_id
"""


def q_paragraph_dedup(sf_dir: str):
    """C4-style corpus-global line dedup + document reassembly. Decision
    is a keys-only (lfp, okey) shuffle; surviving line payloads reach the
    reassembly via the partition-aligned `winner_filter` (object-store
    winner buckets — cluster-safe), never an all-to-all
    (functions/paragraphs.py for the full scale argument)."""
    from webextract.functions.paragraphs import paragraph_dedup

    return paragraph_dedup(lambda: _docs(sf_dir, ["doc_id", "text"]))


_SQL_PARAGRAPH_DEDUP = """
WITH lx AS (
  SELECT doc_id, i::BIGINT AS idx, l[i+1] AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM documents),
       unnest(range(0, len(l))) t(i)
),
keep AS (
  SELECT doc_id, idx, line FROM lx
  QUALIFY row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) = 1
)
SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS text
FROM keep GROUP BY doc_id
"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: eval split = doc_id % 97 == 0; training
    docs flagged when any word 8-gram also occurs in the eval split
    (broadcast semi-join — functions/decontam.py)."""
    import numpy as np
    import pyarrow as pa

    from webextract.functions.decontam import decontaminate

    def _mod97(b):
        return b.column("doc_id").to_numpy(zero_copy_only=False) % 97 == 0

    def eval_split(b):
        return b.filter(pa.array(_mod97(b)))

    def train_split(b):
        return b.filter(pa.array(~_mod97(b)))

    ev = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        eval_split, batch_format="pyarrow")
    tr = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        train_split, batch_format="pyarrow")
    return decontaminate(tr, ev).select_columns(["doc_id", "contaminated"])


_SQL_DECONTAMINATE = r"""
WITH w AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '[\s\x{0b}]+'),
                x -> x <> '') AS words
  FROM documents
),
g AS (
  SELECT doc_id, array_to_string(words[i+1:i+8], ' ') AS gram
  FROM w, unnest(range(0, greatest(len(words) - 7, 0))) AS t(i)
),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
bad AS (
  SELECT DISTINCT g.doc_id FROM g JOIN ev USING (gram)
  WHERE g.doc_id % 97 <> 0
)
SELECT d.doc_id, (d.doc_id IN (SELECT doc_id FROM bad)) AS contaminated
FROM documents d WHERE d.doc_id % 97 <> 0
"""


def q_stratified_sample(sf_dir: str):
    """Deterministic per-language stratified sample (en 25%, de 50%,
    others 80%): key-derived LCG threshold, map-side only, SQL-mirrored
    with identical constants (functions/sampling.py)."""
    from webextract.functions.sampling import stratified_sample_batch

    def sample(b):
        return stratified_sample_batch(
            b, rates_permille={"en": 250, "de": 500},
            default_permille=800)

    return _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        sample, batch_format="pyarrow")


_SQL_STRATIFIED = """
SELECT doc_id, lang FROM documents
WHERE ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 % 1000
      < CASE lang WHEN 'en' THEN 250 WHEN 'de' THEN 500 ELSE 800 END
"""


def q_host_quota(sf_dir: str):
    """Per-domain document cap (Gopher §A1.2 caps docs per domain to
    bound source skew): keep the first `k` docs per source, by doc_id.

    Scale shape = the `dedup_docs_rows` discipline: the keyed decision is
    a (source, doc_id) keys-only shuffle whose groups emit at most k
    winner ids; full rows are then retrieved map-side with
    `winner_filter` (object-store winner buckets — cluster-safe), so text
    payloads never cross an all-to-all."""
    from webextract.functions.dedup import winner_filter

    k = 3

    def topk(group: pa.Table) -> pa.Table:
        ids = sorted(group.column("doc_id").to_pylist())[:k]
        return pa.table({"doc_id": pa.array(ids, type=pa.int64())})

    keys = _docs(sf_dir, ["source", "doc_id"])
    winners = keys.groupby("source").map_groups(
        topk, batch_format="pyarrow")
    out = winner_filter(
        _docs(sf_dir, ["doc_id", "source", "lang"]), winners, "doc_id",
    )
    return out.select_columns(["doc_id", "source", "lang"])


_SQL_HOST_QUOTA = """
SELECT doc_id, source, lang FROM documents
QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 3
"""


def q_seq_decode(sf_dir: str):
    """EOS-terminated sequence decode (RecAttnLabelDecode,
    rec_postprocess.py:255-346 analog): the first 20 chars of each doc are
    encoded into the 36-char GO/STOP dictionary (unencodable chars
    skipped), <STOP>-terminated, GO-padded; docs with doc_id%10==0 get NO
    stop token and must decode to '' (the reference's no-EOS rule)."""
    from webextract.stages.seqdecode import SeqDecodeUDF

    charset = "0123456789abcdefghijklmnopqrstuvwxyz"
    idx = {c: i + 2 for i, c in enumerate(charset)}

    def encode(b: pa.Table) -> pa.Table:
        ids_col = []
        for did, t in zip(b.column("doc_id").to_pylist(),
                          b.column("text").to_pylist()):
            ids = [idx[c] for c in (t or "").lower()[:20] if c in idx]
            if did % 10 != 0:
                ids.append(1)  # <STOP>
            ids.extend([0] * max(0, 24 - len(ids)))  # trailing <GO> padding
            ids_col.append(ids)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "token_ids": pa.array(ids_col, type=pa.list_(pa.int32())),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(encode, batch_format="pyarrow")
        .map_batches(
            SeqDecodeUDF(kind="attn", charset=charset),
            batch_format="pyarrow",
        )
        .select_columns(["doc_id", "text"])
    )


_SQL_SEQ_DECODE = r"""
SELECT doc_id,
  CASE WHEN doc_id % 10 = 0 THEN ''
       ELSE regexp_replace(substr(lower(text), 1, 20), '[^0-9a-z]', '', 'g')
  END AS text
FROM documents
"""
