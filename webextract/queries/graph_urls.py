"""URL canonicalization, unigram LM, link graph, PageRank (split from __ray_entry__.py).

See webextract/queries/__init__.py for the assembled surface.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from webextract.queries._shared import _docs
from webextract.queries.flagship import _links_ds


# --------------------------------------------------------------------------
# Round-3 batch 5: url canonicalization, unigram-LM scoring, lag windows,
# count-min sketch
# --------------------------------------------------------------------------

# Messy-URL synthesis shared by the engine query and the SQL oracle: both
# sides build the SAME raw url string from doc_id (modular rules only, so
# SQL can mirror it), then canonicalize INDEPENDENTLY — the engine through
# functions/urls.py, the oracle through DuckDB string functions. Variants
# exercised: uppercase scheme/host, explicit :443, utm_* params, fragments;
# path key doc_id%25 + host doc_id%20 (lcm 100 << corpus size, so canonical keys genuinely collide) force canonical collisions so the
# dedup query has real work.
_MESSY_URL_SQL = """
(CASE WHEN doc_id % 7 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
(CASE WHEN doc_id % 4 = 1 THEN 'Host' || (doc_id % 20) || '.Example'
      ELSE 'host' || (doc_id % 20) || '.example' END) ||
(CASE WHEN doc_id % 5 = 2 THEN ':443' ELSE '' END) ||
(CASE WHEN doc_id % 11 = 3 THEN '' ELSE '/doc/' || (doc_id % 25) END) ||
(CASE WHEN doc_id % 3 = 1 THEN '?utm_source=feed'
      WHEN doc_id % 3 = 2 THEN '?ref=a&utm_campaign=x&id=' || (doc_id % 25)
      ELSE '' END) ||
(CASE WHEN doc_id % 2 = 1 THEN '#sec1' ELSE '' END)
"""


def _messy_url(doc_id: int) -> str:
    scheme = "HTTPS" if doc_id % 7 == 0 else "https"
    host = (f"Host{doc_id % 20}.Example" if doc_id % 4 == 1
            else f"host{doc_id % 20}.example")
    port = ":443" if doc_id % 5 == 2 else ""
    path = "" if doc_id % 11 == 3 else f"/doc/{doc_id % 25}"
    q = ("?utm_source=feed" if doc_id % 3 == 1
         else f"?ref=a&utm_campaign=x&id={doc_id % 25}" if doc_id % 3 == 2
         else "")
    frag = "#sec1" if doc_id % 2 == 1 else ""
    return f"{scheme}://{host}{port}{path}{q}{frag}"


def _messy_urls_ds(sf_dir: str):
    def conv(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "url": pa.array([_messy_url(i) for i in ids], type=pa.string()),
        })

    return _docs(sf_dir, ["doc_id"]).map_batches(conv, batch_format="pyarrow")


def q_url_canonical(sf_dir: str):
    """URL canonicalization (functions/urls.py — fragment strip, case
    folding, default-port drop, utm_* param removal), checked against an
    independent DuckDB string-function implementation of the same rules."""
    from webextract.functions.urls import canonicalize_batch

    ds = _messy_urls_ds(sf_dir)
    return ds.map_batches(
        lambda b: canonicalize_batch(b).select(["doc_id", "canon_url"]),
        batch_format="pyarrow")


# The oracle CANONICALIZES the raw url with string ops (independent SQL
# implementation of the five rules) — it does not shortcut to the expected
# canonical form.
_SQL_URL_CANON_BODY = """
u AS (SELECT doc_id, {url_expr} AS url FROM documents),
s AS (SELECT doc_id, split_part(url, '#', 1) AS nofrag FROM u),
p AS (SELECT doc_id,
        lower(split_part(nofrag, '://', 1)) AS scheme,
        split_part(nofrag, '://', 2) AS rest FROM s),
cutp AS (SELECT doc_id, scheme, rest,
        least(coalesce(nullif(instr(rest, '/'), 0), 1000000000),
              coalesce(nullif(instr(rest, '?'), 0), 1000000000)) AS cut
       FROM p),
hp AS (SELECT doc_id, scheme,
        lower(CASE WHEN cut = 1000000000 THEN rest
                   ELSE substr(rest, 1, cut - 1) END) AS hostport,
        CASE WHEN cut = 1000000000 THEN ''
             ELSE substr(rest, cut) END AS pathq FROM cutp),
hh AS (SELECT doc_id, scheme,
        CASE WHEN scheme = 'https' AND hostport LIKE '%:443'
               THEN substr(hostport, 1, length(hostport) - 4)
             WHEN scheme = 'http' AND hostport LIKE '%:80'
               THEN substr(hostport, 1, length(hostport) - 3)
             ELSE hostport END AS host,
        CASE WHEN split_part(pathq, '?', 1) = '' THEN '/'
             ELSE split_part(pathq, '?', 1) END AS path,
        CASE WHEN pathq LIKE '%?%'
               THEN substr(pathq, length(split_part(pathq, '?', 1)) + 2)
             ELSE '' END AS query
       FROM hp),
q AS (SELECT doc_id, scheme, host, path,
        coalesce(array_to_string(list_filter(string_split(query, '&'),
          x -> x <> '' AND NOT starts_with(x, 'utm_')), '&'), '') AS cq
      FROM hh),
canon AS (SELECT doc_id,
        scheme || '://' || host || path ||
        CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS canon_url
      FROM q)
"""

_SQL_URL_CANON = ("WITH " + _SQL_URL_CANON_BODY.format(url_expr=_MESSY_URL_SQL)
                  + "\nSELECT doc_id, canon_url FROM canon")


def q_url_dedup(sf_dir: str):
    """Keep-newest row per CANONICAL url (functions/urls.dedup_by_url):
    only (canon_url, doc_id) crosses the shuffle — the keys-only winner
    discipline of dedup_docs_rows applied to crawl-url identity."""
    from webextract.functions.urls import dedup_by_url

    return dedup_by_url(_messy_urls_ds(sf_dir), order_col="doc_id",
                        keep="max")


_SQL_URL_DEDUP = ("WITH " + _SQL_URL_CANON_BODY.format(url_expr=_MESSY_URL_SQL)
                  + """
SELECT canon_url, doc_id FROM canon
QUALIFY row_number() OVER (PARTITION BY canon_url ORDER BY doc_id DESC) = 1
""")


def q_lm_scores(sf_dir: str):
    """CCNet-style bits-per-token under the corpus unigram LM
    (functions/lm.py — two keys-only shuffles, integer-quantized token
    information so doubles match the oracle bit-for-bit)."""
    from webextract.functions.lm import corpus_token_count, unigram_lm_scores

    docs = _docs(sf_dir, ["doc_id", "text"])
    n = corpus_token_count(docs)
    return unigram_lm_scores(docs, total_tokens=n)


# length(bin(x)) on a positive BIGINT == Python int.bit_length; // is
# integer division in DuckDB, so lm_bits is an exact integer sum and
# avg_bits one integer/integer division — bit-identical to the engine.
_SQL_LM_SCORES = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf FROM w GROUP BY 1, 2),
cnt AS (SELECT word, count(*)::BIGINT AS cnt FROM w GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS n FROM w)
SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
  sum(tf * length(bin(n.n // cnt.cnt)))::BIGINT AS lm_bits,
  sum(tf * length(bin(n.n // cnt.cnt)))::DOUBLE / sum(tf) AS avg_bits
FROM tf JOIN cnt USING (word), n
GROUP BY doc_id
"""


def q_ccnet_buckets(sf_dir: str):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, LREC —
    cited by the C4/CCNet lineage in PAPERS.md): every document is
    assigned a head/middle/tail TERCILE of bits-per-token WITHIN ITS
    LANGUAGE — the selection signal CCNet thresholds on. Pipeline
    composition: `unigram_lm_scores` (two keys-only exchanges) ->
    exact-integer quantization q = lm_bits * 10^6 // n_tokens (so the
    tercile order is integer-exact in both engines) -> lang attach via
    the measured `join_dim` -> per-lang NTILE(3) through `rank_agg`'s
    one-histogram-row-per-distinct-(lang, q) exchange."""
    from webextract.functions.lm import corpus_token_count, unigram_lm_scores
    from webextract.functions.window import rank_agg
    from webextract.queries._shared import join_dim

    docs = _docs(sf_dir, ["doc_id", "text"])
    n = corpus_token_count(docs)
    scored = unigram_lm_scores(docs, total_tokens=n)

    q_schema = pa.schema([("doc_id", pa.int64()), ("q", pa.int64())])

    def quant(b: pa.Table) -> pa.Table:
        lm = b.column("lm_bits").cast(pa.int64())
        nt = b.column("n_tokens").cast(pa.int64())
        return pa.table({
            "doc_id": b.column("doc_id"),
            "q": pc.divide(pc.multiply(lm, pa.scalar(1_000_000, pa.int64())),
                           nt).cast(pa.int64()),
        }, schema=q_schema)

    with_lang = join_dim(
        scored.map_batches(quant, batch_format="pyarrow"),
        f"{sf_dir}/documents.parquet", key="doc_id", cols=["lang"],
        fact_schema=q_schema)
    ranked = rank_agg(with_lang, by="lang", val="q", tiebreak="doc_id",
                      n_tiles=3)
    return (ranked.select_columns(["lang", "doc_id", "q", "tile"])
            .rename_columns({"tile": "ppl_bucket"}))


_SQL_CCNET_BUCKETS = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf FROM w GROUP BY 1, 2),
cnt AS (SELECT word, count(*)::BIGINT AS cnt FROM w GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS n FROM w),
s AS (
  SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
         sum(tf * length(bin(n.n // cnt.cnt)))::BIGINT AS lm_bits
  FROM tf JOIN cnt USING (word), n
  GROUP BY doc_id
),
b AS (
  SELECT d.lang, s.doc_id, (s.lm_bits * 1000000 // s.n_tokens)::BIGINT AS q
  FROM s JOIN documents d USING (doc_id)
)
SELECT lang, doc_id, q,
       ntile(3) OVER (PARTITION BY lang ORDER BY q, doc_id)::BIGINT
         AS ppl_bucket
FROM b
"""


def q_lm_bigram_scores(sf_dir: str):
    """Bits-per-bigram under the corpus BIGRAM LM (functions/lm.py
    `bigram_lm_scores`): one context-word-keyed exchange computes both
    the bigram counts and the conditional's denominator in place;
    integer-quantized conditional information so doubles match the
    oracle bit-for-bit."""
    from webextract.functions.lm import bigram_lm_scores

    return bigram_lm_scores(_docs(sf_dir, ["doc_id", "text"]))


_SQL_LM_BIGRAM_SCORES = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
bg AS (SELECT w.doc_id, w.words[t.i+1] AS w1, w.words[t.i+2] AS w2
       FROM w, unnest(range(0, greatest(coalesce(len(w.words), 0) - 1, 0)))
            AS t(i)),
tf AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS tf FROM bg
       GROUP BY 1, 2, 3),
cbg AS (SELECT w1, w2, count(*)::BIGINT AS cnt FROM bg GROUP BY 1, 2),
cctx AS (SELECT w1, count(*)::BIGINT AS ctx FROM bg GROUP BY 1)
SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
  sum(tf * length(bin(cctx.ctx // cbg.cnt)))::BIGINT AS lm2_bits,
  sum(tf * length(bin(cctx.ctx // cbg.cnt)))::DOUBLE / sum(tf) AS avg_bits2
FROM tf JOIN cbg USING (w1, w2) JOIN cctx USING (w1)
GROUP BY doc_id
"""


def _dsir_scored(sf_dir: str):
    """Shared DSIR scoring subgraph (functions/dsir.py): target slice =
    English documents, raw = whole corpus; integer-quantized unigram
    log-importance-ratio so doubles match the oracle bit-for-bit."""
    from webextract.functions.dsir import (corpus_token_counts_flagged,
                                           dsir_scores)

    def flag(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text": b.column("text"),
            "is_target": pc.equal(b.column("lang"), "en"),
        })

    docs = _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        flag, batch_format="pyarrow")
    r, t = corpus_token_counts_flagged(docs)
    return dsir_scores(docs, raw_tokens=r, target_tokens=t)


def q_dsir_scores(sf_dir: str):
    """DSIR importance scores (Xie et al. 2023) for every document against
    the English target slice — two keys-only shuffles, no driver vocab."""
    return _dsir_scored(sf_dir)


def q_dsir_scores_hashed(sf_dir: str):
    """Hashed-feature DSIR (the paper's bounded-feature scale path): the
    bucket-count fold is the ONLY exchange (<= n_buckets rows by
    construction) and scoring is an embarrassingly parallel broadcast
    pass — rows-only (hash-internal, like `minhash_signatures`); the
    cross-variant equivalence is pinned by pytest at a collision-free
    bucket width."""
    from webextract.functions.dsir import dsir_scores_hashed

    def flag(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text": b.column("text"),
            "is_target": pc.equal(b.column("lang"), "en"),
        })

    docs = _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        flag, batch_format="pyarrow")
    return dsir_scores_hashed(docs, n_buckets=4096)


def q_dsir_select(sf_dir: str):
    """Deterministic DSIR resampling: top-200 docs by importance weight
    (zero-temperature limit of Gumbel-top-k), id tie-break."""
    from webextract.functions.dsir import dsir_select

    return dsir_select(_dsir_scored(sf_dir), k=200)


_SQL_DSIR_BODY = """
w AS (
  -- coalesce mirrors the engine's fill_null guards: NULL text tokenizes
  -- as the empty-string token, NULL lang means non-target
  SELECT doc_id, coalesce(lang = 'en', FALSE) AS is_t,
         unnest(string_split(coalesce(text, ''), ' ')) AS word
  FROM documents
),
tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf FROM w GROUP BY 1, 2),
cnt AS (SELECT word, count(*)::BIGINT AS cnt_r,
               sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS cnt_t
        FROM w GROUP BY 1),
tot AS (SELECT count(*)::BIGINT AS r,
               sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS t FROM w),
scores AS (
  SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
    sum(tf * (length(bin(tot.r // cnt.cnt_r))
              - length(bin(greatest(tot.t // (cnt.cnt_t + 1), 1)))
             ))::BIGINT AS dsir_bits,
    sum(tf * (length(bin(tot.r // cnt.cnt_r))
              - length(bin(greatest(tot.t // (cnt.cnt_t + 1), 1)))
             ))::DOUBLE / sum(tf) AS avg_dsir
  FROM tf JOIN cnt USING (word), tot
  GROUP BY doc_id
)
"""

# length(bin(x)) on a positive BIGINT == Python int.bit_length; greatest(
# .., 1) keeps the smoothed target quotient positive on both engines, so
# dsir_bits is an exact integer sum and avg_dsir one integer/integer
# division — bit-identical to the engine.
_SQL_DSIR_SCORES = ("WITH " + _SQL_DSIR_BODY
                    + "SELECT * FROM scores")

_SQL_DSIR_SELECT = ("WITH " + _SQL_DSIR_BODY + """
SELECT doc_id, dsir_bits FROM scores
ORDER BY dsir_bits DESC, doc_id ASC
LIMIT 200
""")


def q_events_lag(sf_dir: str):
    """Per-user LAG window (functions/temporal.key_lag): previous event id
    + time gap within each user, ordered (ts, event_id); first event per
    user dropped so no nullable columns."""
    import ray.data

    from webextract.functions.temporal import key_lag

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id"])

    def conv(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": b.column("ts").cast(pa.int64()),
            "event_id": b.column("event_id"),
        })

    return key_lag(ds.map_batches(conv, batch_format="pyarrow"),
                   by="user_id", ts="ts_us", payload="event_id")


_SQL_EVENTS_LAG = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
)
SELECT user_id, ts_us, event_id,
  lag(event_id) OVER w AS prev_event_id,
  ts_us - lag(ts_us) OVER w AS gap
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
QUALIFY prev_event_id IS NOT NULL
"""


def q_cms_word_counts(sf_dir: str):
    """Approximate corpus word frequencies from a distributed count-min
    sketch (functions/sketches.CmsSketch — never undercounts, overcount
    bounded by e*N/w w.p. 1-2^-d; rows-only, bound pinned by pytest)."""
    from webextract.functions.sketches import cms_word_counts

    probes = ["count", "crawl", "data", "page", "text"]
    return cms_word_counts(_docs(sf_dir, ["text"]), probes)


# --------------------------------------------------------------------------
# Round-3 batch 6: link graph — outlink extraction, host degrees, PageRank
# --------------------------------------------------------------------------


def q_extract_links(sf_dir: str):
    """Outlink/anchor extraction from the raw page HTML
    (stages/links.py — crop-fan-out analog over <a href> regions). The
    oracle reconstructs the corpus's deterministic nav + sidebar link
    inventory per doc; corrupt (%50==7) and pdf (%25==3) rows emit no
    links, mirroring the segmenter's quarantine/doctype gating."""
    return _links_ds(sf_dir)


_SQL_EXTRACT_LINKS = """
WITH ok AS (
  SELECT doc_id FROM documents WHERE doc_id % 50 <> 7 AND doc_id % 25 <> 3
),
nav AS (SELECT doc_id, unnest(range(3 + doc_id % 5)) AS i FROM ok),
ads AS (SELECT doc_id, unnest(range(4 + doc_id % 3)) AS i FROM ok)
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
"""

# Synthetic host graph shared by the engine and the SQL oracle (modular
# rules only, like the messy-url synthesis): src = doc_id % 20,
# dst = (doc_id*7 + 3) % 20. dst is always odd-shifted so no self-loops.


def _host_edges_ds(sf_dir: str):
    def conv(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(ids % 20, type=pa.int64()),
            "dst": pa.array((ids * 7 + 3) % 20, type=pa.int64()),
        })

    return _docs(sf_dir, ["doc_id"]).map_batches(conv, batch_format="pyarrow")


def q_host_degree(sf_dir: str):
    """Exact per-host out/in degree over the synthetic host link graph
    (functions/graph.degree_stats — per-batch combiner, one keys-only
    groupby; multi-edges counted with multiplicity)."""
    from webextract.functions.graph import degree_stats

    return degree_stats(_host_edges_ds(sf_dir))


_SQL_HOST_DEGREE = """
WITH e AS (
  SELECT doc_id % 20 AS src, (doc_id * 7 + 3) % 20 AS dst FROM documents
)
SELECT node, sum(o)::BIGINT AS out_deg, sum(i)::BIGINT AS in_deg FROM (
  SELECT src AS node, 1 AS o, 0 AS i FROM e
  UNION ALL
  SELECT dst AS node, 0 AS o, 1 AS i FROM e
) GROUP BY node
"""


def q_pagerank_hosts(sf_dir: str):
    """PageRank over the DISTINCT host graph (functions/graph.pagerank —
    per-iteration join + groupby moving only (node, double) pairs).
    Rows-only: cross-block float sums are order-dependent; exactness vs a
    dense local reference is pinned by pytest instead."""
    from webextract.functions.dedup import exact_dedup
    from webextract.functions.graph import pagerank

    def key(b: pa.Table) -> pa.Table:
        import numpy as np

        s = b.column("src").to_numpy(zero_copy_only=False)
        d = b.column("dst").to_numpy(zero_copy_only=False)
        return b.append_column("ek", pa.array(s * 1000 + d,
                                              type=pa.int64()))

    keyed = _host_edges_ds(sf_dir).map_batches(key, batch_format="pyarrow")
    distinct = exact_dedup(keyed.select_columns(["ek", "src"]),
                           key_col="ek", order_col="src")

    def unkey(b: pa.Table) -> pa.Table:
        import numpy as np

        ek = b.column("ek").to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(ek // 1000, type=pa.int64()),
            "dst": pa.array(ek % 1000, type=pa.int64()),
        })

    edges = distinct.map_batches(unkey, batch_format="pyarrow")
    return pagerank(edges, n_iter=5)
