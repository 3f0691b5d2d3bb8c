"""Dedup family (split from __ray_entry__.py).

See webextract/queries/__init__.py for the assembled surface.
"""

from __future__ import annotations

import pyarrow as pa
from webextract.queries._shared import _docs


# --------------------------------------------------------------------------
# Dedup family
# --------------------------------------------------------------------------


def q_dedup_exact(sf_dir: str):
    from webextract.functions.dedup import exact_dedup
    from webextract.functions.textstats import fingerprint_batch

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    )
    return exact_dedup(ds.select_columns(["fp", "doc_id"]), "fp", "doc_id")


def q_dedup_events(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "event_id"]
    )
    return (
        ds.groupby(["user_id", "event_type"])
        .min("event_id")
        .rename_columns({"min(event_id)": "event_id"})
    )


def q_dedup_docs_rows(sf_dir: str):
    """Keep-first dedup returning the FULL surviving row (not just the key)
    — the shape a prep pipeline actually wants.

    Scale shape (round-3 rewrite): the keyed DECISION is a keys-only
    shuffle (groupby(fp).min(doc_id) over projected (fp, doc_id)); the
    surviving full rows are then retrieved with `winner_filter` — a
    partition-aligned map-side semi filter whose winner buckets travel
    through the OBJECT STORE (cluster-safe: no node-local scratch) — so
    the text payload is read once and NEVER crosses an all-to-all (the
    old version shuffled (doc_id, text, lang) through
    groupby(fp).map_groups)."""
    from webextract.functions.dedup import exact_dedup, winner_filter
    from webextract.functions.textstats import fingerprint_batch

    keys = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(fingerprint_batch, batch_format="pyarrow")
        .select_columns(["fp", "doc_id"])
    )
    winners = exact_dedup(keys, "fp", "doc_id").select_columns(["doc_id"])
    out = winner_filter(
        _docs(sf_dir, ["doc_id", "text", "lang"]), winners, "doc_id",
    )
    return out.select_columns(["doc_id", "text", "lang"])


_SQL_DEDUP_ROWS = """
SELECT doc_id, text, lang FROM documents
QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
"""


def q_normalize_text(sf_dir: str):
    """Unicode canonicalization prep op: NFC normalize + lowercase +
    whitespace collapse — the text-side RecResizeNormForInfer analog
    (canonicalize-before-emit), SQL-mirrored via nfc_normalize/lower/
    regexp_replace."""
    import re
    import unicodedata

    ws = re.compile(r"\s+")

    def norm(b: pa.Table) -> pa.Table:
        out = [
            ws.sub(" ", unicodedata.normalize("NFC", (t or "")).lower()).strip()
            for t in b.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "norm_text": pa.array(out, type=pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        norm, batch_format="pyarrow"
    )


_SQL_NORMALIZE = r"""
SELECT doc_id,
       trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
         AS norm_text
FROM documents
"""


def q_minhash_signatures(sf_dir: str):
    from webextract.functions.dedup import MinHasher

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHasher(), batch_format="pyarrow"
    )

    def project(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # first signature / band-key element per row, vectorized (no
        # per-row Python): list_element is an O(n) offset gather
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "sig0": pc.list_element(b.column("minhash"), 0).cast(pa.int64()),
                "band0": pc.list_element(b.column("band_key"), 0).cast(pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def q_neardup_pairs(sf_dir: str):
    from webextract.functions.dedup import neardup_pairs

    return neardup_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.5)


def q_neardup_pairs_exact(sf_dir: str):
    """LSH candidates verified with EXACT n-gram Jaccard, fully distributed.

    Candidate (id_a, id_b) pairs from MinHash+LSH (bands=16 for ~1.0 recall
    at j>=0.9) get their texts back through `attach_pair_texts` — a
    MEASURED transport: dimension-sized corpora broadcast the (id, text)
    table once and gather map-side (zero join exchanges); above the bound,
    two hash joins move (doc_id, text) pairs, never a driver-side dict.
    Each row then computes exact word-3-gram Jaccard and keeps pairs >=
    0.8. On the deterministic corpus every planted near-dup sits at j>=0.9
    and every non-dup below 0.3, so the result equals the all-pairs SQL
    oracle.
    """
    from webextract.functions.dedup import jaccard, neardup_pairs
    from webextract.functions.joins import attach_pair_texts

    cand = neardup_pairs(
        _docs(sf_dir, ["doc_id", "text"]), threshold=0.5, bands=16
    ).drop_columns(["est_jaccard"])
    s_cand = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    j2 = attach_pair_texts(cand, _docs(sf_dir, ["doc_id", "text"]),
                           cand_schema=s_cand)

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "jaccard": pa.array([], type=pa.float64()),
                }
            )
        ids_a = b.column("id_a").to_pylist()
        ids_b = b.column("id_b").to_pylist()
        ja = [
            round(jaccard(ta, tb), 6)
            for ta, tb in zip(b.column("text_a").to_pylist(),
                              b.column("text_b").to_pylist())
        ]
        keep_a, keep_b, keep_j = [], [], []
        for a, bb, jc in zip(ids_a, ids_b, ja):
            if jc >= 0.8:
                keep_a.append(a)
                keep_b.append(bb)
                keep_j.append(jc)
        return pa.table(
            {
                "id_a": pa.array(keep_a, type=pa.int64()),
                "id_b": pa.array(keep_b, type=pa.int64()),
                "jaccard": pa.array(keep_j, type=pa.float64()),
            }
        )

    return j2.map_batches(verify, batch_format="pyarrow")


_SQL_NEARDUP_EXACT = r"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
g AS (
  SELECT DISTINCT doc_id, array_to_string(words[i+1 : i+3], ' ') AS gram
  FROM w, unnest(range(0, greatest(len(words) - 2, 1))) AS t(i)
),
cnt AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(ix::DOUBLE / (ca.n + cb.n - ix), 6) AS jaccard
FROM inter
JOIN cnt ca ON ca.doc_id = id_a
JOIN cnt cb ON cb.doc_id = id_b
WHERE ix::DOUBLE / (ca.n + cb.n - ix) >= 0.8
"""


_NEARDUP_PAIRS_CACHE: dict = {}


def _neardup_pairs_exact_mat(sf_dir: str):
    """Materialized (and memoized per sf_dir) exact near-dup pairs: three
    queries (`neardup_pairs_exact` consumers `dedup_clusters` and
    `neardup_keep`) share the same expensive LSH->join->verify subgraph;
    the result is tiny (pairs only), so pinning it once per session is
    strictly cheaper than recomputing the chain per query."""
    ds = _NEARDUP_PAIRS_CACHE.get(sf_dir)
    if ds is None:
        ds = q_neardup_pairs_exact(sf_dir).materialize()
        _NEARDUP_PAIRS_CACHE[sf_dir] = ds
    return ds


def q_neardup_pairs_exact_cached(sf_dir: str):
    """Driver-facing `neardup_pairs_exact`: same result, via the shared
    materialized subgraph (docstring of `q_neardup_pairs_exact` has the
    semantics; `_neardup_pairs_exact_mat` the caching rationale)."""
    return _neardup_pairs_exact_mat(sf_dir)


def q_dedup_clusters(sf_dir: str):
    """Duplicate CLUSTERS: exact-verified near-dup pairs -> connected
    components by distributed min-label propagation (functions/graph.py);
    component id = min doc_id reachable. The step that turns pair mining
    into keep-one-per-cluster dedup."""
    from webextract.functions.graph import connected_components

    pairs = _neardup_pairs_exact_mat(sf_dir)
    return connected_components(pairs).rename_columns({"node": "doc_id"})


_SQL_DEDUP_CLUSTERS = (
    "WITH RECURSIVE pairs AS (" + _SQL_NEARDUP_EXACT + "),\n"
    + r"""
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
)
SELECT src AS doc_id, least(src, min(dst))::BIGINT AS component
FROM reach GROUP BY src
"""
)


def q_rolling_fingerprint(sf_dir: str):
    """Winnowing-style doc fingerprint: min rolling-window hash per doc."""
    from webextract.functions.textstats import rolling_hashes

    def fp(b: pa.Table) -> pa.Table:
        vals = [min(rolling_hashes(s or "", window=32))
                for s in b.column("text").to_pylist()]
        return pa.table(
            {"doc_id": b.column("doc_id"),
             "fp_rolling": pa.array(vals, type=pa.int64())}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fp, batch_format="pyarrow")


def q_simhash(sf_dir: str):
    from webextract.functions.dedup import simhash_batch

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "simhash"])


def q_substring_dedup(sf_dir: str):
    """ExactSubstr-style duplicated-substring removal (Lee et al. 2022,
    word-5-gram bounded variant — functions/substring.py): every word
    position covered by a word 5-gram occurring >= 2 times anywhere in
    the corpus is removed from ALL its occurrences, and documents are
    reassembled. Decision is one keys-only (gfp, n) exchange; the
    duplicated-gram set broadcasts (measured ArrayIndex / hash-bucket
    switch) and the probe+mask+reassemble stage is fused — document
    payload never shuffles."""
    from webextract.functions.substring import substring_dedup

    return substring_dedup(lambda: _docs(sf_dir, ["doc_id", "text"]), k=5)


_SQL_SUBSTRING_DEDUP = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (SELECT w.doc_id, t.i AS pos,
             array_to_string(w.words[t.i+1 : t.i+5], ' ') AS gram
      FROM w, unnest(range(0, greatest(coalesce(len(w.words), 0) - 4, 0)))
           AS t(i)),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
cov AS (SELECT DISTINCT g.doc_id, g.pos + j.j AS wpos
        FROM g JOIN dup USING (gram), unnest(range(0, 5)) AS j(j)),
wp AS (SELECT w.doc_id, t.i AS wpos, w.words[t.i+1] AS word
       FROM w, unnest(range(0, coalesce(len(w.words), 0))) AS t(i)),
kept AS (SELECT wp.doc_id, wp.wpos, wp.word FROM wp
         LEFT JOIN cov ON cov.doc_id = wp.doc_id AND cov.wpos = wp.wpos
         WHERE cov.doc_id IS NULL),
wl AS (SELECT doc_id, coalesce(len(words), 0) AS nw FROM w)
SELECT wl.doc_id,
       coalesce(string_agg(k.word, ' ' ORDER BY k.wpos), '') AS text_kept,
       count(k.wpos)::BIGINT AS n_kept,
       (wl.nw - count(k.wpos))::BIGINT AS n_removed
FROM wl LEFT JOIN kept k ON k.doc_id = wl.doc_id
GROUP BY wl.doc_id, wl.nw
"""


def q_incremental_dedup(sf_dir: str):
    """Incremental snapshot ingestion: dedup a NEW crawl slice against the
    already-ingested PRIOR corpus, then within itself — the
    continuous-ingestion shape a web-scale pipeline runs per crawl dump
    (the new slice is a day's crawl; the prior corpus is the whole lake).
    Slices are deterministic over the synthetic table: prior =
    ``doc_id % 4 != 3`` (75%), new = the rest. Reference analog: the
    keep-first content-hash discipline of the converters' duplicate-label
    drop (mindocr/data/utils dict building), lifted to cross-snapshot
    ingestion.

    Scale shape: both sides are projected to content-fingerprint KEYS
    before anything moves — the cross-snapshot probe is a keys-only
    ``hash_join(how="anti")`` exchange, the within-slice keep-first is the
    keys-only ``exact_dedup``, and the surviving FULL rows come back
    through ``winner_filter``'s object-store buckets, so the text payload
    never crosses an all-to-all at any corpus size. The prior side is
    per-batch pre-distincted map-side (a batch-local combiner) before the
    exchange.
    """
    from webextract.functions.dedup import exact_dedup, winner_filter
    from webextract.functions.joins import hash_join
    from webextract.functions.textstats import fingerprint_batch

    keys = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(fingerprint_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "fp"])
    )

    def _slice(new: bool):
        def fn(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            is_new = pc.equal(
                pc.bit_wise_and(b.column("doc_id"), pa.scalar(3)), 3)
            return b.filter(is_new if new else pc.invert(is_new))

        return fn

    new_keys = keys.map_batches(_slice(True), batch_format="pyarrow")

    def _prior_fps(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_new = pc.equal(
            pc.bit_wise_and(b.column("doc_id"), pa.scalar(3)), 3)
        t = b.filter(pc.invert(is_new)).select(["fp"])
        # batch-local combiner: distinct fps before the keys-only exchange
        return t.group_by("fp").aggregate([])

    prior_fps = keys.map_batches(_prior_fps, batch_format="pyarrow")

    unseen = hash_join(
        new_keys, prior_fps, on="fp", how="anti",
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("fp", pa.string())]),
        right_schema=pa.schema([("fp", pa.string())]),
    )
    winners = exact_dedup(unseen, "fp", "doc_id").select_columns(["doc_id"])
    out = winner_filter(
        _docs(sf_dir, ["doc_id", "text", "lang"]), winners, "doc_id",
    )
    return out.select_columns(["doc_id", "text", "lang"])


_SQL_INCREMENTAL_DEDUP = """
SELECT d.doc_id, d.text, d.lang FROM documents d
WHERE d.doc_id % 4 = 3
  AND NOT EXISTS (SELECT 1 FROM documents p
                  WHERE p.doc_id % 4 <> 3 AND md5(p.text) = md5(d.text))
QUALIFY row_number() OVER (PARTITION BY md5(d.text) ORDER BY d.doc_id) = 1
"""


def q_dedup_report(sf_dir: str):
    """Dedup telemetry — the per-stage removal summary a 100 TB dedup
    run prints before anyone trusts it: for each dedup granularity
    (exact text, canonicalized text, word/vocabulary), total units,
    distinct units and the implied removal count, as one fixed
    (stage, n_total, n_distinct, n_removed) table.

    Scale shape: each stage is one column-pruned scan with a BLOCK-LOCAL
    pre-distinct (unique fingerprints / words per block), then a
    keys-only distinct groupby whose `.count()` is the only driver
    value — six scalars total cross to the driver, never rows. Text
    identity travels as md5 fingerprints (the `doc_fingerprint`
    convention, mirrored literally in the SQL), so the exchanges carry
    32-byte keys, not documents."""
    import hashlib
    import re
    import unicodedata

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ws = re.compile(r"\s+")

    def _distinct_count(ds) -> int:
        return int(ds.count())

    def fp_exact(b: pa.Table) -> pa.Table:
        fps = {hashlib.md5((t or "").encode()).hexdigest()
               for t in b.column("text").to_pylist()}
        return pa.table({"fp": pa.array(sorted(fps), type=pa.string())})

    def fp_norm(b: pa.Table) -> pa.Table:
        fps = {hashlib.md5(
            ws.sub(" ", unicodedata.normalize("NFC", (t or "")).lower())
            .strip().encode()).hexdigest()
               for t in b.column("text").to_pylist()}
        return pa.table({"fp": pa.array(sorted(fps), type=pa.string())})

    def words_block(b: pa.Table) -> pa.Table:
        texts = pc.fill_null(b.column("text").combine_chunks(), "")
        lists = pc.split_pattern(texts, " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        return pa.table({"word": pc.unique(lists.flatten())})

    def word_totals(b: pa.Table) -> pa.Table:
        texts = pc.fill_null(b.column("text").combine_chunks(), "")
        lists = pc.split_pattern(texts, " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        return pa.table({"n": pa.array(
            [int(pc.sum(lists.value_lengths()).as_py() or 0)],
            type=pa.int64())})

    docs = _docs(sf_dir, ["text"])
    n_docs = int(docs.count())
    from ray.data.aggregate import Count

    d_exact = _distinct_count(
        docs.map_batches(fp_exact, batch_format="pyarrow")
        .groupby("fp").aggregate(Count()))
    d_norm = _distinct_count(
        docs.map_batches(fp_norm, batch_format="pyarrow")
        .groupby("fp").aggregate(Count()))
    d_word = _distinct_count(
        docs.map_batches(words_block, batch_format="pyarrow")
        .groupby("word").aggregate(Count()))
    n_words = int(
        docs.map_batches(word_totals, batch_format="pyarrow")
        .aggregate(Sum("n"))["sum(n)"])

    stages = [("exact_text", n_docs, d_exact),
              ("norm_text", n_docs, d_norm),
              ("word", n_words, d_word)]
    return pa.table({
        "stage": pa.array([s for s, _, _ in stages], type=pa.string()),
        "n_total": pa.array([t for _, t, _ in stages], type=pa.int64()),
        "n_distinct": pa.array([d for _, _, d in stages], type=pa.int64()),
        "n_removed": pa.array([t - d for _, t, d in stages],
                              type=pa.int64()),
    })


_SQL_DEDUP_REPORT = r"""
WITH n AS (
  SELECT trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
           AS nt
  FROM documents
), w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT 'exact_text' AS stage, count(*)::BIGINT AS n_total,
       count(DISTINCT md5(text))::BIGINT AS n_distinct,
       (count(*) - count(DISTINCT md5(text)))::BIGINT AS n_removed
FROM documents
UNION ALL
SELECT 'norm_text', count(*)::BIGINT, count(DISTINCT md5(nt))::BIGINT,
       (count(*) - count(DISTINCT md5(nt)))::BIGINT FROM n
UNION ALL
SELECT 'word', count(*)::BIGINT, count(DISTINCT word)::BIGINT,
       (count(*) - count(DISTINCT word))::BIGINT FROM w
"""
