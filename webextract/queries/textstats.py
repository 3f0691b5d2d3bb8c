"""Text analysis (split from __ray_entry__.py).

See webextract/queries/__init__.py for the assembled surface.
"""

from __future__ import annotations

import pyarrow as pa
from webextract.queries._shared import _conc, _docs


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------


def q_doc_fingerprint(sf_dir: str):
    from webextract.functions.textstats import fingerprint_batch

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "fp"])


def q_quality_stats(sf_dir: str):
    from webextract.functions.textstats import quality_stats_batch

    def project(b: pa.Table) -> pa.Table:
        b = quality_stats_batch(b)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars": b.column("n_chars_c"),
                "n_tokens": b.column("n_tokens"),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(project, batch_format="pyarrow")


def q_token_stats_by_lang(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min, Sum

    from webextract.functions.textstats import quality_stats_batch

    ds = _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        quality_stats_batch, batch_format="pyarrow"
    )
    out = ds.groupby("lang").aggregate(
        Count(), Sum("n_tokens"), Min("n_chars_c"), Max("n_chars_c")
    )
    return out.rename_columns(
        {
            "count()": "n_docs",
            "sum(n_tokens)": "total_tokens",
            "min(n_chars_c)": "min_chars",
            "max(n_chars_c)": "max_chars",
        }
    )


def q_bpe_token_counts(sf_dir: str):
    from webextract.functions.textstats import bpe_token_count_batch

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        bpe_token_count_batch, batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "n_bpe_tokens"])


def q_quality_scores(sf_dir: str):
    """C4/Gopher-style quality ratios; UNROUNDED float64 so the exact IEEE
    divisions match the SQL oracle bit-for-bit (np.round is half-even,
    DuckDB round is half-away — rounding would desync at ties)."""
    import functools

    from webextract.functions.textstats import quality_score_batch

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        functools.partial(quality_score_batch, round_to=None),
        batch_format="pyarrow",
    )
    return ds.select_columns(
        ["doc_id", "alpha_ratio", "punct_ratio", "stopword_ratio", "quality"]
    )


_SQL_QUALITY_SCORES = r"""
WITH q AS (
  SELECT doc_id,
    length(text)::DOUBLE AS n,
    length(regexp_replace(text, '[^\p{L} ]', '', 'g'))::DOUBLE AS alpha_cnt,
    length(regexp_replace(text, '[\p{L}\p{N}\s\x{0b}]', '', 'g'))::DOUBLE AS punct_cnt,
    list_filter(regexp_split_to_array(lower(text), '[\s\x{0b}]+'),
                w -> w <> '') AS words
  FROM documents
),
r AS (
  SELECT doc_id,
    CASE WHEN n > 0 THEN alpha_cnt / n ELSE 0.0 END AS alpha_ratio,
    CASE WHEN n > 0 THEN punct_cnt / n ELSE 0.0 END AS punct_ratio,
    CASE WHEN len(words) > 0 AND n > 0 THEN
      len(list_filter(words, w -> list_contains(
        ['the','a','an','and','or','of','to','in','is','are','was','for',
         'with','on','at','by','it','this','that'], w)))::DOUBLE / len(words)
      ELSE 0.0 END AS stopword_ratio,
    CASE WHEN len(words) > 0 AND n > 0
      THEN list_sum(list_transform(words, w -> length(w)))::DOUBLE
           / len(words) ELSE 0.0 END AS mwl,
    n
  FROM q
)
SELECT doc_id, alpha_ratio, punct_ratio, stopword_ratio,
  CASE WHEN n > 0 THEN greatest(0.0, least(1.0,
    alpha_ratio - 2.0 * greatest(0.0, punct_ratio - 0.1)
      - (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 0.0 ELSE 0.3 END)))
  ELSE 0.0 END AS quality
FROM r
"""


_SQL_LANG_ID = r"""
WITH w AS (
  SELECT doc_id, text,
         list_distinct(list_filter(
           regexp_split_to_array(lower(text), '[\s\x{0b}]+'),
           w -> w <> '')) AS ws
  FROM documents
),
v AS (
  SELECT doc_id, text,
    len(list_intersect(ws, ['der','die','und','das','ist','nicht','ein','mit','für'])) AS v_de,
    len(list_intersect(ws, ['the','and','of','to','is','in','that','for','with'])) AS v_en,
    len(list_intersect(ws, ['el','la','los','que','es','una','por','con','para'])) AS v_es,
    len(list_intersect(ws, ['le','la','les','et','est','une','pour','que','dans'])) AS v_fr
  FROM w
)
SELECT doc_id,
  CASE
    WHEN length(regexp_replace(substring(text, 1, 2000),
                               '[^\x{4e00}-\x{9fff}]', '', 'g'))
         > 0.2 * least(length(text), 2000) THEN 'zh'
    WHEN greatest(v_de, v_en, v_es, v_fr) = 0 THEN 'und'
    WHEN v_de >= v_en AND v_de >= v_es AND v_de >= v_fr THEN 'de'
    WHEN v_en >= v_es AND v_en >= v_fr THEN 'en'
    WHEN v_es >= v_fr THEN 'es'
    ELSE 'fr'
  END AS lang_pred
FROM v
"""


def q_pii_scan(sf_dir: str):
    """PII span counts per doc (oracle asserts zero false positives on the
    clean synthetic text — PII precision, not recall; recall is pytest-side
    with planted entities)."""
    from webextract.functions.pii import PiiScanner

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        PiiScanner(redact_col=False), batch_format="pyarrow",
    )

    def project(b: pa.Table) -> pa.Table:
        n = [len(s) for s in b.column("pii_spans").to_pylist()]
        return pa.table(
            {"doc_id": b.column("doc_id"), "n_pii": pa.array(n, type=pa.int64())}
        )

    return ds.map_batches(project, batch_format="pyarrow")


def q_lang_id(sf_dir: str):
    from webextract.functions.textstats import lang_id_batch

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lang_id_batch, batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "lang_pred"])


def q_vocab_novelty(sf_dir: str):
    """Cross-snapshot vocabulary novelty at the word-trigram level:
    3-gram shingles appearing in the NEW crawl slice (``doc_id % 2 = 1``)
    that the PRIOR slice never saw, with their new-slice occurrence
    counts — top 50 by (count desc, gram asc). The drift probe a
    continuously-ingesting corpus runs per dump (spam campaigns,
    template changes, new junk phrasings); pairs with
    `incremental_dedup`'s document-level cross-snapshot anti join.
    (Trigrams, not unigrams: single-word novelty saturates on any
    bounded vocabulary — phrase-level novelty is what actually drifts.)

    Scale shape: both sides build trigrams map-side with vectorized
    kernels (``split_pattern`` explode + ``binary_join_element_wise``
    over three shifted views of the flat word array — no per-row
    Python); the prior side is per-block DISTINCTed before anything
    moves; the unseen-gram probe is ``hash_join(how="anti")`` whose
    transport is picked by MEASURE (broadcast key set when the prior
    gram vocabulary is dimension-sized, keys-only exchange beyond);
    the count side is one gram-keyed exchange fed by block-local
    combiners; the finish is a per-block top-k prefilter + bounded
    global sort."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from webextract.functions.joins import hash_join

    docs = _docs(sf_dir, ["doc_id", "text"])

    def _trigrams_flat(t: pa.Table) -> pa.Array:
        texts = t.column("text").combine_chunks()
        lists = pc.split_pattern(pc.fill_null(texts, ""), " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        n = len(flat)
        if n < 3:
            return pa.array([], type=pa.string())
        grams = pc.binary_join_element_wise(
            flat.slice(0, n - 2), flat.slice(1, n - 2),
            flat.slice(2, n - 2), " ")
        # Mask out trigrams that straddle a document boundary: position
        # j (0-based in the flat array) is valid iff j+3 <= end-of-doc.
        offs = np.asarray(lists.offsets)
        ends = np.repeat(offs[1:], np.diff(offs))[: n - 2]
        valid = (np.arange(n - 2) + 3) <= ends
        return grams.filter(pa.array(valid))

    def _slice(b: pa.Table, new: bool) -> pa.Table:
        odd = pc.equal(
            pc.bit_wise_and(b.column("doc_id"), pa.scalar(1)), 1)
        return b.filter(odd if new else pc.invert(odd))

    def new_counts(b: pa.Table) -> pa.Table:
        t = _slice(b, True)
        grams = _trigrams_flat(t) if t.num_rows else None
        if grams is None or len(grams) == 0:
            return pa.table({"gram": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        agg = (pa.table({"gram": grams})
               .group_by("gram").aggregate([([], "count_all")]))
        return pa.table({"gram": agg.column("gram"),
                         "n": agg.column("count_all").cast(pa.int64())})

    def prior_vocab(b: pa.Table) -> pa.Table:
        t = _slice(b, False)
        if t.num_rows == 0:
            return pa.table({"gram": pa.array([], type=pa.string())})
        return pa.table({"gram": pc.unique(_trigrams_flat(t))})

    new_cnt = (docs.map_batches(new_counts, batch_format="pyarrow")
               .groupby("gram").aggregate(Sum("n", alias_name="n")))
    prior = docs.map_batches(prior_vocab, batch_format="pyarrow")
    unseen = hash_join(
        new_cnt, prior, on="gram", how="anti",
        left_schema=pa.schema([("gram", pa.string()), ("n", pa.int64())]),
        right_schema=pa.schema([("gram", pa.string())]),
    )

    def blk_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= 50:
            return t
        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("gram", "ascending")])
        return t.take(idx.slice(0, 50))

    return (unseen.map_batches(blk_topk, batch_format="pyarrow")
            .sort(["n", "gram"], descending=[True, False]).limit(50))


_SQL_VOCAB_NOVELTY = """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), tri AS (
  SELECT doc_id, ws[u.i] || ' ' || ws[u.i+1] || ' ' || ws[u.i+2] AS gram
  FROM tok CROSS JOIN LATERAL unnest(range(1, len(ws)-1)) AS u(i)
), newc AS (
  SELECT gram, count(*)::BIGINT AS n FROM tri
  WHERE doc_id % 2 = 1 GROUP BY gram
), oldv AS (
  SELECT DISTINCT gram FROM tri WHERE doc_id % 2 = 0
)
SELECT gram, n FROM newc
WHERE NOT EXISTS (SELECT 1 FROM oldv WHERE oldv.gram = newc.gram)
ORDER BY n DESC, gram
LIMIT 50
"""
