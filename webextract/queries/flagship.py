"""Flagship: detect-then-extract with byte-identity oracle (split from __ray_entry__.py).

See webextract/queries/__init__.py for the assembled surface.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from webextract.queries._shared import _conc


# --------------------------------------------------------------------------
# Flagship: detect-then-extract with byte-identity oracle
# --------------------------------------------------------------------------


_EXTRACT_CACHE: dict = {}
_LINKS_CACHE: dict = {}


def _extract_ds(sf_dir: str):
    """Extracted-pages dataset, materialized and memoized per sf_dir:
    six driver queries (extract_text, block_counts, verify_pass,
    training_prep, c4_line_filter, ...) consume the same
    render->segment->extract subgraph; the result is one row per doc
    (html payload already dropped), so pinning it once per session is
    strictly cheaper than re-running the pipeline per query."""
    ds = _EXTRACT_CACHE.get(sf_dir)
    if ds is None:
        from webextract.pipelines.extract_pipeline import extract_pages
        from webextract.sources.pages import pages_from_documents

        ds = extract_pages(
            pages_from_documents(sf_dir), concurrency=_conc()
        ).materialize()
        _EXTRACT_CACHE[sf_dir] = ds
    return ds


def _links_ds(sf_dir: str):
    """(doc_id, href, anchor) rows, materialized + memoized per sf_dir
    (shared by extract_links / anchor_terms / top_anchor_per_target)."""
    ds = _LINKS_CACHE.get(sf_dir)
    if ds is None:
        from webextract.sources.pages import pages_from_documents
        from webextract.stages.links import extract_links

        ds = extract_links(
            pages_from_documents(sf_dir), concurrency=_conc()
        ).materialize()
        _LINKS_CACHE[sf_dir] = ds
    return ds


def q_extract_text(sf_dir: str):
    """Byte-identical extracted text per document (ok rows)."""
    ds = _extract_ds(sf_dir).filter(expr="status == 'ok'")
    return ds.select_columns(["doc_id", "text"])


_SQL_GOLD_TEXT = r"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         (CASE WHEN doc_id % 19 = 11 AND doc_id % 25 <> 3 AND doc_id % 17 <> 5 THEN 5 ELSE doc_id % 3 + 1 END)::INT AS k
  FROM documents
)
SELECT doc_id,
  array_to_string(
    list_filter(
      list_transform(range(0, k), i ->
        array_to_string(words[(i*len(words))//k + 1 : ((i+1)*len(words))//k], ' ')
      ), c -> c <> ''), chr(10)) AS text
FROM w
WHERE doc_id % 50 <> 7
"""


def q_verify_pass(sf_dir: str):
    """The north-rule verification pass as a query: byte-equality flags
    reduced to global counters (RecMetric partial+AllReduce pattern). The
    oracle pins n_match == n_ok — 100% byte-identity is itself the assertion.
    """
    from webextract.functions.metrics import verify_extraction

    m = verify_extraction(_extract_ds(sf_dir))
    return pa.table(
        {
            "n_docs": pa.array([m["n_docs"]], type=pa.int64()),
            "n_ok": pa.array([m["n_ok"]], type=pa.int64()),
            "n_match": pa.array([m["n_match"]], type=pa.int64()),
        }
    )


_SQL_VERIFY_PASS = """
SELECT count(*)::BIGINT AS n_docs,
       sum(CASE WHEN doc_id % 50 <> 7 THEN 1 ELSE 0 END)::BIGINT AS n_ok,
       sum(CASE WHEN doc_id % 50 <> 7 THEN 1 ELSE 0 END)::BIGINT AS n_match
FROM documents
"""


def q_extract_block_counts(sf_dir: str):
    """Detect-stage block counts + branch routing + quarantine status."""
    ds = _extract_ds(sf_dir)

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_blocks": pc.cast(b.column("n_blocks"), pa.int64()),
                "doctype": b.column("doctype"),
                "status": b.column("status"),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


_SQL_BLOCK_COUNTS = """
SELECT doc_id,
  CASE WHEN doc_id % 50 = 7 THEN 0
       ELSE least(CASE WHEN doc_id % 19 = 11 AND doc_id % 25 <> 3 AND doc_id % 17 <> 5 THEN 5 ELSE doc_id % 3 + 1 END,
                 len(string_split(text, ' '))) END AS n_blocks,
  CASE WHEN doc_id % 50 = 7 THEN ''
       WHEN doc_id % 25 = 3 THEN 'pdf' ELSE 'html' END AS doctype,
  CASE WHEN doc_id % 50 = 7 THEN 'error' ELSE 'ok' END AS status
FROM documents
"""


def q_training_prep(sf_dir: str):
    """Full prep composition: extract -> quality filter -> 64-token chunks.

    All synthetic docs pass the quality gate deterministically (word-soup
    alpha ratio ~1.0 >> 0.5), so the oracle is gold-text chunking over the
    non-corrupt docs.
    """
    from webextract.pipelines.prep_pipeline import prep_training_data
    from webextract.sources.pages import pages_from_documents

    return prep_training_data(
        pages_from_documents(sf_dir), chunk_tokens=64, min_quality=0.5,
        concurrency=_conc(),
    )


_SQL_TRAINING_PREP = r"""
WITH k0 AS (
  SELECT doc_id, text, (CASE WHEN doc_id % 19 = 11 AND doc_id % 25 <> 3 AND doc_id % 17 <> 5 THEN 5 ELSE doc_id % 3 + 1 END)::INT AS k
  FROM documents WHERE doc_id % 50 <> 7
),
g AS (
  SELECT doc_id,
    array_to_string(
      list_filter(
        list_transform(range(0, k), i ->
          array_to_string(
            string_split(text, ' ')[(i*len(string_split(text, ' ')))//k + 1
                                    : ((i+1)*len(string_split(text, ' ')))//k],
            ' ')
        ), c -> c <> ''), chr(10)) AS gold
  FROM k0
),
w AS (
  SELECT doc_id, string_split(gold, ' ') AS words FROM g
),
e AS (
  SELECT doc_id, words, unnest(range(0, (len(words)-1)//64 + 1)) AS i FROM w
)
SELECT doc_id, i::INT AS chunk_idx,
  array_to_string(words[i*64 + 1 : least((i+1)*64, len(words))], ' ') AS chunk_text,
  (least((i+1)*64, len(words)) - i*64)::BIGINT AS n_tokens
FROM e
"""
