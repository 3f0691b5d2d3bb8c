"""Table structure + spatial matching; similarity search (split from __ray_entry__.py).

See webextract/queries/__init__.py for the assembled surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from webextract.queries._shared import _conc, _docs


# --------------------------------------------------------------------------
# Table structure + spatial matching
# --------------------------------------------------------------------------


def q_table_extract(sf_dir: str):
    """Table-structure decode (TableLabelDecode analog): a deterministic
    per-doc <table> grid derived from the documents table is parsed back
    into explicit (row, col, text) cells; oracle reconstructs in SQL.

    R = doc_id%3+2 rows x 3 cols; cell (r,c) holds words[(r*3+c) % n]."""
    from html import escape

    from webextract.stages.tables import explode_cells

    def render(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        htmls = []
        for i, t in zip(ids, texts):
            words = (t or "").split(" ")
            n = len(words)
            rows = []
            for r in range(i % 3 + 2):
                tds = "".join(
                    f"<td>{escape(words[(r * 3 + c) % n])}</td>" for c in range(3)
                )
                rows.append(f"<tr>{tds}</tr>")
            htmls.append(("<table>" + "".join(rows) + "</table>").encode())
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "html": pa.array(htmls, type=pa.binary()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(render, batch_format="pyarrow")
        .map_batches(explode_cells, batch_format="pyarrow")
    )


_SQL_TABLE_EXTRACT = r"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         (doc_id % 3 + 2)::INT AS nrows
  FROM documents
),
e AS (
  SELECT doc_id, words, unnest(range(0, nrows * 3)) AS i FROM w
)
SELECT doc_id, (i // 3)::INT AS row, (i % 3)::INT AS col,
       words[(i % len(words)) + 1] AS cell_text
FROM e
"""


def q_table_cell_match(sf_dir: str):
    """Cell⇄text spatial join (matcher.py:217-270 analog) on deterministic
    geometry: an R x 3 grid of 100x20 cells, two text boxes centered in
    each cell; per-cell assembled text must equal 'w[i] w[i+ncells]'."""
    from webextract.functions.matcher import match_cells_batch

    def build(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out_id, out_cells, out_tboxes, out_texts = [], [], [], []
        for i, t in zip(ids, texts):
            words = (t or "").split(" ")
            n = len(words)
            ncells = (i % 3 + 2) * 3
            cells, tboxes, frags = [], [], []
            for ci in range(ncells):
                r, c = divmod(ci, 3)
                x0, y0 = c * 100.0, r * 20.0
                cells.append([x0, y0, x0 + 100.0, y0 + 20.0])
            for ci in range(ncells):  # first fragment per cell, in order
                r, c = divmod(ci, 3)
                tboxes.append([c * 100.0 + 10, r * 20.0 + 5,
                               c * 100.0 + 40, r * 20.0 + 15])
                frags.append(words[ci % n])
            for ci in range(ncells):  # second fragment per cell
                r, c = divmod(ci, 3)
                tboxes.append([c * 100.0 + 50, r * 20.0 + 5,
                               c * 100.0 + 90, r * 20.0 + 15])
                frags.append(words[(ci + ncells) % n])
            out_id.append(i)
            out_cells.append(cells)
            out_tboxes.append(tboxes)
            out_texts.append(frags)
        box_t = pa.list_(pa.list_(pa.float64()))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "cell_boxes": pa.array(out_cells, type=box_t),
                "text_boxes": pa.array(out_tboxes, type=box_t),
                "texts": pa.array(out_texts, type=pa.list_(pa.string())),
            }
        )

    matched = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(build, batch_format="pyarrow")
        .map_batches(match_cells_batch, batch_format="pyarrow")
    )

    def explode(b: pa.Table) -> pa.Table:
        ids, cidx, ctext = [], [], []
        for i in range(b.num_rows):
            did = b.column("doc_id")[i].as_py()
            for ci, txt in enumerate(b.column("cell_texts")[i].as_py()):
                ids.append(did)
                cidx.append(ci)
                ctext.append(txt)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "cell_idx": pa.array(cidx, type=pa.int32()),
                "cell_text": pa.array(ctext, type=pa.string()),
            }
        )

    return matched.map_batches(explode, batch_format="pyarrow")


_SQL_CELL_MATCH = r"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         ((doc_id % 3 + 2) * 3)::INT AS ncells
  FROM documents
),
e AS (
  SELECT doc_id, words, ncells, unnest(range(0, ncells)) AS ci FROM w
)
SELECT doc_id, ci::INT AS cell_idx,
       words[(ci % len(words)) + 1] || ' ' ||
       words[((ci + ncells) % len(words)) + 1] AS cell_text
FROM e
"""


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------


def _query_vec(sf_dir: str) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = t.column("vec_id").to_pylist().index(0)
    return np.asarray(t.column("embedding")[idx].as_py(), dtype=np.float64)


def q_similarity_topk(sf_dir: str):
    import ray.data

    from webextract.functions.similarity import topk_cosine

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return topk_cosine(ds, _query_vec(sf_dir), k=10, concurrency=_conc())


def q_similarity_topk_lsh(sf_dir: str):
    import ray.data

    from webextract.functions.similarity import topk_cosine_lsh

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return topk_cosine_lsh(ds, _query_vec(sf_dir), k=5, n_planes=4,
                           concurrency=_conc())


def q_similarity_topk_ivf(sf_dir: str):
    import ray.data

    from webextract.functions.similarity import topk_cosine_ivf

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return topk_cosine_ivf(ds, _query_vec(sf_dir), k=5, n_centroids=8,
                           nprobe=2, concurrency=_conc())


def q_similarity_topk_ivfpq(sf_dir: str):
    """IVFADC+R (functions/similarity.topk_cosine_ivfpq): PQ-compressed
    ADC candidate generation (8 uint8 codes per 64-float vector) over the
    probed IVF buckets, exact re-rank of the top 50 candidates against
    the raw column. Approximate by construction -> rows-only."""
    import ray.data

    from webextract.functions.similarity import topk_cosine_ivfpq

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return topk_cosine_ivfpq(ds, _query_vec(sf_dir), k=5, n_centroids=8,
                             nprobe=2, m=8, n_codes=16, rerank=50,
                             concurrency=_conc())


def q_embedding_neardup(sf_dir: str):
    import ray.data

    from webextract.functions.similarity import embedding_neardup

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    dim = len(_query_vec(sf_dir))
    return embedding_neardup(ds, tau=0.95, dim=dim, n_planes=6,
                             concurrency=_conc())
