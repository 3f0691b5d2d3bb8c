"""TF-IDF top-terms per document, fully distributed.

The reference scores recognized text against a char-frequency dictionary
(`mindocr/postprocess/rec_postprocess.py` char-dict weighting); the
corpus-level analog a training-data pipeline needs is term weighting by
document frequency. Shape:

1. `map_batches` explodes each doc into `(doc_id, word, tf)` rows — tf is
   complete per batch because a document never spans rows.
2. ONE keys-only shuffle `groupby(word)` attaches the global document
   frequency `df = |group|` to every row (no driver-side vocabulary).
3. A second `groupby(doc_id)` keeps each doc's top-k terms by
   ``score = (tf * n_docs) / df`` (idf as an exact integer ratio — no
   log, so the engine and a SQL oracle produce bit-identical doubles).

Ties break on ascending word, making the top-k total and deterministic.
At 100 TB both shuffles move only (doc_id, word, small ints) — text
payloads never enter an all-to-all.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _explode_tf(text_col: str, id_col: str):
    """(doc_id, word, tf) rows, VECTORIZED (round-5: the former per-row
    Python dict loop is one `_flat_ngram_strings` split + an Arrow hash
    group_by over (doc, word))."""
    from webextract.functions.ngrams import _flat_ngram_strings

    def fn(batch: pa.Table) -> pa.Table:
        doc_idx, words = _flat_ngram_strings(batch.column(text_col), 1)
        ids = np.asarray(
            batch.column(id_col).cast(pa.int64()).combine_chunks())
        if doc_idx.size == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "word": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64()),
            })
        counted = pa.table({
            id_col: pa.array(ids[doc_idx], type=pa.int64()),
            "word": words,
        }).group_by([id_col, "word"], use_threads=False).aggregate(
            [([], "count_all")])
        # select BY NAME: pyarrow group_by column order differs across
        # versions (keys-first in 16.x, aggregates-first before)
        return pa.table({
            id_col: counted.column(id_col),
            "word": counted.column("word"),
            "tf": counted.column("count_all").cast(pa.int64()),
        })

    return fn


def tfidf_topk(ds, *, n_docs: int, text_col: str = "text",
               id_col: str = "doc_id", k: int = 3):
    """Top-`k` terms per document by ``(tf * n_docs) / df``.

    `n_docs` is passed in (a prior `ds.count()` or known table size) so the
    pipeline stays a single lazy graph. Returns a Dataset with columns
    ``(doc_id, word, tf, df, score)``.
    """
    from webextract.functions.joins import attach_group_size, partition_apply

    pairs = ds.map_batches(_explode_tf(text_col, id_col),
                           batch_format="pyarrow")

    pair_schema = pa.schema([(id_col, pa.int64()), ("word", pa.string()),
                             ("tf", pa.int64())])
    # df = group size over word ((doc, word) rows are distinct per doc):
    # ONE exchange, no per-word Python (round-5 — the former
    # groupby(word).map_groups paid one call per vocabulary entry)
    with_df = attach_group_size(pairs, on="word", schema=pair_schema,
                                out="df")

    df_schema = pair_schema.append(pa.field("df", pa.int64()))
    out_schema = df_schema.append(pa.field("score", pa.float64()))

    def topk_part(part: pa.Table) -> pa.Table:
        tf = part.column("tf").to_numpy(zero_copy_only=False)
        dfreq = part.column("df").to_numpy(zero_copy_only=False)
        # exact integer product cast to double, then ONE IEEE division —
        # bit-identical to SQL's (tf * n)::DOUBLE / df
        score = (tf * n_docs).astype(np.float64) / dfreq
        part = part.append_column("score",
                                  pa.array(score, type=pa.float64()))
        idx = pc.sort_indices(part, sort_keys=[
            (id_col, "ascending"), ("score", "descending"),
            ("word", "ascending")])
        t = part.take(idx)
        d = t.column(id_col).to_numpy(zero_copy_only=False)
        starts = np.r_[0, np.nonzero(d[1:] != d[:-1])[0] + 1]
        counts = np.r_[starts[1:], d.size] - starts
        rank = np.arange(d.size, dtype=np.int64) - np.repeat(starts, counts)
        return t.filter(pa.array(rank < k)).cast(out_schema)

    return partition_apply(with_df, topk_part, on=id_col,
                           schema=df_schema, out_schema=out_schema)
