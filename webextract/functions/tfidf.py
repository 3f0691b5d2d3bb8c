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
    def fn(batch: pa.Table) -> pa.Table:
        ids: List[int] = []
        words: List[str] = []
        tfs: List[int] = []
        id_vals = batch.column(id_col).to_pylist()
        for did, text in zip(id_vals, batch.column(text_col).to_pylist()):
            counts: dict = {}
            for w in (text or "").split(" "):
                counts[w] = counts.get(w, 0) + 1
            ids.extend([did] * len(counts))
            words.extend(counts.keys())
            tfs.extend(counts.values())
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "word": pa.array(words, type=pa.string()),
            "tf": pa.array(tfs, type=pa.int64()),
        })

    return fn


def tfidf_topk(ds, *, n_docs: int, text_col: str = "text",
               id_col: str = "doc_id", k: int = 3):
    """Top-`k` terms per document by ``(tf * n_docs) / df``.

    `n_docs` is passed in (a prior `ds.count()` or known table size) so the
    pipeline stays a single lazy graph. Returns a Dataset with columns
    ``(doc_id, word, tf, df, score)``.
    """
    pairs = ds.map_batches(_explode_tf(text_col, id_col),
                           batch_format="pyarrow")

    df_schema = pa.schema([(id_col, pa.int64()), ("word", pa.string()),
                           ("tf", pa.int64()), ("df", pa.int64())])

    def attach_df(group: pa.Table) -> pa.Table:
        df = group.num_rows  # one row per containing doc
        return pa.table({
            id_col: group.column(id_col),
            "word": group.column("word"),
            "tf": group.column("tf"),
            "df": pa.array([df] * group.num_rows, type=pa.int64()),
        }, schema=df_schema)

    with_df = pairs.groupby("word").map_groups(attach_df,
                                               batch_format="pyarrow")

    out_schema = df_schema.append(pa.field("score", pa.float64()))

    def topk(group: pa.Table) -> pa.Table:
        tf = group.column("tf").to_numpy(zero_copy_only=False)
        dfreq = group.column("df").to_numpy(zero_copy_only=False)
        # exact integer product cast to double, then ONE IEEE division —
        # bit-identical to SQL's (tf * n)::DOUBLE / df
        score = (tf * n_docs).astype(np.float64) / dfreq
        group = group.append_column("score", pa.array(score,
                                                      type=pa.float64()))
        order = pc.sort_indices(
            group, sort_keys=[("score", "descending"), ("word", "ascending")])
        return group.take(order[:k]).cast(out_schema)

    return with_df.groupby(id_col).map_groups(topk, batch_format="pyarrow")
