"""Benchmark decontamination: flag training docs sharing word n-grams
with an evaluation split.

Standard LLM-prep hygiene (GPT-3 paper §C "Measuring and Preventing
Memorization Of Benchmarks"; The Pile; Dolma): a training document is
contaminated if any of its word n-grams (n=8 here, GPT-3 used 13-gram
spans on benchmarks) also occurs in the held-out evaluation set. The
reference engine has no analog (image-OCR); part of the added LLM-prep
surface.

Scale shape: the EVAL side of this join is a benchmark suite — thousands
of documents, a constant of the problem that does not grow with the
100 TB training corpus. So the right shape is a broadcast semi-join:

1. eval docs -> distinct n-gram hashes, folded into one sorted int64
   array on the driver (bounded by eval-set size BY DEFINITION — this is
   the documented exception to the no-driver-state rule, same class as
   the IVF centroid sample);
2. ``ray.put`` the array ONCE; every filter task reads it zero-copy from
   the object store (never re-shipped per batch);
3. training docs stream through a stateless ``map_batches`` doing a
   vectorized ``np.searchsorted`` membership test per doc.

No shuffle anywhere; the training corpus is read once.

Tokenization is the engine-wide whitespace split. Gram hashing shares
the dedup family's flat vectorized layout: the whole batch's words in
ONE array, per-position coefficient accumulation over a sliding window,
SplitMix64 finish — full 64-bit (no 31-bit fold: membership must not
produce false contamination flags), zero per-gram Python.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webextract.functions.dedup import _GRAM_COEF, _mix_np, _word_hashes


def _gram_hash_flat(texts, n: int = 8):
    """(values, doc_ids) of the full-window word n-gram hashes of a
    string column — int64 values, one row per gram, vectorized end to
    end. Docs with fewer than ``n`` words contribute nothing (the
    decontamination contract: too short to match a benchmark span)."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), type=pa.string())
    D = len(texts)
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    if D == 0:
        return empty
    lists = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat_all = lists.flatten()
    n_all = lists.value_lengths().to_numpy(zero_copy_only=False)
    doc_all = np.repeat(np.arange(D, dtype=np.int64), n_all)
    keep = pc.not_equal(flat_all, "")
    if pc.all(keep).as_py():
        flat_arr, doc_of_word = flat_all, doc_all
    else:
        flat_arr = flat_all.filter(keep)
        doc_of_word = doc_all[np.asarray(keep)]
    N = len(flat_arr)
    if N < n:
        return empty
    de = pc.dictionary_encode(flat_arr)
    uniq_h = _word_hashes(de.dictionary.to_pylist())
    wh = uniq_h[de.indices.to_numpy(zero_copy_only=False)]
    acc = _GRAM_COEF[0] * wh[0 : N - n + 1]
    for j in range(1, n):
        acc = acc + _GRAM_COEF[j] * wh[j : N - n + 1 + j]
    valid = doc_of_word[: N - n + 1] == doc_of_word[n - 1 :]
    return (_mix_np(acc)[valid].view(np.int64),
            doc_of_word[: N - n + 1][valid])


def ngram_hashes(text: str, n: int = 8) -> List[int]:
    """Signed-int64 hashes of the word n-grams of one doc (empty if the
    doc has fewer than n words) — single-row view of the flat batch
    hasher, so eval and train sides can never diverge."""
    vals, _ = _gram_hash_flat([text or ""], n)
    return vals.tolist()


def gram_hash_batch(batch: pa.Table, *, text_col: str = "text",
                    n: int = 8) -> pa.Table:
    """Explode each doc into its distinct n-gram hashes (decision column
    only — no payload)."""
    vals, _ = _gram_hash_flat(batch.column(text_col), n)
    return pa.table({"gh": pa.array(np.unique(vals), type=pa.int64())})


def collect_eval_grams(eval_ds, *, n: int = 8) -> np.ndarray:
    """Distinct n-gram hashes of the eval split as a sorted int64 array.

    Per-block pre-dedup happens inside ``gram_hash_batch``; the driver
    folds block outputs into one array. Bounded by eval-set vocabulary —
    see the module docstring for why that is a constant, not a scale
    term.
    """
    parts = [
        np.asarray(b.column("gh").combine_chunks())
        for b in eval_ds.map_batches(
            lambda t: gram_hash_batch(t, n=n),
            batch_format="pyarrow").iter_batches(
            batch_size=65536, batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


class ContaminationFlagger:
    """Batch UDF: flags each training doc against the broadcast eval
    n-gram array. The ref resolves lazily (zero-copy local plasma read),
    so the stage runs as plain tasks on warm workers; the per-doc "any
    gram in eval" fold is one bincount over the hit mask — no Python row
    loop."""

    def __init__(self, grams_ref, *, n: int = 8, text_col: str = "text"):
        self.grams_ref = grams_ref
        self.n = n
        self.text_col = text_col
        self._grams = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._grams is None:
            import ray

            self._grams = ray.get(self.grams_ref)
        g = self._grams
        D = batch.num_rows
        vals, docs = _gram_hash_flat(batch.column(self.text_col), self.n)
        if vals.size and g.size:
            pos = np.searchsorted(g, vals)
            pos[pos == g.size] = 0  # any in-range index; mismatch anyway
            hit = g[pos] == vals
            flags = np.bincount(docs[hit], minlength=D) > 0
        else:
            flags = np.zeros(D, dtype=bool)
        return batch.append_column(
            "contaminated", pa.array(flags, type=pa.bool_()))


def decontaminate(train_ds, eval_ds, *, n: int = 8,
                  concurrency: int = 4) -> "object":
    """Append a `contaminated` flag to every training doc (keep/drop is
    the caller's policy — flagging preserves auditability)."""
    import ray

    grams_ref = ray.put(collect_eval_grams(eval_ds, n=n))
    return train_ds.map_batches(
        ContaminationFlagger(grams_ref, n=n),
        batch_format="pyarrow",
    )
