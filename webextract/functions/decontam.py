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

Tokenization is the engine-wide whitespace split; hashes are the same
blake2b-64 used by the dedup family, shifted into signed-int64 space.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from webextract.functions.dedup import _hash64

_SHIFT = 1 << 63


def ngram_hashes(text: str, n: int = 8) -> List[int]:
    """Signed-int64 hashes of the word n-grams of `text` (empty if the
    doc has fewer than n words)."""
    words = (text or "").split()
    return [
        _hash64(" ".join(words[i:i + n]).encode("utf-8")) - _SHIFT
        for i in range(len(words) - n + 1)
    ]


def gram_hash_batch(batch: pa.Table, *, text_col: str = "text",
                    n: int = 8) -> pa.Table:
    """Explode each doc into its distinct n-gram hashes (decision column
    only — no payload)."""
    out: set = set()
    for t in batch.column(text_col).to_pylist():
        out.update(ngram_hashes(t, n))
    return pa.table({"gh": pa.array(sorted(out), type=pa.int64())})


def collect_eval_grams(eval_ds, *, n: int = 8) -> np.ndarray:
    """Distinct n-gram hashes of the eval split as a sorted int64 array.

    Per-block pre-dedup happens inside ``gram_hash_batch``; the driver
    folds block outputs into one set. Bounded by eval-set vocabulary —
    see the module docstring for why that is a constant, not a scale
    term.
    """
    acc: set = set()
    for b in eval_ds.map_batches(
            lambda t: gram_hash_batch(t, n=n),
            batch_format="pyarrow").iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        acc.update(b.column("gh").to_pylist())
    return np.sort(np.fromiter(acc, dtype=np.int64, count=len(acc)))


class ContaminationFlagger:
    """Actor-pool stage: flags each training doc against the broadcast
    eval n-gram array (loaded once per actor in __init__)."""

    def __init__(self, grams_ref, *, n: int = 8, text_col: str = "text"):
        import ray

        self.grams = ray.get(grams_ref)  # zero-copy view from plasma
        self.n = n
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flags = []
        g = self.grams
        for t in batch.column(self.text_col).to_pylist():
            hs = np.asarray(ngram_hashes(t, self.n), dtype=np.int64)
            if hs.size == 0 or g.size == 0:
                flags.append(False)
                continue
            pos = np.searchsorted(g, hs)
            pos[pos == g.size] = 0  # any in-range index; mismatch anyway
            flags.append(bool(np.any(g[pos] == hs)))
        return batch.append_column(
            "contaminated", pa.array(flags, type=pa.bool_()))


def decontaminate(train_ds, eval_ds, *, n: int = 8,
                  concurrency: int = 4) -> "object":
    """Append a `contaminated` flag to every training doc (keep/drop is
    the caller's policy — flagging preserves auditability)."""
    import ray

    grams_ref = ray.put(collect_eval_grams(eval_ds, n=n))
    return train_ds.map_batches(
        ContaminationFlagger,
        fn_constructor_kwargs={"grams_ref": grams_ref, "n": n},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
