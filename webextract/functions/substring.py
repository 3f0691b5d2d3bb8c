"""Exact duplicated-substring removal (ExactSubstr, word-k-gram variant).

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better", §4 ExactSubstr) removes every substring longer than a threshold
that occurs more than once ANYWHERE in the corpus — all copies go, unlike
the keep-first document/paragraph dedups. Their implementation is a
corpus-wide suffix array; this module is the bounded word-level variant
that a k-gram seed makes distributable with keys-only exchanges:

    a word position is removed iff it is covered by at least one word
    k-gram whose total occurrence count across the corpus (including
    repeats inside one document) is >= 2.

Every duplicated span of length >= k words is removed in full (each of
its positions sits inside at least one duplicated k-gram), and nothing
shorter than k words is ever touched — the same guarantee shape as the
suffix-array threshold, quantized to word k-grams. The reference engine
has no such op (it is image-OCR); this extends the LLM-prep dedup family
(exact / URL / MinHash / paragraph / decontam / SemDeDup / ssjoin) with
the substring-granularity member.

Scale shape:

1. **Decide** keys-only: explode each doc into 64-bit k-gram
   fingerprints inside ``map_batches`` (vectorized `_flat_ngram_strings`
   + one polars hash of the gram strings), fold to per-batch
   ``(gfp, n)`` partial counts before the exchange, then ONE keys-only
   ``groupby(gfp).sum(n)`` and a ``>= 2`` filter. The only all-to-all
   moves two int64 columns — never gram text, never payload.
2. **Publish** the duplicated-gram fingerprint set through
   ``publish_winners(mode="hash")`` — at or below ``_SMALL_WINNERS_MAX``
   keys it ships as ONE broadcast sorted array (`ArrayIndex`, plain
   tasks on warm workers); above, SplitMix64-hash bucket stores
   (`BucketIndex`). Hash mode is mandatory here: gram fingerprints are
   uniform over int64, so range buckets have no locality to exploit.
   The bucket path requires the duplicated-gram set to fit a consumer
   heap in aggregate (documented `BucketIndex` bound); the unbounded
   alternative — routing (gfp, doc, pos) coverage through a second
   keyed exchange and reassembling under a doc_id partition — trades
   one full payload shuffle for that bound, which the suffix-array
   literature pays too. At web scale, raise ``k``: the duplicated-gram
   count drops sharply with span length (measured here: k=3 covers 93%
   of corpus words, k=5 10%).
3. **Filter + reassemble in ONE fused map stage**: each payload batch
   re-derives its gram fingerprints, probes the index, expands the
   surviving seed positions to a word coverage mask with a
   difference-array prefix sum (one ``np.add.at`` pair per batch — no
   per-span Python), and rebuilds every document with a single
   ``pc.binary_join`` over per-doc offsets. Document payload never
   leaves the task that read it — zero payload shuffles at any scale
   (the same fused shape as ``paragraphs.LineDedupAssembler``).

Determinism: removal is a pure corpus-global predicate (count >= 2), so
the output is independent of partitioning and visit order — no
first-occurrence tiebreak exists to get wrong.

NULL/empty text: a NULL text has ZERO words (kept text ``""``,
``n_kept = 0``); an empty string is ONE empty word (kept unless
covered) — both mirror the SQL oracle's ``string_split`` semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webextract.functions.ngrams import _flat_ngram_strings
from webextract.functions.paragraphs import _hash_lines

OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("text_kept", pa.string()),
    ("n_kept", pa.int64()),
    ("n_removed", pa.int64()),
])


def _gram_fps(texts, k: int):
    """(doc_index, within-doc position, fingerprint) arrays for every
    word k-gram of a string column — vectorized: `_flat_ngram_strings`
    emits grams in per-doc positional order, so positions are run-local
    ranks. NULL texts emit no grams: fill_null("") has < k words for
    k >= 2, and the k == 1 phantom gram of the ``[""]`` placeholder is
    dropped here by the validity mask."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    doc_idx, grams = _flat_ngram_strings(texts, k)
    if k == 1 and doc_idx.size:
        valid = pc.is_valid(texts).to_numpy(zero_copy_only=False)
        keep = valid[doc_idx]
        if not keep.all():
            doc_idx = doc_idx[keep]
            grams = grams.filter(pa.array(keep)) \
                if not isinstance(grams, pa.ChunkedArray) \
                else grams.combine_chunks().filter(pa.array(keep))
    if doc_idx.size == 0:
        return doc_idx, doc_idx, np.empty(0, dtype=np.int64)
    starts = np.r_[0, np.nonzero(doc_idx[1:] != doc_idx[:-1])[0] + 1]
    runlen = np.r_[starts[1:], doc_idx.size] - starts
    pos = np.arange(doc_idx.size, dtype=np.int64) - np.repeat(starts, runlen)
    if isinstance(grams, pa.ChunkedArray):
        grams = grams.combine_chunks()
    return doc_idx, pos, _hash_lines(grams)


def _word_layout(batch: pa.Table, *, id_col: str, text_col: str):
    """Per-doc word arrays with SQL NULL semantics: NULL text -> zero
    words. Returns (ids, word_counts, flat_words, flat_offsets) where
    ``flat_words`` concatenates only the VALID docs' words and
    ``flat_offsets[i]`` is doc i's first flat index."""
    ids = np.asarray(batch.column(id_col).cast(pa.int64()).combine_chunks())
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    valid = pc.is_valid(texts).to_numpy(zero_copy_only=False)
    lists = pc.split_pattern(pc.fill_null(texts, ""), " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    wc = lists.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lists.flatten()
    if not valid.all():
        # drop NULL docs' placeholder [""] words from the flat layout
        keep = np.repeat(valid, wc)
        flat = flat.filter(pa.array(keep))
        wc = np.where(valid, wc, 0)
    offs = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(wc, out=offs[1:])
    return ids, wc, flat, offs


def decide_partial_factory(k: int, *, text_col: str = "text"):
    """Map-side combiner for the decision branch: one ``(gfp, n)`` row
    per UNIQUE gram fingerprint in the batch (counts are associative
    under the downstream sum — within-doc repeats count)."""
    schema = pa.schema([("gfp", pa.int64()), ("n", pa.int64())])

    def decide_partial(b: pa.Table) -> pa.Table:
        _, _, gfp = _gram_fps(b.column(text_col), k)
        if gfp.size == 0:
            return schema.empty_table()
        u, c = np.unique(gfp, return_counts=True)
        return pa.table({"gfp": pa.array(u, type=pa.int64()),
                         "n": pa.array(c.astype(np.int64))}, schema=schema)

    return decide_partial


class SubstringDedupAssembler:
    """Fused probe+mask+reassemble stage: batch of (doc_id, text) in,
    ``OUT_SCHEMA`` rows out. Stateful UDF — the index copy (with its
    per-actor bucket cache) is constructed once per actor; under the
    broadcast `ArrayIndex` it runs task-mode on warm workers."""

    def __init__(self, index, k: int, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.index = index
        self.k = k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.k
        ids, wc, flat, offs = _word_layout(
            batch, id_col=self.id_col, text_col=self.text_col)
        total = int(offs[-1])
        doc_idx, pos, gfp = _gram_fps(batch.column(self.text_col), k)
        dup = self.index.allowed(gfp)
        covered = np.zeros(total, dtype=bool)
        if dup.any():
            # difference-array span union: +1 at each duplicated seed's
            # start, -1 past its end (pos + k <= wc by construction, so
            # spans never cross document boundaries)
            d_sel, p_sel = doc_idx[dup], pos[dup]
            diff = np.zeros(total + 1, dtype=np.int64)
            starts = offs[d_sel] + p_sel
            np.add.at(diff, starts, 1)
            np.add.at(diff, starts + k, -1)
            covered = np.cumsum(diff[:-1]) > 0
        kept_mask = ~covered
        kept_words = flat.filter(pa.array(kept_mask)).cast(pa.large_string())
        # per-doc kept counts -> offsets into the surviving flat words
        kept_per_doc = np.add.reduceat(
            np.r_[kept_mask, False].astype(np.int64), offs[:-1]
        ) if len(ids) else np.empty(0, dtype=np.int64)
        kept_per_doc = np.where(wc == 0, 0, kept_per_doc)
        kofs = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(kept_per_doc, out=kofs[1:])
        la = pa.LargeListArray.from_arrays(
            pa.array(kofs, type=pa.int64()), kept_words)
        texts = pc.binary_join(la, pa.scalar(" ", type=pa.large_string()))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text_kept": texts.cast(pa.string()),
            "n_kept": pa.array(kept_per_doc, type=pa.int64()),
            "n_removed": pa.array(wc - kept_per_doc, type=pa.int64()),
        }, schema=OUT_SCHEMA)


def substring_dedup(docs_fn, *, k: int = 5, concurrency=None,
                    text_col: str = "text"):
    """Corpus-global duplicated-substring removal -> ``OUT_SCHEMA``
    Dataset (every input doc appears once; fully-duplicated docs keep an
    empty ``text_kept``, unlike paragraph_dedup's GROUP-BY-drop, because
    downstream span accounting wants the zero rows).

    ``docs_fn()`` must return a fresh (doc_id, text) Dataset per call —
    the decision branch and the payload branch each consume one lazy
    read (same twice-read discipline as ``paragraph_dedup``)."""
    from webextract.functions.dedup import ArrayIndex, publish_winners

    dup = (
        docs_fn()
        .map_batches(decide_partial_factory(k, text_col=text_col),
                     batch_format="pyarrow")
        .groupby("gfp").sum("n")
        .map_batches(
            lambda t: t.filter(
                pc.greater_equal(t.column("sum(n)"), 2)
            ).select(["gfp"]),
            batch_format="pyarrow")
    )
    index = publish_winners(dup, "gfp", mode="hash")
    if isinstance(index, ArrayIndex):
        return docs_fn().map_batches(
            SubstringDedupAssembler(index, k, text_col=text_col),
            batch_format="pyarrow")
    return docs_fn().map_batches(
        SubstringDedupAssembler,
        fn_constructor_kwargs={"index": index, "k": k,
                               "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency or (1, 8),
    )
