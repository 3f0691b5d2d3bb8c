"""Corpus-global paragraph/line deduplication (C4-style).

C4 ("Exploring the Limits of Transfer Learning", Raffel et al. 2020, §2.2)
removes REPEATED SPANS across the whole corpus, not just whole-document
duplicates: any line occurring more than once anywhere is kept only at its
first occurrence and removed everywhere else, then documents are
reassembled from their surviving lines. The reference engine has no such
op (it is image-OCR); this is part of the LLM-prep surface the north rule
adds on top.

Scale shape (the part that matters at 100 TB):

1. **Explode** each doc into lines inside ``map_batches`` (row explosion
   in place, no shuffle). Each line gets a globally-unique, *monotone*
   order key ``okey = doc_id << 20 | line_idx`` (raises if a doc exceeds
   2^20 lines; doc_id < 2^43 — comfortable at a trillion docs). The
   explode is fully vectorized: Arrow ``split_pattern`` + ``flatten``
   for the rows, and the 64-bit line fingerprint is computed once per
   UNIQUE line in the batch (``dictionary_encode`` then hash the
   dictionary — repeated lines are the workload's whole premise).
2. **Decide** keys-only: project ``(lfp, okey)`` where ``lfp`` is a 64-bit
   content hash of the line, and ``groupby(lfp).min(okey)``. The only
   all-to-all moves two int64 columns — never line text.
3. **Filter + reassemble in ONE fused map stage** (round-4 rewrite):
   each payload batch re-derives its own line okeys, probes the
   published winner buckets (:class:`webextract.functions.dedup.
   BucketIndex` — object-store buckets, cached per actor), masks dead
   lines, and rebuilds every document with a single ``pc.binary_join``
   over the per-doc offsets. The line payload therefore NEVER leaves
   the task that read the document — zero payload shuffles at any
   scale (the round-3 version shuffled surviving lines through a
   groupby/repartition for reassembly; measured 32 s of exchange
   overhead at sf0.1 that this removes). Winner okeys inherit doc_id's
   monotonicity within input partitions, so each task touches O(1)
   buckets. Documents whose every line was deduplicated away disappear
   (same as the SQL oracle's GROUP BY).

Determinism: first occurrence = smallest (doc_id, line_idx) in
lexicographic order, which the okey packing preserves exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webextract.functions.dedup import _hash64

_IDX_BITS = 20
_MAX_LINES = 1 << _IDX_BITS
_SIGN = 1 << 63

try:  # vectorized 64-bit string hash (equality-only, internal to one run)
    import polars as _pl
except ImportError:  # pragma: no cover - polars is baked into the env
    _pl = None


def _hash_lines(arr: pa.Array) -> np.ndarray:
    """int64 content hash per string — vectorized via polars (xxh-based,
    deterministic for a fixed seed across processes of one run, which is
    the only contract the two explode passes need); blake2b fallback
    keeps the function importable without polars."""
    if _pl is not None:
        u = _pl.from_arrow(arr).hash(seed=0).to_numpy()
        return u.view(np.int64)
    return np.fromiter(
        (_hash64(u.encode("utf-8")) - _SIGN for u in arr.to_pylist()),
        dtype=np.int64, count=len(arr))


def explode_lines(batch: pa.Table, *, id_col: str = "doc_id",
                  text_col: str = "text",
                  with_text: bool = True) -> pa.Table:
    """One row per line of each document (vectorized, no per-row Python).

    Emits ``(okey, lfp)`` and, when ``with_text``, ``(doc_id, idx, line)``
    as well — the decision branch runs with ``with_text=False`` so the
    keys-only groupby never sees a payload column.
    """
    ids = np.asarray(batch.column(id_col).cast(pa.int64()).combine_chunks())
    lists = pc.split_pattern(
        pc.fill_null(batch.column(text_col).combine_chunks(), ""), "\n")
    nlines = lists.value_lengths().to_numpy(zero_copy_only=False)
    bad = np.nonzero(nlines >= _MAX_LINES)[0]
    if bad.size:
        raise ValueError(
            f"doc {ids[bad[0]]} has {nlines[bad[0]]} lines >= "
            f"2^{_IDX_BITS}; raise _IDX_BITS or pre-chunk the document")
    doc_rep = np.repeat(ids, nlines)
    total = int(nlines.sum())
    starts = np.zeros(len(ids), dtype=np.int64)
    np.cumsum(nlines[:-1], out=starts[1:])
    idx = np.arange(total, dtype=np.int64) - np.repeat(starts, nlines)
    okeys = (doc_rep << _IDX_BITS) | idx
    flat = lists.flatten()
    # hash each UNIQUE line once; signed-int64 wrap keeps Arrow happy —
    # equality is all we need
    de = pc.dictionary_encode(flat)
    uniq = _hash_lines(de.dictionary)
    lfps = uniq[de.indices.to_numpy(zero_copy_only=False)]
    cols = {"okey": pa.array(okeys, type=pa.int64()),
            "lfp": pa.array(lfps, type=pa.int64())}
    if with_text:
        cols.update({
            "doc_id": pa.array(doc_rep, type=pa.int64()),
            "idx": pa.array(idx, type=pa.int64()),
            "line": flat,
        })
    return pa.table(cols)


class LineDedupAssembler:
    """Fused filter+reassemble stage: batch of (doc_id, text) in,
    (doc_id, text-with-dead-lines-removed) out. Stateful actor UDF —
    the :class:`BucketIndex` copy (with its per-actor bucket cache) is
    constructed once per actor."""

    def __init__(self, index, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.index = index
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ex = explode_lines(batch, id_col=self.id_col,
                           text_col=self.text_col, with_text=True)
        okeys = np.asarray(ex.column("okey").combine_chunks())
        mask = self.index.allowed(okeys)
        d = np.asarray(ex.column("doc_id").combine_chunks())[mask]
        lines = (ex.column("line").combine_chunks()
                 .filter(pa.array(mask)).cast(pa.large_string()))
        if d.size == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "text": pa.array([], type=pa.string())})
        # explode order is (doc, idx)-sorted, so surviving lines stay
        # grouped per doc and in order: one offsets pass + binary_join
        starts = np.nonzero(np.r_[True, d[1:] != d[:-1]])[0]
        offsets = np.concatenate([starts, [d.size]]).astype(np.int64)
        la = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), lines)
        texts = pc.binary_join(la, pa.scalar("\n",
                                             type=pa.large_string()))
        return pa.table({
            "doc_id": pa.array(d[starts], type=pa.int64()),
            "text": texts.cast(pa.string()),
        })


def paragraph_dedup(docs_fn, *, tmp_dir: str | None = None,
                    concurrency=None):
    """Corpus-global line dedup -> reassembled (doc_id, text) dataset.

    ``docs_fn()`` must return a fresh (doc_id, text) Dataset per call —
    the decision branch and the payload branch each consume one lazy read
    (same twice-read discipline as ``q_dedup_docs_rows``; re-reading a
    pruned parquet column is cheaper than materializing the explode).
    """
    from webextract.functions.dedup import (
        _SMALL_WINNERS_MAX, ArrayIndex, publish_winners)

    def decide_partial(b: pa.Table) -> pa.Table:
        """Explode + per-batch combiner: one (lfp, min okey) row per
        UNIQUE line in the batch. Repeated lines are the C4 workload's
        premise, so folding before the exchange cuts the shuffled rows
        to the batch's distinct-line count (min is associative — the
        global groupby min over partials equals the min over all rows).
        """
        ex = explode_lines(b, id_col="doc_id", text_col="text",
                           with_text=False)
        lfps = np.asarray(ex.column("lfp").combine_chunks())
        okeys = np.asarray(ex.column("okey").combine_chunks())
        order = np.lexsort((okeys, lfps))
        lf, ok = lfps[order], okeys[order]
        first = np.r_[True, lf[1:] != lf[:-1]]
        return pa.table({"lfp": pa.array(lf[first], type=pa.int64()),
                         "okey": pa.array(ok[first], type=pa.int64())})

    decision = docs_fn().map_batches(
        decide_partial, batch_format="pyarrow").materialize()
    if decision.count() <= _SMALL_WINNERS_MAX:
        # Small-corpus fast path: the per-batch combiner already folded
        # each batch to its distinct lines, so when the combined partials
        # fit one broadcast block (<= 64 MB of two int64 cols) the global
        # min-per-lfp is a single vectorized driver fold — no groupby
        # exchange, no bucket stores, and the assembler runs task-based
        # on warm workers. Above the bound: the keys-only groupby +
        # sharded bucket publish, unchanged.
        import ray

        parts = [t for t in ray.get(decision.to_arrow_refs()) if t.num_rows]
        if parts:
            t = pa.concat_tables(parts)
            lf = np.asarray(t.column("lfp").combine_chunks())
            ok = np.asarray(t.column("okey").combine_chunks())
            order = np.lexsort((ok, lf))
            lf, ok = lf[order], ok[order]
            arr = np.unique(ok[np.r_[True, lf[1:] != lf[:-1]]])
        else:
            arr = np.empty(0, dtype=np.int64)
        index = ArrayIndex(ray.put(arr), int(arr.size))
    else:
        winners = (decision.groupby("lfp").min("okey")
                   .rename_columns({"min(okey)": "okey"})
                   .select_columns(["okey"]))
        index = publish_winners(
            winners, "okey", tmp_dir=tmp_dir,
            # okey = doc_id << 20: a 2^28-wide bucket spans ~256 doc_ids,
            # keeping side buckets O(100) not O(10k) at test scale
            bucket_width=1 << 28,
        )
    if isinstance(index, ArrayIndex):
        return docs_fn().map_batches(
            LineDedupAssembler(index), batch_format="pyarrow")
    return docs_fn().map_batches(
        LineDedupAssembler,
        fn_constructor_kwargs={"index": index},
        batch_format="pyarrow",
        concurrency=concurrency or (1, 8),
    )
