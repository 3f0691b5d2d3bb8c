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
   2^20 lines; doc_id < 2^43 — comfortable at a trillion docs).
2. **Decide** keys-only: project ``(lfp, okey)`` where ``lfp`` is a 64-bit
   content hash of the line, and ``groupby(lfp).min(okey)``. The only
   all-to-all moves two int64 columns — never line text.
3. **Retrieve** survivors with :func:`webextract.functions.dedup.
   winner_filter` on ``okey``: winner okeys inherit doc_id's monotonicity
   within input partitions, so the map-side semi filter touches O(1)
   bucket files per task and the line payload never crosses a shuffle.
4. **Reassemble** docs with ``groupby(doc_id).map_groups`` (sort by idx,
   join with \\n). This shuffle moves only the SURVIVING lines — it is
   the output materialization, not overhead. Documents whose every line
   was deduplicated away disappear (same as the SQL oracle's GROUP BY).

Determinism: first occurrence = smallest (doc_id, line_idx) in
lexicographic order, which the okey packing preserves exactly.
"""

from __future__ import annotations

from typing import List

import pyarrow as pa

from webextract.functions.dedup import _hash64

_IDX_BITS = 20
_MAX_LINES = 1 << _IDX_BITS


def explode_lines(batch: pa.Table, *, id_col: str = "doc_id",
                  text_col: str = "text",
                  with_text: bool = True) -> pa.Table:
    """One row per line of each document.

    Emits ``(okey, lfp)`` and, when ``with_text``, ``(doc_id, idx, line)``
    as well — the decision branch runs with ``with_text=False`` so the
    keys-only groupby never sees a payload column.
    """
    okeys: List[int] = []
    lfps: List[int] = []
    doc_ids: List[int] = []
    idxs: List[int] = []
    lines: List[str] = []
    for doc_id, text in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
        ls = (text or "").split("\n")
        if len(ls) >= _MAX_LINES:
            raise ValueError(
                f"doc {doc_id} has {len(ls)} lines >= 2^{_IDX_BITS}; "
                "raise _IDX_BITS or pre-chunk the document")
        base = doc_id << _IDX_BITS
        for i, ln in enumerate(ls):
            okeys.append(base | i)
            # signed-int64 wrap keeps Arrow happy; equality is all we need
            lfps.append(_hash64(ln.encode("utf-8")) - (1 << 63))
            if with_text:
                doc_ids.append(doc_id)
                idxs.append(i)
                lines.append(ln)
    cols = {"okey": pa.array(okeys, type=pa.int64()),
            "lfp": pa.array(lfps, type=pa.int64())}
    if with_text:
        cols.update({
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "idx": pa.array(idxs, type=pa.int64()),
            "line": pa.array(lines, type=pa.string()),
        })
    return pa.table(cols)


def _reassemble(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "text": pa.array([], type=pa.string())})
    g = group.sort_by("idx")
    return pa.table({
        "doc_id": pa.array([g.column("doc_id")[0].as_py()],
                           type=pa.int64()),
        "text": pa.array(["\n".join(g.column("line").to_pylist())],
                         type=pa.string()),
    })


def paragraph_dedup(docs_fn, *, tmp_dir: str | None = None,
                    concurrency=None):
    """Corpus-global line dedup -> reassembled (doc_id, text) dataset.

    ``docs_fn()`` must return a fresh (doc_id, text) Dataset per call —
    the decision branch and the payload branch each consume one lazy read
    (same twice-read discipline as ``q_dedup_docs_rows``; re-reading a
    pruned parquet column is cheaper than materializing the explode).
    """
    from webextract.functions.dedup import winner_filter

    decision = docs_fn().map_batches(
        lambda b: explode_lines(b, with_text=False),
        batch_format="pyarrow")
    winners = (decision.groupby("lfp").min("okey")
               .rename_columns({"min(okey)": "okey"})
               .select_columns(["okey"]))
    exploded = docs_fn().map_batches(explode_lines, batch_format="pyarrow")
    survivors = winner_filter(
        exploded, winners, "okey", tmp_dir=tmp_dir,
        # okey = doc_id << 20: a 2^28-wide bucket spans ~256 doc_ids,
        # keeping side files O(100) not O(10k) at test scale
        bucket_width=1 << 28, concurrency=concurrency,
    )
    return (survivors.select_columns(["doc_id", "idx", "line"])
            .groupby("doc_id")
            .map_groups(_reassemble, batch_format="pyarrow"))
