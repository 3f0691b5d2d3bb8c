"""Exact all-pairs set-similarity join (prefix-filtered, PPJoin-lite).

The LSH chain (`functions/dedup.neardup_pairs`) generates near-dup
candidates PROBABILISTICALLY — recall < 1 by construction. This module is
the EXACT counterpart: every document pair whose word-n-gram-set Jaccard
meets the threshold is found, with no hash-family recall term, using the
prefix-filtering principle (Bayardo et al., WWW'07 "Scaling Up All Pairs
Similarity Search"; Xiao et al., WWW'08 PPJoin):

  order every document's distinct shingle set by ONE global total order;
  if J(a, b) >= t, then the first ``|s| - ceil(t*|s|) + 1`` shingles of a
  and b (their "prefixes") must share at least one element.

So candidates = pairs co-occurring in at least one prefix-shingle group —
an EXACT superset of the answer — then a join-back-to-text pass verifies
integer intersection/union counts. All threshold comparisons are exact
integer cross-multiplications of the threshold's rational form (never
float-rounded: ``ceil(0.8 * 35)`` in floats is 29, not 28 — a wrong
prefix length silently LOSES pairs).

Scale shape: prefix emission is a per-row map (|prefix| ~ (1-t)|s| rows
per doc, keys-only); candidate generation is a per-shingle-group pair
scan bounded by shingle frequency (a stop-shingle hotter than
``max_group`` RAISES — no silent caps; production would df-order the
canonical order to push frequent shingles OUT of prefixes, which needs a
broadcast df dictionary — documented tradeoff, lexicographic order keeps
this module state-free); verification is the neardup chain's two hash
joins, shuffling (pair, text) rows only for surviving candidates.
"""

from __future__ import annotations

from fractions import Fraction
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _shingles(text: str, n: int) -> List[str]:
    """Distinct word n-grams, mirroring the SQL oracle's gram CTE
    (``words[i+1 : i+n]`` over ``range(0, greatest(len-n+1, 1))``)."""
    words = (text or "").split(" ")
    return sorted({
        " ".join(words[i:i + n])
        for i in range(max(len(words) - (n - 1), 1))
    })


def _ceil_mul(frac: Fraction, n: int) -> int:
    """Exact ceil(frac * n) in integer arithmetic."""
    return -((-frac.numerator * n) // frac.denominator)


def ssjoin_pairs(docs, *, threshold: float = 0.8, n: int = 3,
                 max_group: int = 100_000, id_col: str = "doc_id",
                 text_col: str = "text",
                 broadcast_texts_max: int = 1 << 16):
    """All (id_a < id_b, jac) pairs with word-n-gram Jaccard >= threshold.

    EXACT: prefix-filter candidate generation (complete by construction)
    + integer-count verification; ``jac`` is the single IEEE division
    intersection/union, bit-identical to a SQL mirror computing the same
    integer counts.

    Verification transport is MEASURED (round-5): when the corpus has at
    most ``broadcast_texts_max`` documents, the (id, text) table ships
    once as a broadcast object-store block and candidates verify
    map-side — zero join exchanges (the `join_dim` dimension-broadcast
    convention). Above the bound, two `hash_join` exchanges retrieve the
    pair texts — the only shape that holds when the text table itself is
    the 100 TB side. The two paths are pytest-identical.
    """

    t = Fraction(threshold).limit_denominator(10_000)

    prefix_schema = pa.schema([
        ("gram", pa.string()), ("doc_id", pa.int64()), ("sz", pa.int64()),
    ])

    def prefix(b: pa.Table) -> pa.Table:
        """Prefix-filter explode, VECTORIZED (round-5: the per-doc
        Python loop over sorted shingle sets becomes one
        `_flat_ngram_strings` split, one Arrow hash-distinct, one
        (doc, gram) sort, and a run-rank mask): each doc emits its
        first ``sz - ceil(t*sz) + 1`` grams under the lexicographic
        canonical order — identical rows to the `_shingles` loop."""
        from webextract.functions.ngrams import _flat_ngram_strings

        texts = b.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        doc_idx, grams = _flat_ngram_strings(texts, n)
        ids = np.asarray(b.column(id_col).cast(pa.int64()).combine_chunks())
        # _shingles emits ONE partial gram (= the whole text) for docs
        # shorter than n words (`range(max(len-n+1, 1))`, mirroring the
        # SQL oracle's greatest(len-n+1, 1)); _flat_ngram_strings emits
        # zero — append those docs' single shingle explicitly
        wc = pc.list_value_length(pc.split_pattern(texts, " ")).to_numpy(
            zero_copy_only=False)
        short = np.nonzero(wc < n)[0]
        if short.size:
            doc_idx = np.concatenate([doc_idx, short])
            grams = pa.concat_arrays([
                grams.combine_chunks() if isinstance(grams, pa.ChunkedArray)
                else grams,
                texts.take(pa.array(short))])
        if doc_idx.size == 0:
            return prefix_schema.empty_table()
        distinct = pa.table({
            "_d": pa.array(doc_idx, type=pa.int64()), "gram": grams,
        }).group_by(["_d", "gram"], use_threads=False).aggregate([])
        idx = pc.sort_indices(distinct, sort_keys=[
            ("_d", "ascending"), ("gram", "ascending")])
        dt = distinct.take(idx)
        d = np.asarray(dt.column("_d"))
        m = dt.num_rows
        starts = np.r_[0, np.nonzero(d[1:] != d[:-1])[0] + 1]
        counts = np.r_[starts[1:], m] - starts
        rank = np.arange(m, dtype=np.int64) - np.repeat(starts, counts)
        sz = np.repeat(counts, counts)
        # keep = sz - ceil(t*sz) + 1, exact integer ceil
        keep_n = sz - (-(-t.numerator * sz) // t.denominator) + 1
        mask = rank < keep_n
        return pa.table({
            "gram": dt.column("gram").filter(pa.array(mask)),
            "doc_id": pa.array(ids[d[mask]], type=pa.int64()),
            "sz": pa.array(sz[mask], type=pa.int64()),
        }, schema=prefix_schema)

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])

    def pairs_part(part: pa.Table) -> pa.Table:
        """All candidate pairs of one hash partition, VECTORIZED
        (round-5: `groupby(gram).map_groups` invoked Python once per
        distinct shingle — a 500k-gram corpus paid 500k calls; here
        every gram run in the partition emits its cross-product with
        the hash_join repeat/arange index arithmetic, then the i<j /
        distinct-id / length filters apply as masks)."""
        g = part.column("gram")
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        codes = np.asarray(g.dictionary_encode().indices)
        ids = part.column("doc_id").to_numpy(zero_copy_only=False)
        szs = part.column("sz").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, codes))
        c, i_, s_ = codes[order], ids[order], szs[order]
        nr = c.size
        neq = c[1:] != c[:-1]
        starts = np.r_[0, np.nonzero(neq)[0] + 1].astype(np.int64)
        m = np.r_[starts[1:], nr].astype(np.int64) - starts
        half = m * (m - 1) // 2
        bad = np.nonzero(half > max_group)[0]
        if bad.size:
            raise ValueError(
                f"ssjoin_pairs: shingle group of {int(m[bad[0]])} docs "
                f"exceeds max_group={max_group} candidate pairs — "
                "df-order the canonical order or raise max_group")
        sel = m >= 2
        ms, ss = m[sel], starts[sel]
        nout = ms * ms
        total = int(nout.sum())
        if total == 0:
            return pair_schema.empty_table()
        offs = np.zeros(len(nout), dtype=np.int64)
        np.cumsum(nout[:-1], out=offs[1:])
        jg = np.arange(total, dtype=np.int64) - np.repeat(offs, nout)
        mr = np.repeat(ms, nout)
        idx_i = np.repeat(ss, nout) + jg // mr
        idx_j = np.repeat(ss, nout) + jg % mr
        keep = idx_i < idx_j  # each unordered combination exactly once
        ia, ib = i_[idx_i[keep]], i_[idx_j[keep]]
        sa, sb = s_[idx_i[keep]], s_[idx_j[keep]]
        lo, hi = np.minimum(sa, sb), np.maximum(sa, sb)
        # length filter: J >= t requires t*max(|a|,|b|) <= min
        ok = (ia != ib) & (t.numerator * hi <= lo * t.denominator)
        a = np.minimum(ia[ok], ib[ok]).astype(np.int64)
        b = np.maximum(ia[ok], ib[ok]).astype(np.int64)
        if a.size == 0:
            return pair_schema.empty_table()
        # partition-local distinct before the (id_a, id_b) exchange
        o2 = np.lexsort((b, a))
        a, b = a[o2], b[o2]
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table({"id_a": pa.array(a[first]),
                         "id_b": pa.array(b[first])}, schema=pair_schema)

    from .joins import partition_apply

    cand = (
        partition_apply(
            docs.map_batches(prefix, batch_format="pyarrow"),
            pairs_part, on="gram",
            schema=prefix_schema, out_schema=pair_schema)
        # global distinct: count-and-drop is a vectorized keys-only
        # exchange (the old per-pair map_groups paid one Python call
        # per distinct pair)
        .groupby(["id_a", "id_b"]).count()
        .select_columns(["id_a", "id_b"])
    )

    out_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                            ("jac", pa.float64())])

    def _verify_pairs(ids_a, ids_b, texts_a, texts_b) -> pa.Table:
        """Shared verify core: exact integer-count Jaccard per candidate
        pair (per-pair Python set work is inherent — candidates are the
        prefix-filtered few)."""
        o_a, o_b, o_j = [], [], []
        for a, bb, ta, tb in zip(ids_a, ids_b, texts_a, texts_b):
            sa = set(_shingles(ta or "", n))
            sb = set(_shingles(tb or "", n))
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            # exact rational threshold compare — the SQL mirror is the
            # same integer cross-multiplication
            if union and inter * t.denominator >= t.numerator * union:
                o_a.append(a)
                o_b.append(bb)
                o_j.append(float(inter) / float(union))
        return pa.table({"id_a": pa.array(o_a, type=pa.int64()),
                         "id_b": pa.array(o_b, type=pa.int64()),
                         "jac": pa.array(o_j, type=pa.float64())},
                        schema=out_schema)

    # measured transport (attach_pair_texts): broadcast map-side gather
    # for dimension-sized corpora, two hash_join exchanges above
    from .joins import attach_pair_texts

    j2 = attach_pair_texts(cand, docs, cand_schema=pair_schema,
                           id_col=id_col, text_col=text_col,
                           broadcast_max=broadcast_texts_max,
                           max_group=max_group)

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        return _verify_pairs(b.column("id_a").to_pylist(),
                             b.column("id_b").to_pylist(),
                             b.column("text_a").to_pylist(),
                             b.column("text_b").to_pylist())

    return j2.map_batches(verify, batch_format="pyarrow")
