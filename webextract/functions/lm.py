"""Corpus-unigram LM quality scoring (CCNet-style), fully distributed.

CCNet/LLaMA-lineage pipelines score every document by its perplexity under
a language model trained on a trusted corpus and filter on that score
(Wenzek et al. 2019, "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data"). The reference's analog is dictionary-confidence
scoring of recognized text (`mindocr/postprocess/rec_postprocess.py`
char-dict softmax confidence + `drop_score` gating); the corpus-level
re-expression is bits-per-token under the corpus's own unigram LM.

Cross-engine exactness: a float ``-log2 p`` sum is order-dependent, so the
per-token information content is QUANTIZED TO INTEGER BITS:

    bits(w) = bit_length(total_tokens // count(w))

i.e. ``floor(log2(N / cnt)) + 1`` within 1 bit of the true unigram
information content — and a per-doc score that is a sum of INTEGERS with
one final integer/integer division, so the engine and a DuckDB oracle
produce bit-identical doubles (`length(bin(n // cnt))` on the SQL side).

Distributed shape (no driver-side vocabulary, no broadcast):

1. `map_batches` explodes docs into ``(doc_id, word, tf)`` — tf complete
   per batch because a document never spans rows.
2. ONE keys-only ``groupby(word)`` attaches ``bits = bit_length(N // cnt)``
   where ``cnt = sum(tf)`` over the group (global occurrence count).
3. ONE ``groupby(doc_id)`` folds ``lm_bits = sum(tf*bits)``,
   ``n_tokens = sum(tf)``, ``avg_bits = lm_bits / n_tokens``.

Both shuffles move only ``(id, word, small ints)`` — text payloads never
enter an all-to-all. At 100 TB the word-keyed exchange is the same one
`tfidf_topk` already pays; hot words (stopwords) produce large groups but
each group reduces to per-doc rows map-side within `map_groups`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webextract.functions.tfidf import _explode_tf


def unigram_lm_scores(ds, *, total_tokens: int, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Score every doc: ``(doc_id, n_tokens, lm_bits, avg_bits)`` where
    ``avg_bits`` is the quantized bits-per-token under the corpus unigram
    LM (higher = rarer vocabulary; CCNet keeps the low/middle band).

    ``total_tokens`` is the corpus token count (a prior one-number
    aggregate, like ``n_docs`` for `tfidf_topk`) so the pipeline stays one
    lazy graph.
    """
    pairs = ds.map_batches(_explode_tf(text_col, id_col),
                           batch_format="pyarrow")

    from ray.data.aggregate import Sum

    from webextract.functions.joins import partition_apply

    mid_schema = pa.schema([(id_col, pa.int64()), ("tf", pa.int64()),
                            ("prod", pa.int64())])

    def attach_bits_part(part: pa.Table) -> pa.Table:
        """One hash partition's words, VECTORIZED (round-5: the
        per-word map_groups paid one Python call per vocabulary entry):
        corpus tf per word via one weighted bincount over dictionary
        codes; ``bits = (total // cnt).bit_length()`` via ``frexp`` —
        exact for quotients < 2^53. Emits tf*bits map-side so the
        per-doc fold downstream is a plain Sum aggregate."""
        w = part.column("word")
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        codes = np.asarray(w.dictionary_encode().indices)
        tf = part.column("tf").to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, weights=tf,
                          minlength=int(codes.max()) + 1
                          if codes.size else 0).astype(np.int64)
        q = (total_tokens // np.maximum(cnt, 1)).astype(np.float64)
        bits = np.frexp(q)[1].astype(np.int64)  # == int.bit_length(q)
        row_bits = bits[codes]
        return pa.table({
            id_col: part.column(id_col),
            "tf": part.column("tf"),
            "prod": pa.array(tf * row_bits, type=pa.int64()),
        }, schema=mid_schema)

    with_bits = partition_apply(
        pairs, attach_bits_part, on="word",
        schema=pa.schema([(id_col, pa.int64()), ("word", pa.string()),
                          ("tf", pa.int64())]),
        out_schema=mid_schema)

    out_schema = pa.schema([
        (id_col, pa.int64()), ("n_tokens", pa.int64()),
        ("lm_bits", pa.int64()), ("avg_bits", pa.float64()),
    ])

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        n_tok = b.column("n_tokens").cast(pa.int64())
        lm = b.column("lm_bits").cast(pa.int64())
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": n_tok,
            "lm_bits": lm,
            "avg_bits": pc.divide(lm.cast(pa.float64()),
                                  n_tok.cast(pa.float64())),
        }, schema=out_schema)

    return (
        with_bits.groupby(id_col)
        .aggregate(Sum("tf", alias_name="n_tokens"),
                   Sum("prod", alias_name="lm_bits"))
        .map_batches(finish, batch_format="pyarrow")
    )


def corpus_token_count(ds, *, text_col: str = "text") -> int:
    """One-number corpus token total (split-on-space, matching
    `_explode_tf`): per-batch partial sums -> driver adds a handful of
    ints. The only driver-side state is one integer per block."""

    def partial(batch: pa.Table) -> pa.Table:
        # vectorized: one split_pattern + one C-level length sum
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lens = pc.list_value_length(
            pc.split_pattern(pc.fill_null(texts, ""), " "))
        n = int(pc.sum(lens).as_py() or 0)
        return pa.table({"n": pa.array([n], type=pa.int64())})

    part = ds.map_batches(partial, batch_format="pyarrow")
    return int(part.sum("n"))


def _explode_bigram_tf(text_col: str, id_col: str):
    """Per-batch (doc_id, w1, w2, tf) explode — tf complete per batch
    because a document never spans rows. Vectorized: one split_pattern,
    two shifted flat takes, one Arrow group_by count. NULL text has zero
    words, and docs under 2 words emit no bigrams (mirroring the SQL
    oracle's ``range(0, greatest(len(words)-1, 0))``)."""
    schema = pa.schema([(id_col, pa.int64()), ("w1", pa.string()),
                        ("w2", pa.string()), ("tf", pa.int64())])

    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            batch.column(id_col).cast(pa.int64()).combine_chunks())
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(pc.fill_null(texts, ""), " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        wc = lists.value_lengths().to_numpy(
            zero_copy_only=False).astype(np.int64)
        valid = pc.is_valid(texts).to_numpy(zero_copy_only=False)
        wc = np.where(valid, wc, 0)  # NULL text: zero words
        n_b = np.maximum(wc - 1, 0)
        total = int(n_b.sum())
        if total == 0:
            return schema.empty_table()
        offs = np.zeros(len(wc) + 1, dtype=np.int64)
        # flat offsets use the RAW per-doc list lengths (the NULL
        # placeholder [""] still occupies one slot in `flat`)
        np.cumsum(lists.value_lengths().to_numpy(
            zero_copy_only=False).astype(np.int64), out=offs[1:])
        ends = np.cumsum(n_b)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            ends - n_b, n_b)
        starts = np.repeat(offs[:-1], n_b) + within
        doc_rep = np.repeat(ids, n_b)
        t = pa.table({
            id_col: pa.array(doc_rep, type=pa.int64()),
            "w1": flat.take(pa.array(starts)),
            "w2": flat.take(pa.array(starts + 1)),
        })
        g = t.group_by([id_col, "w1", "w2"],
                       use_threads=False).aggregate([([], "count_all")])
        return pa.table({
            id_col: g.column(id_col),
            "w1": g.column("w1"),
            "w2": g.column("w2"),
            "tf": g.column("count_all").cast(pa.int64()),
        }, schema=schema)

    return fn


def bigram_lm_scores(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Bits-per-bigram under the corpus's own BIGRAM LM — the
    second-order member of the CCNet-style scoring family:

        bits(w1, w2) = bit_length(ctx(w1) // cnt(w1, w2))

    where ``cnt(w1, w2)`` is the corpus bigram count and ``ctx(w1)`` the
    count of bigrams starting with w1 (occurrences of w1 excluding
    doc-final positions) — the integer quantization of the conditional
    information ``-log2 p(w2 | w1)``, so the per-doc sum is exact
    integer arithmetic and doubles match a DuckDB oracle bit-for-bit
    (same trick as `unigram_lm_scores`).

    Distributed shape: partitioning on the CONTEXT word co-locates every
    bigram sharing w1 with everything its conditional needs, so ONE
    keys-only exchange computes both counts vectorized (sorted-run
    reduceat over dictionary codes) and emits per-row ``tf * bits``
    map-side; the per-doc fold is a plain Sum aggregate. Text payloads
    never enter an all-to-all. Docs with fewer than 2 words emit no rows
    (no bigrams — mirrored by the oracle's GROUP BY).
    """
    from ray.data.aggregate import Sum

    from webextract.functions.joins import partition_apply

    pairs = ds.map_batches(_explode_bigram_tf(text_col, id_col),
                           batch_format="pyarrow")

    mid_schema = pa.schema([(id_col, pa.int64()), ("tf", pa.int64()),
                            ("prod", pa.int64())])

    def attach_bits_part(part: pa.Table) -> pa.Table:
        w1 = part.column("w1")
        w2 = part.column("w2")
        if isinstance(w1, pa.ChunkedArray):
            w1 = w1.combine_chunks()
        if isinstance(w2, pa.ChunkedArray):
            w2 = w2.combine_chunks()
        c1 = np.asarray(w1.dictionary_encode().indices).astype(np.int64)
        c2 = np.asarray(w2.dictionary_encode().indices).astype(np.int64)
        tf = part.column("tf").to_numpy(zero_copy_only=False)
        order = np.lexsort((c2, c1))
        a1, a2, atf = c1[order], c2[order], tf[order]
        pair_new = np.r_[True, (a1[1:] != a1[:-1]) | (a2[1:] != a2[:-1])]
        pstart = np.nonzero(pair_new)[0]
        pair_cnt = np.add.reduceat(atf, pstart)
        ctx_new = np.r_[True, a1[1:] != a1[:-1]]
        ctx_cnt = np.add.reduceat(atf, np.nonzero(ctx_new)[0])
        ctx_idx_per_row = np.cumsum(ctx_new) - 1
        ctx_of_pair = ctx_cnt[ctx_idx_per_row[pstart]]
        q = (ctx_of_pair // np.maximum(pair_cnt, 1)).astype(np.float64)
        bits_pair = np.frexp(q)[1].astype(np.int64)  # int.bit_length
        row_bits = bits_pair[np.cumsum(pair_new) - 1]
        prod = np.empty(len(atf), dtype=np.int64)
        prod[order] = atf * row_bits
        return pa.table({
            id_col: part.column(id_col),
            "tf": part.column("tf"),
            "prod": pa.array(prod, type=pa.int64()),
        }, schema=mid_schema)

    with_bits = partition_apply(
        pairs, attach_bits_part, on="w1",
        schema=pa.schema([(id_col, pa.int64()), ("w1", pa.string()),
                          ("w2", pa.string()), ("tf", pa.int64())]),
        out_schema=mid_schema)

    out_schema = pa.schema([
        (id_col, pa.int64()), ("n_bigrams", pa.int64()),
        ("lm2_bits", pa.int64()), ("avg_bits2", pa.float64()),
    ])

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        n_bg = b.column("n_bigrams").cast(pa.int64())
        lm = b.column("lm2_bits").cast(pa.int64())
        return pa.table({
            id_col: b.column(id_col),
            "n_bigrams": n_bg,
            "lm2_bits": lm,
            "avg_bits2": pc.divide(lm.cast(pa.float64()),
                                   n_bg.cast(pa.float64())),
        }, schema=out_schema)

    import ray.data

    # schema anchor: a corpus of only <2-word docs legitimately yields 0
    # rows, and the aggregate loses its columns on an all-empty input —
    # union one 0-row typed block so the result keeps its shape
    return (
        with_bits.groupby(id_col)
        .aggregate(Sum("tf", alias_name="n_bigrams"),
                   Sum("prod", alias_name="lm2_bits"))
        .map_batches(finish, batch_format="pyarrow")
        .union(ray.data.from_arrow(out_schema.empty_table()))
    )
