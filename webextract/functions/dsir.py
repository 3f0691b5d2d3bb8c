"""DSIR-style importance scoring for data selection, fully distributed.

DSIR (Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling") scores every raw document by the log-likelihood ratio of its
n-gram features under a TARGET distribution vs the RAW distribution, then
resamples the corpus proportionally to that importance weight.  The
reference's analog is `drop_score`-gated selection of recognized text
(`mindocr/postprocess/rec_postprocess.py` confidence gating +
`tools/infer/text/predict_system.py` assembly filter); the corpus-level
re-expression selects documents whose vocabulary looks like the target
domain.

Cross-engine exactness uses the same integer quantization as
:mod:`webextract.functions.lm`: per-word information content is quantized
to integer bits, so the importance weight of word ``w`` is

    lambda(w) = bits_raw(w) - bits_target(w)
    bits_raw(w)    = bit_length(R //  cnt_raw(w))
    bits_target(w) = bit_length(max(T // (cnt_target(w) + 1), 1))

with ``R``/``T`` the raw/target corpus token totals and add-one smoothing
on the target side (a raw word may be absent from the target slice; a raw
word always has ``cnt_raw >= 1``).  ``max(.., 1)`` keeps the quotient
positive so ``bit_length`` matches DuckDB's ``length(bin(x))`` exactly.
A document's score is then an INTEGER sum ``sum(tf * lambda)`` plus one
final integer/integer division — bit-identical to the SQL oracle.

Distributed shape (two keys-only shuffles, no driver vocabulary):

1. `map_batches` explodes docs into ``(doc_id, word, tf, tf_t)`` where
   ``tf_t = tf`` for target-slice documents, else 0 — tf complete per
   batch because a document never spans rows.
2. ONE ``partition_apply`` on ``word`` computes both global counts with
   two weighted bincounts over dictionary codes and emits
   ``(doc_id, tf, prod = tf * lambda)`` map-side.
3. ONE ``groupby(doc_id)`` folds ``dsir_bits = sum(prod)``,
   ``n_tokens = sum(tf)``, ``avg_dsir = dsir_bits / n_tokens``.

Both exchanges move only ``(id, word, small ints)`` — document payloads
never enter an all-to-all; this is the same exchange `lm_scores` and
`tfidf_topk` already pay, so the 100 TB behavior is identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _explode_tf_flagged(text_col: str, id_col: str, target_col: str):
    """(doc_id, word, tf, tf_t) rows, vectorized — `tfidf._explode_tf`
    with the doc-level target flag multiplied into a second tf column so
    the word-partition stage can fold both distributions in one pass."""
    from webextract.functions.ngrams import _flat_ngram_strings

    empty = pa.schema([
        (id_col, pa.int64()), ("word", pa.string()),
        ("tf", pa.int64()), ("tf_t", pa.int64()),
    ])

    def fn(batch: pa.Table) -> pa.Table:
        doc_idx, words = _flat_ngram_strings(batch.column(text_col), 1)
        if doc_idx.size == 0:
            return empty.empty_table()
        ids = np.asarray(
            batch.column(id_col).cast(pa.int64()).combine_chunks())
        # a NULL flag means non-target (SQL CASE WHEN semantics); without
        # fill_null the numpy conversion turns nulls into NaN -> INT64_MIN
        is_t = np.asarray(
            pc.fill_null(batch.column(target_col), False)
            .cast(pa.int8()).combine_chunks()
        ).astype(np.int64)
        counted = pa.table({
            id_col: pa.array(ids[doc_idx], type=pa.int64()),
            "_t": pa.array(is_t[doc_idx], type=pa.int64()),
            "word": words,
        }).group_by([id_col, "_t", "word"], use_threads=False).aggregate(
            [([], "count_all")])
        # select BY NAME: pyarrow group_by column order differs across
        # versions (keys-first in 16.x, aggregates-first before)
        tf = counted.column("count_all").cast(pa.int64())
        return pa.table({
            id_col: counted.column(id_col),
            "word": counted.column("word"),
            "tf": tf,
            "tf_t": pc.multiply(tf, counted.column("_t")),
        }, schema=empty)

    return fn


def dsir_scores(ds, *, raw_tokens: int, target_tokens: int,
                text_col: str = "text", id_col: str = "doc_id",
                target_col: str = "is_target"):
    """Score every doc: ``(doc_id, n_tokens, dsir_bits, avg_dsir)``.

    ``dsir_bits`` is the quantized unigram log-importance-ratio summed
    over the document's tokens (positive = more target-like than the raw
    corpus average); ``avg_dsir`` normalizes by length so long documents
    don't dominate selection.  ``raw_tokens``/``target_tokens`` are prior
    one-number aggregates (see :func:`webextract.functions.lm.
    corpus_token_count`) so the pipeline stays one lazy graph.
    """
    from ray.data.aggregate import Sum

    from webextract.functions.joins import partition_apply

    pairs = ds.map_batches(
        _explode_tf_flagged(text_col, id_col, target_col),
        batch_format="pyarrow")

    mid_schema = pa.schema([(id_col, pa.int64()), ("tf", pa.int64()),
                            ("prod", pa.int64())])

    def attach_lambda_part(part: pa.Table) -> pa.Table:
        """One hash partition's words, vectorized: both corpus counts via
        weighted bincounts over dictionary codes; ``bit_length`` via
        ``frexp`` — exact for quotients < 2^53."""
        w = part.column("word")
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        codes = np.asarray(w.dictionary_encode().indices)
        tf = part.column("tf").to_numpy(zero_copy_only=False)
        tf_t = part.column("tf_t").to_numpy(zero_copy_only=False)
        size = int(codes.max()) + 1 if codes.size else 0
        cnt_r = np.bincount(codes, weights=tf, minlength=size).astype(
            np.int64)
        cnt_t = np.bincount(codes, weights=tf_t, minlength=size).astype(
            np.int64)
        q_r = (raw_tokens // np.maximum(cnt_r, 1)).astype(np.float64)
        q_t = np.maximum(target_tokens // (cnt_t + 1), 1).astype(np.float64)
        lam = np.frexp(q_r)[1].astype(np.int64) - np.frexp(q_t)[1].astype(
            np.int64)
        return pa.table({
            id_col: part.column(id_col),
            "tf": part.column("tf"),
            "prod": pa.array(tf * lam[codes], type=pa.int64()),
        }, schema=mid_schema)

    with_lambda = partition_apply(
        pairs, attach_lambda_part, on="word",
        schema=pa.schema([(id_col, pa.int64()), ("word", pa.string()),
                          ("tf", pa.int64()), ("tf_t", pa.int64())]),
        out_schema=mid_schema)

    out_schema = pa.schema([
        (id_col, pa.int64()), ("n_tokens", pa.int64()),
        ("dsir_bits", pa.int64()), ("avg_dsir", pa.float64()),
    ])

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        n_tok = b.column("n_tokens").cast(pa.int64())
        bits = b.column("dsir_bits").cast(pa.int64())
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": n_tok,
            "dsir_bits": bits,
            "avg_dsir": pc.divide(bits.cast(pa.float64()),
                                  n_tok.cast(pa.float64())),
        }, schema=out_schema)

    return (
        with_lambda.groupby(id_col)
        .aggregate(Sum("tf", alias_name="n_tokens"),
                   Sum("prod", alias_name="dsir_bits"))
        .map_batches(finish, batch_format="pyarrow")
    )


def corpus_token_counts_flagged(ds, *, text_col: str = "text",
                                target_col: str = "is_target"):
    """One-pass ``(raw_tokens, target_tokens)`` corpus totals
    (split-on-space, matching `_explode_tf_flagged`): per-batch partial
    sums -> driver adds a handful of int pairs.  The only driver-side
    state is two integers per block."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lens = pc.list_value_length(
            pc.split_pattern(pc.fill_null(texts, ""), " ")).cast(pa.int64())
        flag = pc.fill_null(batch.column(target_col), False).cast(pa.int64())
        n = int(pc.sum(lens).as_py() or 0)
        n_t = int(pc.sum(pc.multiply(lens, flag)).as_py() or 0)
        return pa.table({"n": pa.array([n], type=pa.int64()),
                         "n_t": pa.array([n_t], type=pa.int64())})

    part = ds.map_batches(partial, batch_format="pyarrow").materialize()
    return int(part.sum("n")), int(part.sum("n_t"))


def dsir_scores_hashed(ds, *, n_buckets: int = 4096,
                       text_col: str = "text", id_col: str = "doc_id",
                       target_col: str = "is_target"):
    """DSIR with HASHED n-gram features — the paper's actual scale trick
    (Xie et al. 2023 §3 hash the feature space to a fixed number of
    buckets), which removes the word-keyed exchange entirely:

    1. COUNT pass: each batch bincounts its word-occurrence buckets
       (raw + target) into at most ``n_buckets`` partial rows; one tiny
       ``groupby(bucket)`` folds them and the driver collects the
       <= ``n_buckets`` totals (bounded BY CONSTRUCTION by the function
       argument, not by data — 4096 int64 triples is ~100 KB).
    2. SCORE pass: the per-bucket lambda array is broadcast via
       ``ray.put`` and every doc is scored in ONE embarrassingly
       parallel `map_batches` gather+segment-sum — at 100 TB there is
       NO all-to-all anywhere in this operator.

    The upstream ``ds`` lineage executes twice (count pass, then score
    pass) — a DELIBERATE recompute-over-materialize call: at the 100 TB
    design point pinning the corpus for the second pass would hold the
    whole input in the object store, while re-running the column-pruned
    read + flag map costs one extra scan of exactly the columns used.
    Callers with a small/expensive upstream can pass a materialized
    dataset instead.

    Occurrence-additive scoring makes the (doc, word) tf grouping of the
    exact variant unnecessary: ``sum_w tf(w)*lambda(b(w)) ==
    sum_occurrences lambda(b(word))``.  Buckets use the same 64-bit word
    hash as the MinHash chain (`dedup._word_hashes` — unique words hashed
    once per batch via dictionary encoding, Zipf-bounded), so the result
    is deterministic but hash-internal: the query registers rows-only
    (like `minhash_signatures`), with cross-variant equivalence pinned by
    pytest at a collision-free bucket width.

    Returns ``(doc_id, n_tokens, dsir_bits, avg_dsir)`` with the same
    quantized-lambda semantics as :func:`dsir_scores` applied to bucket
    counts.
    """
    import ray

    from webextract.functions.dedup import _word_hashes

    def _bucketize(texts):
        """Flat (doc_index, bucket) arrays for every word occurrence of a
        string column — one split + dictionary encode; Python touches
        only the per-batch UNIQUE words."""
        from webextract.functions.ngrams import _flat_ngram_strings

        doc_idx, words = _flat_ngram_strings(texts, 1)
        if doc_idx.size == 0:
            return doc_idx, np.empty(0, dtype=np.int64)
        de = pc.dictionary_encode(words)
        uniq_b = (_word_hashes(de.dictionary.to_pylist())
                  % np.uint64(n_buckets)).astype(np.int64)
        return doc_idx, uniq_b[de.indices.to_numpy(zero_copy_only=False)]

    cnt_schema = pa.schema([("bucket", pa.int64()), ("cnt_r", pa.int64()),
                            ("cnt_t", pa.int64())])

    def count_partial(batch: pa.Table) -> pa.Table:
        doc_idx, buckets = _bucketize(batch.column(text_col))
        if doc_idx.size == 0:
            return cnt_schema.empty_table()
        # NULL flag == non-target; see _explode_tf_flagged
        is_t = np.asarray(
            pc.fill_null(batch.column(target_col), False)
            .cast(pa.int8()).combine_chunks()
        ).astype(np.int64)
        cnt_r = np.bincount(buckets, minlength=n_buckets)
        cnt_t = np.bincount(buckets, weights=is_t[doc_idx],
                            minlength=n_buckets).astype(np.int64)
        nz = np.nonzero(cnt_r)[0]
        return pa.table({
            "bucket": pa.array(nz, type=pa.int64()),
            "cnt_r": pa.array(cnt_r[nz], type=pa.int64()),
            "cnt_t": pa.array(cnt_t[nz], type=pa.int64()),
        }, schema=cnt_schema)

    from ray.data.aggregate import Sum

    folded = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("cnt_r", alias_name="cnt_r"),
                   Sum("cnt_t", alias_name="cnt_t"))
        .take_all()  # <= n_buckets rows by construction (function arg)
    )
    cnt_r = np.zeros(n_buckets, dtype=np.int64)
    cnt_t = np.zeros(n_buckets, dtype=np.int64)
    for row in folded:
        cnt_r[row["bucket"]] = row["cnt_r"]
        cnt_t[row["bucket"]] = row["cnt_t"]
    raw_tokens = int(cnt_r.sum())
    target_tokens = int(cnt_t.sum())
    q_r = (raw_tokens // np.maximum(cnt_r, 1)).astype(np.float64)
    q_t = np.maximum(target_tokens // (cnt_t + 1), 1).astype(np.float64)
    lam = (np.frexp(q_r)[1] - np.frexp(q_t)[1]).astype(np.int64)
    lam_ref = ray.put(lam)

    out_schema = pa.schema([
        (id_col, pa.int64()), ("n_tokens", pa.int64()),
        ("dsir_bits", pa.int64()), ("avg_dsir", pa.float64()),
    ])

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        lam_arr = ray.get(lam_ref)  # zero-copy plasma read per task
        doc_idx, buckets = _bucketize(batch.column(text_col))
        n_rows = batch.num_rows
        n_tok = np.bincount(doc_idx, minlength=n_rows).astype(np.int64)
        bits = np.bincount(doc_idx, weights=lam_arr[buckets],
                           minlength=n_rows).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(n_tok),
            "dsir_bits": pa.array(bits),
            "avg_dsir": pa.array(
                bits / np.maximum(n_tok, 1).astype(np.float64)),
        }, schema=out_schema)

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_select(scored, *, k: int = 200, id_col: str = "doc_id"):
    """Deterministic resampling stand-in: keep the top-``k`` documents by
    ``(dsir_bits DESC, doc_id ASC)``.

    DSIR proper draws a Gumbel-top-k sample proportional to the
    importance weights; the cross-engine-exact analog is the weight
    top-k itself (the zero-temperature limit), with the id tie-break
    making the result total-ordered.  The sort's limit is pushed into
    the per-block top-k by Ray's sort+limit planning, so only ``k`` rows
    per block reach the final merge.
    """
    cols = scored.select_columns([id_col, "dsir_bits"])

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        order = pc.sort_indices(b, sort_keys=[("dsir_bits", "descending"),
                                              (id_col, "ascending")])
        return b.take(order.slice(0, k))

    # per-block prefilter (Ray 2.49's LimitPushdownRule stops at Sort, so
    # the limit alone would NOT bound the global sort's input): only k
    # rows per block enter the all-to-all, making the final sort O(k *
    # n_blocks) regardless of corpus size. batch_size=None pins the
    # whole-block contract the prefilter depends on.
    return cols.map_batches(
        local_topk, batch_format="pyarrow", batch_size=None,
    ).sort(["dsir_bits", id_col], descending=[True, False]).limit(k)
