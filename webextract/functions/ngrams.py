"""Cross-document n-gram duplication + line-level quality filtering.

Two LLM-corpus-prep operators the MinHash chain doesn't cover:

* :func:`dup_ngram_topk` — the exact-substring-duplication primitive
  (the fixed-length word-n-gram restriction of the suffix-array pass in
  Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  Better"): which n-grams appear verbatim in >= `min_docs` distinct
  documents, ranked by document frequency. Shape at scale: one explode
  (distinct n-grams per doc, computed inside `map_batches` so the
  per-doc dedup never shuffles) followed by ONE keys-only groupby on
  the n-gram string — no payload ever crosses the exchange — then a
  k-row global top-k.

* :func:`line_filter_batch` — C4-style line-level filtering (Raffel et
  al. 2020 §2.2): drop lines that fail a deterministic keep rule and
  re-join the survivors. Pure per-row map, no shuffle; the keep rule
  here (>= `min_words` words and containing `must_contain`) is the
  word-soup-corpus analog of C4's "ends in terminal punctuation and
  has >= 5 words" (mirrored literally by the SQL oracle).

Reference parity: mindocr has no corpus-prep stage; these extend the
dedup/text-prep families beside functions/dedup.py (MinHash/LSH) and
functions/decontam.py (n-gram contamination probe).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _flat_ngram_strings(texts, n: int):
    """(doc_index, ngram) arrays for every word n-gram of a string
    column — vectorized end to end: one `split_pattern` (keeps empty
    tokens, matching Python ``str.split(" ")``), flat `take`s at n
    shifted offsets, and one C-level `binary_join_element_wise`. No
    per-row Python. Returns (int64 numpy doc indices, StringArray)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern(pc.fill_null(texts, ""), " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    cnt = lists.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    n_g = np.maximum(cnt - (n - 1), 0)
    total = int(n_g.sum())
    if total == 0:
        return (np.empty(0, dtype=np.int64),
                pa.array([], type=pa.string()))
    doc_idx = np.repeat(np.arange(len(cnt), dtype=np.int64), n_g)
    if n == 1:  # words ARE the 1-grams — no take/join copies
        return doc_idx, flat
    offs = np.zeros(len(cnt) + 1, dtype=np.int64)
    np.cumsum(cnt, out=offs[1:])
    ends = np.cumsum(n_g)
    within = np.arange(total, dtype=np.int64) - np.repeat(ends - n_g, n_g)
    starts = np.repeat(offs[:-1], n_g) + within
    cols = [flat.take(pa.array(starts + j)) for j in range(n)]
    grams = pc.binary_join_element_wise(*cols, " ")
    return doc_idx, grams


def doc_distinct_ngrams_batch(
    batch: pa.Table, *, n: int = 5, text_col: str = "text"
) -> pa.Table:
    """Explode each document into its DISTINCT word n-grams.

    The distinctness is per document (a phrase repeated inside one doc
    counts once), so the downstream groupby count is document
    frequency. Output is a single `ngram` string column — the groupby
    that follows moves keys only. Vectorized: `_flat_ngram_strings`
    plus one Arrow hash-distinct on (doc, ngram); the former Python
    set-per-row loop was the hot-stage bottleneck at bench scale.
    """
    doc_idx, grams = _flat_ngram_strings(batch.column(text_col), n)
    distinct = pa.table({
        "_d": pa.array(doc_idx, type=pa.int64()), "ngram": grams,
    }).group_by(["_d", "ngram"], use_threads=False).aggregate([])
    return distinct.select(["ngram"])


def doc_ngram_pairs_batch(
    batch: pa.Table, *, n: int = 5, text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Distinct (doc_id, ngram) pairs per document — the keyed variant
    of :func:`doc_distinct_ngrams_batch` for per-document duplication
    scoring. Documents never span batches, so batch-local distinctness
    is global distinctness."""
    doc_idx, grams = _flat_ngram_strings(batch.column(text_col), n)
    ids = np.asarray(batch.column(id_col).cast(pa.int64()).combine_chunks())
    return pa.table({
        id_col: pa.array(ids[doc_idx], type=pa.int64()), "ngram": grams,
    }).group_by([id_col, "ngram"], use_threads=False).aggregate([])


def dup_ngram_topk(ds, *, n: int = 5, k: int = 20, min_docs: int = 2):
    """Top-k cross-document duplicated word n-grams by doc frequency.

    `ds` must have a `text` column. Returns (ngram, ndocs) sorted by
    (ndocs DESC, ngram ASC) — a total order, so the k-boundary is
    deterministic. The only all-to-all is the groupby on the ~n-word
    n-gram strings; at 10^12 docs you would pre-hash the n-gram to a
    fixed 8-byte key inside the explode (same shape, smaller exchange).
    """
    from ray.data.aggregate import Count

    counts = (
        ds.map_batches(
            lambda b: doc_distinct_ngrams_batch(b, n=n),
            batch_format="pyarrow",
        )
        .groupby("ngram")
        .aggregate(Count())
        .rename_columns({"count()": "ndocs"})
        .filter(expr=f"ndocs >= {min_docs}")
    )
    return counts.sort(["ndocs", "ngram"], descending=[True, False]).limit(k)


def line_filter_batch(
    batch: pa.Table,
    *,
    text_col: str = "text",
    min_words: int = 20,
    must_contain: str = "the",
) -> pa.Table:
    """C4-style line filter: keep lines with >= `min_words` words that
    contain the word `must_contain`; emit per-doc survivor text plus
    kept/total line counts.

    Lines are '\\n'-separated (the extractor's block-join contract);
    word count is the single-space split the whole oracle surface uses.
    Empty-survivor docs stay in the output with text='' — dropping rows
    is the *caller's* policy decision, not the filter's.
    """
    texts = batch.column(text_col).to_pylist()
    kept_text: List[str] = []
    n_lines: List[int] = []
    n_kept: List[int] = []
    for t in texts:
        # the extractor never emits empty lines (nonempty blocks joined
        # by single '\n'); filtering '' makes text=='' count 0 lines,
        # matching the oracle's list_filter(c <> '') line set.
        lines = [ln for ln in (t or "").split("\n") if ln]
        kept = [
            ln
            for ln in lines
            if len(ln.split(" ")) >= min_words
            and must_contain in ln.split(" ")
        ]
        n_lines.append(len(lines))
        n_kept.append(len(kept))
        kept_text.append("\n".join(kept))
    out = batch.drop_columns([text_col])
    return (
        out.append_column("n_lines", pa.array(n_lines, type=pa.int64()))
        .append_column("n_kept", pa.array(n_kept, type=pa.int64()))
        .append_column("text", pa.array(kept_text, type=pa.string()))
    )


def word_doc_pairs_batch(
    batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Explode each document into its DISTINCT (word, doc_id) pairs —
    the map side of inverted-index construction. Vectorized: the n=1
    case of `_flat_ngram_strings` (one split_pattern, zero takes) plus
    one Arrow hash-distinct."""
    doc_idx, words = _flat_ngram_strings(batch.column(text_col), 1)
    ids = np.asarray(batch.column(id_col).cast(pa.int64()).combine_chunks())
    return pa.table({
        "word": words,
        id_col: pa.array(ids[doc_idx], type=pa.int64()),
    }).group_by(["word", id_col], use_threads=False).aggregate([])


def inverted_index(ds, *, max_group: int = 100_000):
    """Posting lists: for every word, the ascending doc_id list of the
    documents containing it (comma-joined string — the same
    string_agg encoding the rest of the oracle surface uses for list
    outputs) plus its document frequency.

    Scale shape: the per-doc word dedup happens inside map_batches (no
    shuffle); ONE keys-only groupby gathers each word's postings. A
    posting list materializes in one task, so `max_group` RAISES on
    stopword-sized lists rather than truncating silently — at 10^12
    docs you shard hot words by a (word, doc_id // B) range bucket and
    concatenate the bucket segments at read time.
    """
    pairs = ds.map_batches(word_doc_pairs_batch, batch_format="pyarrow")
    out_schema = pa.schema([
        ("word", pa.string()), ("df", pa.int64()), ("postings", pa.string()),
    ])

    from webextract.functions.joins import partition_apply

    def grp_part(part: pa.Table) -> pa.Table:
        """All posting lists of one hash partition, VECTORIZED (round-5:
        the per-word map_groups paid one Python call per vocabulary
        entry). Sort by (word, doc_id), run boundaries, then ONE
        C-level list-array ``binary_join`` builds every comma-joined
        posting string at once."""
        idx = pc.sort_indices(part, sort_keys=[
            ("word", "ascending"), ("doc_id", "ascending")])
        t = part.take(idx)
        w = t.column("word").combine_chunks()
        n = t.num_rows
        neq = np.asarray(pc.not_equal(w.slice(1), w.slice(0, n - 1))) \
            if n > 1 else np.empty(0, dtype=bool)
        starts = np.r_[0, np.nonzero(neq)[0] + 1].astype(np.int64)
        counts = np.r_[starts[1:], n] - starts
        big = np.nonzero(counts > max_group)[0]
        if big.size:
            raise ValueError(
                f"inverted_index: posting list for "
                f"{w[int(starts[big[0]])].as_py()!r} has "
                f"{int(counts[big[0]])} docs > max_group={max_group}")
        ids_str = pc.cast(t.column("doc_id"), pa.string()).combine_chunks()
        offsets = pa.array(np.r_[starts, n], type=pa.int32())
        lists = pa.ListArray.from_arrays(offsets, ids_str)
        return pa.table({
            "word": w.take(pa.array(starts)),
            "df": pa.array(counts, type=pa.int64()),
            "postings": pc.binary_join(lists, ","),
        }, schema=out_schema)

    return partition_apply(
        pairs, grp_part, on="word",
        schema=pa.schema([("word", pa.string()), ("doc_id", pa.int64())]),
        out_schema=out_schema)
