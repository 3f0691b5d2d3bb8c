"""Library-level pins for the cross-doc n-gram dedup primitive and the
C4-style line filter (functions/ngrams.py)."""

import pyarrow as pa
import ray.data

from webextract.functions.ngrams import (
    doc_distinct_ngrams_batch,
    dup_ngram_topk,
    line_filter_batch,
)


def _docs(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts))), "text": pa.array(texts)}
    )


# ------------------------------------------------------- distinct n-grams


def test_doc_distinct_ngrams_dedups_within_doc():
    # "a b a b a b" has 3 occurrences of trigram "a b a"/"b a b" but each
    # counts once per doc
    t = _docs(["a b a b a b"])
    out = doc_distinct_ngrams_batch(t, n=3)
    assert sorted(out.column("ngram").to_pylist()) == ["a b a", "b a b"]


def test_doc_distinct_ngrams_short_doc_empty():
    out = doc_distinct_ngrams_batch(_docs(["a b"]), n=5)
    assert out.num_rows == 0
    assert out.schema.field("ngram").type == pa.string()


def test_dup_ngram_topk_counts_doc_frequency(ray_session):
    texts = [
        "the quick brown fox jumps over",   # shares 5-gram with doc 1
        "a the quick brown fox jumps now",  # "the quick brown fox jumps"
        "the quick brown fox jumps over",   # identical to doc 0
        "totally unrelated words here only today",
    ]
    ds = ray.data.from_arrow(_docs(texts)).repartition(3)
    got = dup_ngram_topk(ds, n=5, k=10, min_docs=2).to_pandas()
    got = got.set_index("ngram")["ndocs"].to_dict()
    # the shared 5-gram appears in all three
    assert got["the quick brown fox jumps"] == 3
    # 5-grams unique to the identical pair appear twice
    assert got["quick brown fox jumps over"] == 2
    # nothing from the singleton doc
    assert not any("unrelated" in g for g in got)


def test_dup_ngram_topk_k_cut_deterministic(ray_session):
    # many tied ndocs=2 ngrams -> the k-cut must follow ngram ASC
    texts = ["w x y z a b c d e f", "w x y z a b c d e f"]
    ds = ray.data.from_arrow(_docs(texts)).repartition(2)
    got = dup_ngram_topk(ds, n=5, k=3, min_docs=2).to_pandas()
    all_ngrams = sorted(
        doc_distinct_ngrams_batch(_docs(texts[:1]), n=5)
        .column("ngram")
        .to_pylist()
    )
    assert got["ngram"].tolist() == all_ngrams[:3]
    assert got["ndocs"].tolist() == [2, 2, 2]


# ------------------------------------------------------------ line filter


def test_line_filter_keep_rule():
    t = _docs(["the a b c d\nshort the\nno stopword line here at all"])
    out = line_filter_batch(t, min_words=5, must_contain="the")
    assert out.column("n_lines").to_pylist() == [3]
    assert out.column("n_kept").to_pylist() == [1]
    assert out.column("text").to_pylist() == ["the a b c d"]


def test_line_filter_empty_text_counts_zero_lines():
    out = line_filter_batch(_docs([""]), min_words=1, must_contain="the")
    assert out.column("n_lines").to_pylist() == [0]
    assert out.column("n_kept").to_pylist() == [0]
    assert out.column("text").to_pylist() == [""]


def test_line_filter_preserves_bytes():
    # survivors must be byte-identical slices of the input, re-joined
    lines = ["the alpha beta gamma delta", "the one two three four"]
    t = _docs(["\n".join(lines)])
    out = line_filter_batch(t, min_words=5, must_contain="the")
    assert out.column("text").to_pylist() == ["\n".join(lines)]
