"""Text-analysis operator tests."""

import pyarrow as pa

from webextract.functions.textstats import (
    fingerprint_batch,
    lang_id,
    quality_stats_batch,
    rolling_hashes,
)


def test_quality_stats_matches_split_semantics():
    b = pa.table({"text": ["a b  c", "one"]})
    out = quality_stats_batch(b)
    # len(text.split(' ')): 'a b  c' -> ['a','b','','c'] = 4 tokens
    assert out.column("n_tokens").to_pylist() == [4, 1]
    assert out.column("n_chars_c").to_pylist() == [6, 3]


def test_fingerprint_is_md5_hex():
    import hashlib

    b = pa.table({"text": ["hello"]})
    out = fingerprint_batch(b)
    assert out.column("fp")[0].as_py() == hashlib.md5(b"hello").hexdigest()


def test_lang_id_heuristics():
    assert lang_id("the cat is in the house and that is fine") == "en"
    assert lang_id("der hund ist nicht in das haus und die katze") == "de"
    assert lang_id("你好世界这是一个中文测试文本需要足够长") == "zh"
    assert lang_id("") == "und"
    assert lang_id("xyzzy plugh") == "und"


def test_lang_id_deterministic_tiebreak():
    assert lang_id("la") == lang_id("la")


def test_rolling_hashes():
    h1 = rolling_hashes("abcdefgh", window=4)
    h2 = rolling_hashes("abcdefgh", window=4)
    assert h1 == h2
    assert len(h1) == 5  # n - window + 1
    # shifted content shares interior window hashes
    h3 = rolling_hashes("xabcdefgh", window=4)
    assert set(h1) & set(h3)
    assert rolling_hashes("ab", window=4)  # short input still hashes


def test_bpe_tokens():
    from webextract.functions.textstats import bpe_tokens, bpe_token_count_batch

    assert bpe_tokens("don't stop-me now!") == [
        "don", "'", "t", "stop", "-", "me", "now", "!"
    ]
    b = pa.table({"text": ["a, b", ""]})
    out = bpe_token_count_batch(b)
    assert out.column("n_bpe_tokens").to_pylist() == [3, 0]


def test_quality_score_ranges():
    from webextract.functions.textstats import quality_score

    clean = quality_score("the quick brown fox jumps over the lazy dog")
    junk = quality_score("@@@@ #### !!!! %%%% ^^^^ &&&& **** ((((")
    assert clean["quality"] > 0.9
    assert junk["quality"] < 0.3
    assert junk["punct_ratio"] > clean["punct_ratio"]
    assert quality_score("")["quality"] == 0.0


def test_quality_score_stopwords():
    from webextract.functions.textstats import quality_score

    assert quality_score("the cat and the dog")["stopword_ratio"] == 0.6


def test_quality_score_batch_matches_scalar():
    """Vectorized batch path must match the scalar reference exactly."""
    import pyarrow as pa

    from webextract import corpus
    from webextract.functions.textstats import quality_score, quality_score_batch

    texts = [corpus.make_text(i) for i in range(50)] + [
        "", " ", "a", "Hello, World! 42", "@@@@ ####", "ünïcödé wörds",
        "中文 文本 测试", "multi\nline\ttext here", None,
    ]
    out = quality_score_batch(pa.table({"text": pa.array(texts, type=pa.string())}))
    for i, s in enumerate(texts):
        r = quality_score(s or "")
        for k in ("alpha_ratio", "punct_ratio", "stopword_ratio",
                  "mean_word_len", "quality"):
            assert abs(out.column(k)[i].as_py() - round(r[k], 6)) < 1e-9, (s, k)


def test_repetition_stats():
    from webextract.functions.textstats import repetition_stats_batch

    t = pa.table({"text": ["a b\na b\nc d", "x y x y x y", "", "solo"]})
    out = repetition_stats_batch(t)
    assert out.column("dup_line_frac").to_pylist() == [2 / 3, 0.0, 0.0, 0.0]
    assert out.column("dup_line_char_frac").to_pylist() == [
        6 / 9, 0.0, 0.0, 0.0]
    # 'x y' occurs 3x, len 3, text len 11
    assert out.column("top_2gram_char_frac").to_pylist() == [
        6 / 11, 9 / 11, 0.0, 0.0]


def test_repetition_stats_tie_break():
    from webextract.functions.textstats import repetition_stats_batch

    # 'b c' and 'a b' both occur twice -> lexicographically smallest wins
    t = pa.table({"text": ["a b c a b c"]})
    out = repetition_stats_batch(t)
    # top gram 'a b' count 2 len 3 over 11 chars
    assert out.column("top_2gram_char_frac").to_pylist() == [6 / 11]
