"""DSIR importance scoring (functions/dsir.py): hand-computed values,
DuckDB cross-check, and the deterministic top-k selection."""

import duckdb
import pyarrow as pa
import ray.data

from webextract.functions.dsir import (
    corpus_token_counts_flagged,
    dsir_scores,
    dsir_select,
)


def _ds(t: pa.Table):
    return ray.data.from_arrow(t)


def _score(t: pa.Table):
    ds = _ds(t)
    r, tt = corpus_token_counts_flagged(ds)
    return dsir_scores(ds, raw_tokens=r, target_tokens=tt)


def test_dsir_hand_computed():
    # raw corpus: "a a b" (target) + "a c" -> R=5, T=3
    # cnt_r: a=3 b=1 c=1; cnt_t: a=2 b=1 c=0
    # bits_r(w) = bl(R // cnt_r): a -> bl(1)=1; b,c -> bl(5)=3
    # bits_t(w) = bl(max(T // (cnt_t+1), 1)): a -> bl(1)=1;
    #             b -> bl(1)=1; c -> bl(3)=2
    # lambda: a=0, b=2, c=1
    t = pa.table({
        "doc_id": [0, 1],
        "text": ["a a b", "a c"],
        "is_target": [True, False],
    })
    ds = _ds(t)
    r, tt = corpus_token_counts_flagged(ds)
    assert (r, tt) == (5, 3)
    out = _score(t).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "n_tokens"] == 3
    assert out.loc[0, "dsir_bits"] == 2 * 0 + 2  # a,a + b
    assert out.loc[1, "dsir_bits"] == 0 + 1  # a + c
    assert out.loc[1, "avg_dsir"] == 0.5
    # target-vocabulary doc scores at least as high per token
    assert out.loc[0, "avg_dsir"] >= out.loc[1, "avg_dsir"]


def test_dsir_matches_duckdb_on_random_corpus():
    # a messier deterministic corpus; oracle computed independently in SQL
    words = ["the", "of", "qq", "zz", "en", "fr", "x1", "y2"]
    texts, flags = [], []
    for i in range(40):
        n = 3 + (i * 7) % 9
        texts.append(" ".join(words[(i * 3 + j * 5) % len(words)]
                              for j in range(n)))
        flags.append(i % 3 == 0)
    t = pa.table({
        "doc_id": list(range(40)), "text": texts, "is_target": flags,
    })
    got = (_score(t).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    want = con.execute("""
WITH w AS (
  SELECT doc_id, is_target AS is_t,
         unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf FROM w GROUP BY 1, 2),
cnt AS (SELECT word, count(*)::BIGINT AS cnt_r,
               sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS cnt_t
        FROM w GROUP BY 1),
tot AS (SELECT count(*)::BIGINT AS r,
               sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS t FROM w)
SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
  sum(tf * (length(bin(tot.r // cnt.cnt_r))
            - length(bin(greatest(tot.t // (cnt.cnt_t + 1), 1)))
           ))::BIGINT AS dsir_bits,
  sum(tf * (length(bin(tot.r // cnt.cnt_r))
            - length(bin(greatest(tot.t // (cnt.cnt_t + 1), 1)))
           ))::DOUBLE / sum(tf) AS avg_dsir
FROM tf JOIN cnt USING (word), tot
GROUP BY doc_id ORDER BY doc_id
""").df()
    assert got["dsir_bits"].tolist() == want["dsir_bits"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
    assert got["avg_dsir"].tolist() == want["avg_dsir"].tolist()


def test_dsir_hashed_equals_exact_when_collision_free():
    # at a wide bucket space with a collision-free corpus vocabulary the
    # bucket counts EQUAL the word counts, so the hashed scores match the
    # exact variant bit-for-bit
    from webextract.functions.dedup import _word_hashes
    from webextract.functions.dsir import dsir_scores_hashed

    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    n_buckets = 1 << 20
    hashes = _word_hashes(words) % n_buckets
    assert len(set(hashes.tolist())) == len(words)  # collision-free width
    texts = [" ".join(words[(i + j) % len(words)] for j in range(4))
             for i in range(12)]
    t = pa.table({
        "doc_id": list(range(12)),
        "text": texts,
        "is_target": [i % 2 == 0 for i in range(12)],
    })
    exact = (_score(t).to_pandas()
             .sort_values("doc_id", ignore_index=True))
    hashed = (dsir_scores_hashed(_ds(t), n_buckets=n_buckets).to_pandas()
              .sort_values("doc_id", ignore_index=True))
    assert hashed["dsir_bits"].tolist() == exact["dsir_bits"].tolist()
    assert hashed["n_tokens"].tolist() == exact["n_tokens"].tolist()
    assert hashed["avg_dsir"].tolist() == exact["avg_dsir"].tolist()


def test_dsir_hashed_batch_size_invariant():
    # the count fold and broadcast scoring must not depend on how docs
    # are split into blocks/batches
    from webextract.functions.dsir import dsir_scores_hashed

    t = pa.table({
        "doc_id": list(range(30)),
        "text": [f"w{i % 7} w{i % 5} common" for i in range(30)],
        "is_target": [i % 4 == 0 for i in range(30)],
    })
    one = (dsir_scores_hashed(_ds(t), n_buckets=256).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    many = (dsir_scores_hashed(
        ray.data.from_arrow(t).repartition(8), n_buckets=256).to_pandas()
        .sort_values("doc_id", ignore_index=True))
    assert one["dsir_bits"].tolist() == many["dsir_bits"].tolist()
    assert one["n_tokens"].tolist() == many["n_tokens"].tolist()


def test_dsir_null_flag_and_null_text():
    # NULL is_target == non-target (SQL CASE semantics); NULL text
    # tokenizes as the empty-string token. Without the fill_null guards
    # the numpy conversion turned a null flag into INT64_MIN bincount
    # weights, silently corrupting every lambda (code-review find).
    from webextract.functions.dsir import dsir_scores_hashed

    t = pa.table({
        "doc_id": [0, 1, 2],
        "text": ["a a b", None, "a c"],
        "is_target": [True, None, False],
    })
    ref = pa.table({
        "doc_id": [0, 1, 2],
        "text": ["a a b", "", "a c"],
        "is_target": [True, False, False],
    })
    got = (_score(t).to_pandas().sort_values("doc_id", ignore_index=True))
    want = (_score(ref).to_pandas().sort_values("doc_id", ignore_index=True))
    assert got["dsir_bits"].tolist() == want["dsir_bits"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
    got_h = (dsir_scores_hashed(_ds(t), n_buckets=64).to_pandas()
             .sort_values("doc_id", ignore_index=True))
    want_h = (dsir_scores_hashed(_ds(ref), n_buckets=64).to_pandas()
              .sort_values("doc_id", ignore_index=True))
    assert got_h["dsir_bits"].tolist() == want_h["dsir_bits"].tolist()


def test_dsir_select_topk_tiebreak():
    t = pa.table({
        "doc_id": [3, 1, 2, 0],
        "text": ["b b", "a", "b b", "c"],
        "is_target": [True, False, False, False],
    })
    out = dsir_select(_score(t), k=3).to_pandas()
    # R=6 T=2; lambda: b=0 (cnt_r=4,cnt_t=2), a=1, c=1 -> scores:
    # doc0=1, doc1=1, doc2=0, doc3=0. Ties (0,1) and (2,3) break by
    # doc_id ascending; k=3 keeps [0, 1, 2].
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["dsir_bits"].tolist() == [1, 1, 0]
    assert list(out.columns) == ["doc_id", "dsir_bits"]
