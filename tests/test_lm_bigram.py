"""Bigram-LM scoring (functions/lm.py bigram_lm_scores): hand-computed
conditional-information values plus the short-doc / NULL-text edge cases
that the SQL oracle's GROUP BY silently drops."""

import pyarrow as pa
import ray.data

from webextract.functions.lm import bigram_lm_scores


def _ds(table: pa.Table, blocks: int = 3):
    return ray.data.from_arrow(table).repartition(blocks)


def test_bigram_lm_hand_computed():
    # doc0 "a b a b c": bigrams (a,b)x2 (b,a) (b,c); doc1 "a b": (a,b)
    # corpus: cnt(a,b)=3 cnt(b,a)=1 cnt(b,c)=1; ctx(a)=3 ctx(b)=2
    # bits = bit_length(ctx // cnt): (a,b)->bl(1)=1 (b,a)->bl(2)=2
    # (b,c)->bl(2)=2
    t = pa.table({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["a b a b c", "a b", "x", None, ""],
    })
    out = bigram_lm_scores(_ds(t)).to_pandas().set_index("doc_id")
    # docs with <2 words (incl. NULL/empty text) emit no row at all,
    # matching the oracle's GROUP BY over an empty bigram set
    assert sorted(out.index) == [0, 1]
    assert out.loc[0, "n_bigrams"] == 4
    assert out.loc[0, "lm2_bits"] == 2 * 1 + 2 + 2
    assert out.loc[0, "avg_bits2"] == 6 / 4
    assert out.loc[1, "n_bigrams"] == 1
    assert out.loc[1, "lm2_bits"] == 1
    assert out.loc[1, "avg_bits2"] == 1.0
    # the doc repeating the corpus-dominant bigram scores lower per
    # bigram than... actually doc1 uses only the dominant bigram ->
    # strictly lower average than doc0 which mixes in rare ones
    assert out.loc[1, "avg_bits2"] < out.loc[0, "avg_bits2"]


def test_bigram_lm_all_short_docs_empty():
    """A corpus of only <2-word docs yields 0 rows but must keep its
    typed output schema (union schema anchor; Ray's to_pandas drops
    columns on all-empty datasets, so assert on the Arrow blocks)."""
    import ray

    t = pa.table({"doc_id": [0, 1], "text": ["one", None]})
    out = bigram_lm_scores(_ds(t, blocks=2))
    assert out.count() == 0
    tbls = [tb for tb in ray.get(out.to_arrow_refs()) if tb.num_columns]
    assert tbls, "no typed block survived an all-empty result"
    assert tbls[0].schema.names == ["doc_id", "n_bigrams", "lm2_bits",
                                    "avg_bits2"]
