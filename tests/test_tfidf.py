"""Unit tests for the distributed TF-IDF operator (functions/tfidf.py)."""

import pyarrow as pa
import ray.data

from webextract.functions.tfidf import tfidf_topk


def _docs_table():
    return pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": [
            "apple banana apple cherry",   # apple tf=2
            "banana banana banana date",   # banana tf=3
            "apple cherry cherry cherry",  # cherry tf=3
        ],
    })


def test_tfidf_scores_and_ranking(ray_session):
    ds = ray.data.from_arrow(_docs_table()).repartition(3)
    out = tfidf_topk(ds, n_docs=3, k=2).to_pandas()
    rows = {(r.doc_id, r.word): (r.tf, r.df, r.score)
            for r in out.itertuples()}
    # df: apple 2, banana 2, cherry 2, date 1
    # doc0: apple score 2*3/2=3.0, cherry 1*3/2=1.5, banana 1.5 ->
    #       top2 = apple, banana (tie 1.5 breaks on word asc)
    assert rows[(0, "apple")] == (2, 2, 3.0)
    assert (0, "banana") in rows and (0, "cherry") not in rows
    # doc1: date 1*3/1=3.0, banana 3*3/2=4.5 -> banana, date
    assert rows[(1, "banana")] == (3, 2, 4.5)
    assert rows[(1, "date")] == (1, 1, 3.0)
    # doc2: cherry 3*3/2=4.5, apple 2*... apple tf=1 -> 1.5
    assert rows[(2, "cherry")] == (3, 2, 4.5)
    assert len(out) == 6  # k=2 for each of 3 docs


def test_tfidf_k_larger_than_vocab(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([5], pa.int64()), "text": ["solo solo"]}))
    out = tfidf_topk(ds, n_docs=1, k=10).to_pandas()
    assert len(out) == 1
    assert out.word[0] == "solo" and out.tf[0] == 2 and out.df[0] == 1
