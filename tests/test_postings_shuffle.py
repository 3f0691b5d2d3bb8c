"""Pins for inverted-index postings (functions/ngrams.inverted_index)
and the deterministic training-order shuffle
(functions/sampling.shuffle_index)."""

import hashlib

import pyarrow as pa
import pytest
import ray.data

from webextract.functions.ngrams import inverted_index
from webextract.functions.sampling import shuffle_index


def _docs(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts))), "text": pa.array(texts)}
    )


# --------------------------------------------------------------- postings


def test_inverted_index_basic(ray_session):
    ds = ray.data.from_arrow(
        _docs(["a b a", "b c", "c a"])
    ).repartition(2)
    got = inverted_index(ds).to_pandas().set_index("word")
    assert got.loc["a", "postings"] == "0,2"
    assert got.loc["a", "df"] == 2
    assert got.loc["b", "postings"] == "0,1"
    assert got.loc["c", "postings"] == "1,2"
    assert got.df.sum() == 6  # per-doc distinct: 'a' twice in doc 0 = once


def test_inverted_index_max_group_raises(ray_session):
    ds = ray.data.from_arrow(_docs(["hot x%d" % i for i in range(8)]))
    with pytest.raises(Exception, match="max_group"):
        inverted_index(ds, max_group=4).to_pandas()


# --------------------------------------------------------- shuffle_index


def test_shuffle_index_is_md5_order_permutation(ray_session):
    ids = list(range(0, 400, 3))
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64())})
    got = (
        shuffle_index(ray.data.from_arrow(t).repartition(5))
        .to_pandas()
        .sort_values("pos")
    )
    assert sorted(got.pos.tolist()) == list(range(len(ids)))
    expect = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    assert got.doc_id.tolist() == expect


def test_shuffle_index_layout_invariant(ray_session):
    ids = list(range(123))
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64())})
    a = (
        shuffle_index(ray.data.from_arrow(t).repartition(2))
        .to_pandas().sort_values("doc_id").pos.tolist()
    )
    b = (
        shuffle_index(ray.data.from_arrow(t).repartition(9))
        .to_pandas().sort_values("doc_id").pos.tolist()
    )
    assert a == b
