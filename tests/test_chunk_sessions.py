"""Chunking + sessionization operator tests."""

import datetime

import pyarrow as pa
import ray.data

from webextract.functions.chunking import chunk_batch, chunk_documents
from webextract.functions.sessions import sessionize, sessionize_group


def test_chunk_boundaries():
    t = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                  "text": [" ".join(str(i) for i in range(150))]})
    out = chunk_batch(t, max_tokens=64)
    assert out.column("chunk_idx").to_pylist() == [0, 1, 2]
    assert out.column("n_tokens").to_pylist() == [64, 64, 22]
    joined = " ".join(out.column("chunk_text").to_pylist())
    assert joined == t.column("text")[0].as_py()


def test_chunk_short_and_empty():
    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": ["one two", ""]})
    out = chunk_batch(t, max_tokens=64)
    assert out.num_rows == 2  # '' splits to [''] -> one 1-token chunk
    assert out.column("n_tokens").to_pylist() == [2, 1]


def test_chunk_dataset(ray_session):
    t = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                  "text": [" ".join("w" for _ in range(100))]})
    out = chunk_documents(ray.data.from_arrow(t), max_tokens=30).take_all()
    assert len(out) == 4


def _events(user, times_min, base_id=0):
    base = datetime.datetime(2024, 1, 1)
    return [
        {
            "user_id": user,
            "event_id": base_id + i,
            "ts": base + datetime.timedelta(minutes=m),
        }
        for i, m in enumerate(times_min)
    ]


def test_sessionize_group_gap_split():
    rows = _events(7, [0, 10, 20, 60, 65, 200])
    g = pa.Table.from_pylist(rows)
    out = sessionize_group(g, gap_minutes=30)
    assert out.column("session_idx").to_pylist() == [0, 1, 2]
    assert out.column("n_events").to_pylist() == [3, 2, 1]
    assert out.column("first_event").to_pylist() == [0, 3, 5]


def test_sessionize_exact_gap_is_same_session():
    rows = _events(1, [0, 30])
    out = sessionize_group(pa.Table.from_pylist(rows), gap_minutes=30)
    assert out.num_rows == 1  # gap == 30min is NOT > 30min


def test_sessionize_dataset_multi_user(ray_session):
    rows = _events(1, [0, 5, 100], 0) + _events(2, [0, 200], 10)
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = sessionize(ds).take_all()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r)
    assert len(per_user[1]) == 2 and len(per_user[2]) == 2
