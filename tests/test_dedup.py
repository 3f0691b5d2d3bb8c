"""Dedup operator tests: minhash/simhash determinism + LSH pipeline on
constructed duplicates."""

import numpy as np
import pyarrow as pa
import ray.data

from webextract.functions.dedup import (
    MinHasher,
    band_keys,
    est_jaccard,
    exact_dedup,
    hamming64,
    jaccard,
    minhash_signature,
    neardup_pairs,
    shingle_hashes,
    simhash64,
)

TEXT_A = "the quick brown fox jumps over the lazy dog again and again today"
TEXT_B = "the quick brown fox jumps over the lazy dog again and again tomorrow"
TEXT_C = "completely different content about ray data pipelines and arrow tables"


def test_shingles_deterministic():
    a1, a2 = shingle_hashes(TEXT_A), shingle_hashes(TEXT_A)
    assert np.array_equal(a1, a2)
    assert len(a1) > 0


def test_minhash_similar_texts_agree_more():
    sa, sb, sc = (minhash_signature(t) for t in (TEXT_A, TEXT_B, TEXT_C))
    assert est_jaccard(sa, sb) > est_jaccard(sa, sc)
    assert est_jaccard(sa, sa) == 1.0


def test_jaccard_exact():
    assert jaccard(TEXT_A, TEXT_A) == 1.0
    assert jaccard(TEXT_A, TEXT_C) < 0.1


def test_band_keys_match_for_identical_sigs():
    sa = minhash_signature(TEXT_A)
    assert band_keys(sa) == band_keys(minhash_signature(TEXT_A))


def test_simhash_properties():
    h1, h2, h3 = simhash64(TEXT_A), simhash64(TEXT_B), simhash64(TEXT_C)
    assert h1 == simhash64(TEXT_A)
    assert hamming64(h1, h2) < hamming64(h1, h3)
    assert simhash64("") == 0


def test_exact_dedup_dataset():
    t = pa.table({"fp": ["x", "x", "y"], "doc_id": [5, 2, 9]})
    out = exact_dedup(ray.data.from_arrow(t), "fp", "doc_id").take_all()
    assert sorted((r["fp"], r["doc_id"]) for r in out) == [("x", 2), ("y", 9)]


def test_neardup_pairs_finds_planted_dups():
    rows = {"doc_id": [1, 2, 3, 4], "text": [TEXT_A, TEXT_B, TEXT_C, TEXT_A]}
    ds = ray.data.from_arrow(pa.table(rows))
    # bands=16 (r=4): P(collide) for est-jaccard 0.75 pair is ~99.8%, so the
    # near-dup reliably surfaces; with the default 8 bands it's a coin flip.
    pairs = neardup_pairs(ds, threshold=0.5, bands=16, concurrency=1).take_all()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    assert (1, 4) in found  # exact duplicate pair must surface
    assert (1, 2) in found  # near duplicate
    assert (1, 3) not in found and (2, 3) not in found


def test_minhasher_batch_udf():
    batch = pa.table({"doc_id": [1], "text": [TEXT_A]})
    out = MinHasher()(batch)
    assert out.column("minhash")[0].as_py() == minhash_signature(TEXT_A).tolist()
    assert len(out.column("band_key")[0].as_py()) == 8


def test_winner_filter_payloads_never_shuffled(tmp_path, monkeypatch):
    import webextract.functions.dedup as dd
    from webextract.functions.dedup import winner_filter

    monkeypatch.setattr(dd, "_SMALL_WINNERS_MAX", 0)  # force bucket path

    # ids spread across many range buckets (bucket_width=8 -> 13 buckets)
    ids = list(range(0, 100))
    payload = [f"payload-{i}" for i in ids]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ids, "text": payload})
    ).repartition(5)
    winners = ray.data.from_arrow(
        pa.table({"doc_id": [i for i in ids if i % 3 == 0]})
    )
    out = winner_filter(ds, winners, "doc_id",
                        tmp_dir=str(tmp_path / "wf"), bucket_width=8,
                        concurrency=1).take_all()
    got = sorted((r["doc_id"], r["text"]) for r in out)
    assert got == [(i, f"payload-{i}") for i in ids if i % 3 == 0]


def test_winner_filter_keep_first_end_to_end(tmp_path, monkeypatch):
    import webextract.functions.dedup as dd
    from webextract.functions.dedup import exact_dedup, winner_filter

    monkeypatch.setattr(dd, "_SMALL_WINNERS_MAX", 0)  # force bucket path

    # planted dups: 10<->11 and 12<->13 share text; keep-first = min doc_id
    texts = {10: "aa", 11: "aa", 12: "bb", 13: "bb", 14: "cc"}
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(texts), "text": list(texts.values())})
    )
    keys = ds.map_batches(
        lambda b: pa.table(
            {"fp": [t for t in b.column("text").to_pylist()],
             "doc_id": b.column("doc_id")}
        ),
        batch_format="pyarrow",
    )
    winners = exact_dedup(keys, "fp", "doc_id").select_columns(["doc_id"])
    # the winners side carries ONLY the key column — the payload dataset is
    # filtered map-side (never enters a groupby/union shuffle)
    assert winners.schema().names == ["doc_id"]
    out = winner_filter(ds, winners, "doc_id",
                        tmp_dir=str(tmp_path / "wf"), concurrency=1).take_all()
    assert sorted((r["doc_id"], r["text"]) for r in out) == [
        (10, "aa"), (12, "bb"), (14, "cc")
    ]


def test_winner_filter_object_store_no_filesystem(tmp_path, monkeypatch):
    """Default (no tmp_dir) mode must work when the filter stage cannot see
    any filesystem the dump stage wrote to: buckets travel via the object
    store only. We assert no parquet side files are ever written by making
    pq.write_table raise inside this process tree's dedup module."""
    import webextract.functions.dedup as dd

    def boom(*a, **k):  # pragma: no cover - must never be called
        raise AssertionError("winner_filter wrote a side file in object mode")

    monkeypatch.setattr("pyarrow.parquet.write_table", boom)
    monkeypatch.setattr(dd, "_SMALL_WINNERS_MAX", 0)  # force bucket path
    ids = list(range(0, 60))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ids, "text": [f"p{i}" for i in ids]})
    ).repartition(4)
    winners = ray.data.from_arrow(
        pa.table({"doc_id": [i for i in ids if i % 5 == 0]}))
    out = dd.winner_filter(ds, winners, "doc_id", bucket_width=16,
                           concurrency=1).take_all()
    assert sorted(r["doc_id"] for r in out) == [i for i in ids if i % 5 == 0]


def test_winner_filter_negative_and_random_keys(monkeypatch):
    """Floor-division bucketing: negative keys must land in the SAME bucket
    on the dump and probe sides (ADVICE round-3 medium: pc.divide truncates
    toward zero while numpy // floors — keys like -5 were silently lost).
    Keys arrive in a random (non-monotone) layout to exercise multi-bucket
    probes."""
    import webextract.functions.dedup as dd
    from webextract.functions.dedup import winner_filter

    monkeypatch.setattr(dd, "_SMALL_WINNERS_MAX", 0)  # force bucket path
    rng = np.random.default_rng(7)
    ids = rng.permutation(np.arange(-50, 50)).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ids, "text": [f"p{i}" for i in ids]})
    ).repartition(3)
    keep = sorted(int(i) for i in ids if i % 3 == 0)  # includes negatives
    winners = ray.data.from_arrow(pa.table({"doc_id": keep}))
    out = winner_filter(ds, winners, "doc_id", bucket_width=8,
                        concurrency=1).take_all()
    assert sorted(r["doc_id"] for r in out) == keep
    assert any(k < 0 for k in keep)


def test_winner_filter_hash_mode_uniform_buckets(monkeypatch):
    """mode="hash": SplitMix64 bucketing must (a) keep dump/probe sides
    consistent for positive AND negative keys, (b) spread a pathologically
    narrow key range (all keys inside one range-bucket width) across many
    hash buckets — the skew robustness the mode exists for."""
    import webextract.functions.dedup as dd
    from webextract.functions.dedup import (
        _hash_bucket_ids,
        publish_buckets,
        winner_filter,
    )

    monkeypatch.setattr(dd, "_SMALL_WINNERS_MAX", 0)  # force bucket path
    rng = np.random.default_rng(11)
    # all keys inside [-40, 60): ONE range bucket at width 2^16, but hash
    # mode must spread them
    ids = rng.permutation(np.arange(-40, 60)).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ids, "text": [f"p{i}" for i in ids]})
    ).repartition(3)
    keep = sorted(int(i) for i in ids if i % 4 == 0)
    winners = ray.data.from_arrow(pa.table({"doc_id": keep}))
    out = winner_filter(ds, winners, "doc_id", mode="hash", num_buckets=16,
                        concurrency=1).take_all()
    assert sorted(r["doc_id"] for r in out) == keep
    assert any(k < 0 for k in keep)
    # uniformity: the winner ids hash into >1 bucket (range mode would
    # put them all into bucket -1/0 at the default width)
    bids = _hash_bucket_ids(np.array(keep, dtype=np.int64), 16)
    assert len(np.unique(bids)) > 4

    # index metadata round-trips through publish for probe-side reuse
    idx = publish_buckets(winners, "doc_id", mode="hash", num_buckets=16)
    mask = idx.allowed(np.array([keep[0], keep[0] + 1], dtype=np.int64))
    assert mask.tolist() == [True, (keep[0] + 1) in keep]


def test_winner_filter_have_cap_fallback(monkeypatch):
    """Above _HAVE_CAP manifest rows the driver-side `have` probe-shortcut
    set is skipped (trillion-doc tiers); membership must still be exact —
    a missing bucket reads as empty from the store."""
    import webextract.functions.dedup as dd

    monkeypatch.setattr(dd, "_HAVE_CAP", 0)
    monkeypatch.setattr(dd, "_SMALL_WINNERS_MAX", 0)  # force bucket path
    ids = list(range(200))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ids, "text": [f"p{i}" for i in ids]})
    ).repartition(4)
    keep = [i for i in ids if i % 7 == 0]
    winners = ray.data.from_arrow(pa.table({"doc_id": keep}))
    out = dd.winner_filter(ds, winners, "doc_id", bucket_width=16,
                           concurrency=1).take_all()
    assert sorted(r["doc_id"] for r in out) == keep


def test_winner_filter_broadcast_small_path():
    """Winner sets at or below _SMALL_WINNERS_MAX ship as ONE sorted
    broadcast block (ArrayIndex) and the filter runs task-based — same
    results as the bucket path, including negative keys and a random
    (non-monotone) key layout."""
    import webextract.functions.dedup as dd

    rng = np.random.default_rng(13)
    ids = rng.permutation(np.arange(-30, 70)).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ids, "text": [f"p{i}" for i in ids]})
    ).repartition(3)
    keep = sorted(int(i) for i in ids if i % 3 == 0)
    winners = ray.data.from_arrow(pa.table({"doc_id": keep}))
    idx = dd.publish_winners(winners, "doc_id")
    assert isinstance(idx, dd.ArrayIndex)  # under the bound -> broadcast
    out = dd.winner_filter(ds, winners, "doc_id").take_all()
    assert sorted(r["doc_id"] for r in out) == keep
    assert any(k < 0 for k in keep)


def test_winner_filter_broadcast_empty_winners():
    ids = list(range(20))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": ids, "text": [f"p{i}" for i in ids]}))
    winners = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], type=pa.int64())}))
    from webextract.functions.dedup import winner_filter

    assert winner_filter(ds, winners, "doc_id").count() == 0


def test_array_index_membership_exact():
    from webextract.functions.dedup import ArrayIndex

    arr = np.array([-9, -1, 0, 4, 7, 123456], dtype=np.int64)
    idx = ArrayIndex(ray.put(arr), arr.size)
    probe = np.array([-10, -9, -1, 1, 4, 8, 123456, 999999], dtype=np.int64)
    assert idx.allowed(probe).tolist() == [
        False, True, True, False, True, False, True, False]
    empty = ArrayIndex(ray.put(np.empty(0, dtype=np.int64)), 0)
    assert empty.allowed(probe).tolist() == [False] * probe.size
    assert idx.allowed(np.empty(0, dtype=np.int64)).size == 0


def test_incremental_dedup_planted_cross_snapshot(tmp_path):
    """Planted cross-snapshot duplicates: prior slice (doc_id % 4 != 3)
    already holds texts "dup-A" and "dup-B"; the new slice (doc_id % 4
    == 3) re-crawls both, carries one internal duplicate pair, and two
    genuinely new texts. Survivors = first-by-id of each unseen text."""
    import duckdb
    import pandas as pd

    from webextract.queries.dedup import (
        _SQL_INCREMENTAL_DEDUP,
        q_incremental_dedup,
    )

    rows = [
        # prior corpus (doc_id % 4 != 3)
        (0, "dup-A", "en"),
        (1, "dup-B", "en"),
        (2, "prior only text", "en"),
        # new slice (doc_id % 4 == 3)
        (3, "dup-A", "en"),          # seen in prior -> dropped
        (7, "fresh text one", "en"),  # kept
        (11, "fresh text one", "de"),  # internal dup -> dropped (7 wins)
        (15, "dup-B", "fr"),          # seen in prior -> dropped
        (19, "fresh text two", "en"),  # kept
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    import pyarrow.parquet as pq

    pq.write_table(t, tmp_path / "documents.parquet")

    got = (
        q_incremental_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [7, 19]
    assert got["text"].tolist() == ["fresh text one", "fresh text two"]

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = (
        con.sql(_SQL_INCREMENTAL_DEDUP)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
