"""Value-level pytests for the round-5 closing queries
(`user_decay_score`, `vocab_novelty`): brute-force pure-Python
references over planted parquet dirs, exercising exactly the edges the
vectorized kernels must get right — document-boundary trigram masking,
sub-3-word documents, the odd/even snapshot split, the age-cap bucket
and the quantize-then-sum integer discipline."""

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(dirpath, name, table):
    pq.write_table(table, str(dirpath / f"{name}.parquet"))


# --- vocab_novelty -----------------------------------------------------------


def ref_trigrams(text):
    ws = text.split(" ")
    return [" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)]


def ref_vocab_novelty(docs):
    new_counts, prior = {}, set()
    for doc_id, text in docs:
        for g in ref_trigrams(text):
            if doc_id % 2 == 1:
                new_counts[g] = new_counts.get(g, 0) + 1
            else:
                prior.add(g)
    rows = [(g, n) for g, n in new_counts.items() if g not in prior]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:50]


def test_vocab_novelty_boundary_mask_and_short_docs(ray_session, tmp_path):
    # Planted so that a BROKEN document-boundary mask changes the answer:
    # doc 1 (new) ends "... u v" and doc 3 (new) starts "w ...": the
    # phantom grams "u v w" / "v w x" exist only if trigrams straddle the
    # boundary in the flat word array. Docs 0/2 (prior) are adjacent too,
    # and doc 5 has <3 words (must contribute nothing).
    docs = [
        (0, "a b c d"),          # prior: "a b c", "b c d"
        (1, "t u v"),            # new:   "t u v"
        (2, "c d e"),            # prior: "c d e"
        (3, "w x y z"),          # new:   "w x y", "x y z"
        (4, "q r"),              # prior, <3 words: nothing
        (5, "m n"),              # new,   <3 words: nothing
        (7, "a b c t u v"),      # new: "a b c"(seen prior!) + 3 more
    ]
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
        "text": pa.array([t for _, t in docs], type=pa.string()),
    }))
    from webextract.queries.textstats import q_vocab_novelty

    got = sorted(
        (r["gram"], r["n"]) for r in q_vocab_novelty(str(tmp_path)).take_all()
    )
    want = sorted(ref_vocab_novelty(docs))
    assert got == want
    # the planted expectation itself: "t u v" occurs in docs 1 and 7,
    # "a b c" is suppressed by the prior slice, no phantom grams
    assert ("t u v", 2) in got
    assert all(not g.startswith("u v") and "v w" not in g for g, _ in got)


def test_vocab_novelty_batch_split_invariance(ray_session, tmp_path):
    # Same corpus through 1 file vs 4 files (different block boundaries)
    # must give identical results — the mask math is per-block.
    rows = [(i, f"w{i % 5} w{(i * 7) % 11} w{(i * 3) % 7} w{i % 4}")
            for i in range(40)]
    one, four = tmp_path / "one", tmp_path / "four"
    one.mkdir(), four.mkdir()
    t = pa.table({
        "doc_id": pa.array([d for d, _ in rows], type=pa.int64()),
        "text": pa.array([x for _, x in rows], type=pa.string()),
    })
    _write(one, "documents", t)
    (four / "documents.parquet").mkdir()
    for j in range(4):
        pq.write_table(t.slice(j * 10, 10),
                       str(four / "documents.parquet" / f"part{j}.parquet"))
    from webextract.queries.textstats import q_vocab_novelty

    a = sorted((r["gram"], r["n"])
               for r in q_vocab_novelty(str(one)).take_all())
    b = sorted((r["gram"], r["n"])
               for r in q_vocab_novelty(str(four)).take_all())
    assert a == b == sorted(ref_vocab_novelty(rows))


# --- user_decay_score --------------------------------------------------------

ANCHOR_US = 1_706_745_600_000_000  # 2024-02-01 00:00:00 UTC


def ref_decay(events):
    out = {}
    for uid, ts_us in events:
        k = min((ANCHOR_US - ts_us) // 86_400_000_000 // 3, 10)
        w = math.floor(1000.0 * 2.0 ** (-k) + 0.5)
        out[uid] = out.get(uid, 0) + int(w)
    return out


def test_user_decay_score_buckets_and_cap(ray_session, tmp_path):
    day_us = 86_400_000_000
    # ages straddling every interesting edge: 0 days (k=0, w=1000),
    # 2.9 days (still k=0), exactly 3 days (k=1, w=500), 29 days (k=9),
    # 31 days (k=10 capped, w≈0.977 -> rounds to 1), 400 days (capped).
    ages_days = [0, 2, 3, 8, 29, 31, 400]
    events = [(100 + i % 3, ANCHOR_US - a * day_us)
              for i, a in enumerate(ages_days)]
    _write(tmp_path, "events", pa.table({
        "user_id": pa.array([u for u, _ in events], type=pa.int64()),
        "ts": pa.array([t for _, t in events], type=pa.timestamp("us")),
    }))
    from webextract.queries.analytics_c import q_user_decay_score

    got = {r["user_id"]: r["decayed_milli"]
           for r in q_user_decay_score(str(tmp_path)).take_all()}
    assert got == ref_decay(events)
    # cap sanity: a 31-day and a 400-day event weigh the same (k=10 -> 1)
    k10 = math.floor(1000.0 * 2.0 ** -10 + 0.5)
    assert k10 == 1


def test_user_decay_score_matches_duckdb_mirror(ray_session, tmp_path):
    import duckdb

    import numpy as np

    rng = np.random.RandomState(7)
    n = 500
    ts = ANCHOR_US - rng.randint(0, 60 * 86_400_000_000, size=n,
                                 dtype=np.int64)
    uid = rng.randint(0, 20, size=n).astype(np.int64)
    _write(tmp_path, "events", pa.table({
        "user_id": pa.array(uid),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
    }))
    from webextract.queries.analytics_c import (
        _SQL_USER_DECAY_SCORE,
        q_user_decay_score,
    )

    got = {r["user_id"]: r["decayed_milli"]
           for r in q_user_decay_score(str(tmp_path)).take_all()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')")
    want = {int(u): int(v)
            for u, v in con.sql(_SQL_USER_DECAY_SCORE).fetchall()}
    assert got == want == ref_decay(list(zip(uid.tolist(), ts.tolist())))


# --- budget_select -----------------------------------------------------------


def test_budget_select_boundary_and_order(ray_session, tmp_path):
    # lang 'en': quality order by n_chars DESC, doc_id ASC; budget 2000.
    # doc 2 (8 tokens each 100 chars...) — plant exact token counts so
    # the inclusive boundary (running == 2000) is exercised.
    rows = [
        # (doc_id, n_tokens, n_chars) — text is n_tokens words
        (1, 900, 500),
        (2, 1100, 400),   # running 2000 exactly -> kept (inclusive)
        (3, 1, 300),      # running 2001 -> dropped
        (4, 50, 200),
    ]
    texts = [" ".join(["w"] * n) for _, n, _ in rows]
    pq.write_table(pa.table({
        "doc_id": pa.array([d for d, _, _ in rows], type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * len(rows), type=pa.string()),
        "n_chars": pa.array([c for _, _, c in rows], type=pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    from webextract.queries.windows_ml import q_budget_select

    got = sorted((r["doc_id"], r["running_tokens"])
                 for r in q_budget_select(str(tmp_path)).take_all())
    assert got == [(1, 900), (2, 2000)]


def test_budget_select_packing_guard_raises(ray_session, tmp_path):
    from webextract.queries.windows_ml import _BSEL_CMAX, q_budget_select

    pq.write_table(pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "text": pa.array(["a b"], type=pa.string()),
        "lang": pa.array(["en"], type=pa.string()),
        "n_chars": pa.array([_BSEL_CMAX], type=pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    with pytest.raises(Exception, match="order-key packing"):
        q_budget_select(str(tmp_path)).take_all()


def test_budget_select_property_vs_bruteforce(ray_session, tmp_path):
    """Randomized (seeded) corpora vs a pure-Python reference: per-lang
    quality order (n_chars DESC, doc_id ASC), inclusive prefix cap.
    One Ray run per corpus (hypothesis-per-example would pay Ray fixed
    costs 100x; three seeded draws cover the shapes: ties in n_chars,
    single-doc langs, over-budget first doc)."""
    import numpy as np

    from webextract.queries.windows_ml import _BUDGET_TOKENS

    for seed in (3, 11, 42):
        rng = np.random.RandomState(seed)
        n = int(rng.randint(20, 120))
        doc_id = rng.choice(10_000, size=n, replace=False).astype(np.int64)
        langs = rng.choice(["en", "de", "zh"], size=n)
        # heavy-tailed token counts so some docs alone bust the budget
        n_tok = np.minimum(
            rng.geometric(1.0 / 300, size=n), 4000).astype(np.int64)
        n_chars = rng.randint(0, 50, size=n).astype(np.int64)  # many ties
        texts = [" ".join(["w"] * int(k)) for k in n_tok]
        d = tmp_path / f"s{seed}"
        d.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array(doc_id), "text": pa.array(texts),
            "lang": pa.array(langs), "n_chars": pa.array(n_chars),
        }), str(d / "documents.parquet"))

        want = []
        for lg in ("en", "de", "zh"):
            idx = [i for i in range(n) if langs[i] == lg]
            idx.sort(key=lambda i: (-n_chars[i], doc_id[i]))
            run = 0
            for i in idx:
                run += int(n_tok[i])
                if run <= _BUDGET_TOKENS:
                    want.append((lg, int(doc_id[i]), int(n_tok[i]), run))

        from webextract.queries.windows_ml import q_budget_select

        got = sorted((r["lang"], r["doc_id"], r["n_tokens"],
                      r["running_tokens"])
                     for r in q_budget_select(str(d)).take_all())
        assert got == sorted(want), f"seed {seed}"
