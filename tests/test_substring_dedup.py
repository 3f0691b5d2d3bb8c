"""ExactSubstr-style duplicated-substring removal (functions/substring.py):
pure-Python reference equivalence on planted spans, SQL NULL/empty text
semantics, batch-split invariance, and the forced bucket-index path."""

from collections import Counter

import pyarrow as pa
import ray.data

from webextract.functions.substring import substring_dedup


def _ref(docs, k):
    """Independent pure-Python reference: remove every word position
    covered by a word k-gram occurring >= 2 times corpus-wide."""
    grams = Counter()
    words = {}
    for did, text in docs:
        ws = [] if text is None else text.split(" ")
        words[did] = ws
        for i in range(max(len(ws) - k + 1, 0)):
            grams[tuple(ws[i:i + k])] += 1
    out = {}
    for did, ws in words.items():
        cov = [False] * len(ws)
        for i in range(max(len(ws) - k + 1, 0)):
            if grams[tuple(ws[i:i + k])] >= 2:
                for j in range(i, i + k):
                    cov[j] = True
        kept = [w for w, c in zip(ws, cov) if not c]
        out[did] = (" ".join(kept), len(kept), len(ws) - len(kept))
    return out


SPAN = "alpha beta gamma delta epsilon zeta"
DOCS = [
    (1, f"intro words {SPAN} tail one"),
    (2, f"other head {SPAN} closing remarks here"),
    (3, "entirely unique document with no repeats at all"),
    (4, "short"),
    (5, None),
    (6, ""),
    (7, f"{SPAN} {SPAN}"),  # within-doc repeat also counts
]


def _run(docs, k, n_blocks=3):
    tables = []
    step = max(1, len(docs) // n_blocks)
    for i in range(0, len(docs), step):
        chunk = docs[i:i + step]
        tables.append(pa.table({
            "doc_id": pa.array([d for d, _ in chunk], type=pa.int64()),
            "text": pa.array([t for _, t in chunk], type=pa.string()),
        }))
    out = substring_dedup(lambda: ray.data.from_arrow(tables), k=k)
    got = {}
    for r in out.take_all():
        got[r["doc_id"]] = (r["text_kept"], r["n_kept"], r["n_removed"])
    return got


def test_matches_reference_k5():
    assert _run(DOCS, 5) == _ref(DOCS, 5)


def test_matches_reference_k2_and_k1():
    # k=2 removes the span's interior aggressively; k=1 removes every
    # repeated WORD (incl. the NULL doc's phantom-gram guard)
    for k in (2, 1):
        assert _run(DOCS, k) == _ref(DOCS, k)


def test_null_and_empty_text_semantics():
    got = _run(DOCS, 5)
    assert got[5] == ("", 0, 0)      # NULL text: zero words
    assert got[6] == ("", 1, 0)      # empty string: ONE empty word, kept
    assert got[4] == ("short", 1, 0)  # shorter than k: untouched


def test_within_doc_repeat_removed_everywhere():
    got = _run(DOCS, 5)
    # doc 7 is two copies of the span: every position is covered
    assert got[7] == ("", 0, 12)
    # the span is also removed from docs 1 and 2 (all copies go)
    assert "gamma" not in got[1][0] and "gamma" not in got[2][0]
    assert got[1][0].startswith("intro words") and got[1][0].endswith("tail one")


def test_batch_split_invariance():
    assert _run(DOCS, 5, n_blocks=1) == _run(DOCS, 5, n_blocks=7)


def test_forced_bucket_path(monkeypatch):
    import webextract.functions.dedup as dd

    monkeypatch.setattr(dd, "_SMALL_WINNERS_MAX", 0)  # force bucket path
    assert _run(DOCS, 5) == _ref(DOCS, 5)


def test_ssjoin_verify_transport_parity(ray_session):
    """The measured broadcast-texts verify path and the hash_join verify
    path return identical pairs and jac values."""
    import pandas as pd

    from webextract.functions.ssjoin import ssjoin_pairs

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon").split()
    texts = []
    for i in range(10):
        words = [base[(j * (i + 3) + i) % len(base)] for j in range(30)]
        texts.append(" ".join(words))
        mut = list(words)
        mut[7] = "CHANGED"
        texts.append(" ".join(mut))
    t = pa.table({"doc_id": pa.array(range(20), type=pa.int64()),
                  "text": pa.array(texts)})

    def run(bmax):
        df = ssjoin_pairs(ray.data.from_arrow(t).repartition(4),
                          threshold=0.7,
                          broadcast_texts_max=bmax).to_pandas()
        return df.sort_values(["id_a", "id_b"], ignore_index=True)

    broadcast, joined = run(1 << 16), run(0)
    pd.testing.assert_frame_equal(broadcast, joined)
    assert len(broadcast) >= 1
