"""Metric tests with hand-computed cases (reference: tests/ut/test_metrics.py
uses 3 known polygons incl. one ignored; same spirit on 1-D spans)."""

import pyarrow as pa
import pytest
import ray.data

from webextract.functions.metrics import (
    norm_edit_distance,
    span_prf,
    verify_extraction,
)


def test_span_prf_hand_case():
    # gold: [0,10) real, [20,30) real, [40,50) ignored
    gold = [(0, 10), (20, 30), (40, 50)]
    ignore = [False, False, True]
    # pred: one exact hit, one miss at [100,110), one absorbed by ignore
    pred = [(0, 10), (100, 110), (41, 49)]
    r = span_prf(pred, gold, ignore)
    assert (r["tp"], r["fp"], r["fn"]) == (1, 1, 1)
    assert r["precision"] == 0.5 and r["recall"] == 0.5 and r["f1"] == 0.5


def test_span_prf_perfect():
    gold = [(0, 5), (10, 20)]
    r = span_prf(gold, gold)
    assert r["f1"] == 1.0


def test_span_prf_iou_threshold():
    # 4/12 overlap -> IoU = 4/16 = 0.25 < 0.5: no match
    r = span_prf([(0, 8)], [(4, 16)])
    assert r["tp"] == 0


def test_span_prf_empty_cases():
    assert span_prf([], [])["f1"] == 1.0
    assert span_prf([(0, 1)], [])["precision"] == 0.0
    assert span_prf([], [(0, 1)])["recall"] == 0.0


def test_verify_extraction_counts():
    t = pa.table(
        {
            "text": ["a", "b", "WRONG", ""],
            "gold_text": ["a", "b", "c", "d"],
            "status": ["ok", "ok", "ok", "error"],
        }
    )
    m = verify_extraction(ray.data.from_arrow(t))
    assert m["n_docs"] == 4 and m["n_ok"] == 3 and m["n_error"] == 1
    assert m["n_match"] == 2
    assert m["pass_rate"] == pytest.approx(2 / 3)


def test_norm_edit_distance():
    assert norm_edit_distance("abc", "abc") == 1.0
    assert norm_edit_distance("abc", "abd") == pytest.approx(2 / 3)
    assert norm_edit_distance("", "abc") == 0.0


def test_eval_rec_fixture():
    """spans_rec-style evaluation: fragments with known gold (FIXTURES §3)."""
    import ray.data

    from webextract.functions.metrics import eval_rec

    rows = [
        {"block_html": b"<b>exact</b> match", "gold_text": "exact match",
         "case": "nested-inline"},
        {"block_html": b"fish &amp; chips", "gold_text": "fish & chips",
         "case": "entity-refs"},
        {"block_html": b"  a \n b  ", "gold_text": "a b",
         "case": "whitespace-runs"},
        {"block_html": b"wrong", "gold_text": "right", "case": "miss"},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    m = eval_rec(ds)
    assert m["n"] == 4
    assert m["acc"] == pytest.approx(0.75)
    # "wrong" vs "right" is 5 substitutions -> ned 0; mean = 3/4 exactly
    assert m["norm_edit_dis"] == pytest.approx(0.75)


def test_eval_rec_via_converter(tmp_path):
    """Full spans_rec path: rec label lines -> converter -> eval_rec."""
    import base64

    import ray.data

    from webextract.functions.metrics import eval_rec
    from webextract.sources.converters import rec_labels_to_spans

    lines = [
        base64.b64encode(b"<p>hello</p>").decode() + "\thello",
        base64.b64encode(b"caf\xc3\xa9").decode() + "\tcafé",
    ]
    ds = ray.data.from_arrow(pa.table({"line": lines})).map_batches(
        rec_labels_to_spans, batch_format="pyarrow"
    )
    m = eval_rec(ds)
    assert m["n"] == 2 and m["acc"] == 1.0
