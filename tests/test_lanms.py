"""Locality-aware NMS span merge (lanms_py.py:26-60 analog)."""

from webextract.stages.lanms import lanms_merge


def s(start, end, score=1.0, kind="p"):
    return {"start": start, "end": end, "kind": kind, "score": score}


def test_overlapping_spans_weight_merge():
    out = lanms_merge([s(0, 100, 1.0), s(10, 110, 3.0)])
    assert len(out) == 1
    # weighted boundaries: (0*1 + 10*3)/4 = 7.5 -> 8; (100+330)/4 = 107.5 -> 108
    assert (out[0]["start"], out[0]["end"]) == (8, 108)
    assert out[0]["score"] == 4.0  # evidence accumulates


def test_disjoint_spans_untouched():
    out = lanms_merge([s(0, 10), s(50, 60)])
    assert [(o["start"], o["end"]) for o in out] == [(0, 10), (50, 60)]


def test_chain_merge_is_locality_aware():
    # three overlapping spans collapse into one running candidate
    out = lanms_merge([s(0, 100), s(20, 120), s(40, 140)])
    assert len(out) == 1


def test_post_merge_nms_suppresses_duplicates():
    # two merged candidates that still overlap heavily: lower score dropped
    out = lanms_merge(
        [s(0, 100, 5.0), s(2, 98, 1.0)], merge_thresh=0.99, nms_thresh=0.5
    )
    assert len(out) == 1 and out[0]["score"] == 5.0


def test_empty():
    assert lanms_merge([]) == []
