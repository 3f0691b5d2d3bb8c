"""Locality-aware NMS: score-weighted merge of adjacent/overlapping spans.

The analog of the reference's EAST postprocess merge
(`mindocr/postprocess/nms_py/lanms_py.py:26-60`): EAST decodes one box per
pixel, then lanms walks boxes in geometry order, MERGING each box into the
running candidate when they overlap (weighted by score) instead of simply
suppressing — standard NMS only runs afterwards on the merged candidates.

1-D span version (byte intervals):

* walk spans in byte order;
* while the next span overlaps the running candidate at IoU >= merge_thresh,
  merge: boundaries become the SCORE-WEIGHTED average of the two (the
  `weight_merge` rule), scores add (evidence accumulates);
* emit candidates, then standard suppression: drop any candidate whose IoU
  with a higher-scoring kept one is >= nms_thresh.

Deterministic; pure function usable inside any segmentation strategy.
"""

from __future__ import annotations

from typing import Dict, List


def _iou(a0: float, a1: float, b0: float, b1: float) -> float:
    inter = max(0.0, min(a1, b1) - max(a0, b0))
    union = (a1 - a0) + (b1 - b0) - inter
    return inter / union if union > 0 else 0.0


def lanms_merge(spans: List[Dict], *, merge_thresh: float = 0.3,
                nms_thresh: float = 0.5) -> List[Dict]:
    """Merge-then-suppress span dicts ({start, end, kind, score})."""
    if not spans:
        return []
    ordered = sorted(spans, key=lambda s: (s["start"], s["end"]))

    merged: List[Dict] = []
    cur = dict(ordered[0])
    cur_w = float(cur["score"])
    cur_fs = cur["start"] * cur_w
    cur_fe = cur["end"] * cur_w
    for s in ordered[1:]:
        if _iou(cur["start"], cur["end"], s["start"], s["end"]) >= merge_thresh:
            w = float(s["score"])
            cur_fs += s["start"] * w
            cur_fe += s["end"] * w
            cur_w += w
            cur["start"] = cur_fs / cur_w
            cur["end"] = cur_fe / cur_w
            cur["score"] = cur_w  # accumulated evidence
        else:
            merged.append(cur)
            cur = dict(s)
            cur_w = float(cur["score"])
            cur_fs = cur["start"] * cur_w
            cur_fe = cur["end"] * cur_w
    merged.append(cur)

    # standard NMS over the merged candidates, highest score first
    merged.sort(key=lambda s: (-s["score"], s["start"]))
    kept: List[Dict] = []
    for s in merged:
        if all(_iou(s["start"], s["end"], k["start"], k["end"]) < nms_thresh
               for k in kept):
            kept.append(s)
    kept.sort(key=lambda s: (s["start"], s["end"]))
    # round boundaries ONLY at the end (det_base_postprocess.py:110-128
    # discipline) so repeated merges never compound rounding error
    for s in kept:
        s["start"] = int(round(s["start"]))
        s["end"] = int(round(s["end"]))
    return kept
