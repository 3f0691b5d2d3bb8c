"""EAST-style segmentation strategy: dense proposals + locality-aware merge.

The analog of the reference's EAST postprocess
(`mindocr/postprocess/det_east_postprocess.py` + `nms_py/lanms_py.py`):
EAST predicts one candidate box PER PIXEL of a text region, then
locality-aware NMS weight-merges the near-duplicate proposals and standard
NMS prunes what remains. The DOM analog:

* every TEXT NODE inside a candidate block emits one proposal spanning its
  enclosing block's bounds (the "per-pixel geometry" — a block with three
  text nodes yields three coincident proposals, denser evidence);
* `lanms_merge` (stages/lanms.py) weight-merges coincident proposals —
  identical intervals average to themselves EXACTLY, so merged bounds stay
  byte-precise — and suppresses residual overlaps; the merged score is the
  accumulated evidence (EAST's summed confidences).

On linear documents this reproduces `segment_html`'s spans through an
entirely different mechanism (pinned by test); like real EAST it carries no
reading-order model, so column-layout reordering is the DB strategy's
domain (document-recovery logic lives in `sorted_layout_boxes`, not the
detector — same split as the reference).
"""

from __future__ import annotations

from typing import List, Optional

from webextract.stages.lanms import lanms_merge
from webextract.stages.segment import _PDF_MAGIC, SegmentConfig, segment_pdf
from webextract.stages.segment_pse import _scan_candidates


def segment_east(html: bytes, cfg: Optional[SegmentConfig] = None) -> List[dict]:
    """Per-text-node proposals -> weighted merge -> NMS -> span dicts."""
    cfg = cfg or SegmentConfig()
    if html[:5] == _PDF_MAGIC:
        return segment_pdf(html, cfg)
    proposals: List[dict] = []
    for c in _scan_candidates(html, cfg):
        if c.text_len < cfg.min_text_len:
            continue
        ld = c.link_len / c.text_len
        if ld > cfg.max_link_density:
            continue
        score = 1.0 - ld
        for _ in range(max(1, c.nodes)):
            proposals.append(
                {"start": c.start, "end": c.end, "kind": c.tag, "score": score}
            )
    merged = lanms_merge(proposals, merge_thresh=0.99, nms_thresh=0.5)
    # re-normalize accumulated evidence to the per-block score so the
    # downstream drop_score threshold keeps its meaning
    out = []
    for m in merged[: cfg.max_candidates]:
        out.append(
            {"start": m["start"], "end": m["end"], "kind": m["kind"],
             "score": min(1.0, m["score"])}
        )
    return out
