"""PSE-style segmentation strategy: kernel detection + region growing.

The analog of the reference's progressive-scale-expansion postprocess
(`mindocr/postprocess/det_pse_postprocess.py:40-150` + the Cython BFS in
`mindocr/postprocess/pse/pse.pyx`): PSE finds SMALL high-confidence kernels
and grows them outward pixel-by-pixel until regions meet. The DOM analog:

* **kernels** = blocks that pass the strict thresholds (text floor, link
  density) — exactly the blocks DB-mode (`segment_html`) would emit;
* **growing** = BFS over sibling adjacency: a non-kernel candidate block
  (too short, or link-dense) that sits DIRECTLY adjacent to a kernel in the
  same parent element is absorbed into the kernel's region, and growth
  continues from it — so a caption or link-heavy sentence between two
  paragraphs joins its surrounding region instead of being dropped;
* regions that touch merge (the "labels meet" rule), and each region emits
  ONE span [min start, max end] with kind="region".

This is a genuinely different segmentation than DB-mode (coarser regions,
recall-leaning), registered as `strategy="pse"` on the `segment` op — the
pluggable-strategy surface of the reference's postprocess registry
(`mindocr/postprocess/builder.py:40-67`).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from webextract.html.tokenizer import VOID_TAGS, get_attr, iter_events
from webextract.stages.segment import (
    _PDF_MAGIC,
    SegmentConfig,
    _is_boiler_attrs,
    segment_pdf,
)

_WS_BYTES = b" \t\r\n\f\v"


class _Cand:
    __slots__ = ("start", "end", "parent", "tag", "text_len", "link_len",
                 "nodes", "boiler")

    def __init__(self, start: int, parent: int, tag: str = "p"):
        self.start = start
        self.end = start
        self.parent = parent
        self.tag = tag
        self.text_len = 0
        self.link_len = 0
        self.nodes = 0  # contributing text nodes (EAST proposal density)
        self.boiler = False


def _scan_candidates(html: bytes, cfg: SegmentConfig) -> List[_Cand]:
    """All non-boiler candidate blocks (kernel or not) in byte order, each
    tagged with its parent element uid for sibling adjacency."""
    block_tags = cfg.block_tags
    cands: List[_Cand] = []
    open_blocks: List[_Cand] = []
    elem_stack: List[Tuple[str, bool, int]] = []  # (tag, is_boiler, uid)
    boiler_depth = 0
    anchor_depth = 0
    uid = 0

    for ev in iter_events(html):
        k = ev[0]
        if k == "text":
            if open_blocks:
                tl = len(html[ev[1] : ev[2]].strip(_WS_BYTES))
                if tl:
                    blk = open_blocks[-1]
                    blk.text_len += tl
                    blk.nodes += 1
                    if anchor_depth > 0:
                        blk.link_len += tl
        elif k == "open":
            tag, a0, a1 = ev[1], ev[2], ev[3]
            if tag in VOID_TAGS:
                continue
            boiler_here = (
                tag in cfg.boiler_containers
                or _is_boiler_attrs(html, a0, a1, cfg.boiler_class_hints)
            )
            uid += 1
            elem_stack.append((tag, boiler_here, uid))
            if boiler_here:
                boiler_depth += 1
            if tag == "a":
                anchor_depth += 1
            if tag in block_tags:
                parent = elem_stack[-2][2] if len(elem_stack) > 1 else 0
                c = _Cand(ev[5], parent, tag)
                c.boiler = boiler_depth > 0
                open_blocks.append(c)
        elif k == "close":
            tag = ev[1]
            if tag == "a" and anchor_depth > 0:
                anchor_depth -= 1
            for i in range(len(elem_stack) - 1, -1, -1):
                if elem_stack[i][0] == tag:
                    for j in range(len(elem_stack) - 1, i - 1, -1):
                        if elem_stack[j][1]:
                            boiler_depth -= 1
                    del elem_stack[i:]
                    break
            if tag in block_tags and any(b.tag == tag for b in open_blocks):
                # close the innermost MATCHING block, finalizing unclosed
                # descendants at the close position too (mirrors
                # segment._scan_blocks — popping blindly dropped nested
                # unclosed blocks' text, e.g. <div><p>a<p>b</div>)
                while open_blocks:
                    blk = open_blocks.pop()
                    blk.end = ev[2]
                    if not blk.boiler and blk.text_len > 0:
                        cands.append(blk)
                    if blk.tag == tag:
                        break
    cands.sort(key=lambda c: c.start)
    return cands


def segment_pse(html: bytes, cfg: Optional[SegmentConfig] = None) -> List[dict]:
    """PSE-analog segmentation: bytes -> region span dicts (module doc)."""
    cfg = cfg or SegmentConfig()
    if html[:5] == _PDF_MAGIC:
        return segment_pdf(html, cfg)
    cands = _scan_candidates(html, cfg)
    if not cands:
        return []

    def is_kernel(c: _Cand) -> bool:
        if c.text_len < max(cfg.min_text_len, 1):
            return False
        return c.link_len / c.text_len <= cfg.max_link_density

    n = len(cands)
    labels = [-1] * n
    # seed one region per kernel (left to right)
    region = 0
    for i, c in enumerate(cands):
        if is_kernel(c):
            labels[i] = region
            region += 1
    if region == 0:
        return []
    # BFS growth over sibling adjacency: an unlabeled candidate adjacent
    # (prev/next in byte order, same parent) to a labeled one takes its
    # label; iterate until no change (regions expand one step per round,
    # the progressive-scale-expansion schedule).
    changed = True
    while changed:
        changed = False
        for i in range(n):
            if labels[i] < 0:
                for j in (i - 1, i + 1):
                    if 0 <= j < n and labels[j] >= 0 \
                            and cands[j].parent == cands[i].parent:
                        labels[i] = labels[j]
                        changed = True
                        break
    # "labels meet" rule: two regions bridged by an absorbed NON-KERNEL
    # connector merge (union-find); bare adjacent kernels stay separate,
    # like PSE kernels separated by background.
    root = list(range(region))

    def find(x: int) -> int:
        while root[x] != x:
            root[x] = root[root[x]]
            x = root[x]
        return x

    for i in range(n - 1):
        a, b = labels[i], labels[i + 1]
        if a < 0 or b < 0 or cands[i].parent != cands[i + 1].parent:
            continue
        if not (is_kernel(cands[i]) and is_kernel(cands[i + 1])):
            ra, rb = find(a), find(b)
            if ra != rb:
                root[max(ra, rb)] = min(ra, rb)

    out = []
    i = 0
    while i < n:
        if labels[i] < 0:
            i += 1
            continue
        lab = find(labels[i])
        start = cands[i].start
        end = cands[i].end
        tl = cands[i].text_len
        ll = cands[i].link_len
        j = i + 1
        while j < n and labels[j] >= 0 and find(labels[j]) == lab:
            end = cands[j].end
            tl += cands[j].text_len
            ll += cands[j].link_len
            j += 1
        score = 1.0 - (ll / tl if tl else 1.0)
        out.append({"start": start, "end": end, "kind": "region",
                    "score": score})
        i = j
        if len(out) >= cfg.max_candidates:
            break
    return out
