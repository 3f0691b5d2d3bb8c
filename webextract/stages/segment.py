"""Detect stage: block segmentation over raw HTML/PDF bytes.

The analog of DBNet detection + `DBPostprocess`
(`mindocr/postprocess/det_db_postprocess.py:16-184`): where the reference
thresholds a probability map, finds contours, filters by per-contour mean
score and unclips boxes, this stage walks the tokenizer event stream, scores
candidate DOM blocks by text/link density, filters by score and container
context (threshold + box_thresh analogs), suppresses non-leaf candidates
(NMS-over-nested-boxes analog, cf. `layout_postprocess.py:_nms`), and emits
byte-offset spans into the ORIGINAL buffer (round/clip only at the end,
`det_base_postprocess.py:110-128` discipline).

Runs as `map_batches(BlockSegmenter, batch_format="pyarrow", concurrency=N)`
— an actor pool like the reference's detector replicas
(`deploy/py_infer/src/parallel/module/detection/det_pre_node.py:12-16`);
state (config, compiled patterns) lives in `__init__`, once per actor.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import FrozenSet, List, Optional, Tuple

import pyarrow as pa

from webextract.html.tokenizer import VOID_TAGS, get_attr, iter_events


@dataclass(frozen=True)
class SegmentConfig:
    """Detect-stage thresholds (the `binary_thresh`/`box_thresh`/
    `max_candidates` analogs of DBPostprocess, det_db_postprocess.py:18-35)."""

    block_tags: FrozenSet[str] = frozenset(
        {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote", "td"}
    )
    # Containers whose entire subtree is boilerplate (readability-style).
    boiler_containers: FrozenSet[str] = frozenset({"nav", "aside", "footer", "header"})
    # class/id substrings that mark a subtree as boilerplate.
    boiler_class_hints: Tuple[str, ...] = (
        "comment", "sidebar", "nav", "footer", "banner", "advert", "promo",
    )
    max_link_density: float = 0.35  # box_thresh analog: drop link-farm blocks
    min_text_len: int = 1
    max_candidates: int = 1000  # max_candidates analog (det_db_postprocess.py:36)
    # div-soup fallback: when no semantic block tag yields a candidate,
    # rescan treating leaf <div>s as blocks (with a higher text floor).
    div_fallback: bool = True
    fallback_min_text_len: int = 10
    # opt-in legacy-charset fallback: payloads that fail strict UTF-8 are
    # decoded with this encoding instead of being quarantined (e.g.
    # "latin-1"). Default None = quarantine (deterministic corpus contract).
    fallback_encoding: object = None


_PDF_MAGIC = b"%PDF-"

# `<meta charset=...>` / `content="...; charset=..."` label in the head
_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)",
                         re.IGNORECASE)


def sniff_charset(html: bytes, limit: int = 2048):
    """Declared-charset sniff for payloads that fail strict UTF-8: the
    first ``charset=`` label within the head region, validated against the
    codec registry. Returns None for utf-8 labels (strict decode already
    failed — re-trying cannot succeed, so truncated/corrupt pages keep
    their deterministic quarantine) and for unknown labels."""
    m = _CHARSET_RE.search(html, 0, limit)
    if m is None:
        return None
    label = m.group(1).decode("ascii").lower()
    if label in ("utf-8", "utf8"):
        return None
    import codecs

    try:
        codecs.lookup(label)
    except LookupError:
        return None
    return label
# Fake-PDF text op: `( ... ) Tj` with PDF string escapes (corpus.render_pdf).
_PDF_TJ_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)\s*Tj", re.DOTALL)

_WS_BYTES = b" \t\r\n\f\v"
_WS_SET = frozenset(_WS_BYTES)

# raw tag bytes -> lowered str (tag vocabularies are tiny; avoids one
# .lower().decode() pair per tag event in the hot scanner)
_TAG_CACHE: dict = {}


@dataclass
class _Block:
    tag: str
    start: int  # content start (byte offset past the open tag)
    okey: Tuple = ()  # reading-order sort key (layout-aware)
    text_len: int = 0
    link_len: int = 0
    boiler: bool = False
    has_child: bool = False


def _is_boiler_attrs(html: bytes, a0: int, a1: int, hints: Tuple[str, ...]) -> bool:
    if a1 <= a0:
        return False
    for name in ("class", "id"):
        val = get_attr(html, a0, a1, name)
        if val:
            low = val.lower()
            for h in hints:
                if h.encode("ascii") in low:
                    return True
    return False


def _col_of(html: bytes, a0: int, a1: int) -> Optional[int]:
    """Column ordinal from the class attr: the x-position hint of our
    layout analog (`sorted_layout_boxes`, recovery_to_doc.py:90-160 — the
    reference infers columns from box x-geometry; CSS column classes are
    the web-document equivalent). Returns 0/1/2 for left/mid/right and -1
    for a full-width SPANNING block (the triple-layout "new section"
    marker)."""
    if a1 <= a0:
        return None
    cls = get_attr(html, a0, a1, "class")
    if not cls:
        return None
    low = cls.lower()
    if b"col-span" in low:
        return -1
    if b"col-left" in low:
        return 0
    if b"col-mid" in low or b"col-center" in low:
        return 1
    if b"col-right" in low:
        return 2
    return None


def segment_pdf(html: bytes, cfg: SegmentConfig) -> List[dict]:
    """PDF branch: spans over the parenthesized `Tj` string payloads."""
    spans = []
    for m in _PDF_TJ_RE.finditer(html):
        spans.append(
            {"start": m.start(1), "end": m.end(1), "kind": "pdf", "score": 1.0}
        )
        if len(spans) >= cfg.max_candidates:
            break
    return spans


def segment_html(html: bytes, cfg: SegmentConfig = SegmentConfig()) -> List[dict]:
    """Pure per-document segmentation: bytes -> list of span dicts.

    Single pass; maintains an open-block stack. Text is attributed to the
    innermost open block; blocks that contain a finalized child block are
    suppressed (leaf-preference = nested-box NMS).

    Pages with no semantic block tags at all (div-soup) fall back to a
    second pass over leaf `div`s with a text-length floor — the
    density-over-generic-regions behavior of readability-style extractors
    (and of DBPostprocess scoring arbitrary contours, not known shapes).
    """
    if html[:5] == _PDF_MAGIC:
        return segment_pdf(html, cfg)
    spans = _scan_blocks(html, cfg, cfg.block_tags, cfg.min_text_len)
    if not spans and cfg.div_fallback:
        spans = _scan_blocks(
            html, cfg, frozenset({"div"}), cfg.fallback_min_text_len
        )
    return spans


def _inspect_attrs(html: bytes, a0: int, a1: int, hints: Tuple[str, ...]):
    """ONE pass over an open tag's attrs: (is_boiler, col_idx_or_None).

    Fetches `class` once and reuses it for both the boiler-hint check and
    the column-layout hint; `id` is only consulted when class gave no
    boiler verdict (profile: get_attr was 3x per tag before)."""
    # C-level substring gate before the attr regex: most attr strings have
    # no class/id at all, and a failed regex search costs ~10x a bytes.find
    cls = (get_attr(html, a0, a1, "class")
           if html.find(b"class", a0, a1) >= 0 else None)
    boiler = False
    col = None
    if cls:
        low = cls.lower()
        for h in hints:
            if h in low:
                boiler = True
                break
        if b"col-span" in low:
            col = -1  # spanning block: resets the column group
        elif b"col-left" in low:
            col = 0
        elif b"col-mid" in low or b"col-center" in low:
            col = 1
        elif b"col-right" in low:
            col = 2
    if not boiler:
        idv = (get_attr(html, a0, a1, "id")
               if html.find(b"id", a0, a1) >= 0 else None)
        if idv:
            low = idv.lower()
            for h in hints:
                if h in low:
                    boiler = True
                    break
    return boiler, col


def _scan_blocks(html: bytes, cfg: SegmentConfig, block_tags, min_text_len: int) -> List[dict]:
    """Single fused pass: tokenizer inlined into the block scanner.

    Event semantics are identical to `iter_events` (pinned by the tokenizer
    and segmenter test suites); inlining removes one tuple allocation plus a
    generator switch per event — the dominant allocator churn of the hot
    path at 32 cores (profile round 2).
    """
    from webextract.html.tokenizer import (
        _CLOSE_RE,
        _OPEN_RE,
        _SCRIPT_END,
        _STYLE_END,
    )

    boiler_containers = cfg.boiler_containers
    hints = tuple(h.encode("ascii") for h in cfg.boiler_class_hints)

    candidates: List[Tuple[int, int, str, float]] = []  # start, end, kind, score
    stack: List[_Block] = []  # open candidate blocks, innermost last
    # open-block tag multiset: membership test for close tags without
    # scanning `stack` (the per-close genexp was measurable at 32-wide)
    open_block_tags: dict = {}
    boiler_depth = 0
    anchor_depth = 0
    # Full element stack of (tag, is_boiler) for EVERY open non-void tag.
    # Boiler scope ends only when the element that STARTED it closes — a
    # plain nested same-tag child (e.g. <div> inside <div class="sidebar">)
    # pops its own entry, never the container's. Closing an element also
    # implicitly closes any unclosed descendants above it on the stack.
    elem_stack: List[Tuple[str, bool]] = []
    # Column-layout context (sorted_layout_boxes analog): entries are
    # (elem_depth_of_col_div, group_anchor_byte, col_idx); a "group" is a
    # run of sibling column divs sharing one parent — all its blocks sort
    # at the group anchor, ordered (col, byte), so a right-column-first
    # byte layout still reads left column first.
    col_stack: List[Tuple[int, int, int]] = []
    last_group: Optional[Tuple[int, int]] = None  # (parent_depth, anchor)

    max_candidates = cfg.max_candidates
    max_link_density = cfg.max_link_density
    n = len(html)
    pos = 0
    find = html.find
    tag_cache = _TAG_CACHE

    ws = _WS_SET

    def on_text(t0: int, t1: int) -> None:
        if stack:
            # stripped length WITHOUT the slice+strip byte copies: the old
            # `len(html[t0:t1].strip())` allocated (and immediately freed)
            # every text node's body — the allocator/DRAM churn BASELINE.md
            # measured as the 32-wide per-doc CPU inflation. End-trimming
            # by index touches only the whitespace margins.
            while t0 < t1 and html[t0] in ws:
                t0 += 1
            while t1 > t0 and html[t1 - 1] in ws:
                t1 -= 1
            tl = t1 - t0
            if tl:
                blk = stack[-1]
                blk.text_len += tl
                if anchor_depth > 0:
                    blk.link_len += tl

    def on_close(tag: str, close_start: int) -> None:
        nonlocal anchor_depth, boiler_depth, last_group
        if tag == "a" and anchor_depth > 0:
            anchor_depth -= 1
        # Pop the innermost matching element plus unclosed descendants;
        # a stray close tag with no open match is ignored. Fast path: the
        # overwhelmingly common well-nested close matches the stack top.
        if elem_stack and elem_stack[-1][0] == tag:
            if elem_stack[-1][1]:
                boiler_depth -= 1
            elem_stack.pop()
        else:
            for i in range(len(elem_stack) - 1, -1, -1):
                if elem_stack[i][0] == tag:
                    for j in range(len(elem_stack) - 1, i - 1, -1):
                        if elem_stack[j][1]:
                            boiler_depth -= 1
                    del elem_stack[i:]
                    break
        depth = len(elem_stack)
        while col_stack and col_stack[-1][0] > depth:
            col_stack.pop()
        if last_group is not None and depth < last_group[0]:
            last_group = None
        if open_block_tags.get(tag):
            # close innermost matching block (pop unclosed inner blocks too)
            while stack:
                blk = stack.pop()
                open_block_tags[blk.tag] -= 1
                done = blk.tag == tag
                end = close_start  # close-tag start = content end
                if (
                    not blk.boiler
                    and not blk.has_child
                    and blk.text_len >= min_text_len
                ):
                    ld = blk.link_len / blk.text_len
                    if ld <= max_link_density:
                        candidates.append(
                            (blk.okey, blk.start, end, blk.tag, 1.0 - ld)
                        )
                if done:
                    break

    while pos < n and len(candidates) < max_candidates:
        lt = find(b"<", pos)
        if lt < 0:
            if stack:
                on_text(pos, n)
            break
        if lt > pos and stack:
            # guarded + inlined hot path: text outside any open block (head
            # content, inter-tag whitespace) costs one truth test, and
            # in-block text skips the function-call overhead entirely
            t0, t1 = pos, lt
            while t0 < t1 and html[t0] in ws:
                t0 += 1
            while t1 > t0 and html[t1 - 1] in ws:
                t1 -= 1
            if t1 > t0:
                blk = stack[-1]
                blk.text_len += t1 - t0
                if anchor_depth > 0:
                    blk.link_len += t1 - t0
        nxt = html[lt + 1] if lt + 1 < n else 0  # int peek: no slice alloc
        if nxt == 0x21:  # '!'
            # comments / doctype contribute nothing (skip events)
            if html[lt + 1 : lt + 4] == b"!--":
                end = find(b"-->", lt + 4)
                pos = n if end < 0 else end + 3
            else:
                end = find(b">", lt + 2)
                pos = n if end < 0 else end + 1
        elif nxt == 0x3F:  # '?'
            end = find(b">", lt + 2)
            pos = n if end < 0 else end + 1
        elif nxt == 0x2F:  # '/'
            # fast path: a well-formed close tag's name runs exactly to the
            # first '>' (valid names contain no quotes, so the first '>' is
            # always the tag end) — one small slice + dict hit replaces the
            # regex match OBJECT + .group/.end calls (allocator churn is the
            # 32-wide inflation term, BASELINE.md)
            gt = find(b">", lt + 2)
            if gt < 0:
                break
            raw = html[lt + 2 : gt]
            tag = tag_cache.get(raw)
            if tag is not None:
                on_close(tag, lt)
                pos = gt + 1
            else:
                m = _CLOSE_RE.match(html, lt)
                if m is None:
                    pos = gt + 1  # broken close: swallow to '>'
                else:
                    raw = m.group(1)
                    tag = tag_cache.get(raw)
                    if tag is None:
                        tag = raw.lower().decode("ascii")
                        if len(tag_cache) < 4096:
                            tag_cache[raw] = tag
                    on_close(tag, lt)
                    pos = m.end()
        else:
            # fast path: an ATTRIBUTE-LESS open tag (`<p>`, `<li>`, ...) is
            # name-then-'>' — when the slice up to the first '>' is a pure
            # tag name there is nothing quoted, so that '>' really ends the
            # tag and the regex (whose job is quote-aware attr parsing) is
            # pure overhead. Anything else — attrs, self-close, stray '<' —
            # falls through to _OPEN_RE unchanged.
            m = None
            tag = None
            # cheap bare-tag gate: only take the fast path when the name is
            # short and immediately followed by '>' (a find bounded to 12
            # bytes; attr-ful tags fail fast without slicing)
            gt = find(b">", lt + 1, lt + 12)
            if gt > lt:
                raw = html[lt + 1 : gt]
                tag = tag_cache.get(raw)
                if tag is None and raw.isalnum() and 0x41 <= raw[0]:
                    # same name grammar as _OPEN_RE minus '-' (dashed
                    # custom elements take the regex path)
                    tag = raw.lower().decode("ascii")
                    if len(tag_cache) < 4096:
                        tag_cache[raw] = tag
            if tag is not None:
                content_start = gt + 1
                pos = content_start
            else:
                m = _OPEN_RE.match(html, lt)
                if m is None:
                    on_text(lt, lt + 1)  # stray '<' = 1-byte text node
                    pos = lt + 1
                    continue
                raw = m.group(1)
                tag = tag_cache.get(raw)
                if tag is None:
                    tag = raw.lower().decode("ascii")
                    if len(tag_cache) < 4096:
                        tag_cache[raw] = tag
                content_start = m.end()
                pos = content_start
            if tag not in VOID_TAGS:
                if m is not None and m.end(2) > m.start(2):
                    boiler_here, col_here = _inspect_attrs(
                        html, m.start(2), m.end(2), hints)
                else:
                    boiler_here, col_here = False, None
                if tag in boiler_containers:
                    boiler_here = True
                if col_here is not None:
                    if col_here < 0:
                        # SPANNING block ("new section",
                        # recovery_to_doc.py triple layout): end the
                        # current column group — later column divs at
                        # the same depth anchor a FRESH group, so the
                        # spanning block reads between the two groups.
                        last_group = None
                    else:
                        parent_depth = len(elem_stack)
                        if (last_group is not None
                                and last_group[0] == parent_depth):
                            anchor = last_group[1]
                        else:
                            anchor = lt  # first col div tag = anchor
                            last_group = (parent_depth, anchor)
                        col_stack.append(
                            (parent_depth + 1, anchor, col_here))
                elem_stack.append((tag, boiler_here))
                if boiler_here:
                    boiler_depth += 1
                if tag == "a":
                    anchor_depth += 1
                if tag in block_tags:
                    if stack:
                        stack[-1].has_child = True
                    if col_stack:
                        _, ganchor, ci = col_stack[-1]
                        okey = (ganchor, ci + 1, content_start)
                    else:
                        okey = (content_start, 0, content_start)
                    stack.append(
                        _Block(tag=tag, start=content_start, okey=okey,
                               boiler=boiler_depth > 0)
                    )
                    open_block_tags[tag] = \
                        open_block_tags.get(tag, 0) + 1
            # start==end: empty group(3) — the no-alloc self-close test
            # (fast-path tags, m None, are never self-closed)
            if (tag == "script" or tag == "style") \
                    and (m is None or m.start(3) == m.end(3)):
                endre = _SCRIPT_END if tag == "script" else _STYLE_END
                em = endre.search(html, content_start)
                if em is None:
                    break  # unterminated raw text: stream ends
                on_close(tag, em.start())
                pos = em.end()

    # reading order: byte order for linear documents, (group anchor, column,
    # byte) for column layouts — sorted_layout_boxes semantics
    candidates.sort(key=lambda c: c[0])
    return [
        {"start": s, "end": e, "kind": t, "score": sc}
        for (_, s, e, t, sc) in candidates[: cfg.max_candidates]
    ]


class BlockSegmenter:
    """Actor-pool batch UDF: pages batch -> spans + cropped block fragments.

    Emits `spans` (byte offsets into the original payload) plus `block_html`
    (the sliced fragment bytes per span) and DROPS the heavy `html` column --
    the faithful mapping of the reference's det stage, which crops sub-images
    and ships only the crops downstream to recognition
    (`deploy/py_infer/src/parallel/module/detection/det_post_node.py:19-52`,
    including its explicit `data`/`frame` free for memory). Only the compact
    fragments cross the object store to the extract stage.

    Rows whose payload fails strict UTF-8 validation (and is not PDF) are
    quarantined via `status='error'` instead of crashing the job -- the
    deterministic replacement for the reference's skip-corrupt-record path
    (`decode_node.py:27-42`); its random-resample-on-error
    (`det_dataset.py:105-110`) is deliberately NOT ported (nondeterministic).

    Output columns are built from flat value arrays + offsets
    (`pa.ListArray.from_arrays`) -- no per-row Python dict materialization in
    the hot path.
    """

    def __init__(self, cfg: Optional[SegmentConfig] = None,
                 strategy: str = "db"):
        self.cfg = cfg or SegmentConfig()
        # pluggable segmentation strategy (the reference's postprocess
        # registry surface, mindocr/postprocess/builder.py:40-67):
        # "db" = DBPostprocess analog (leaf blocks), "pse" = PSE-analog
        # kernel + region growing (webextract/stages/segment_pse.py)
        if strategy == "db":
            self.segment = segment_html
        elif strategy == "pse":
            from webextract.stages.segment_pse import segment_pse

            self.segment = segment_pse
        elif strategy == "east":
            from webextract.stages.segment_east import segment_east

            self.segment = segment_east
        else:
            raise ValueError(f"unknown segmentation strategy {strategy!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        segment = self.segment
        offsets = [0]
        f_starts: List[int] = []
        f_ends: List[int] = []
        f_kinds: List[str] = []
        f_scores: List[float] = []
        f_frags: List[bytes] = []
        status_col: List[str] = []
        error_col: List[str] = []
        doctype_col: List[str] = []
        encoding_col: List[str] = []
        for html in batch.column("html").to_pylist():
            if html is None:
                status_col.append("error")
                error_col.append("null-payload")
                doctype_col.append("")
                encoding_col.append("")
                offsets.append(len(f_starts))
                continue
            if html[:5] == _PDF_MAGIC:
                spans = segment_pdf(html, cfg)
                doctype_col.append("pdf")
                encoding_col.append("utf-8")
            else:
                encoding = "utf-8"
                try:
                    # ASCII fast path (valid UTF-8, no validation str alloc)
                    if not html.isascii():
                        html.decode("utf-8", "strict")
                except UnicodeDecodeError:
                    # declared charset first (<meta charset=...> sniff),
                    # then the configured legacy fallback, else quarantine
                    sniffed = sniff_charset(html)
                    if sniffed is not None:
                        try:
                            html.decode(sniffed, "strict")
                            encoding = sniffed
                        except UnicodeDecodeError:
                            sniffed = None
                    if encoding == "utf-8":
                        if cfg.fallback_encoding:
                            encoding = str(cfg.fallback_encoding)
                        else:
                            status_col.append("error")
                            error_col.append("utf8-decode")
                            doctype_col.append("")
                            encoding_col.append("")
                            offsets.append(len(f_starts))
                            continue
                spans = segment(html, cfg)
                doctype_col.append("html")
                encoding_col.append(encoding)
            status_col.append("ok")
            error_col.append("")
            for s in spans:
                f_starts.append(s["start"])
                f_ends.append(s["end"])
                f_kinds.append(s["kind"])
                f_scores.append(s["score"])
                f_frags.append(html[s["start"] : s["end"]])
            offsets.append(len(f_starts))

        off = pa.array(offsets, type=pa.int32())
        struct = pa.StructArray.from_arrays(
            [
                pa.array(f_starts, type=pa.int64()),
                pa.array(f_ends, type=pa.int64()),
                pa.array(f_kinds, type=pa.string()),
                pa.array(f_scores, type=pa.float64()),
            ],
            names=["start", "end", "kind", "score"],
        )
        spans_arr = pa.ListArray.from_arrays(off, struct)
        frags_arr = pa.ListArray.from_arrays(off, pa.array(f_frags, type=pa.binary()))
        return (
            batch.drop_columns(["html"])
            .append_column("spans", spans_arr)
            .append_column("block_html", frags_arr)
            .append_column("status", pa.array(status_col, type=pa.string()))
            .append_column("error", pa.array(error_col, type=pa.string()))
            .append_column("doctype", pa.array(doctype_col, type=pa.string()))
            .append_column("encoding", pa.array(encoding_col, type=pa.string()))
        )
