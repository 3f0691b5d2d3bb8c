"""Cell ⇄ text-box spatial matcher: the 3-tier assignment join.

The analog of the reference's table matcher
(`tools/infer/text/utils/matcher.py:217-270` rule order, `Matcher` class
`:466-600`): each detected text box is assigned to exactly one table cell by
a strict 3-tier rule whose ORDER is the semantics:

1. **center-in-cell** — the box's center point lies inside a cell rectangle;
2. **max IoU** — else, the cell with the largest intersection-over-union
   (> 0) with the box;
3. **min center distance** — else, the nearest cell by Euclidean center
   distance (always resolves).

Ties break to the LOWEST cell index at every tier (deterministic). Within a
cell, assigned texts keep their input order and join with a single space —
the `reduce_repeat_bb`/assembly discipline. Both sides of the join are
per-document small-N, so the whole match runs inside one `map_batches` row
(SURVEY.md §2.4: never a shuffle).

Boxes are axis-aligned rects [x0, y0, x1, y1] (the reference quads arrive
axis-aligned after its `validate_det_res` clipping; a web-layout analog has
no rotation at all).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa


def _as_rects(boxes: Sequence[Sequence[float]]) -> np.ndarray:
    a = np.asarray(boxes, dtype=np.float64)
    return a.reshape(0, 4) if a.size == 0 else a.reshape(-1, 4)


def match_cells(cell_boxes: Sequence[Sequence[float]],
                text_boxes: Sequence[Sequence[float]]) -> List[int]:
    """Return the assigned cell index for every text box (3-tier order)."""
    cells = _as_rects(cell_boxes)
    texts = _as_rects(text_boxes)
    if len(texts) == 0:
        return []
    if len(cells) == 0:
        return [-1] * len(texts)

    cx = (texts[:, 0] + texts[:, 2]) / 2.0
    cy = (texts[:, 1] + texts[:, 3]) / 2.0

    # tier 1: center-in-cell (inclusive bounds, lowest cell index wins)
    inside = (
        (cx[:, None] >= cells[None, :, 0])
        & (cx[:, None] <= cells[None, :, 2])
        & (cy[:, None] >= cells[None, :, 1])
        & (cy[:, None] <= cells[None, :, 3])
    )

    # tier 2: IoU
    ix0 = np.maximum(texts[:, None, 0], cells[None, :, 0])
    iy0 = np.maximum(texts[:, None, 1], cells[None, :, 1])
    ix1 = np.minimum(texts[:, None, 2], cells[None, :, 2])
    iy1 = np.minimum(texts[:, None, 3], cells[None, :, 3])
    inter = np.clip(ix1 - ix0, 0, None) * np.clip(iy1 - iy0, 0, None)
    area_t = (texts[:, 2] - texts[:, 0]) * (texts[:, 3] - texts[:, 1])
    area_c = (cells[:, 2] - cells[:, 0]) * (cells[:, 3] - cells[:, 1])
    union = area_t[:, None] + area_c[None, :] - inter
    iou = np.where(union > 0, inter / np.where(union > 0, union, 1.0), 0.0)

    # tier 3: center distance
    ccx = (cells[:, 0] + cells[:, 2]) / 2.0
    ccy = (cells[:, 1] + cells[:, 3]) / 2.0
    dist = (cx[:, None] - ccx[None, :]) ** 2 + (cy[:, None] - ccy[None, :]) ** 2

    out: List[int] = []
    for t in range(len(texts)):
        hit = np.nonzero(inside[t])[0]
        if hit.size:
            out.append(int(hit[0]))
            continue
        if iou[t].max() > 0:
            out.append(int(iou[t].argmax()))  # argmax ties -> lowest index
            continue
        out.append(int(dist[t].argmin()))
    return out


def assemble_cell_texts(n_cells: int, assign: Sequence[int],
                        texts: Sequence[str]) -> List[str]:
    """Per-cell text: assigned fragments in input order, space-joined."""
    buf: List[List[str]] = [[] for _ in range(n_cells)]
    for a, t in zip(assign, texts):
        if 0 <= a < n_cells and t:
            buf[a].append(t)
    return [" ".join(b) for b in buf]


def sort_boxes_reading_order(boxes: Sequence[Sequence[float]],
                             y_tol: float = 10.0) -> List[int]:
    """Reading-order permutation of 2-D boxes: the `sort_words_by_poly`
    tolerance comparator (`tools/infer/text/utils/utils.py:201-226`) made
    total and deterministic.

    The reference sorts by top-y, then walks the sorted list swapping
    neighbors whose y's differ by less than a tolerance but whose x order
    is reversed — same-LINE boxes order left-to-right even when their y's
    differ slightly. That pairwise pass is order-sensitive; here the same
    semantics run as explicit line grouping: boxes sort by (y, x, index),
    then a box joins the current line while its y is within `y_tol` of the
    line's FIRST box (the reference's comparison anchor), and each line
    sorts left-to-right. Ties break on the input index (stable).

    Returns the index permutation (apply to texts/boxes alike).
    """
    rects = _as_rects(boxes)
    n = len(rects)
    if n == 0:
        return []
    order = sorted(range(n), key=lambda i: (rects[i][1], rects[i][0], i))
    lines: List[List[int]] = []
    line_y = None
    for i in order:
        y = rects[i][1]
        if line_y is None or y - line_y >= y_tol:
            lines.append([i])
            line_y = y
        else:
            lines[-1].append(i)
    out: List[int] = []
    for line in lines:
        line.sort(key=lambda i: (rects[i][0], rects[i][1], i))
        out.extend(line)
    return out


def match_cells_batch(batch: pa.Table, *, cell_col: str = "cell_boxes",
                      text_box_col: str = "text_boxes",
                      text_col: str = "texts") -> pa.Table:
    """map_batches UDF: per document, assign text boxes to cells and emit
    `cell_assign` (list<int32>, per text box) + `cell_texts` (list<string>,
    per cell)."""
    assigns, cell_texts = [], []
    for i in range(batch.num_rows):
        cb = batch.column(cell_col)[i].as_py() or []
        tb = batch.column(text_box_col)[i].as_py() or []
        tx = batch.column(text_col)[i].as_py() or []
        a = match_cells(cb, tb)
        assigns.append(a)
        cell_texts.append(assemble_cell_texts(len(cb), a, tx))
    return batch.append_column(
        "cell_assign", pa.array(assigns, type=pa.list_(pa.int32()))
    ).append_column(
        "cell_texts", pa.array(cell_texts, type=pa.list_(pa.string()))
    )
