"""Evaluation metrics: byte-identity pass rate + span precision/recall/F1.

* :func:`verify_extraction` — the groupby-url verification pass required by
  the north rule: per-row byte-equality flags computed in `map_batches`,
  reduced with `Sum` aggregates — the partial-counters + AllReduce(sum)
  pattern of `RecMetric` (`mindocr/metrics/rec_metrics.py:16-170`,
  `mindocr/utils/misc.py:48-58`).
* :func:`span_prf` — 1-D interval port of `DetectionIoUEvaluator` greedy
  IoU>=0.5 matching with ignore-region absorption
  (`mindocr/metrics/det_metrics.py:22-96`).
* :func:`norm_edit_distance` — the Levenshtein `norm_edit_dis` component of
  RecMetric (capped, for diagnostic scoring of near-miss extractions).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc


def verify_extraction(result_ds, *, text_col: str = "text",
                      gold_col: str = "gold_text") -> Dict[str, float]:
    """Byte-identity pass over an extraction result Dataset.

    Returns {n_docs, n_ok, n_error, n_match, pass_rate}; `pass_rate` counts
    ok-status rows whose extracted text equals gold byte-for-byte.
    """

    def flags(batch: pa.Table) -> pa.Table:
        ok = pc.equal(batch.column("status"), pa.scalar("ok"))
        match = pc.and_(ok, pc.equal(batch.column(text_col), batch.column(gold_col)))
        return pa.table(
            {
                "n_docs": pa.array([batch.num_rows], type=pa.int64()),
                "n_ok": pa.array([pc.sum(pc.cast(ok, pa.int64())).as_py() or 0], type=pa.int64()),
                "n_match": pa.array([pc.sum(pc.cast(match, pa.int64())).as_py() or 0], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    partials = result_ds.map_batches(flags, batch_format="pyarrow")
    agg = partials.aggregate(Sum("n_docs"), Sum("n_ok"), Sum("n_match"))
    n_docs = agg["sum(n_docs)"] or 0
    n_ok = agg["sum(n_ok)"] or 0
    n_match = agg["sum(n_match)"] or 0
    return {
        "n_docs": n_docs,
        "n_ok": n_ok,
        "n_error": n_docs - n_ok,
        "n_match": n_match,
        "pass_rate": (n_match / n_ok) if n_ok else 0.0,
    }


# --- 1-D span IoU matching (DetectionIoUEvaluator port) ---------------------


def _iou_1d(a: Tuple[int, int], b: Tuple[int, int]) -> float:
    inter = max(0, min(a[1], b[1]) - max(a[0], b[0]))
    union = (a[1] - a[0]) + (b[1] - b[0]) - inter
    return inter / union if union > 0 else 0.0


def span_prf(
    pred: Sequence[Tuple[int, int]],
    gold: Sequence[Tuple[int, int]],
    ignore: Optional[Sequence[bool]] = None,
    iou_thresh: float = 0.5,
) -> Dict[str, float]:
    """Greedy IoU matching of predicted vs gold spans (per document).

    Semantics ported from DetectionIoUEvaluator (det_metrics.py:22-96):
    1. gold spans flagged `ignore` don't count toward recall;
    2. predictions overlapping an ignored gold span (IoU >= thresh against
       it) are absorbed — they count as neither TP nor FP;
    3. remaining predictions greedily match unmatched non-ignored gold
       spans at IoU >= thresh (first match wins, byte order).
    """
    ignore = list(ignore) if ignore is not None else [False] * len(gold)
    gold_live = [g for g, ig in zip(gold, ignore) if not ig]
    gold_ignored = [g for g, ig in zip(gold, ignore) if ig]

    kept_preds = []
    for p in pred:
        if any(_iou_1d(p, g) >= iou_thresh for g in gold_ignored):
            continue  # absorbed by ignore region
        kept_preds.append(p)

    matched = [False] * len(gold_live)
    tp = 0
    for p in kept_preds:
        for gi, g in enumerate(gold_live):
            if not matched[gi] and _iou_1d(p, g) >= iou_thresh:
                matched[gi] = True
                tp += 1
                break
    fp = len(kept_preds) - tp
    fn = len(gold_live) - tp
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": precision, "recall": recall, "f1": f1}


def span_metrics(ds, *, pred_col: str = "spans", gold_col: str = "gold_spans",
                 iou_thresh: float = 0.5) -> Dict[str, float]:
    """Dataset-level detect metric: per-row TP/FP/FN partials -> Sum -> global
    precision/recall/F1 (the DetMetric AllReduce pattern,
    det_metrics.py:140-168)."""

    def partials(batch: pa.Table) -> pa.Table:
        tp = fp = fn = 0
        for i in range(batch.num_rows):
            pred = [(s["start"], s["end"]) for s in (batch.column(pred_col)[i].as_py() or [])]
            gold_raw = batch.column(gold_col)[i].as_py() or []
            gold = [(g["start"], g["end"]) for g in gold_raw]
            ignore = [bool(g.get("ignore", False)) for g in gold_raw]
            r = span_prf(pred, gold, ignore, iou_thresh)
            tp += r["tp"]
            fp += r["fp"]
            fn += r["fn"]
        return pa.table(
            {
                "tp": pa.array([tp], type=pa.int64()),
                "fp": pa.array([fp], type=pa.int64()),
                "fn": pa.array([fn], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partials, batch_format="pyarrow").aggregate(
        Sum("tp"), Sum("fp"), Sum("fn")
    )
    tp, fp, fn = (agg["sum(tp)"] or 0), (agg["sum(fp)"] or 0), (agg["sum(fn)"] or 0)
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": precision, "recall": recall, "f1": f1}


def eval_rec(ds, *, frag_col: str = "block_html", gold_col: str = "gold_text",
             kind: str = "p") -> Dict[str, float]:
    """Recognition-only evaluation over a spans_rec fragments table
    (FIXTURES.md §3) — the `deploy/eval_utils/eval_rec.py` analog reusing
    RecMetric semantics: exact-match count + summed normalized edit
    distance as partials, one Sum reduction, final divide."""
    from ray.data.aggregate import Sum

    from webextract.stages.extract import decode_block

    def partials(batch: pa.Table) -> pa.Table:
        correct = 0
        ned_sum = 0.0
        frags = batch.column(frag_col).to_pylist()
        golds = batch.column(gold_col).to_pylist()
        for frag, gold in zip(frags, golds):
            try:
                got = decode_block(frag or b"", kind)
            except UnicodeDecodeError:
                got = ""
            if got == gold:
                correct += 1
                ned_sum += 1.0
            else:
                ned_sum += norm_edit_distance(got, gold or "")
        return pa.table(
            {
                "n": pa.array([batch.num_rows], type=pa.int64()),
                "correct": pa.array([correct], type=pa.int64()),
                "ned": pa.array([ned_sum], type=pa.float64()),
            }
        )

    agg = ds.map_batches(partials, batch_format="pyarrow").aggregate(
        Sum("n"), Sum("correct"), Sum("ned")
    )
    n = agg["sum(n)"] or 0
    correct = agg["sum(correct)"] or 0
    ned = agg["sum(ned)"] or 0.0
    return {
        "n": n,
        "acc": correct / n if n else 0.0,
        "norm_edit_dis": ned / n if n else 0.0,
    }


def e2e_prf(
    pred: Sequence[Tuple[int, int, str]],
    gold: Sequence[Tuple[int, int, str]],
    ignore: Optional[Sequence[bool]] = None,
    iou_thresh: float = 0.5,
) -> Dict[str, float]:
    """Combined end-to-end matching (eval_pipeline.py:19-60 analog): a
    prediction is a TP only if it BOTH overlaps an unmatched gold span at
    IoU >= thresh AND reproduces its transcription exactly. Ignored gold
    spans absorb overlapping predictions (neither TP nor FP), exactly as in
    the det-only evaluator."""
    ignore = list(ignore) if ignore is not None else [False] * len(gold)
    gold_live = [g for g, ig in zip(gold, ignore) if not ig]
    gold_ignored = [g for g, ig in zip(gold, ignore) if ig]

    kept = []
    for p in pred:
        if any(_iou_1d(p[:2], g[:2]) >= iou_thresh for g in gold_ignored):
            continue
        kept.append(p)

    matched = [False] * len(gold_live)
    tp = 0
    for p in kept:
        for gi, g in enumerate(gold_live):
            if (not matched[gi] and _iou_1d(p[:2], g[:2]) >= iou_thresh
                    and p[2] == g[2]):
                matched[gi] = True
                tp += 1
                break
    fp = len(kept) - tp
    fn = len(gold_live) - tp
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": precision, "recall": recall, "f1": f1}


def eval_e2e(ds, *, pred_col: str = "spans", pred_text_col: str = "block_texts",
             gold_col: str = "gold_blocks", iou_thresh: float = 0.5) -> Dict[str, float]:
    """Dataset-level combined e2e metric: word/block-level IoU>=0.5 AND
    exact transcription, reduced with the same partial-Sum pattern as
    span_metrics. `pred_col` rows are span structs; `pred_text_col` holds
    the parallel decoded texts; `gold_col` rows are blocks_gold structs
    (start/end/text/ignore)."""

    def partials(batch: pa.Table) -> pa.Table:
        tp = fp = fn = 0
        for i in range(batch.num_rows):
            spans_raw = batch.column(pred_col)[i].as_py() or []
            texts = batch.column(pred_text_col)[i].as_py() or []
            pred = [
                (s["start"], s["end"], t)
                for s, t in zip(spans_raw, texts)
            ]
            gold_raw = batch.column(gold_col)[i].as_py() or []
            gold = [(g["start"], g["end"], g.get("text", "")) for g in gold_raw]
            ignore = [bool(g.get("ignore", False)) for g in gold_raw]
            r = e2e_prf(pred, gold, ignore, iou_thresh)
            tp += r["tp"]
            fp += r["fp"]
            fn += r["fn"]
        return pa.table(
            {
                "tp": pa.array([tp], type=pa.int64()),
                "fp": pa.array([fp], type=pa.int64()),
                "fn": pa.array([fn], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partials, batch_format="pyarrow").aggregate(
        Sum("tp"), Sum("fp"), Sum("fn")
    )
    tp, fp, fn = (agg["sum(tp)"] or 0), (agg["sum(fp)"] or 0), (agg["sum(fn)"] or 0)
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": precision, "recall": recall, "f1": f1}


# --- normalized edit distance (RecMetric analog) ----------------------------


def norm_edit_distance(a: str, b: str, cap: int = 512) -> float:
    """1 - levenshtein(a, b)/max(len): 1.0 = identical. Inputs capped to
    `cap` chars (quadratic DP; diagnostic metric, not the hot path)."""
    a, b = a[:cap], b[:cap]
    if a == b:
        return 1.0
    if not a or not b:
        return 0.0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return 1.0 - prev[-1] / max(len(a), len(b))
