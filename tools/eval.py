"""Golden-output evaluation CLI — the `deploy/eval_utils` analog.

Three modes over Parquet inputs, mirroring the reference's eval scripts:

* ``det``  — span precision/recall/F1 (IoU>=0.5, ignore absorption) between
  a predictions table (`url`, `spans`) and a gold table (`url`, `blocks`)
  — `deploy/eval_utils/eval_det.py`.
* ``rec``  — fragment decode accuracy + normalized edit distance over a
  spans_rec table (`block_html`, `gold_text`) — `eval_rec.py` / RecMetric.
* ``e2e``  — combined word/block-level IoU>=0.5 AND exact transcription —
  `eval_pipeline.py:19-60`.

Usage:
    python tools/eval.py det  --pred pred.parquet --gold gold.parquet
    python tools/eval.py rec  --pred spans_rec.parquet
    python tools/eval.py e2e  --pred pred.parquet --gold gold.parquet

Prints one JSON line of metrics. Owns its Ray session.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _join_pred_gold(pred_path: str, gold_path: str, pred_cols, gold_cols):
    """url-keyed join of prediction and gold tables (small-side broadcast)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from webextract.functions.joins import broadcast_join

    pred = ray.data.read_parquet(pred_path, columns=["url"] + pred_cols)
    gold_tbl = pq.read_table(gold_path, columns=["url"] + gold_cols)
    return broadcast_join(pred, gold_tbl, key="url")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="golden-output evaluation")
    p.add_argument("mode", choices=("det", "rec", "e2e"))
    p.add_argument("--pred", required=True)
    p.add_argument("--gold")
    p.add_argument("--iou", type=float, default=0.5)
    p.add_argument("--num-cpus", type=int, default=8)
    args = p.parse_args(argv)

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, ignore_reinit_error=True)
    try:
        if args.mode == "rec":
            import ray.data

            from webextract.functions.metrics import eval_rec

            ds = ray.data.read_parquet(args.pred)
            metrics = eval_rec(ds)
        elif args.mode == "det":
            from webextract.functions.metrics import span_metrics

            if not args.gold:
                p.error("det mode requires --gold")
            ds = _join_pred_gold(args.pred, args.gold, ["spans"], ["blocks"])
            metrics = span_metrics(ds, pred_col="spans", gold_col="blocks",
                                   iou_thresh=args.iou)
        else:  # e2e
            from webextract.functions.metrics import eval_e2e

            if not args.gold:
                p.error("e2e mode requires --gold")
            ds = _join_pred_gold(
                args.pred, args.gold, ["spans", "block_texts"], ["blocks"]
            )
            metrics = eval_e2e(ds, pred_col="spans",
                               pred_text_col="block_texts",
                               gold_col="blocks", iou_thresh=args.iou)
        print(json.dumps({"mode": args.mode, **metrics}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
