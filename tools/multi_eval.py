"""Multi-dataset evaluation runner.

The analog of the reference's `tools/benchmarking/multi_dataset_eval.py`:
run the SAME evaluation (flagship extract + byte-identity verify + timing)
over several pages-corpus directories and print one summary row per
dataset plus an aggregate, so regressions on any corpus variant surface in
one run.

Usage:
    python tools/multi_eval.py DIR [DIR ...] [--num-cpus N]

Each DIR is a Parquet pages corpus (url, warc_ts, html, text, lang). This
script owns its Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import time


def eval_dataset(path: str, num_cpus: int) -> dict:
    from webextract.functions.metrics import verify_extraction
    from webextract.pipelines.extract_pipeline import extract_pages
    from webextract.sources.pages import read_pages

    conc = max(2, num_cpus - max(2, num_cpus // 4))
    t0 = time.perf_counter()
    result = extract_pages(read_pages(path), concurrency=conc, batch_size=512)
    m = verify_extraction(result)
    elapsed = time.perf_counter() - t0
    return {
        "dataset": path,
        "n_docs": m["n_docs"],
        "n_ok": m["n_ok"],
        "n_error": m["n_error"],
        "pass_rate": round(m["pass_rate"], 6),
        "seconds": round(elapsed, 3),
        "docs_per_sec": round(m["n_docs"] / elapsed, 1) if elapsed else 0.0,
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("dirs", nargs="+")
    p.add_argument("--num-cpus", type=int, default=8)
    args = p.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, ignore_reinit_error=True)
    try:
        rows = [eval_dataset(d, args.num_cpus) for d in args.dirs]
    finally:
        ray.shutdown()

    hdr = ("dataset", "n_docs", "n_ok", "n_error", "pass_rate",
           "seconds", "docs_per_sec")
    print("\t".join(hdr))
    for r in rows:
        print("\t".join(str(r[k]) for k in hdr))
    total_docs = sum(r["n_docs"] for r in rows)
    total_ok = sum(r["n_ok"] for r in rows)
    worst = min((r["pass_rate"] for r in rows), default=1.0)
    print(json.dumps({
        "datasets": len(rows),
        "total_docs": total_docs,
        "total_ok": total_ok,
        "worst_pass_rate": worst,
    }))
    return 0 if worst == 1.0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
