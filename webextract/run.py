"""CLI entrypoint — the `ray job submit` surface.

    python -m webextract.run --input /data/pages --output /out [--resume]

On a real cluster this module is the job entrypoint
(`ray job submit -- python -m webextract.run ...`); in the sandbox it runs
against local parquet. Owns its Ray session (guarded init, shutdown at the
end) — library code never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="ray-webextract batch extraction job")
    p.add_argument("--input", required=True, help="pages parquet dir")
    p.add_argument("--output", required=True, help="output dir (created)")
    p.add_argument("--resume", action="store_true",
                   help="skip shards already in the lineage manifest")
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--mode", choices=("tasks", "actors"), default="tasks",
                   help="fused kernel as a task pool (default; fastest "
                        "measured) or an actor pool")
    p.add_argument("--concurrency", type=int, default=0,
                   help="actors mode: pool max size (default: cpus - cpus/4)")
    p.add_argument("--salt-buckets", type=int, default=0,
                   help="apply deterministic salted repartition on the url "
                        "host before extraction (skew defense; >0 enables)")
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--drop-score", type=float, default=0.5)
    p.add_argument("--strategy", choices=("db", "pse", "east"), default="db",
                   help="segmentation strategy (pluggable postprocess "
                        "surface; pse/east force the staged pipeline)")
    p.add_argument("--keep-spans", action="store_true")
    p.add_argument("--verify", action="store_true",
                   help="after extraction, run the byte-identity pass "
                        "against the gold_text column and print metrics")
    p.add_argument("--stats", action="store_true",
                   help="print per-operator ds.stats() of the last shard "
                        "to stderr (observability)")
    p.add_argument("--wave-size", type=int, default=1,
                   help="pending shards per streaming execution (raise when "
                        "shards are small; lineage stays per-shard)")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)
    try:
        from webextract.pipelines.extract_pipeline import extract_pages
        from webextract.state.lineage import run_resumable

        if args.mode == "tasks":
            conc = None
        else:
            conc = args.concurrency or max(
                2, args.num_cpus - max(2, args.num_cpus // 4)
            )

        def pipeline(ds):
            if args.salt_buckets > 0:
                from webextract.pipelines.registry import get_op

                ds = get_op("salted_repartition")(
                    ds,
                    key="url",
                    key_extract=r"https://([^/]+)/",
                    salt_buckets=args.salt_buckets,
                )
            if args.strategy != "db":
                from webextract.pipelines.registry import build_pipeline

                pool = conc or (1, 8)  # stateful stages need a pool size
                return build_pipeline(ds, [
                    {"op": "segment", "strategy": args.strategy,
                     "batch_size": args.batch_size, "concurrency": pool},
                    {"op": "extract", "drop_score": args.drop_score,
                     "batch_size": args.batch_size, "concurrency": pool},
                    {"op": "assemble", "keep_spans": args.keep_spans},
                ])
            return extract_pages(
                ds,
                drop_score=args.drop_score,
                batch_size=args.batch_size,
                concurrency=conc,
                keep_spans=args.keep_spans,
            )

        if not args.resume and os.path.exists(
            os.path.join(args.output, "_MANIFEST.jsonl")
        ):
            print(
                f"error: {args.output} has a manifest; pass --resume to continue "
                "or choose a fresh output dir",
                file=sys.stderr,
            )
            return 2

        t0 = time.perf_counter()
        stats = run_resumable(args.input, args.output, pipeline,
                              wave_size=args.wave_size)
        elapsed = time.perf_counter() - t0
        op_stats = stats.pop("last_shard_stats", "")
        if args.stats and op_stats:
            print(op_stats, file=sys.stderr)
        report = {
            "elapsed_sec": round(elapsed, 2),
            "docs_per_sec": round(stats["rows"] / elapsed, 1) if elapsed else None,
            **stats,
        }
        if args.verify:
            import ray.data

            from webextract.functions.metrics import verify_extraction

            files = [
                os.path.join(args.output, d, f)
                for d in sorted(os.listdir(args.output))
                if d.startswith("part-")
                for f in sorted(os.listdir(os.path.join(args.output, d)))
                if f.endswith(".parquet")
            ]
            result = ray.data.read_parquet(files)
            report["verify"] = verify_extraction(result)
        from webextract.state.counters import snapshot

        counters = snapshot()
        # skipped-bucket / data-loss counters surface in the report even
        # when zero events fired (empty dict = "counted, nothing lost")
        report["counters"] = counters or {}
        print(json.dumps(report))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
