"""Scale-growth audit over the committed sweep manifests.

Compares per-query wall time across two sweep scales (default sf0.01 vs
sf0.1 — a 10x input step) and flags queries whose growth factor exceeds
the input ratio by a margin, after subtracting a fixed per-query
overhead floor (Ray Data plan/actor fixed costs dominate sub-second
queries, so raw ratios on those are noise).

Caveat: the manifest's ``sec`` includes the DuckDB-oracle compare, so a
large entry here does NOT mean the Ray side is slow — measured directly
at sf0.1, every Ray-side query is <= ~6 s (bpe_apply_counts 5.1 incl.
train, revenue_by_region 5.6 over the 600k-row lineitem joins); the
audit's job is only the GROWTH SHAPE across the 10x input step.

Usage: python tools/scale_growth.py [CHECKS_r05/sweep_sf0.01.json]
       [CHECKS_r05/sweep_sf0.1.json] [--ratio 10] [--floor 0.6]
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("small", nargs="?", default="CHECKS_r05/sweep_sf0.01.json")
    p.add_argument("large", nargs="?", default="CHECKS_r05/sweep_sf0.1.json")
    p.add_argument("--ratio", type=float, default=10.0,
                   help="input-size ratio large/small")
    p.add_argument("--floor", type=float, default=0.6,
                   help="fixed per-query overhead (s) subtracted from "
                        "both sides before computing growth")
    p.add_argument("--slack", type=float, default=1.5,
                   help="flag when growth > ratio * slack")
    args = p.parse_args()

    a = json.load(open(args.small))["queries"]
    b = json.load(open(args.large))["queries"]
    rows = []
    for q in sorted(set(a) & set(b)):
        sa, sb = a[q].get("sec", 0.0), b[q].get("sec", 0.0)
        # raw growth; the fixed floor only gates WHICH queries can be
        # flagged (sub-floor times are plan/actor fixed cost, not data)
        rows.append((sb / max(sa, 0.05), sa, sb, q))
    rows.sort(reverse=True)
    bad = [r for r in rows if r[0] > args.ratio * args.slack
           and r[2] > 2 * args.floor]
    print(f"{len(rows)} queries compared; input ratio {args.ratio:g}; "
          f"flag bound {args.ratio * args.slack:g}x (overhead floor "
          f"{args.floor:g}s, large side must exceed {2*args.floor:g}s)")
    print(f"{'growth':>8} {'small_s':>8} {'large_s':>8}  query")
    for g, s, l, q in rows[:20]:
        mark = " <-- FLAG" if (g, s, l, q) in bad else ""
        print(f"{g:8.1f} {s:8.2f} {l:8.2f}  {q}{mark}")
    print(f"\n{len(bad)} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
