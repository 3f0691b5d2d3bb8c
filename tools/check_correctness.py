"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir and compares it against
``oracle_sql()`` via DuckDB: row count, column names, and order-insensitive
exact value equality (rows+columns sorted by name before compare).

Usage: python tools/check_correctness.py [--json manifest.json] [sf_dir]
       [only_query ...]

With ``--json`` a machine-readable manifest is written: one entry per
query with status (PASS / ok-rows-only / FAIL), row count and error, so
each round's full-sweep results can be committed and diffed against the
driver's sampled CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray
    import ray.data

    if isinstance(res, ray.data.Dataset):
        # Ray 2.49's Dataset.to_pandas() returns a COLUMN-LESS frame for an
        # all-empty dataset even when every block is a typed empty Arrow
        # table. Concat the arrow blocks ourselves so a legitimately empty
        # result (e.g. an anti-join with full coverage at sf0.001) keeps
        # its schema for the driver-style column compare.
        tbls = [t for t in ray.get(res.to_arrow_refs()) if t.num_columns]
        if tbls:
            return pa.concat_tables(tbls, promote_options="default").to_pandas()
        return pd.DataFrame()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main() -> int:
    import ray

    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True)
    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    manifest = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            manifest[name] = {"status": "FAIL", "rows": None,
                              "err": f"{type(e).__name__}: {e}"[:300]}
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows-only check, {len(got)} rows, cols {list(got.columns)}")
            manifest[name] = {"status": "rows_only", "rows": len(got),
                              "sec": round(time.perf_counter() - t0, 2)}
            continue
        exp = canon(con.sql(sql).df())
        status = []
        if len(got) != len(exp):
            status.append(f"rowcount {len(got)} != {len(exp)}")
        if list(got.columns) != list(exp.columns):
            status.append(f"cols {list(got.columns)} != {list(exp.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(
                    got, exp, check_dtype=False, check_exact=True
                )
            except AssertionError as e:
                status.append("values differ: " + str(e).splitlines()[-1][:200])
        dtypes_note = ""
        for c in set(got.columns) & set(exp.columns):
            if str(got[c].dtype) != str(exp[c].dtype):
                dtypes_note += f" [dtype {c}: {got[c].dtype} vs {exp[c].dtype}]"
        if status:
            print(f"FAIL {name}: {'; '.join(status)}{dtypes_note}")
            manifest[name] = {"status": "FAIL", "rows": len(got),
                              "err": "; ".join(status)[:300]}
            failures += 1
        else:
            print(f"PASS {name}: {len(got)} rows{dtypes_note}")
            manifest[name] = {"status": "PASS", "rows": len(got),
                              "sec": round(time.perf_counter() - t0, 2)}
    ray.shutdown()
    if json_out:
        counts = {}
        for v in manifest.values():
            counts[v["status"]] = counts.get(v["status"], 0) + 1
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "counts": counts,
                       "queries": manifest}, f, indent=1, sort_keys=True)
        print(f"manifest -> {json_out} {counts}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
