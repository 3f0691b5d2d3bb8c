"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir and compares it against
``oracle_sql()`` via DuckDB: row count, column names, and order-insensitive
exact value equality (rows+columns sorted by name before compare).

Usage: python tools/check_correctness.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
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

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
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
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows-only check, {len(got)} rows, cols {list(got.columns)}")
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
            failures += 1
        else:
            print(f"PASS {name}: {len(got)} rows{dtypes_note}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
