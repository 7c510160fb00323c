"""Local stand-in for the driver's correctness gate.

Runs every __ray_entry__.queries() callable and its oracle_sql() twin on an
sf dir, compares row count, sorted column names, and an order-insensitive
value hash. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if np.issubdtype(col.dtype, np.floating):
            df[c] = col.round(9)
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype("int64")
    rows = sorted(df.astype(str).apply(lambda r: "\x1f".join(r), axis=1).tolist())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    con = duckdb.connect()
    for tbl in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: ray side raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        sql = sqls.get(name)
        if sql is None:
            print(f"ok   {name}: rows={len(mine)} (rows-only, no oracle)")
            if len(mine) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            oracle = con.execute(sql).df()
        except Exception as ex:
            print(f"FAIL {name}: SQL raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        ok_rows = len(mine) == len(oracle)
        ok_cols = sorted(mine.columns) == sorted(oracle.columns)
        h1 = value_hash(mine) if ok_cols else "-"
        h2 = value_hash(oracle) if ok_cols else "-"
        ok = ok_rows and ok_cols and h1 == h2
        status = "ok  " if ok else "FAIL"
        print(
            f"{status} {name}: rows {len(mine)}/{len(oracle)} cols "
            f"{sorted(mine.columns)}=={sorted(oracle.columns)}: {ok_cols} hash {h1} {h2}"
        )
        if not ok:
            failures += 1
            if ok_cols and len(mine) and len(oracle):
                m = mine.sort_values(sorted(mine.columns)).reset_index(drop=True)
                o = oracle.sort_values(sorted(oracle.columns)).reset_index(drop=True)
                diff = (
                    m.astype(str) != o.astype(str)
                    if len(m) == len(o)
                    else None
                )
                if diff is not None:
                    bad = diff.any(axis=1)
                    print("  first diffs (mine vs oracle):")
                    print(pd.concat([m[bad].head(3), o[bad].head(3)], axis=1))
                else:
                    print("  mine head:\n", m.head(3), "\n  oracle head:\n", o.head(3))
    print(f"\n{failures} failures")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
