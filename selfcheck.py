"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` SQL via DuckDB at
a given sf dir and compares row count, column names/dtypes and an
order-insensitive value hash (columns sorted by name), mirroring
CORRECTNESS_r{N}.json. Usage::

    python selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def oracle_df(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"rows {len(ray_df)} != {len(sql_df)}")
    rc, sc = sorted(ray_df.columns), sorted(sql_df.columns)
    if rc != sc:
        problems.append(f"cols {rc} != {sc}")
        return problems
    for c in rc:
        rt, st = ray_df[c].dtype, sql_df[c].dtype
        if str(rt) != str(st):
            problems.append(f"dtype[{c}] {rt} != {st}")
    if value_hash(ray_df) != value_hash(sql_df):
        problems.append("value hash mismatch")
        # show a sample diff
        key = rc[0]
        merged = ray_df.merge(sql_df, how="outer", indicator=True,
                              on=list(ray_df.columns))
        only = merged[merged["_merge"] != "both"]
        problems.append(f"  {len(only)} differing rows; sample:\n{only.head(6).to_string()}")
    return problems


def main():
    import ray
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.01"
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = args or list(qs)
    failed = []
    for name in names:
        import time
        t0 = time.time()
        try:
            ray_df = to_pandas(qs[name](sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(ray_df)} (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            sql_df = oracle_df(sf_dir, oracles[name])
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {e}")
            failed.append(name)
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"PASS {name}: rows={len(ray_df)} [{time.time()-t0:.1f}s]")
    ray.shutdown()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all queries match oracles")


if __name__ == "__main__":
    main()
