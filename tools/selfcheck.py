"""Mini-driver: run every queries() entry AND its oracle_sql() side by
side at sf0.01 and report rows/schema/value-hash matches — a local
stand-in for the driver's CORRECTNESS gate.

    python tools/selfcheck.py [sf_dir] [query_name ...]

With query names, only those queries run (fast targeted re-check after
touching one pipeline); with none, the full sweep runs.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(2)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, sqls = entry.queries(), entry.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in only}
    n_pass = n_fail = n_no_oracle = 0
    for name, fn in qs.items():
        try:
            out = fn(sf_dir)
            if isinstance(out, ray.data.Dataset):
                eng = out.to_pandas()
            elif hasattr(out, "to_pandas"):
                eng = out.to_pandas()
            else:
                eng = out
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ENGINE ERROR {exc}")
            n_fail += 1
            continue
        if name not in sqls:
            print(f"{name}: no_oracle rows={len(eng)}")
            n_no_oracle += 1
            continue
        try:
            ora = con.execute(sqls[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {exc}")
            n_fail += 1
            continue
        e, o = canon(eng), canon(ora)
        rows = len(e) == len(o)
        schema = list(e.columns) == list(o.columns)
        hmatch = rows and schema and value_hash(e) == value_hash(o)
        ok = rows and schema and hmatch
        n_pass += ok
        n_fail += not ok
        if not ok:
            print(f"{name}: FAIL rows={rows}({len(e)}/{len(o)}) schema={schema} hash={hmatch}")
            if schema and rows:
                neq = (e != o) & ~(e.isna() & o.isna())
                bad = neq.any(axis=1)
                print(e[bad].head(3))
                print(o[bad].head(3))
            elif not schema:
                print("  engine:", list(e.columns))
                print("  oracle:", list(o.columns))
        else:
            print(f"{name}: ok ({len(e)} rows)")
    print(f"\nPASS {n_pass}  FAIL {n_fail}  NO_ORACLE {n_no_oracle}")
    ray.shutdown()


if __name__ == "__main__":
    main()
