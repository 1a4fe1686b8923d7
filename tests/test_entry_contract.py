"""Driver-contract test: every queries() entry with an oracle_sql()
must match DuckDB on the sf0.01 tables (row count + sorted-column
values) — a local replica of the driver's CORRECTNESS gate."""

import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return pa.Table.from_pylist(result.take_all()).to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")  # unit-normalize (us vs ns)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_smoke(entry_mod):
    res = entry_mod.entry()
    df = _to_df(res)
    assert len(df) >= 0
    assert "extracted_text" in df.columns


def test_queries_match_oracle(entry_mod, con):
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    assert set(sqls) <= set(qs)
    failures = []
    for name, sql in sqls.items():
        got = _normalize(_to_df(qs[name](SF_DIR)))
        want = _normalize(con.execute(sql).df())
        if list(got.columns) != list(want.columns):
            failures.append(f"{name}: columns {list(got.columns)} != {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append(f"{name}: rows {len(got)} != {len(want)}")
            continue
        if not got.equals(want):
            diff = (got != want) & ~(got.isna() & want.isna())
            bad = diff.any(axis=1)
            failures.append(f"{name}: {int(bad.sum())} mismatching rows; first:\n{got[bad].head(2)}\nvs\n{want[bad].head(2)}")
    assert not failures, "\n".join(failures)
