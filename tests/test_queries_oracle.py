"""Local replica of the driver's correctness gate: run each queries()
entry at sf0.001 and compare row count, schema (column names) and values
against the matching oracle_sql() in DuckDB."""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(result):
    import pyarrow as pa

    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_vs_oracle(ray_session, con, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    ours = _canon(_to_pandas(q(SF_DIR)))
    oracle = _canon(con.execute(sql).fetchdf())
    assert list(ours.columns) == list(oracle.columns), (
        f"columns {list(ours.columns)} vs {list(oracle.columns)}")
    assert len(ours) == len(oracle), f"rows {len(ours)} vs {len(oracle)}"
    for c in ours.columns:
        a, b = ours[c], oracle[c]
        if pd.api.types.is_float_dtype(a):
            assert all(math.isclose(x, y, rel_tol=0, abs_tol=1e-9)
                       for x, y in zip(a, b)), c
        else:
            assert a.tolist() == b.tolist(), c


ROWS_ONLY = [k for k in sorted(entry_mod.queries().keys()) if k not in ORACLE_KEYS]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    q = entry_mod.queries()[name]
    df = _to_pandas(q(SF_DIR))
    assert len(df) >= 0
    assert len(df.columns) > 0
