"""Local mirror of the driver's correctness gate: run every queries()
entry at sf0.001 and compare against its oracle_sql() with DuckDB —
row count, schema-compatible values, order-insensitive."""

import duckdb
import numpy as np
import pandas as pd
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_pandas(result):
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(np.asarray(v).tolist()))
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
        if str(df[c].dtype) in ("int32", "int16", "int8", "uint32"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def assert_frames_match(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    a, b = _normalize(ray_df), _normalize(sql_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    for c in a.columns:
        if a[c].dtype.kind == "f":
            assert np.allclose(
                a[c].to_numpy(dtype=np.float64),
                b[c].to_numpy(dtype=np.float64),
                rtol=1e-9,
                atol=1e-9,
                equal_nan=True,
            ), f"{name}: float col {c} differs"
        else:
            eq = a[c].to_numpy(dtype=object) == b[c].to_numpy(dtype=object)
            assert np.asarray(eq).all(), (
                f"{name}: col {c} differs, first at "
                f"{np.argmin(eq)}: {a[c].iloc[int(np.argmin(eq))]!r} vs "
                f"{b[c].iloc[int(np.argmin(eq))]!r}"
            )


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def all_query_names():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    return sorted(entrymod.queries())


@pytest.mark.parametrize("name", all_query_names())
def test_query_vs_oracle(ray_session, sf_dir, oracle_con, name):
    import __ray_entry__ as entrymod

    result = _to_pandas(entrymod.queries()[name](sf_dir))
    assert result is not None
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        # rows-only check (non-SQL-expressible): must run; schema only
        # checkable when non-empty (Ray drops schema on empty to_pandas)
        assert isinstance(result, pd.DataFrame)
        assert len(result) == 0 or len(result.columns) > 0
        return
    sql_df = oracle_con.execute(oracles[name]).df()
    assert_frames_match(result, sql_df, name)


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod

    df = entrymod.entry()
    assert len(df) >= 1
    assert bool(df["roundtrip_ok"].iloc[0])
    assert float(df["compression_ratio"].iloc[0]) < 0.7
