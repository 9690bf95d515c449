"""Mini-driver: run each registry query and its DuckDB oracle, compare
like the driver does (sort columns by name, sort rows, exact values)."""

from __future__ import annotations

import glob
import os

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        df = result
    elif isinstance(result, pa.Table):
        df = result.to_pandas()
    else:  # ray Dataset
        df = result.to_pandas()
    return df


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "uint32", "int16", "uint64"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, ray_result, sql: str | None, con) -> tuple[bool, str]:
    rdf = canonical(to_pandas(ray_result))
    if sql is None:
        return (len(rdf) >= 0, f"rows-only: {len(rdf)} rows")
    odf = canonical(con.sql(sql).df())
    if list(rdf.columns) != list(odf.columns):
        return False, f"column mismatch: {list(rdf.columns)} vs {list(odf.columns)}"
    if len(rdf) != len(odf):
        return False, f"row count: {len(rdf)} vs {len(odf)}"
    try:
        pd.testing.assert_frame_equal(rdf, odf, check_dtype=False, check_exact=True)
        return True, f"match: {len(rdf)} rows"
    except AssertionError as e:
        return False, str(e).split("\n")[0] + " (first diff shown)"
