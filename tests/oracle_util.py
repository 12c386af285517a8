"""Mimic the driver's oracle gate locally: run the Spark query and its
DuckDB oracle on the same sf dir, sort columns by name and rows by value,
and require exact equality (the driver hashes values, so 'close' floats
are NOT good enough — common.py's rounding rules exist to make equality
exact)."""

from __future__ import annotations

import math

import duckdb

from mister_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).fetchdf()


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(spark_df, sql: str, sf_dir: str, float_exact: bool = True):
    """Return (ok, detail). Exact match on counts, sorted columns, values."""
    got = _normalize(spark_df.toPandas())
    want = _normalize(run_oracle(sql, sf_dir))
    if list(got.columns) != list(want.columns):
        return False, f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    if len(got) != len(want):
        return False, f"row counts differ: {len(got)} vs {len(want)}"
    for c in got.columns:
        for i, (a, b) in enumerate(zip(got[c].tolist(), want[c].tolist())):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    return False, f"{c}[{i}]: {a!r} != {b!r} (Δ={a - b!r})"
            elif str(a) != str(b):
                return False, f"{c}[{i}]: {a!r} != {b!r}"
    return True, f"{len(got)} rows match"
