"""Driver-compare emulator: run a catalog query on Spark AND its DuckDB
oracle, compare row count + column names + exact sorted values — the
same shape as the driver's CORRECTNESS gate (order-insensitive
value-hash with columns sorted by name). Exact equality (not allclose)
because the driver hashes values: our determinism rules must make both
engines produce identical bits."""

from __future__ import annotations

import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"create view {name} as select * from read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("Int", "UInt")) or df[c].dtype.kind in "iu":
            df[c] = df[c].astype("float64")  # unify nullable ints for sort/compare
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
        elif df[c].dtype.kind == "b":
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), ignore_index=True, na_position="last")


def compare(spark_df, oracle_pdf: pd.DataFrame) -> dict:
    got = _normalize(spark_df.toPandas())
    exp = _normalize(oracle_pdf)
    res = {"rows": (len(got), len(exp)), "cols": (list(got.columns), list(exp.columns))}
    res["rows_match"] = len(got) == len(exp)
    res["cols_match"] = list(got.columns) == list(exp.columns)
    if not (res["rows_match"] and res["cols_match"]):
        res["values_match"] = False
        return res
    bad = []
    for c in got.columns:
        a, b = got[c], exp[c]
        if a.dtype.kind == "f":
            eq = (a.to_numpy() == b.to_numpy()) | (a.isna() & b.isna()).to_numpy()
        else:
            eq = (a == b) | (a.isna() & b.isna())
        if not np.all(eq):
            idx = int(np.argmin(np.asarray(eq)))
            bad.append((c, idx, a.iloc[idx], b.iloc[idx]))
    res["values_match"] = not bad
    res["mismatches"] = bad[:5]
    return res


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, dict]:
    from lbf_spark.queries import QUERIES

    con = duckdb_conn(sf_dir)
    out = {}
    for name, (fn, sql) in QUERIES.items():
        if names and name not in names:
            continue
        if sql is None:
            out[name] = {"oracle": None, "rows": fn(spark, sf_dir).count()}
            continue
        try:
            oracle_pdf = con.execute(sql).fetchdf()
            out[name] = compare(fn(spark, sf_dir), oracle_pdf)
        except Exception as e:  # surface, keep going
            out[name] = {"error": f"{type(e).__name__}: {e}"}
    return out
