"""Driver-compare emulator: run a catalog query on Spark AND its DuckDB
oracle, compare row count + column names + exact sorted values — the
same shape as the driver's CORRECTNESS gate (order-insensitive
value-hash with columns sorted by name). Exact equality (not allclose)
because the driver hashes values: our determinism rules must make both
engines produce identical bits.

Type-strict since round 5: the driver hashes TYPED values, so an
oracle column that DuckDB promotes to HUGEINT (int128 → float64 in
``fetchdf``) against a Spark bigint must FAIL here the way it fails at
the driver.  Round 4's emulator coerced every integer column to
float64 before comparing, which masked exactly that bug class
(q77/q78/q91 were locally green and driver-red).  Now we compare dtype
*families* (int vs int, float vs float, …) before values, and
``oracle_output_types`` lets tests sweep every oracle's DuckDB result
schema for HUGEINT/UHUGEINT/wide-DECIMAL leaks without executing it.
"""

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


def oracle_output_types(con, sql: str) -> dict[str, str]:
    """Column name → DuckDB type for an oracle's result, WITHOUT running
    it (DESCRIBE binds and type-checks only). Used by the pytest sweep
    that asserts no HUGEINT/UHUGEINT/DECIMAL(>18) ever reaches the
    driver's typed hash."""
    rows = con.execute(f"describe {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


_WIDE_TYPES = ("HUGEINT", "UHUGEINT", "INT128", "UINT128")


def wide_type_leaks(types: dict[str, str]) -> list[tuple[str, str]]:
    """Columns whose DuckDB type would hash differently from any Spark
    type: int128 family, or DECIMAL with precision > 18 (Spark's
    decimal(18,x) casts in the engine keep us at or below 18)."""
    bad = []
    for col, typ in types.items():
        t = typ.upper()
        if any(w in t for w in _WIDE_TYPES):
            bad.append((col, typ))
        elif t.startswith("DECIMAL"):
            try:
                prec = int(t.split("(")[1].split(",")[0])
            except (IndexError, ValueError):
                prec = 38
            if prec > 18:
                bad.append((col, typ))
    return bad


def _family(dtype) -> str:
    """Dtype → comparison family. int and float are DISTINCT families:
    a DuckDB HUGEINT arrives as float64 and must not silently match a
    Spark bigint."""
    kind = getattr(dtype, "kind", None)
    if kind in "iu" or str(dtype).startswith(("Int", "UInt")):
        return "int"
    if kind == "f" or str(dtype).startswith("Float"):
        return "float"
    if kind == "b" or str(dtype) == "boolean":
        return "bool"
    if kind == "M":
        return "datetime"
    return "str"


def _normalize(df: pd.DataFrame) -> tuple[pd.DataFrame, dict[str, str]]:
    df = df[sorted(df.columns)].copy()
    families = {c: _family(df[c].dtype) for c in df.columns}
    for c in df.columns:
        fam = families[c]
        if fam == "int":
            # nullable Int64 / plain int64 → one concrete int repr; a
            # value that cannot round-trip int64 would have arrived as
            # float (HUGEINT) and already be a family mismatch.
            df[c] = df[c].astype("Int64")
        elif fam == "float":
            df[c] = df[c].astype("float64")
        elif fam == "bool":
            df[c] = df[c].astype("boolean")
        elif fam == "str":
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True, na_position="last"), families


def compare(spark_df, oracle_pdf: pd.DataFrame) -> dict:
    got, got_fam = _normalize(spark_df.toPandas())
    exp, exp_fam = _normalize(oracle_pdf)
    res = {"rows": (len(got), len(exp)), "cols": (list(got.columns), list(exp.columns))}
    res["rows_match"] = len(got) == len(exp)
    res["cols_match"] = list(got.columns) == list(exp.columns)
    if not (res["rows_match"] and res["cols_match"]):
        res["values_match"] = False
        return res
    fam_bad = [
        (c, got_fam[c], exp_fam[c])
        for c in got.columns
        if got_fam[c] != exp_fam[c]
    ]
    if fam_bad:
        res["values_match"] = False
        res["dtype_mismatches"] = fam_bad
        return res
    bad = []
    for c in got.columns:
        a, b = got[c], exp[c]
        if a.dtype.kind == "f":
            eq = (a.to_numpy() == b.to_numpy()) | (a.isna() & b.isna()).to_numpy()
        else:
            eq = ((a == b) | (a.isna() & b.isna())).fillna(False)
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
