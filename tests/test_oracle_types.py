"""Oracle type hygiene: the driver hashes TYPED values, so a DuckDB
oracle column that type-promotes past what Spark can produce (HUGEINT,
UHUGEINT, DECIMAL precision > 18) hash-mismatches even when every value
is numerically identical — exactly what went wrong with q77/q78/q91 in
round 4. Two guards:

1. ``test_no_wide_types_in_any_oracle`` sweeps EVERY registered oracle
   with DuckDB ``DESCRIBE`` (binds + type-checks, no execution) and
   fails if any result column is a wide type.
2. ``test_parity_catches_hugeint`` pins the emulator's strictness: an
   int-vs-float dtype-family mismatch must report values_match=False
   (round 4's emulator coerced ints to float64 and missed it).

No SparkSession needed — both tests are metadata-only.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from lbf_spark.parity import (
    compare,
    duckdb_conn,
    oracle_output_types,
    wide_type_leaks,
    _family,
    _normalize,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def test_no_wide_types_in_any_oracle():
    from lbf_spark.queries import QUERIES

    con = duckdb_conn(SF_DIR)
    leaks = {}
    for name, (fn, sql) in QUERIES.items():
        if sql is None:
            continue
        bad = wide_type_leaks(oracle_output_types(con, sql))
        if bad:
            leaks[name] = bad
    assert not leaks, f"oracle columns that would hash-mismatch the driver: {leaks}"


def test_wide_type_detector():
    con = duckdb_conn(SF_DIR)
    # sum(bigint) promotes to HUGEINT — must be flagged
    bad = wide_type_leaks(
        oracle_output_types(con, "select sum(x) as s from (select 1::bigint as x)")
    )
    assert bad == [("s", "HUGEINT")]
    # cast back to bigint — clean
    assert not wide_type_leaks(
        oracle_output_types(
            con, "select cast(sum(x) as bigint) as s from (select 1::bigint as x)"
        )
    )
    # wide decimal flagged, decimal(18,4) clean
    assert wide_type_leaks(
        oracle_output_types(con, "select 1::decimal(38,4) as d")
    ) == [("d", "DECIMAL(38,4)")]
    assert not wide_type_leaks(
        oracle_output_types(con, "select 1::decimal(18,4) as d")
    )


def test_family_classification():
    assert _family(pd.Series([1, 2]).dtype) == "int"
    assert _family(pd.Series([1, 2], dtype="Int64").dtype) == "int"
    assert _family(pd.Series([1.0]).dtype) == "float"
    assert _family(pd.Series([True]).dtype) == "bool"
    assert _family(pd.Series(["a"]).dtype) == "str"
    assert _family(pd.Series(pd.to_datetime(["2024-01-01"])).dtype) == "datetime"


def test_parity_catches_int_float_family_mismatch():
    """A HUGEINT oracle column arrives from fetchdf as float64 while the
    Spark side is int64 — the emulator must fail on dtype family, never
    silently unify to float (round 4 blind spot)."""

    class _FakeSparkDF:
        def __init__(self, pdf):
            self._pdf = pdf

        def toPandas(self):
            return self._pdf

    spark_side = _FakeSparkDF(pd.DataFrame({"total": pd.Series([100], dtype="int64")}))
    oracle_side = pd.DataFrame({"total": pd.Series([100.0], dtype="float64")})
    res = compare(spark_side, oracle_side)
    assert res["values_match"] is False
    assert res["dtype_mismatches"] == [("total", "int", "float")]

    # same family, same values → green
    ok = compare(
        _FakeSparkDF(pd.DataFrame({"total": pd.Series([100], dtype="int64")})),
        pd.DataFrame({"total": pd.Series([100], dtype="int32")}),
    )
    assert ok["values_match"] is True


def test_normalize_int_nulls_stay_int_family():
    df, fams = _normalize(pd.DataFrame({"a": pd.Series([1, None], dtype="Int64")}))
    assert fams["a"] == "int"
    assert str(df["a"].dtype) == "Int64"
