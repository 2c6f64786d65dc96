"""Bucketed co-located joins (zero-exchange, plan-asserted) and
deterministic salted joins for skewed keys."""

import pandas as pd
import numpy as np
import pytest
from pyspark.sql import functions as F

from lbf_spark import fixtures
from lbf_spark.operators import joins as J


def _explain(df):
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_bucketed_join_has_no_exchange(spark, tiny_events, tmp_path):
    """Two tables bucketed on the same key must SortMergeJoin with ZERO
    Exchange operators — the repeated-join shuffle eliminated at write
    time (the 100-TB co-location story)."""
    ev = fixtures.events_to_spark(spark, tiny_events).select(
        "entity", "ts", "phash"
    )
    dim = ev.groupBy("entity").agg(F.count(F.lit(1)).alias("n_events"))
    try:
        try:
            J.write_bucketed(ev, "ev_bkt", "entity", buckets=8)
            J.write_bucketed(dim, "dim_bkt", "entity", buckets=8)
        except Exception as e:  # pragma: no cover - catalog-less sessions
            pytest.skip(f"no persistent catalog in this session: {e}")
        a = J.read_bucketed(spark, "ev_bkt")
        b = J.read_bucketed(spark, "dim_bkt")
        # disable broadcast so the join exercises the bucketed SMJ path
        # (at real scale both sides are too big to broadcast anyway)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "entity")
            plan = _explain(joined)
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan, plan
            assert "Bucketed: true" in plan, plan
            assert joined.count() == ev.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("drop table if exists ev_bkt")
        spark.sql("drop table if exists dim_bkt")


def test_salted_join_equals_plain_join(spark, tiny_events):
    """Salting must not change results — inner and left, including
    unmatched left rows, on a Zipf-skewed key."""
    ev = fixtures.events_to_spark(spark, tiny_events).select(
        "entity", "ts", "phash"
    )
    dim = (
        ev.groupBy("entity").agg(F.avg("phash").alias("dim_v"))
        .filter(F.col("entity") != "e0000")  # leave one entity unmatched
    )
    for how in ("inner", "left"):
        plain = (
            ev.join(dim, "entity", how)
            .toPandas().sort_values(["entity", "ts"], ignore_index=True)
        )
        salted = (
            J.salted_equi_join(ev, dim, "entity", salt=4, how=how)
            .select(*plain.columns)
            .toPandas().sort_values(["entity", "ts"], ignore_index=True)
        )
        assert len(salted) == len(plain), how
        g = salted["dim_v"].astype(float).to_numpy()
        e = plain["dim_v"].astype(float).to_numpy()
        assert np.all((g == e) | (np.isnan(g) & np.isnan(e))), how


def test_salted_join_spreads_hot_key(spark, tiny_events):
    """The hot entity's rows must land on >1 salt value (the whole
    point), and right/full joins are refused."""
    ev = fixtures.events_to_spark(spark, tiny_events).select("entity", "ts", "phash")
    hot = ev.groupBy("entity").count().orderBy(F.desc("count")).first()["entity"]
    big_salt = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("", *[F.col(c).cast("string") for c in ev.columns])),
                1, 8,
            ), 16, 10,
        ).cast("long"),
        F.lit(4),
    )
    n_salts = (
        ev.filter(F.col("entity") == hot)
        .select(big_salt.alias("s")).distinct().count()
    )
    assert n_salts > 1
    dim = ev.groupBy("entity").agg(F.count(F.lit(1)).alias("n"))
    with pytest.raises(ValueError, match="inner/left"):
        J.salted_equi_join(ev, dim, "entity", how="full")


def test_row_salt_null_heavy_and_anagram_rows_spread(spark):
    """NULL-skipping concat collapsed ('h','x',NULL) / ('h',NULL,'x')
    (and null-heavy variants) onto one salt — the sentinel + field
    separator must spread them."""
    pdf = pd.DataFrame(
        {
            "k": ["h"] * 64,
            "a": [None if i % 2 else f"v{i}" for i in range(64)],
            "b": [f"v{i}" if i % 2 else None for i in range(64)],
        }
    )
    df = spark.createDataFrame(pdf)
    n = df.select(J.row_salt(df.columns, 8).alias("s")).distinct().count()
    assert n > 4  # 64 distinct rows over 8 salts: near-all salts hit
    # concat-anagram pair must not share a salt derivation input
    pair = spark.createDataFrame(
        pd.DataFrame({"k": ["h", "h"], "a": ["x", None], "b": [None, "x"]})
    )
    salts = [
        r["s"]
        for r in pair.select(J.row_salt(pair.columns, 1 << 30).alias("s")).collect()
    ]
    assert salts[0] != salts[1]
