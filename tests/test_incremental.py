"""Incremental feature maintenance (operators/incremental.py) —
stitched refresh must be bit-identical to a full recompute, for both
granularities, including the late-data and new-entity edges."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window, functions as F

from lbf_spark.operators.incremental import (
    incremental_entity_refresh,
    incremental_range_refresh,
    refresh_lower_bound,
)

LOOKBACK = 500


def _feat_range(df):
    w = Window.partitionBy("entity").orderBy("ts").rangeBetween(-LOOKBACK, 0)
    return df.select(
        "entity",
        "ts",
        F.round(
            F.sum(F.col("duration").cast("decimal(18,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("f_mean"),
        F.count(F.lit(1)).over(w).alias("f_cnt"),
    )


def _feat_unbounded(df):
    # ffill-style feature: unbounded lookback ⇒ only the entity-level
    # refresh is exact for it
    w = (
        Window.partitionBy("entity")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.select(
        "entity",
        "ts",
        F.sum(F.col("duration").cast("decimal(18,4)")).over(w).alias("cum"),
        F.count(F.lit(1)).over(w).alias("seen"),
    )


def _df(spark, tiny_events):
    pdf = tiny_events[["entity", "ts", "duration"]].copy()
    return spark.createDataFrame(pdf)


def _split(df, mod, k=0):
    # deterministic split: rows whose (ts % mod) == k form the delta
    batch = df.filter(F.col("ts") % mod == k)
    base = df.filter(F.col("ts") % mod != k)
    return base, batch


def _collect(df):
    return (
        df.toPandas()
        .sort_values(list(df.columns), ignore_index=True)
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("fn,kind", [(_feat_range, "range"), (_feat_unbounded, "entity")])
def test_refresh_equals_full_recompute(spark, tiny_events, fn, kind):
    df = _df(spark, tiny_events)
    base, batch = _split(df, 7)
    assert batch.count() > 0 and base.count() > 0
    full = _collect(fn(df))
    if kind == "range":
        got = incremental_range_refresh(
            base, batch, fn, lookback=LOOKBACK, by="entity", order="ts"
        )
    else:
        got = incremental_entity_refresh(base, batch, fn, by="entity")
    pd.testing.assert_frame_equal(_collect(got), full)


def test_range_refresh_late_data_and_new_entity(spark, tiny_events):
    df = _df(spark, tiny_events)
    # delta = an EARLY slice of entity e0000 (late-arriving data that
    # invalidates a long suffix) + a brand-new entity never seen in base
    cut = df.filter(F.col("entity") == "e0000").agg(
        F.expr("percentile(ts, 0.2)").alias("c")
    ).first()["c"]
    late = df.filter((F.col("entity") == "e0000") & (F.col("ts") <= cut))
    new_entity = spark.createDataFrame(
        pd.DataFrame({"entity": ["zzz", "zzz"], "ts": [50, 600], "duration": [10, 20]})
    )
    batch = late.unionByName(new_entity)
    base = df.subtract(late)
    full = _collect(_feat_range(df.unionByName(new_entity)))
    got = incremental_range_refresh(
        base, batch, _feat_range, lookback=LOOKBACK, by="entity", order="ts"
    )
    pd.testing.assert_frame_equal(_collect(got), full)


def test_range_refresh_empty_batch_is_identity(spark, tiny_events):
    df = _df(spark, tiny_events)
    batch = df.filter(F.lit(False))
    got = incremental_range_refresh(
        df, batch, _feat_range, lookback=LOOKBACK, by="entity", order="ts"
    )
    pd.testing.assert_frame_equal(_collect(got), _collect(_feat_range(df)))
    assert refresh_lower_bound(batch, lookback=LOOKBACK, order="ts") is None


def test_refresh_lower_bound_prunes(spark, tiny_events):
    df = _df(spark, tiny_events)
    _, batch = _split(df, 7)
    lo = refresh_lower_bound(batch, lookback=LOOKBACK, order="ts")
    assert lo == batch.agg(F.min("ts")).first()[0] - LOOKBACK
    # the bound is safe: every row the range refresh touches is ≥ lo
    starts = batch.groupBy("entity").agg(F.min("ts").alias("s"))
    region_min = (
        df.join(starts, "entity")
        .filter(F.col("ts") >= F.col("s") - LOOKBACK)
        .agg(F.min("ts"))
        .first()[0]
    )
    assert region_min >= lo


def test_refresh_reuses_materialized_old_features(spark, tiny_events):
    # production shape: old features come from the feature table, not
    # a recompute — pass them in and the stitch must still be exact
    df = _df(spark, tiny_events)
    base, batch = _split(df, 7)
    old = spark.createDataFrame(_collect(_feat_range(base)))
    got = incremental_range_refresh(
        base,
        batch,
        _feat_range,
        lookback=LOOKBACK,
        by="entity",
        order="ts",
        old_features=old,
    )
    pd.testing.assert_frame_equal(_collect(got), _collect(_feat_range(df)))


def test_range_refresh_plan_broadcasts_starts(spark, tiny_events):
    df = _df(spark, tiny_events)
    base, batch = _split(df, 7)
    got = incremental_range_refresh(
        base, batch, _feat_range, lookback=LOOKBACK, by="entity", order="ts"
    )
    tree = got._jdf.queryExecution().executedPlan().toString()
    # the per-entity start frame rides as a broadcast — the big side is
    # never shuffled for the stitch itself
    assert "BroadcastHashJoin" in tree or "BroadcastExchange" in tree
