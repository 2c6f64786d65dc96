"""Halo-sliced window ops must equal the unsliced operators exactly,
while splitting a hot (Zipf) entity's work across many tasks."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lbf_spark import fixtures
from lbf_spark.operators import sliced_windows as SW, windows as W


WINDOW = 16
GAP = 1000
SLICE_W = 5_000  # fixture ts span ~100k → ~20 slices


@pytest.fixture(scope="module")
def events(spark):
    # Zipf fixture: hottest entity holds ≥20% of rows (the skew model)
    ev_pd = (
        fixtures.generate_events(n_rows=4000, n_entities=6)
        .drop_duplicates(subset=["entity", "ts"])
        [["entity", "ts", "duration", "phash"]]
    )
    df = spark.createDataFrame(ev_pd).repartition(8)
    df = df.withColumn("v", (F.col("phash") % 1000).cast("double"))
    return df


def _sorted(pdf, extra=()):
    return pdf.sort_values(["entity", "ts", *extra], ignore_index=True)


@pytest.mark.parametrize("kernel", ["mean", "sum", "min", "max", "median"])
def test_rolling_sliced_equals_unsliced(spark, events, kernel):
    unsliced_fn = {
        "mean": lambda d: W.rolling_mean(d, "v", "r", WINDOW),
        "sum": lambda d: W.rolling_sum(d, "v", "r", WINDOW),
        "min": lambda d: W.rolling_min_max(d, "v", "r", "_mx", WINDOW).drop("_mx"),
        "max": lambda d: W.rolling_min_max(d, "v", "_mn", "r", WINDOW).drop("_mn"),
        "median": lambda d: W.rolling_median(d, "v", "r", WINDOW),
    }[kernel]
    exp = _sorted(unsliced_fn(events).toPandas())
    got = _sorted(
        SW.rolling_sliced(
            events, "v", "r", WINDOW, kernel=kernel, slice_width=SLICE_W
        ).toPandas()
    )
    assert len(got) == len(exp)
    assert np.allclose(
        got["r"].astype(float), exp["r"].astype(float), rtol=0, atol=0
    ), kernel


def test_rolling_median_slice_width_param_routes(spark, events):
    exp = _sorted(W.rolling_median(events, "v", "r", WINDOW).toPandas())
    got = _sorted(
        W.rolling_median(events, "v", "r", WINDOW, slice_width=SLICE_W).toPandas()
    )
    assert np.allclose(got["r"], exp["r"], rtol=0, atol=0)


def test_sessionize_sliced_equals_unsliced(spark, events):
    exp = _sorted(W.sessionize(events, GAP, out="s").toPandas())
    got = _sorted(SW.sessionize_sliced(events, GAP, out="s", slice_width=SLICE_W).toPandas())
    assert len(got) == len(exp)
    assert np.array_equal(
        got["s"].astype("int64").to_numpy(), exp["s"].astype("int64").to_numpy()
    )


def test_sessionize_sliced_auto_width(spark, events):
    exp = _sorted(W.sessionize(events, GAP, out="s").toPandas())
    got = _sorted(SW.sessionize_sliced(events, GAP, out="s").toPandas())
    assert np.array_equal(
        got["s"].astype("int64").to_numpy(), exp["s"].astype("int64").to_numpy()
    )


def test_hot_entity_work_is_split(spark, events):
    """The Zipf-hot entity must span ≥4 slices — i.e. its window work
    lands in ≥4 independent tasks instead of one."""
    hot = (
        events.groupBy("entity").count().orderBy(F.desc("count")).first()["entity"]
    )
    n_slices = (
        SW._with_slice(events.filter(F.col("entity") == hot), "ts", SLICE_W)
        .select("_slice").distinct().count()
    )
    assert n_slices >= 4, n_slices


def test_halo_rows_are_bounded(spark, events):
    """Halo duplication is ≤ (window-1) per (entity, slice) — the
    duplicate-then-trim cost is O(parallelism), not O(data)."""
    sliced = SW._with_slice(events, "ts", SLICE_W)
    halos = SW._halo_rows(sliced, WINDOW, ["entity"], ["ts"])
    per_slice = halos.groupBy("entity", "_slice").count().toPandas()
    assert (per_slice["count"] <= WINDOW - 1).all()
    n_halo = int(per_slice["count"].sum())
    n_rows = events.count()
    n_groups = sliced.select("entity", "_slice").distinct().count()
    assert n_halo <= (WINDOW - 1) * n_groups
    assert n_halo < n_rows  # sanity: duplication stays a small fraction


def test_sparse_slices_halo_correct(spark):
    """Near-empty intermediate slices: the halo for slice s must reach
    back across multiple prior slices when s-1 has < window-1 rows."""
    rows = (
        [("a", t, float(t)) for t in range(0, 20)]       # slice 0 dense
        + [("a", 105, 105.0)]                            # slice 1: one row
        + [("a", t, float(t)) for t in range(200, 215)]  # slice 2 dense
    )
    df = spark.createDataFrame(rows, "entity string, ts long, v double")
    exp = _sorted(W.rolling_mean(df, "v", "r", 8).toPandas())
    got = _sorted(
        SW.rolling_sliced(df, "v", "r", 8, kernel="mean", slice_width=100).toPandas()
    )
    assert np.allclose(got["r"], exp["r"], rtol=0, atol=0)
    exp_s = _sorted(W.sessionize(df, 50, out="s").toPandas())
    got_s = _sorted(SW.sessionize_sliced(df, 50, out="s", slice_width=100).toPandas())
    assert np.array_equal(
        got_s["s"].astype("int64").to_numpy(), exp_s["s"].astype("int64").to_numpy()
    )
