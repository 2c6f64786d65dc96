import numpy as np
import pandas as pd

from lbf_spark import fixtures
from lbf_spark.operators.asof import asof_join, asof_join_sliced, interval_join


def _events(spark, pdf):
    return fixtures.events_to_spark(spark, pdf.drop(columns=["bytes"]).assign(bytes=None)[
        fixtures.EVENT_COLUMNS
    ])


def _pandas_asof(events: pd.DataFrame, anchors: pd.DataFrame, tolerance=None):
    out = []
    for entity, a in anchors.groupby("entity"):
        e = events[events.entity == entity].sort_values("ts")
        m = pd.merge_asof(
            a.sort_values("anchor_ts"),
            e[["ts", "duration"]],
            left_on="anchor_ts",
            right_on="ts",
            direction="backward",
            tolerance=tolerance,
        )
        out.append(m)
    return (
        pd.concat(out)
        .sort_values(["entity", "anchor_ts", "name"], ignore_index=True)
    )


def _check(got: pd.DataFrame, exp: pd.DataFrame):
    got = got.sort_values(["entity", "anchor_ts", "name"], ignore_index=True)
    assert len(got) == len(exp)
    assert (got["entity"] == exp["entity"]).all()
    for c in ["ts", "duration"]:
        g = got[c].astype("float64").to_numpy()
        x = exp[c].astype("float64").to_numpy()
        assert np.allclose(g, x, equal_nan=True), c


def test_asof_matches_pandas(spark, tiny_events, tiny_anchors):
    ev = _events(spark, tiny_events)
    an = fixtures.anchors_to_spark(spark, tiny_anchors)
    got = asof_join(ev, an, select=["ts", "duration"]).toPandas()
    _check(got, _pandas_asof(tiny_events, tiny_anchors))


def test_asof_sliced_equals_cogroup(spark, tiny_events, tiny_anchors):
    ev = _events(spark, tiny_events)
    an = fixtures.anchors_to_spark(spark, tiny_anchors)
    tol = 5000
    a = asof_join(ev, an, select=["ts", "duration"], tolerance=tol).toPandas()
    for w in (500, 1700, 5000):
        b = asof_join_sliced(
            ev, an, select=["ts", "duration"], tolerance=tol, slice_width=w
        ).toPandas()
        _check(b, _pandas_asof(tiny_events, tiny_anchors, tolerance=tol))
        _check(
            b,
            a.sort_values(["entity", "anchor_ts", "name"], ignore_index=True),
        )


def test_asof_zero_leakage(spark, tiny_events, tiny_anchors):
    """Injecting future events must not change any as-of result."""
    ev = _events(spark, tiny_events)
    an = fixtures.anchors_to_spark(spark, tiny_anchors)
    base = asof_join(ev, an, select=["ts", "duration"]).toPandas()

    future = tiny_events.copy()
    future["ts"] = future["ts"] + int(tiny_anchors["anchor_ts"].max()) + 10_000
    future["image_id"] = "future_" + future["image_id"]
    both = pd.concat([tiny_events, future], ignore_index=True)
    got = asof_join(_events(spark, both), an, select=["ts", "duration"]).toPandas()
    _check(got, base.sort_values(["entity", "anchor_ts", "name"], ignore_index=True))


def test_asof_no_event_entity_yields_nulls(spark, tiny_events, tiny_anchors):
    ev = _events(spark, tiny_events)
    extra = pd.DataFrame(
        [{"entity": "e9999", "anchor_ts": 5, "name": "setA", "score": 1, "strand": "+"}]
    ).astype({"score": "int32"})
    an = fixtures.anchors_to_spark(
        spark, pd.concat([tiny_anchors, extra], ignore_index=True)
    )
    got = asof_join(ev, an, select=["ts", "duration"]).toPandas()
    row = got[got.entity == "e9999"]
    assert len(row) == 1 and row["ts"].isna().all()


def test_interval_join_counts(spark, tiny_events, tiny_anchors):
    ev = _events(spark, tiny_events)
    an = fixtures.anchors_to_spark(spark, tiny_anchors)
    span = 1000
    got = (
        interval_join(ev.select("entity", "ts"), an, lower=-(span - 1), upper=0)
        .groupBy("entity", "anchor_ts", "name")
        .count()
        .toPandas()
        .set_index(["entity", "anchor_ts", "name"])["count"]
    )
    for a in tiny_anchors.itertuples(index=False):
        e = tiny_events[tiny_events.entity == a.entity]
        exp = int(((e.ts > a.anchor_ts - span) & (e.ts <= a.anchor_ts)).sum())
        key = (a.entity, a.anchor_ts, a.name)
        assert got.get(key, 0) == exp or (exp == 0 and key not in got.index)


def test_pit_feature_matrix_nulls_and_no_leakage(spark):
    from lbf_spark.operators.asof import pit_feature_matrix

    labels = spark.createDataFrame(
        pd.DataFrame(
            {"entity": ["a", "a", "b"], "anchor_ts": [5, 20, 3], "label_id": [1, 2, 3]}
        )
    )
    ga = spark.createDataFrame(
        pd.DataFrame(
            {"entity": ["a", "a"], "ts": [4, 10], "a_ts": [4, 10], "a_val": [1.0, 2.0]}
        )
    )
    gb = spark.createDataFrame(
        pd.DataFrame({"entity": ["b"], "ts": [2], "b_ts": [2], "b_val": [9.0]})
    )
    m = (
        pit_feature_matrix(
            labels, [(ga, ["a_ts", "a_val"]), (gb, ["b_ts", "b_val"])]
        )
        .toPandas()
        .sort_values("label_id", ignore_index=True)
    )
    # label 1: a@4 matches, no b group rows for entity a ⇒ null
    assert m.loc[0, "a_ts"] == 4 and pd.isna(m.loc[0, "b_ts"])
    # label 2: latest a is 10 (not the future-free 4 only) — still ≤ anchor
    assert m.loc[1, "a_ts"] == 10
    # label 3 (entity b): only b group matches; a side null
    assert pd.isna(m.loc[2, "a_ts"]) and m.loc[2, "b_ts"] == 2
    # zero leakage: every matched ts ≤ its anchor
    for c in ("a_ts", "b_ts"):
        ok = m[c].isna() | (m[c] <= m["anchor_ts"])
        assert ok.all()
