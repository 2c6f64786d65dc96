"""Seeded probabilistic dyad mode (operators/windows.py:
dyad_centers_prob) vs an independent numpy/hashlib twin.

The reference's stochastic A5 extractor (signal_transformer.py:50-113)
draws the per-fragment nucleosome count with *unseeded*
np.random.choice; the engine keeps the same sampling law
(P(k = floor + 1) = remainder / spacing) but derives the uniform from
md5(seed:entity:event_id), so every draw is a pure function of the row.
The twin below recomputes the whole thing with hashlib + plain ints —
no Spark expressions shared with the operator.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from lbf_spark.operators import windows as W


def _twin_rows(rows, spacing, seed=42):
    """Independent recomputation: (entity, ts, duration, event_id) →
    list of (event_id, center_ts)."""
    out = []
    for entity, ts, duration, event_id in rows:
        blob = f"{seed}:{entity}:{event_id}".encode()
        u = int(hashlib.md5(blob).hexdigest()[:13], 16) / float(1 << 52)
        k_floor = duration // spacing
        p_next = (duration % spacing) / float(spacing)
        k = max(1, k_floor + (1 if u < p_next else 0))
        est = ts + duration // 2 - (k * spacing) // 2
        for i in range(k):
            out.append((event_id, est + spacing // 2 + i * spacing))
    return out


@pytest.fixture(scope="module")
def dyad_input():
    rows = []
    for eid in range(400):
        entity = f"e{eid % 5}"
        ts = 1_000_000_000 + eid * 7_919_000
        duration = 100_000 + (eid * 37) % 2_000_000  # spans 0.1–2.1 spacings
        rows.append((entity, ts, duration, eid))
    return rows


def test_prob_dyad_matches_hashlib_twin(spark, dyad_input):
    spacing = 1_000_000
    df = spark.createDataFrame(
        pd.DataFrame(dyad_input, columns=["entity", "ts", "duration", "event_id"])
    )
    got = sorted(
        (r["event_id"], r["center_ts"])
        for r in W.dyad_centers_prob(
            df, spacing, by="entity", on="ts", id_col="event_id"
        ).select("event_id", "center_ts").collect()
    )
    assert got == sorted(_twin_rows(dyad_input, spacing))


def test_prob_dyad_partition_order_independent(spark, dyad_input):
    """Same rows, adversarial partitioning → identical draws (the seeds
    are per-row, not per-partition)."""
    spacing = 1_000_000
    pdf = pd.DataFrame(dyad_input, columns=["entity", "ts", "duration", "event_id"])
    a = spark.createDataFrame(pdf).coalesce(1)
    b = spark.createDataFrame(pdf.iloc[::-1]).repartition(7, "event_id")
    run = lambda d: sorted(
        (r["event_id"], r["center_ts"])
        for r in W.dyad_centers_prob(
            d, spacing, by="entity", on="ts", id_col="event_id"
        ).select("event_id", "center_ts").collect()
    )
    assert run(a) == run(b)


def test_prob_dyad_sampling_law(spark):
    """Seeded draws must track the law's expectation: over many rows
    with duration = 1.5 × spacing, E[k] = 1.5 and every k ∈ {1, 2}."""
    spacing = 1_000_000
    rows = [(f"e{i % 11}", i * 10_000_000, 1_500_000, i) for i in range(4000)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["entity", "ts", "duration", "event_id"])
    )
    ks = (
        W.dyad_centers_prob(
            df, spacing, by="entity", on="ts", id_col="event_id", with_k=True
        )
        .select("event_id", "dyad_k")
        .distinct()
        .toPandas()["dyad_k"]
    )
    assert set(ks.unique()) <= {1, 2}
    assert abs(ks.mean() - 1.5) < 0.05


def test_prob_dyad_geometry(spark):
    """Centers are evenly spaced by `spacing`, centered on the fragment
    midpoint (± integer floor), count == drawn k."""
    spacing = 1_000_000
    rows = [("e0", 5_000_000_000, 3_700_000, 1)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["entity", "ts", "duration", "event_id"])
    )
    out = (
        W.dyad_centers_prob(
            df, spacing, by="entity", on="ts", id_col="event_id", with_k=True
        )
        .orderBy("center_ts")
        .collect()
    )
    k = out[0]["dyad_k"]
    assert len(out) == k and k in (3, 4)
    centers = [r["center_ts"] for r in out]
    assert all(b - a == spacing for a, b in zip(centers, centers[1:]))
    mid = 5_000_000_000 + 3_700_000 // 2
    est = mid - (k * spacing) // 2
    assert centers[0] == est + spacing // 2
