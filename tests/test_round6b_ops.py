"""Round-6 continuation operators: cost-balanced sharding and friends."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lbf_spark.operators import distributions as D


def _snake_twin(costs: dict, n: int) -> dict:
    """Pure-python replay: (cost desc, id asc) rank → snake shard."""
    order = sorted(costs, key=lambda i: (-costs[i], i))
    out = {}
    for r0, i in enumerate(order):
        rnd, pos = divmod(r0, n)
        out[i] = (r0 + 1, pos if rnd % 2 == 0 else n - 1 - pos)
    return out


def test_cost_balanced_shards_matches_twin(spark):
    """Banded global rank + snake assignment ≡ the plain python replay
    row-for-row — including ties (id asc) and zero costs (band edge:
    conv(0) has bit-length 1, shared with cost 1)."""
    rng = np.random.default_rng(7)
    costs = {i: int(v) for i, v in enumerate(rng.zipf(1.6, 300) * 100)}
    costs[0] = 0  # band-edge pin
    costs[1] = 1
    costs[2] = costs[3] = 4096  # exact power boundary + tie
    df = spark.createDataFrame(
        [(i, c) for i, c in costs.items()], "id long, cost long"
    )
    got = {
        r["id"]: (r["cost_rank"], r["shard"])
        for r in D.cost_balanced_shards(
            df, n_shards=8, cost_col="cost", id_col="id"
        ).collect()
    }
    assert got == _snake_twin(costs, 8)


def test_cost_balanced_shards_balance_law(spark):
    """On Zipf costs every snake round gives each shard exactly one
    row, so loads stay within ~one max-item of each other — while md5
    sharding (shuffle_shards) leaves a strictly larger spread on the
    same data."""
    rng = np.random.default_rng(11)
    vals = (rng.zipf(1.5, 2000).clip(max=10_000) * 37).astype(int)
    df = spark.createDataFrame(
        [(int(i), int(v)) for i, v in enumerate(vals)], "id long, cost long"
    )
    n = 16
    snake = (
        D.cost_balanced_shards(df, n_shards=n, cost_col="cost", id_col="id")
        .groupBy("shard")
        .agg(F.sum("cost").alias("load"))
        .collect()
    )
    loads = {r["shard"]: r["load"] for r in snake}
    assert set(loads) == set(range(n))  # every shard used
    spread = max(loads.values()) - min(loads.values())
    assert spread <= int(vals.max())
    md5_loads = (
        D.shuffle_shards(df, n_shards=n, id_col="id")
        .groupBy("shard")
        .agg(F.sum("cost").alias("load"))
        .collect()
    )
    md5_spread = max(r["load"] for r in md5_loads) - min(
        r["load"] for r in md5_loads
    )
    assert spread < md5_spread


def test_cost_balanced_shards_plan_no_global_window(spark):
    """The corpus-sized rank must come from per-band windows: the plan
    may sort/partition on __band but must NOT contain a corpus-wide
    single-partition window (the empty partitionBy marker), and no
    Python appears in the plan."""
    df = spark.range(500).select(
        F.col("id"), (F.col("id") % 97).alias("cost")
    )
    out = D.cost_balanced_shards(
        df, n_shards=8, cost_col="cost", id_col="id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__band" in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    # the only SinglePartition exchange feeds the ≤64-row band-offset
    # frame (its window sorts by __band), never the corpus rank window
    for frag in plan.split("Exchange"):
        if frag.startswith(" SinglePartition"):
            assert "__bn" in frag or "__band" in frag


def test_prep_images_cost_shards_identical_rows(spark):
    """prep_images(cost_shards=N) only moves WHERE decode work runs —
    output rows are bit-identical to the unbalanced chain."""
    from lbf_spark import fixtures
    from lbf_spark.plans.imageprep import prep_images

    ev = fixtures.events_to_spark(
        spark, fixtures.generate_events(n_rows=40, n_entities=4)
    ).select("image_id", "bytes", "fmt", "w", "h")
    tgts = [(16, 16), (24, 16)]
    base = {
        r["image_id"]: (bytes(r["bytes"]), r["w"], r["h"], r["batch_no"],
                        r["pos"])
        for r in prep_images(
            ev, tgts, mode="cover", batch_size=4, n_shards=2
        ).collect()
    }
    balanced = {
        r["image_id"]: (bytes(r["bytes"]), r["w"], r["h"], r["batch_no"],
                        r["pos"])
        for r in prep_images(
            ev, tgts, mode="cover", batch_size=4, n_shards=2, cost_shards=3
        ).collect()
    }
    assert balanced == base
