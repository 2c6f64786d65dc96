"""Small cross-cutting helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition when the incoming plan has fewer
    partitions than the cluster has cores.

    Row-local-heavy stages (regex tokenize, shingle, md5, explode) run
    at SCAN parallelism — a single-row-group parquet file yields ONE
    task no matter how many cores exist, serializing the whole stage
    (measured: the sf0.1 documents table is one row group; shingling
    5 000 docs took 4 s on 1 task vs ~0.3 s fanned out). The shuffle
    this inserts moves only the raw input rows (tiny next to the
    exploded output) and is deterministic (Spark sorts round-robin
    partitions for retry safety). At warehouse scale inputs are
    many-file and this is a no-op.

    Laziness guard: ``df.rdd`` under AQE materializes upstream
    exchange stages at plan-build time (a throwaway execution the
    real action would repeat), so the partition count is probed ONLY
    on plans with no Exchange of any kind. A plan with a SHUFFLE
    exchange is returned untouched (the shuffle already provides full
    parallelism); a plan with only a BroadcastExchange (broadcast
    join over a possibly-single-split scan) keeps the probe-side
    pathology, so it falls back to ``inputFiles()`` — driver-side
    file listing, no execution — as a lower bound on scan splits
    (multi-row-group files undercount, costing at worst one
    unnecessary narrow shuffle)."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    plan = df._jdf.queryExecution().sparkPlan().toString()
    shuffle_markers = (
        "Exchange hashpartitioning",
        "Exchange rangepartitioning",
        "Exchange RoundRobinPartitioning",
        "Exchange SinglePartition",
    )
    if any(m in plan for m in shuffle_markers):
        return df
    if "BroadcastExchange" in plan:
        n_files = len(df.inputFiles())
        if 0 < n_files < target:
            return df.repartition(target)
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
