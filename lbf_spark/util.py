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

    Laziness guard: frames with an upstream Exchange are returned
    untouched WITHOUT probing partition counts — under AQE,
    ``df.rdd`` materializes upstream shuffle stages at plan-build
    time (a throwaway execution the real action would repeat), and
    the shuffle already provides full parallelism anyway. Only
    narrow scan-rooted plans (where ``df.rdd`` is metadata-only) are
    probed."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    plan = df._jdf.queryExecution().sparkPlan().toString()
    if "Exchange" in plan:
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
