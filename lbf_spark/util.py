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
    many-file and this is a no-op."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
