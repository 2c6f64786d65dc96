"""Data-profiling operators: the observability half of a data engine.

Skew profiling answers "will this key distribution break my shuffle?"
BEFORE a job runs — the operational companion to the salted join /
sliced-window mitigations. Table profiling is the deequ-style
column-quality summary (null fractions, cardinalities, bounds) a
100-TB ingest pipeline gates on. Both are pure aggregations: one
partial-aggregating groupBy per profile, never data-sized outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def key_skew_profile(df: DataFrame, key: str) -> DataFrame:
    """One-row skew profile of ``key``: key cardinality, total rows,
    the hottest key and its row count, median/p99 rows-per-key, and
    ``skew_ratio`` = max/mean rows-per-key (the number that predicts a
    straggler: a ratio ≫ shuffle-partition count means one reducer
    holds the key no matter how partitions are sized).

    Shape: groupBy(key) partial-agg (skew-safe — the hot key reduces
    map-side), then one aggregate over the |keys|-row frame. The
    hottest key is picked with a (count desc, key asc) total order."""
    counts = df.groupBy(F.col(key).cast("string").alias("__k")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    hottest = (
        counts.orderBy(F.desc("__n"), F.asc("__k"))
        .limit(1)
        .select(
            F.col("__k").alias("hottest_key"), F.col("__n").alias("max_rows")
        )
    )
    summary = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__n").alias("total_rows"),
        F.round(F.percentile("__n", F.lit(0.5)), 4).alias("p50_rows_per_key"),
        F.round(F.percentile("__n", F.lit(0.99)), 4).alias("p99_rows_per_key"),
        F.round(
            F.max("__n") / (F.sum("__n") / F.count(F.lit(1))), 4
        ).alias("skew_ratio"),
    )
    return summary.crossJoin(F.broadcast(hottest)).select(
        "n_keys",
        "total_rows",
        "max_rows",
        "hottest_key",
        "p50_rows_per_key",
        "p99_rows_per_key",
        "skew_ratio",
    )


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """deequ-style column profile: one row per column with null
    fraction, exact distinct count, and min/max (as strings — a
    heterogeneous profile row needs one type). Exact distincts expand
    to Spark's two-stage distinct aggregation; at 100 TB swap
    ``approx_count_distinct`` per column and keep the schema.

    All columns profile in ONE pass (a single aggregate over the scan,
    no per-column jobs); the unioned shape is |cols| rows."""
    total = F.count(F.lit(1))
    aggs = []
    for c in cols:
        aggs += [
            F.round(
                F.sum(F.col(c).isNull().cast("long")) / total, 6
            ).alias(f"__nf_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    out = None
    for c in cols:
        row = one.select(
            F.lit(c).alias("column"),
            F.col(f"__nf_{c}").alias("null_frac"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
        )
        out = row if out is None else out.unionAll(row)
    return out
