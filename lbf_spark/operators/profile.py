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


def table_profile(
    df: DataFrame, cols: list[str], approx: bool = False, rsd: float = 0.05
) -> DataFrame:
    """deequ-style column profile: one row per column with null
    fraction, distinct count, and min/max (as strings — a
    heterogeneous profile row needs one type).

    ``approx=False`` uses exact ``count_distinct`` — Spark's two-stage
    distinct aggregation, a per-column extra shuffle whose state is the
    distinct-value set. ``approx=True`` is the 100-TB twin: a
    HyperLogLog++ sketch (``approx_count_distinct``, relative standard
    deviation ``rsd``) that partial-aggregates map-side in O(1/rsd²)
    bytes per column, no distinct shuffle at all — same output schema,
    so gates written against the exact profile run unchanged. The
    sketch is deterministic for fixed data (hash-based, no sampling);
    tests/test_profile_approx.py pins its error against the exact twin.

    All columns profile in ONE pass (a single aggregate over the scan,
    no per-column jobs); the unioned shape is |cols| rows."""
    total = F.count(F.lit(1))
    nd = (
        (lambda c: F.approx_count_distinct(F.col(c), rsd))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = []
    for c in cols:
        aggs += [
            F.round(
                F.sum(F.col(c).isNull().cast("long")) / total, 6
            ).alias(f"__nf_{c}"),
            nd(c).alias(f"__nd_{c}"),
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


def group_quantiles_approx(
    df: DataFrame,
    value_col: str,
    by: str,
    probs: list[float] = (0.25, 0.5, 0.75, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles — the 100-TB twin of the exact
    ``percentile`` path (queries.q68): ``percentile_approx`` keeps a
    mergeable Greenwald-Khanna-style sketch per group, partial-
    aggregating map-side in O(accuracy·log n) state instead of sorting
    the group, with a guaranteed RANK error ≤ 1/accuracy: the returned
    value's empirical CDF position is within that of the requested
    prob (it returns a real data value; the exact type-7 estimator
    interpolates, so compare by rank, not by value —
    tests/test_profile_approx.py pins exactly that bound).

    Column names match q68's exact output (q25/q50/...) so the two are
    drop-in twins."""
    def _name(p: float) -> str:
        return "q" + str(int(p * 100) if (p * 100).is_integer() else p)

    return df.groupBy(by).agg(
        *[
            F.round(
                F.percentile_approx(value_col, F.lit(p), F.lit(accuracy)), 6
            ).alias(_name(p))
            for p in probs
        ]
    )
