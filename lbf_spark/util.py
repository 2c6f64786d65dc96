"""Small cross-cutting helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Partitioning spellings that mean "a shuffle already spread the rows
# over many tasks" — matched case-insensitively so Catalyst node
# renames across Spark versions degrade gracefully (see fan_out).
_FULL_PARALLEL_MARKERS = (
    "hashpartitioning",
    "rangepartitioning",
    "roundrobinpartitioning",
)


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

    Plan dispatch (version-tolerant, probed on the ``executedPlan``
    string — building the AdaptiveSparkPlan wrapper executes nothing
    (``isFinalPlan=false``), and unlike ``sparkPlan`` it INCLUDES the
    exchanges EnsureRequirements inserts, so aggregate/join plans are
    recognized instead of falling through to the ``df.rdd`` probe,
    which would materialize their shuffle stages at plan-build time):

    - hash/range/round-robin exchange anywhere → returned untouched
      (the shuffle already provides full parallelism downstream);
    - ``SinglePartition`` exchange with no full-parallelism shuffle
      (global sort / limit / scalar aggregate) → ONE task feeds every
      downstream stage, the exact pathology fan_out exists to fix →
      unconditionally ``repartition(target)`` (a narrow round-robin of
      the — usually small — post-collapse rows);
    - broadcast exchange only, or an Exchange spelling this version
      doesn't recognize → ``df.rdd`` would materialize upstream stages
      at plan-build time under AQE, so fall back to ``inputFiles()``
      (driver-side listing, no execution) as a lower bound on scan
      splits — multi-row-group files undercount, costing at worst one
      unnecessary narrow shuffle;
    - narrow plan (no exchange at all) → probe
      ``df.rdd.getNumPartitions()`` directly (safe: nothing to
      execute).

    If the private plan-string probe itself fails (API moved), the
    ``inputFiles()`` fallback is used.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism

    def _files_fallback() -> DataFrame:
        n_files = len(df.inputFiles())
        if 0 < n_files < target:
            return df.repartition(target)
        return df

    try:
        plan = df._jdf.queryExecution().executedPlan().toString().lower()
    except Exception:
        return _files_fallback()
    if any(m in plan for m in _FULL_PARALLEL_MARKERS):
        return df
    if "singlepartition" in plan:
        return df.repartition(target)
    if "exchange" in plan:
        # BroadcastExchange, or a renamed/unknown exchange node: never
        # risk the df.rdd probe over a plan that contains an exchange.
        return _files_fallback()
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def free_local_checkpoint(df: DataFrame) -> bool:
    """Unpersist the block-backed RDD behind an EAGER ``localCheckpoint``
    (a ``LogicalRDD`` plan). The frame's data is UNRECOVERABLE
    afterwards — local checkpoints truncate the recompute lineage — so
    only call on frames nothing will act on again (a superseded
    iteration round, a released scope). Returns False (doing nothing)
    when the plan is not a LogicalRDD, e.g. a RELIABLE ``checkpoint``
    (its DFS files are owned by the checkpoint-dir lifecycle, not block
    storage). This is the release half of the iterative-algorithm
    lineage-truncation rule (CLAUDE.md): without it every round's
    node-sized blocks (and each bench repeat's edge list) stay resident
    until the session dies — measured r7: the q55@10x pair stage's CPU
    grew 246 → 566 s across three same-JVM repeats from the
    accumulated storage + GC pressure."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return False
        plan.rdd().unpersist(False)
        return True
    except Exception:
        return False
