"""SparkSession factory with scale-oriented defaults.

The reference parallelizes nothing but a samtools subprocess
(``/root/reference/src/lbfextract/utils.py:187-190``); every knob here
exists to make the same logical pipeline run on a 1000-executor cluster:
AQE for runtime re-planning + skew-join splitting, Arrow for every
pandas-UDF boundary, and shuffle-partition counts sized to cores rather
than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "lbf_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    in the sandbox; on a real cluster the caller passes nothing and
    spark-submit supplies the master.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("LBF_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of small shuffle partitions and skew-join
        # splitting — the distributed answer to the reference's hand-tuned
        # single-pass samtools scan (SURVEY.md §4).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's coalescing floor is BYTE-based (1m default), but many of
        # this engine's reduce stages are CPU-dense over tiny rows
        # (array_intersect verification, as-of merge, rank statistics):
        # a 10 MB exchange would coalesce to ~10 tasks and idle the
        # other cores (measured r7: the q24 verify stage ran 16/32
        # tasks, 85 s CPU over 29 MB). 64k keeps such stages at full
        # width; at warehouse scale partitions are GBs and the floor is
        # inert. Env-overridable for deployments that want the default.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("LBF_AQE_MIN_PARTITION_SIZE", "64k"),
        )
        # Scan-split size. Sandbox/test inputs are single-digit-MB,
        # few-row-group files where a 128m split serializes the scan
        # (sf1.0 lineitem: 131.8 MB ⇒ 2 tasks); 16m reaches row-group
        # granularity. Production at TB scale should raise this to
        # 128m-1g (guide §6: fewer, larger map tasks) via the env.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("LBF_MAX_PARTITION_BYTES", "16m"),
        )
        # Arrow on both directions of every pandas UDF. Batch size 2048:
        # with KB-scale binary payloads, 10k-row batches mean ~30 MB
        # pandas frames per worker — measured 2× slower than 2k batches
        # at 32 workers (allocator churn); 2048 keeps batches ~6 MB.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Timestamps in the engine are int64 event-times; keep session TZ
        # fixed so timestamp-typed test tables hash identically everywhere.
        .config("spark.sql.session.timeZone", "UTC")
        # Local mode: the driver JVM IS the executor. 8g forced the q23
        # pair aggregation through ~1.7 GB of map+reduce spill (measured
        # r7); 24g on the 128 GiB sandbox keeps hash aggregations
        # in-memory. On a real cluster executor memory is sized by
        # spark-submit, not here (guide §5).
        .config("spark.driver.memory", os.environ.get("LBF_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # ship the package to executors (spark-submit --py-files equivalent),
    # so UDFs unpickle no matter where the driver was launched from
    from lbf_spark.packaging import ship_package

    ship_package(spark)
    return spark
