"""Iceberg-style table layout over partitioned parquet.

The north_rule's storage is an Iceberg table of image+caption pairs; no
table-format runtime ships in this sandbox, so this module implements
the parts of that contract the engine actually relies on, on plain
partitioned parquet:

* a **partition spec** `(entity_bucket = hash(entity) % N, ts_day =
  floor(ts / day))` — the bucket keeps any one directory bounded under
  Zipf-skewed entities, the day column gives time-range pruning (the
  Iceberg `bucket(N, entity), days(ts)` transform pair);
* **snapshot manifests**: every write appends a JSON snapshot (schema,
  partition spec, the exact data files the write ADDED, parent pointer)
  — enough lineage to know exactly what a run read, and enough for
  **time travel** (`scan(snapshot_id=…)`) and **incremental reads**
  (`incremental_files` — the Iceberg changelog-read analog);
* **partition pruning**: `scan()` turns entity/time predicates into
  partition-column predicates so the parquet source prunes directories
  (verified via PartitionFilters in the physical plan).

Swapping in real Iceberg later = replacing these writers/readers with
catalog calls; every operator above this layer is unchanged.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

DAY = 86_400


def _with_partition_cols(df: DataFrame, n_buckets: int, ts_unit_day: int) -> DataFrame:
    return df.withColumn(
        "entity_bucket", F.pmod(F.xxhash64("entity"), F.lit(n_buckets)).cast("int")
    ).withColumn("ts_day", F.floor(F.col("ts") / F.lit(ts_unit_day)).cast("long"))


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    n_buckets: int = 16,
    ts_unit_day: int = DAY,
) -> dict:
    """Partitioned write + snapshot manifest. Returns the snapshot.

    ``path`` may be local, ``file:``-prefixed, or a DFS URI — all
    metadata IO goes through the Hadoop FileSystem API (``fsio``), the
    same requirement Iceberg itself has of its warehouse location."""
    from lbf_spark import fsio

    spark = df.sparkSession
    pdf = _with_partition_cols(df, n_buckets, ts_unit_day)
    pdf.write.mode(mode).partitionBy("entity_bucket", "ts_day").parquet(
        fsio.join(path, "data")
    )
    meta_dir = fsio.join(path, "metadata")
    fsio.mkdirs(spark, meta_dir)
    existing = [f for f in fsio.list_names(spark, meta_dir) if f.endswith(".json")]
    parent = existing[-1] if existing else None
    all_files = [
        f["path"]
        for f in fsio.list_files_recursive(spark, fsio.join(path, "data"), ".parquet")
    ]
    if mode == "overwrite" or parent is None:
        prev_cumulative: set[str] = set()
    else:
        prev_cumulative = set(
            _cumulative_files(spark, path, _read_snaps(spark, meta_dir))
        )
    added = sorted(set(all_files) - prev_cumulative)
    snapshot = {
        "snapshot_id": len(existing) + 1,
        "parent": parent,
        "schema": df.schema.json(),
        "partition_spec": {
            "entity_bucket": f"bucket({n_buckets}, entity)",
            "ts_day": f"floor(ts / {ts_unit_day})",
        },
        "added_files": added,
        "n_data_files": len(all_files),
        "mode": mode,
    }
    name = f"snap-{snapshot['snapshot_id']:05d}.json"
    fsio.write_text_atomic(spark, fsio.join(meta_dir, name), json.dumps(snapshot, indent=1))
    return snapshot


def _read_snaps(spark, meta_dir: str) -> list[dict]:
    from lbf_spark import fsio

    names = [f for f in fsio.list_names(spark, meta_dir) if f.endswith(".json")]
    return [
        json.loads(fsio.read_text(spark, fsio.join(meta_dir, n))) for n in names
    ]


def _cumulative_files(
    spark, path: str, snaps: list[dict], as_of: int | None = None
) -> list[str]:
    """The data files visible at snapshot ``as_of`` (default: latest):
    replay added_files, resetting at each overwrite — Iceberg's
    manifest-list reachability, one JSON per snapshot here. Raises if
    ``as_of`` predates the last overwrite (those files are gone)."""
    if as_of is not None and any(
        s["mode"] == "overwrite" and s["snapshot_id"] > as_of for s in snaps
    ):
        raise ValueError(
            f"snapshot {as_of} predates an overwrite — its data files "
            "no longer exist (this shim does not retain overwritten files)"
        )
    files: list[str] = []
    for s in snaps:
        if as_of is not None and s["snapshot_id"] > as_of:
            break
        if s["mode"] == "overwrite":
            files = []
        if "added_files" not in s:
            raise ValueError(
                f"snapshot {s['snapshot_id']} has no added_files list — "
                "manifest predates file tracking; time travel/incremental "
                "reads need manifests written by this table layer"
            )
        files.extend(s["added_files"])
    return files


def current_snapshot(path: str, spark: SparkSession | None = None) -> dict | None:
    from lbf_spark import fsio

    spark = spark or SparkSession.getActiveSession()
    meta_dir = fsio.join(path, "metadata")
    snaps = [f for f in fsio.list_names(spark, meta_dir) if f.endswith(".json")]
    if not snaps:
        return None
    return json.loads(fsio.read_text(spark, fsio.join(meta_dir, snaps[-1])))


def incremental_files(
    spark: SparkSession, path: str, after: int, until: int | None = None
) -> list[str]:
    """Data files added by snapshots in (after, until] — the Iceberg
    incremental/changelog read: a consumer that processed snapshot
    ``after`` reads exactly the new files, never rescanning the table.
    Raises if an overwrite happened in the range (a changelog consumer
    must restart from the overwrite)."""
    from lbf_spark import fsio

    snaps = _read_snaps(spark, fsio.join(path, "metadata"))
    picked: list[str] = []
    for s in snaps:
        sid = s["snapshot_id"]
        if sid <= after or (until is not None and sid > until):
            continue
        if s["mode"] == "overwrite":
            raise ValueError(
                f"snapshot {sid} is an overwrite — incremental reads "
                "across it are undefined; re-read the table from scratch"
            )
        if "added_files" not in s:
            raise ValueError(
                f"snapshot {sid} has no added_files list — manifest "
                "predates file tracking; incremental reads need manifests "
                "written by this table layer"
            )
        picked.extend(s["added_files"])
    data_dir = fsio.join(path, "data")
    return [fsio.join(data_dir, f) for f in picked]


def scan(
    spark: SparkSession,
    path: str,
    entities: list[str] | None = None,
    ts_min: int | None = None,
    ts_max: int | None = None,
    n_buckets: int = 16,
    ts_unit_day: int = DAY,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Pruned scan: entity/time predicates are rewritten onto the
    partition columns (bucket list, day range) so the source skips whole
    directories — the engine-side half of Iceberg's partition-transform
    pruning. The exact row-level predicate is applied on top.

    ``snapshot_id`` time-travels: only the data files visible at that
    snapshot are read (basePath keeps the hive partition columns), back
    to the most recent overwrite."""
    from lbf_spark import fsio

    data_dir = fsio.join(path, "data")
    if snapshot_id is None:
        df = spark.read.parquet(data_dir)
    else:
        snaps = _read_snaps(spark, fsio.join(path, "metadata"))
        files = _cumulative_files(spark, path, snaps, as_of=snapshot_id)
        df = spark.read.option("basePath", data_dir).parquet(
            *[fsio.join(data_dir, f) for f in files]
        )
    if entities:
        bucket_vals = (
            spark.createDataFrame([(e,) for e in entities], "entity string")
            .select(F.pmod(F.xxhash64("entity"), F.lit(n_buckets)).cast("int").alias("b"))
            .distinct()
            .toPandas()["b"]
            .tolist()
        )
        df = df.filter(F.col("entity_bucket").isin(bucket_vals)).filter(
            F.col("entity").isin(entities)
        )
    if ts_min is not None:
        df = df.filter(
            (F.col("ts_day") >= ts_min // ts_unit_day) & (F.col("ts") >= ts_min)
        )
    if ts_max is not None:
        df = df.filter(
            (F.col("ts_day") <= ts_max // ts_unit_day) & (F.col("ts") <= ts_max)
        )
    return df


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    order_col: str = "path",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Small-file compaction planner (the Iceberg ``BinPack`` rewrite
    analog for this table layout): files in deterministic ``order_col``
    order are packed left-to-right into rewrite groups of ≈
    ``target_bytes`` — ``group_id = floor(exclusive_prefix_sum(bytes) /
    target)``. Greedy in file order, so a group can overshoot by at
    most one file (the standard first-fit behavior); ordering by path
    keeps partition-adjacent files in the same rewrite group.

    The input is a file *manifest* (metadata), never data rows: the
    single-partition prefix-sum window is O(#files) — at 100 TB with
    128 MB files that is ~10^6 manifest rows on one task, fine; the
    actual rewrite jobs it plans are what touch data."""
    w = (
        Window.orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(bytes_col).over(w), F.lit(0))
    return files.withColumn(
        "group_id", F.floor(cum / F.lit(float(target_bytes))).cast("long")
    )


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out: str = "z_value",
) -> DataFrame:
    """Z-order (Morton) interleave key over m pre-bucketed non-negative
    integer columns — the multi-dimensional clustering key behind
    Iceberg/Delta ``ZORDER BY``: sorting by it co-locates rows close in
    EVERY dimension, so min/max file statistics prune scans on any of
    the m columns, not just the leading sort key.

    Bit i of column j lands at position ``i·m + j``; inputs clamp into
    ``[0, 2^bits)``. Pure JVM integer arithmetic (powers of two through
    ``pow`` are exact doubles up to 2^52, cast back to long) — no UDF,
    reproducible in ANSI SQL. Use with
    ``repartitionByRange(out).sortWithinPartitions(out)`` to lay files
    out; the key itself is what's verifiable."""
    m = len(cols)
    if m < 1 or bits * m > 62:
        raise ValueError("need 1+ columns and bits*len(cols) <= 62")
    lim = (1 << bits) - 1
    clamped = [
        F.greatest(F.lit(0), F.least(F.col(c).cast("long"), F.lit(lim)))
        for c in cols
    ]

    def _zbits(i):
        total = None
        for j, c in enumerate(clamped):
            bit = F.floor(c / F.pow(F.lit(2.0), i)).cast("long") % 2
            term = bit * F.pow(F.lit(2.0), i * m + j).cast("long")
            total = term if total is None else total + term
        return total

    z = F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc + _zbits(i),
    )
    return df.withColumn(out, z)
