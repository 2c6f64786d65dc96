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
  partition spec, file count, parent pointer) — enough lineage to know
  exactly what a run read;
* **partition pruning**: `scan()` turns entity/time predicates into
  partition-column predicates so the parquet source prunes directories
  (verified via PartitionFilters in the physical plan).

Swapping in real Iceberg later = replacing these writers/readers with
catalog calls; every operator above this layer is unchanged.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

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
    """Partitioned write + snapshot manifest. Returns the snapshot."""
    pdf = _with_partition_cols(df, n_buckets, ts_unit_day)
    pdf.write.mode(mode).partitionBy("entity_bucket", "ts_day").parquet(
        os.path.join(path, "data")
    )
    meta_dir = os.path.join(path, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    existing = sorted(f for f in os.listdir(meta_dir) if f.endswith(".json"))
    parent = existing[-1] if existing else None
    n_files = sum(
        len([f for f in files if f.endswith(".parquet")])
        for _, _, files in os.walk(os.path.join(path, "data"))
    )
    snapshot = {
        "snapshot_id": len(existing) + 1,
        "parent": parent,
        "schema": df.schema.json(),
        "partition_spec": {
            "entity_bucket": f"bucket({n_buckets}, entity)",
            "ts_day": f"floor(ts / {ts_unit_day})",
        },
        "n_data_files": n_files,
        "mode": mode,
    }
    name = f"snap-{snapshot['snapshot_id']:05d}.json"
    with open(os.path.join(meta_dir, name), "w") as fh:
        json.dump(snapshot, fh, indent=1)
    return snapshot


def current_snapshot(path: str) -> dict | None:
    meta_dir = os.path.join(path, "metadata")
    if not os.path.isdir(meta_dir):
        return None
    snaps = sorted(f for f in os.listdir(meta_dir) if f.endswith(".json"))
    if not snaps:
        return None
    with open(os.path.join(meta_dir, snaps[-1])) as fh:
        return json.load(fh)


def scan(
    spark: SparkSession,
    path: str,
    entities: list[str] | None = None,
    ts_min: int | None = None,
    ts_max: int | None = None,
    n_buckets: int = 16,
    ts_unit_day: int = DAY,
) -> DataFrame:
    """Pruned scan: entity/time predicates are rewritten onto the
    partition columns (bucket list, day range) so the source skips whole
    directories — the engine-side half of Iceberg's partition-transform
    pruning. The exact row-level predicate is applied on top."""
    df = spark.read.parquet(os.path.join(path, "data"))
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
