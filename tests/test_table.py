"""Iceberg-style table layout: snapshots, pruning, append lineage."""

from pyspark.sql import functions as F

from lbf_spark import fixtures
from lbf_spark.sources import table as TBL


def _explain(df):
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_write_scan_roundtrip_and_snapshots(spark, tiny_events, tmp_path):
    path = str(tmp_path / "tbl")
    ev = fixtures.events_to_spark(spark, tiny_events)
    snap1 = TBL.write_table(ev, path, mode="overwrite", ts_unit_day=10_000)
    assert snap1["snapshot_id"] == 1 and snap1["n_data_files"] > 0

    got = TBL.scan(spark, path)
    assert got.count() == len(tiny_events)

    # append = new snapshot with parent lineage
    extra = fixtures.events_to_spark(spark, tiny_events.iloc[:100])
    snap2 = TBL.write_table(extra, path, mode="append", ts_unit_day=10_000)
    assert snap2["snapshot_id"] == 2 and snap2["parent"] == "snap-00001.json"
    assert TBL.scan(spark, path).count() == len(tiny_events) + 100
    assert TBL.current_snapshot(path)["snapshot_id"] == 2


def test_table_file_uri_roundtrip(spark, tiny_events, tmp_path):
    """Scheme-prefixed warehouse paths (file:// stands in for hdfs://,
    s3a://): metadata IO must go through the Hadoop FS API, not os.*."""
    path = "file://" + str(tmp_path / "tbl_uri")
    ev = fixtures.events_to_spark(spark, tiny_events)
    snap = TBL.write_table(ev, path, mode="overwrite", ts_unit_day=10_000)
    assert snap["snapshot_id"] == 1 and snap["n_data_files"] > 0
    assert TBL.scan(spark, path).count() == len(tiny_events)
    assert TBL.current_snapshot(path)["snapshot_id"] == 1


def test_time_travel_and_incremental_reads(spark, tiny_events, tmp_path):
    """Snapshot file lists: scan(snapshot_id=N) reproduces the table as
    of N; incremental_files gives exactly the files a changelog
    consumer must read; overwrites invalidate history before them."""
    import pytest as _pytest

    from lbf_spark.sources.table import incremental_files

    path = str(tmp_path / "tbl_tt")
    ev = fixtures.events_to_spark(spark, tiny_events)
    TBL.write_table(ev, path, mode="overwrite", ts_unit_day=10_000)        # snap 1
    n1 = len(tiny_events)
    extra = fixtures.events_to_spark(spark, tiny_events.iloc[:100])
    TBL.write_table(extra, path, mode="append", ts_unit_day=10_000)        # snap 2
    extra2 = fixtures.events_to_spark(spark, tiny_events.iloc[100:150])
    TBL.write_table(extra2, path, mode="append", ts_unit_day=10_000)       # snap 3

    assert TBL.scan(spark, path, snapshot_id=1).count() == n1
    assert TBL.scan(spark, path, snapshot_id=2).count() == n1 + 100
    assert TBL.scan(spark, path, snapshot_id=3).count() == n1 + 150
    assert TBL.scan(spark, path).count() == n1 + 150
    # time-traveled scans keep the hive partition columns (basePath)
    assert "entity_bucket" in TBL.scan(spark, path, snapshot_id=1).columns

    # changelog read: snapshots (1, 3] = the 150 appended rows
    inc = incremental_files(spark, path, after=1)
    assert spark.read.option(
        "basePath", path + "/data"
    ).parquet(*inc).count() == 150
    inc23 = incremental_files(spark, path, after=2, until=3)
    assert spark.read.option("basePath", path + "/data").parquet(*inc23).count() == 50

    # an overwrite invalidates earlier snapshots and breaks changelogs
    TBL.write_table(extra2, path, mode="overwrite", ts_unit_day=10_000)    # snap 4
    assert TBL.scan(spark, path, snapshot_id=4).count() == 50
    with _pytest.raises(ValueError, match="predates an overwrite"):
        TBL.scan(spark, path, snapshot_id=2).count()
    with _pytest.raises(ValueError, match="overwrite"):
        incremental_files(spark, path, after=3)


def test_scan_prunes_partitions(spark, tiny_events, tmp_path):
    path = str(tmp_path / "tbl2")
    ev = fixtures.events_to_spark(spark, tiny_events)
    TBL.write_table(ev, path, mode="overwrite", ts_unit_day=10_000)

    pruned = TBL.scan(spark, path, entities=["e0000"], ts_unit_day=10_000)
    plan = _explain(pruned)
    # bucket predicate must land in PartitionFilters (directory pruning)
    pf = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "entity_bucket" in pf
    # correctness: same rows as a full-scan filter
    full = TBL.scan(spark, path, ts_unit_day=10_000).filter(F.col("entity") == "e0000")
    assert pruned.count() == full.count() == int((tiny_events.entity == "e0000").sum())


def test_scan_time_range_pruning(spark, tiny_events, tmp_path):
    path = str(tmp_path / "tbl3")
    ev = fixtures.events_to_spark(spark, tiny_events)
    TBL.write_table(ev, path, mode="overwrite", ts_unit_day=10_000)
    lo, hi = 15_000, 30_000
    pruned = TBL.scan(spark, path, ts_min=lo, ts_max=hi, ts_unit_day=10_000)
    plan = _explain(pruned)
    assert "ts_day" in plan.split("PartitionFilters")[1].splitlines()[0]
    exp = int(((tiny_events.ts >= lo) & (tiny_events.ts <= hi)).sum())
    assert pruned.count() == exp
