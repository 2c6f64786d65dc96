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
