"""Iceberg metadata interop: golden-file pin of the schema/spec
translation and a full export → import round-trip on a real multi-
snapshot table (append + merge), plus spec-conformance spot checks."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from lbf_spark import fixtures
from lbf_spark.sources import table as TBL
from lbf_spark.sources import iceberg_interop as ICE

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "iceberg_schema_spec.json")


def test_schema_and_spec_translation_matches_golden():
    from pyspark.sql.types import (
        ArrayType, BinaryType, BooleanType, DoubleType, FloatType,
        IntegerType, LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("caption", StringType(), True),
        StructField("phash", LongType(), True),
        StructField("entity", StringType(), True),
        StructField("ts", LongType(), True),
        StructField("value", DoubleType(), True),
        StructField("flag", BooleanType(), True),
        StructField("embedding", ArrayType(FloatType(), True), True),
    ])
    ice = ICE.schema_to_iceberg(schema.json())
    spec = ICE.spec_to_iceberg(
        {"entity_bucket": "bucket(16, entity)",
         "ts_day": "floor(ts / 86400000000)"}, ice,
    )
    got = json.loads(json.dumps({"schema": ice, "partition_spec": spec},
                                sort_keys=True))
    exp = json.loads(open(GOLDEN).read())
    assert got == exp

    # spec conformance spot checks (public Iceberg spec invariants)
    assert all(f["id"] >= 1 for f in ice["fields"])
    ids = [f["id"] for f in ice["fields"]]
    assert len(ids) == len(set(ids))  # unique field ids
    assert spec["fields"][0]["field-id"] == 1000  # partition ids ≥ 1000
    by_name = {f["name"]: f["id"] for f in ice["fields"]}
    assert spec["fields"][0]["source-id"] == by_name["entity"]
    assert spec["fields"][1]["source-id"] == by_name["ts"]

    # unsupported types refuse loudly instead of exporting garbage
    from pyspark.sql.types import DecimalType
    bad = StructType([StructField("d", DecimalType(18, 4), True)])
    with pytest.raises(ValueError, match="unsupported"):
        ICE.schema_to_iceberg(bad.json())


def test_export_import_round_trip(spark, tmp_path, tiny_events):
    """write_table → append → merge, exported to Iceberg metadata and
    imported back: snapshot chain, parent links, visible file set and
    partition values all survive the round trip."""
    path = str(tmp_path / "ice_tbl")
    pdf = tiny_events[["image_id", "entity", "ts", "caption", "phash"]]
    df = fixtures.events_to_spark(
        spark, tiny_events
    ).select("image_id", "entity", "ts", "caption", "phash")
    half = pdf["ts"].median()
    TBL.write_table(df.filter(F.col("ts") <= half), path,
                    mode="overwrite", n_buckets=4, ts_unit_day=10_000)
    TBL.write_table(df.filter(F.col("ts") > half), path,
                    mode="append", n_buckets=4, ts_unit_day=10_000)
    changes = df.limit(20).withColumn("caption", F.lit("rewritten"))
    TBL.merge_upsert(spark, path, changes, keys=["image_id"])

    meta = ICE.to_iceberg_metadata(spark, path)
    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] == 3
    ops = [s["summary"]["operation"] for s in meta["snapshots"]]
    assert ops == ["overwrite", "append", "replace"]
    assert meta["snapshots"][1]["parent-snapshot-id"] == 1
    assert meta["snapshots"][2]["parent-snapshot-id"] == 2
    # record counts in the manifest entries = actual table rows
    snaps = TBL._read_snaps(spark, f"{path}/metadata")
    back = ICE.from_iceberg_metadata(meta)
    assert back["snapshot_ids"] == [1, 2, 3]
    assert back["parents"] == {2: 1, 3: 2}
    visible_engine = sorted(TBL._replay_files(snaps)["visible"])
    assert sorted(back["visible_files"]) == visible_engine
    # partition quotients: every exported file's (bucket, day) matches
    # its Hive path — the quotient↔multiple translation inverts exactly
    for rel, (bucket, day_q) in back["partition_quotients"].items():
        assert f"entity_bucket={bucket}/" in rel
        assert f"ts_day={day_q}/" in rel
    names = [n for n, _t, _r in back["schema_fields"]]
    assert names == ["image_id", "entity", "ts", "caption", "phash"]

    # serialized form lands next to the table via fsio and re-parses
    txt = ICE.write_iceberg_metadata(spark, path)
    on_disk = open(f"{path}/metadata/iceberg.metadata.json").read()
    assert on_disk == txt
    assert ICE.from_iceberg_metadata(json.loads(txt))["snapshot_ids"] == [1, 2, 3]

    # a foreign Iceberg document (no inline entries) is refused
    with pytest.raises(ValueError, match="x-visible-files"):
        ICE.from_iceberg_metadata({"format-version": 2, "snapshots": []})


def test_spec_evolution_exports_partition_spec_list(
    spark, tmp_path, tiny_events
):
    """evolve_partition_spec maps onto Iceberg's partition-specs LIST:
    one entry per generation with fresh field-ids (1000+2g/1001+2g),
    default-spec-id = the head's generation, each snapshot tagged with
    its own x-spec-id, and the import derives per-snapshot day
    quotients under the right generation's unit."""
    path = str(tmp_path / "ice_ev")
    df = fixtures.events_to_spark(spark, tiny_events).select(
        "image_id", "entity", "ts", "caption", "phash"
    )
    half = int(tiny_events["ts"].median())
    TBL.write_table(df.filter(F.col("ts") <= half), path,
                    mode="overwrite", n_buckets=16, ts_unit_day=10_000)
    TBL.evolve_partition_spec(spark, path, n_buckets=4,
                              ts_unit_day=20_000)
    TBL.write_table(df.filter(F.col("ts") > half), path)
    meta = ICE.to_iceberg_metadata(spark, path)
    specs = meta["partition-specs"]
    assert [sp["spec-id"] for sp in specs] == [0, 1]
    assert specs[0]["fields"][0]["transform"] == "bucket[16]"
    assert specs[1]["fields"][0]["transform"] == "bucket[4]"
    assert specs[1]["fields"][0]["field-id"] == 1002
    assert meta["default-spec-id"] == 1
    assert meta["last-partition-id"] == 1003
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    assert by_id[1]["x-spec-id"] == 0
    assert by_id[2]["x-spec-id"] == 1  # the evolve commit
    assert by_id[3]["x-spec-id"] == 1
    back = ICE.from_iceberg_metadata(meta)
    assert back["default_spec_id"] == 1 and back["n_partition_specs"] == 2
    # round trip keeps the full visible set across both layouts
    assert len(back["visible_files"]) == len(
        TBL._replay_files(TBL._read_snaps(spark, path + "/metadata"))[
            "visible"
        ]
    )
