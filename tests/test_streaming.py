"""Streaming = batch parity (the Structured Streaming unification) +
late-data watermark behavior."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lbf_spark import fixtures
from lbf_spark.streaming.stream_features import (
    run_stream_to_memory,
    stream_session_stats,
    stream_tumbling_counts,
)

GAP = 1000
WIN = 500


@pytest.fixture(scope="module")
def stream_input(tmp_path_factory, tiny_events):
    d = tmp_path_factory.mktemp("stream_src")
    pdf = tiny_events.drop(columns=["bytes"])
    # two files = two micro-batch splits
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:500], preserve_index=False),
                   str(d / "part1.parquet"))
    pq.write_table(pa.Table.from_pandas(pdf.iloc[500:], preserve_index=False),
                   str(d / "part2.parquet"))
    return str(d)


def _keys(df: pd.DataFrame, cols):
    return sorted(map(tuple, df[cols].itertuples(index=False)))


def test_stream_sessions_match_batch(spark, stream_input):
    static = spark.read.parquet(stream_input)
    batch = stream_session_stats(static, GAP).toPandas()
    run_stream_to_memory(
        spark, stream_input, lambda df: stream_session_stats(df, GAP), "sess_tbl"
    )
    streamed = spark.sql("select * from sess_tbl").toPandas()
    cols = ["entity", "session_start", "session_end", "n_events", "session_span"]
    assert _keys(streamed, cols) == _keys(batch, cols)
    assert len(batch) > 2  # fixture really has session gaps


def test_stream_tumbling_match_batch(spark, stream_input):
    static = spark.read.parquet(stream_input)
    batch = stream_tumbling_counts(static, WIN, value_col="duration").toPandas()
    run_stream_to_memory(
        spark,
        stream_input,
        lambda df: stream_tumbling_counts(df, WIN, value_col="duration"),
        "tumb_tbl",
    )
    streamed = spark.sql("select * from tumb_tbl").toPandas()
    cols = ["entity", "bucket_start", "n_events"]
    assert _keys(streamed, cols) == _keys(batch, cols)


def test_watermark_drops_very_late_events(spark, tmp_path):
    """Events older than the watermark behind the stream's max event
    time must not extend closed sessions (append-mode semantics)."""
    d = tmp_path / "late_src"
    d.mkdir()
    on_time = pd.DataFrame(
        {"entity": ["e1"] * 3, "ts": [1_000_000, 1_000_010, 2_000_000]}
    )
    pq.write_table(pa.Table.from_pandas(on_time, preserve_index=False),
                   str(d / "a.parquet"))
    src = spark.readStream.schema("entity string, ts long").parquet(str(d))
    q = (
        stream_session_stats(src, GAP, watermark="60 seconds")
        .writeStream.format("memory")
        .queryName("late_tbl")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from late_tbl").toPandas()
    # watermark = max_event - 60s = 2_000_000 - 60; the first session
    # (ends 1_000_010 + gap) is final and emitted; the newest is still open
    assert (got["session_start"] == 1_000_000).any()
    assert not (got["session_start"] == 2_000_000).any()


def test_stateful_asof_enrich_stream_equals_batch(spark, tmp_path, tiny_events):
    """Streaming point-in-time join: a tagged feature+anchor stream
    split over 3 time-ordered micro-batches must reproduce the batch
    asof_join exactly — anchors matching features from EARLIER batches
    prove the state carry; anchors before any feature emit nulls."""
    import os
    import numpy as np
    from lbf_spark.operators.asof import asof_join
    from lbf_spark.streaming.stream_features import stream_asof_enrich

    pdf = (
        tiny_events.drop(columns=["bytes"])
        .drop_duplicates(subset=["entity", "ts"])
        .sort_values("ts", ignore_index=True)
    )
    pdf["v"] = (pdf["phash"] % 1000).astype(float)
    feats = pdf[["entity", "ts", "v"]].assign(kind="f")
    anchors = (
        pdf.iloc[::7][["entity", "ts"]]
        .assign(ts=lambda d: d["ts"] + 3, v=0.0, kind="a")
    )
    tagged = (
        pd.concat([feats, anchors[["entity", "ts", "v", "kind"]]])
        .sort_values("ts", ignore_index=True)
    )
    d = tmp_path / "src"
    d.mkdir()
    n = len(tagged)
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        p = str(d / f"part{i}.parquet")
        pq.write_table(pa.Table.from_pandas(tagged.iloc[lo:hi], preserve_index=False), p)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    src = spark.readStream.schema(
        spark.read.parquet(str(d)).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(d))
    q = (
        stream_asof_enrich(src)
        .writeStream.format("memory")
        .queryName("asof_tbl")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("select * from asof_tbl").toPandas()
        .sort_values(["entity", "anchor_ts"], ignore_index=True)
    )
    ev = spark.createDataFrame(feats[["entity", "ts", "v"]])
    an = spark.createDataFrame(
        anchors[["entity", "ts"]].rename(columns={"ts": "anchor_ts"})
    )
    exp = (
        asof_join(ev, an, select=["v", "ts"])
        .toPandas()
        .sort_values(["entity", "anchor_ts"], ignore_index=True)
    )
    assert len(got) == len(exp) and len(got) > 10
    a = got["matched_v"].astype(float).to_numpy()
    b = exp["v"].astype(float).to_numpy()
    assert np.all((a == b) | (np.isnan(a) & np.isnan(b)))
    at = got["matched_ts"].astype(float).to_numpy()
    bt = exp["ts"].astype(float).to_numpy()
    assert np.all((at == bt) | (np.isnan(at) & np.isnan(bt)))


def test_stateful_rolling_mean_stream_equals_batch(spark, tmp_path, tiny_events):
    """applyInPandasWithState custom operator: rolling mean state must
    carry across micro-batches — 3 time-ordered files, one per trigger,
    compared to the batch windows.rolling_mean."""
    import os
    import numpy as np
    from lbf_spark.operators.windows import rolling_mean
    from lbf_spark.streaming.stream_features import stream_rolling_mean_stateful

    WINDOW = 8
    pdf = (
        tiny_events.drop(columns=["bytes"])
        .drop_duplicates(subset=["entity", "ts"])
        .sort_values("ts", ignore_index=True)
    )
    pdf["v"] = (pdf["phash"] % 1000).astype(float)
    pdf = pdf[["entity", "ts", "v"]]
    d = tmp_path / "src"
    d.mkdir()
    n = len(pdf)
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        p = str(d / f"part{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf.iloc[lo:hi], preserve_index=False), p)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    src = spark.readStream.schema(
        spark.read.parquet(str(d)).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(d))
    q = (
        stream_rolling_mean_stateful(src, window=WINDOW)
        .writeStream.format("memory")
        .queryName("roll_tbl")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("select * from roll_tbl")
        .toPandas()
        .sort_values(["entity", "ts"], ignore_index=True)
    )
    static = spark.createDataFrame(pdf)
    exp = (
        rolling_mean(static, "v", "roll_mean", WINDOW, order="ts")
        .toPandas()
        .sort_values(["entity", "ts"], ignore_index=True)
    )
    assert len(got) == len(exp) and len(got) > 0
    assert np.allclose(got["roll_mean"], exp["roll_mean"], rtol=1e-12, atol=1e-12)
    # state really crossed batches: rows in later thirds have windows
    # spanning the file boundary — the exact equality above proves it


def test_stream_dedup_across_microbatches(spark, tmp_path):
    """Exact dedup with watermark state: a key re-delivered in a LATER
    micro-batch is dropped; the surviving set equals batch
    dropDuplicates. maxFilesPerTrigger=1 forces the re-delivery into a
    separate batch so cross-batch state is what's under test."""
    from lbf_spark.streaming.stream_features import stream_dedup

    d = tmp_path / "dedup_src"
    d.mkdir()
    b1 = pd.DataFrame({"k": ["a", "b", "c"], "ts": [100, 110, 120]})
    b2 = pd.DataFrame({"k": ["b", "d", "a"], "ts": [130, 140, 150]})  # b, a re-sent
    pq.write_table(pa.Table.from_pandas(b1, preserve_index=False), str(d / "b1.parquet"))
    pq.write_table(pa.Table.from_pandas(b2, preserve_index=False), str(d / "b2.parquet"))
    src = (
        spark.readStream.schema("k string, ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        stream_dedup(src, ["k"], watermark_delay="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_tbl")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select k from dedup_tbl").toPandas()["k"].tolist()
    assert sorted(got) == ["a", "b", "c", "d"]


def test_stream_table_sink_exactly_once(spark, tmp_path, tiny_events):
    """Stream → snapshot table: availableNow run lands every row
    exactly once (one snapshot per micro-batch, batch lineage in the
    manifests); a REPLAYED micro-batch (foreachBatch is at-least-once)
    is skipped idempotently; the table then time-travels normally."""
    import json as _json

    from lbf_spark.sources import table as TBL
    from lbf_spark.streaming.stream_features import stream_table_sink

    src_dir = tmp_path / "sink_src"
    src_dir.mkdir()
    pdf = tiny_events[["entity", "ts", "image_id", "phash"]]
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:400], preserve_index=False),
                   str(src_dir / "a.parquet"))
    pq.write_table(pa.Table.from_pandas(pdf.iloc[400:], preserve_index=False),
                   str(src_dir / "b.parquet"))
    tbl = str(tmp_path / "sink_tbl")
    stream = spark.readStream.schema(
        "entity string, ts long, image_id string, phash long"
    ).option("maxFilesPerTrigger", "1").parquet(str(src_dir))
    q = stream_table_sink(
        stream, tbl, checkpoint_dir=str(tmp_path / "sink_ckpt"),
        ts_unit_day=10_000,
    )
    q.awaitTermination(120)
    assert TBL.scan(spark, tbl).count() == len(pdf)
    snap = TBL.current_snapshot(tbl, spark)
    assert snap["batch_id"] is not None and snap["snapshot_id"] >= 2

    # the at-least-once replay contract, invoked directly: re-commit
    # the LAST batch id with its data — must be an idempotent no-op
    from lbf_spark.streaming.stream_features import table_batch_commit

    names = sorted(p.name for p in (tmp_path / "sink_tbl" / "metadata").iterdir())
    last = _json.loads((tmp_path / "sink_tbl" / "metadata" / names[-1]).read_text())
    replay_df = spark.createDataFrame(pdf.iloc[400:])
    assert table_batch_commit(
        replay_df, last["batch_id"], tbl, ts_unit_day=10_000
    ) is None
    assert TBL.scan(spark, tbl).count() == len(pdf)  # nothing duplicated
    assert TBL.current_snapshot(tbl, spark)["snapshot_id"] == last["snapshot_id"]
    # a genuinely NEW batch id still commits
    new_df = spark.createDataFrame(
        pdf.iloc[:5].assign(image_id=lambda d: "nb_" + d.image_id)
    )
    snap = table_batch_commit(new_df, last["batch_id"] + 1, tbl, ts_unit_day=10_000)
    assert snap is not None
    assert TBL.scan(spark, tbl).count() == len(pdf) + 5


def test_stream_image_decode_matches_batch(spark, tmp_path, tiny_events):
    """The flagship's decode stage runs unchanged under Structured
    Streaming (mapInPandas is streaming-compatible): per-image pixel
    stats from a 2-micro-batch stream == the batch run."""
    from lbf_spark.operators.images import decode_stats

    src_dir = tmp_path / "img_src"
    src_dir.mkdir()
    pdf = tiny_events[["image_id", "bytes", "fmt"]].iloc[:300]
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:150], preserve_index=False),
                   str(src_dir / "a.parquet"))
    pq.write_table(pa.Table.from_pandas(pdf.iloc[150:], preserve_index=False),
                   str(src_dir / "b.parquet"))
    batch = (
        decode_stats(spark.read.parquet(str(src_dir)))
        .select("image_id", "pixel_mean", "pixel_std")
        .toPandas().sort_values("image_id", ignore_index=True)
    )
    stream = spark.readStream.schema(
        "image_id string, bytes binary, fmt string"
    ).option("maxFilesPerTrigger", "1").parquet(str(src_dir))
    q = (
        decode_stats(stream)
        .select("image_id", "pixel_mean", "pixel_std")
        .writeStream.format("memory").queryName("img_stats_tbl")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("img_stats_tbl")
        .toPandas().sort_values("image_id", ignore_index=True)
    )
    assert len(got) == len(batch) == 300
    assert (got["image_id"] == batch["image_id"]).all()
    import numpy as np
    np.testing.assert_allclose(got["pixel_mean"], batch["pixel_mean"], rtol=0, atol=0)
    np.testing.assert_allclose(got["pixel_std"], batch["pixel_std"], rtol=0, atol=0)


def test_stream_cdc_apply_latest_state(spark, tmp_path, tiny_events):
    """Changelog stream → continuously-merged table: two micro-batches
    of updates/inserts/deletes end in exactly the pandas-computed
    latest-per-key state; a replayed batch is an idempotent no-op."""
    import pandas as pd

    from lbf_spark.sources import table as TBL
    from lbf_spark.streaming.stream_features import (
        cdc_batch_apply, stream_cdc_apply,
    )

    base = tiny_events[["image_id", "ts", "entity", "phash"]].iloc[:60].copy()
    base["__del"] = False
    # batch 2: update 10 keys (newer ts), delete 5, insert 5 new keys,
    # plus an OLDER duplicate change for one key (must lose the reduce)
    upd = base.iloc[:10].copy()
    upd["ts"] = upd["ts"] + 1_000_000
    upd["phash"] = 777
    stale = base.iloc[[0]].copy()
    stale["ts"] = stale["ts"] - 5  # older than batch-1 row: reduce keeps newer
    stale["phash"] = -1
    dele = base.iloc[10:15].copy()
    dele["ts"] = dele["ts"] + 1_000_000
    dele["__del"] = True
    ins = base.iloc[15:20].copy()
    ins["image_id"] = "new_" + ins["image_id"]
    batch2 = pd.concat([upd, dele, ins, stale], ignore_index=True)

    src_dir = tmp_path / "cdc_src"
    src_dir.mkdir()
    pq.write_table(pa.Table.from_pandas(base, preserve_index=False),
                   str(src_dir / "a.parquet"))
    pq.write_table(pa.Table.from_pandas(batch2, preserve_index=False),
                   str(src_dir / "b.parquet"))
    tbl = str(tmp_path / "cdc_tbl")
    stream = spark.readStream.schema(
        "image_id string, ts long, entity string, phash long, __del boolean"
    ).option("maxFilesPerTrigger", "1").parquet(str(src_dir))
    q = stream_cdc_apply(
        stream, tbl, checkpoint_dir=str(tmp_path / "cdc_ckpt"),
        keys=["image_id"], delete_col="__del", ts_unit_day=10_000,
    )
    q.awaitTermination(120)

    got = (
        TBL.scan(spark, tbl)
        .select("image_id", "phash")
        .toPandas()
        .sort_values("image_id", ignore_index=True)
    )
    # pandas twin: latest per key, deletes applied
    # NOTE: file-source batch order is a.parquet then b.parquet
    exp = base.drop(columns="__del").set_index("image_id")
    for _i, r in upd.iterrows():
        exp.loc[r.image_id, "phash"] = r.phash
    exp = exp.drop(index=dele.image_id)
    for _i, r in ins.iterrows():
        exp.loc[r.image_id] = [r.ts, r.entity, r.phash]
    exp = exp.reset_index()[["image_id", "phash"]].sort_values(
        "image_id", ignore_index=True
    )
    pd.testing.assert_frame_equal(got.astype({"phash": "int64"}),
                                  exp.astype({"phash": "int64"}))

    # replay of the last committed batch id: idempotent no-op
    last = TBL.current_snapshot(tbl, spark)
    assert last["mode"] == "merge" and last["batch_id"] is not None
    assert cdc_batch_apply(
        spark.createDataFrame(batch2), last["batch_id"], tbl,
        keys=["image_id"], delete_col="__del", ts_unit_day=10_000,
    ) is None
    assert TBL.current_snapshot(tbl, spark)["snapshot_id"] == last["snapshot_id"]
    # time travel across the CDC boundary: pre-merge state = full batch 1
    assert TBL.scan(spark, tbl, snapshot_id=1).count() == len(base)


def test_cdc_replay_check_is_o1_in_snapshots(spark, tmp_path, tiny_events,
                                             monkeypatch):
    """The replay check reads ONE manifest regardless of snapshot count
    (batch_hwm high-water mark in the latest manifest), and a legacy
    table whose manifests carry batch_id but no batch_hwm upgrades on
    its first post-upgrade commit."""
    from lbf_spark import fsio
    from lbf_spark.sources import table as TBL
    from lbf_spark.streaming.stream_features import cdc_batch_apply

    base = tiny_events[["image_id", "ts", "entity", "phash"]].iloc[:40].copy()
    tbl = str(tmp_path / "o1_tbl")
    n_batches = 8
    for b in range(n_batches):
        chunk = base.iloc[b * 5:(b + 1) * 5]
        assert cdc_batch_apply(
            spark.createDataFrame(chunk), b, tbl,
            keys=["image_id"], ts_unit_day=10_000,
        ) is not None
    assert TBL.current_snapshot(tbl, spark)["batch_hwm"] == n_batches - 1

    calls = {"n": 0}
    real_read = fsio.read_text

    def counting_read(spark_, path):
        calls["n"] += 1
        return real_read(spark_, path)

    monkeypatch.setattr(fsio, "read_text", counting_read)
    # replayed batch: exactly ONE manifest read (current_snapshot), a
    # no-op, with 8 snapshots on disk — the pre-r6 check read all 8
    for replay_id in (0, 3, n_batches - 1):
        calls["n"] = 0
        assert cdc_batch_apply(
            spark.createDataFrame(base.iloc[:5]), replay_id, tbl,
            keys=["image_id"], ts_unit_day=10_000,
        ) is None
        assert calls["n"] == 1
    monkeypatch.undo()

    # legacy table: manifests tagged batch_id but NO batch_hwm — the
    # fallback scans once, decides replay correctly, and the next real
    # commit writes the hwm forward
    legacy = str(tmp_path / "legacy_tbl")
    sdf = spark.createDataFrame(base.iloc[:10])
    TBL.write_table(sdf, legacy, mode="overwrite", ts_unit_day=10_000,
                    extra={"batch_id": 0})
    TBL.write_table(spark.createDataFrame(base.iloc[10:20]), legacy,
                    mode="append", ts_unit_day=10_000, extra={"batch_id": 1})
    assert "batch_hwm" not in TBL.current_snapshot(legacy, spark)
    assert cdc_batch_apply(  # replay decided via the compat scan
        spark.createDataFrame(base.iloc[:5]), 1, legacy,
        keys=["image_id"], ts_unit_day=10_000,
    ) is None
    assert cdc_batch_apply(
        spark.createDataFrame(base.iloc[20:25]), 2, legacy,
        keys=["image_id"], ts_unit_day=10_000,
    ) is not None
    assert TBL.current_snapshot(legacy, spark)["batch_hwm"] == 2


def test_cdc_duplicate_newest_ts_enforced(spark, tmp_path, tiny_events):
    """Total-order rule is enforced at execution time: a changelog
    batch holding two changes for one key at the SAME newest timestamp
    fails loudly without tiebreak_cols, and resolves deterministically
    (desc tiebreak) with them."""
    from lbf_spark.sources import table as TBL
    from lbf_spark.streaming.stream_features import cdc_batch_apply

    rows = tiny_events[["image_id", "ts", "entity", "phash"]].iloc[:6].copy()
    dup = rows.iloc[[0]].copy()
    dup["phash"] = 999  # same (image_id, ts), different payload
    batch = pd.concat([rows, dup], ignore_index=True)

    tbl = str(tmp_path / "dup_tbl")
    with pytest.raises(Exception, match="duplicate \\(keys, ts\\)"):
        cdc_batch_apply(
            spark.createDataFrame(batch), 0, tbl,
            keys=["image_id"], ts_unit_day=10_000,
        )

    # with a tiebreak the SAME batch applies, keeping the max-phash row
    tbl2 = str(tmp_path / "dup_tbl2")
    assert cdc_batch_apply(
        spark.createDataFrame(batch), 0, tbl2,
        keys=["image_id"], tiebreak_cols=["phash"], ts_unit_day=10_000,
    ) is not None
    got = (
        TBL.scan(spark, tbl2)
        .filter(F.col("image_id") == rows.iloc[0]["image_id"])
        .select("phash").collect()
    )
    winner = max(int(rows.iloc[0]["phash"]), 999)  # desc tiebreak
    assert [r["phash"] for r in got] == [winner]

    # a batch with ties only BELOW the newest ts per key passes the
    # guard (the reduce's outcome is already deterministic there)
    older = rows.iloc[[1]].copy()
    older["ts"] = older["ts"] - 7
    older2 = older.copy()
    older2["phash"] = -5
    ok_batch = pd.concat([rows.iloc[[1]], older, older2], ignore_index=True)
    assert cdc_batch_apply(
        spark.createDataFrame(ok_batch), 1, tbl2,
        keys=["image_id"], ts_unit_day=10_000,
    ) is not None


def test_stream_attribution_join_matches_batch(spark, tmp_path):
    """Two genuine streams through the watermarked interval join
    (availableNow) must equal the batch run of the same plan — and the
    last-touch reduce must pick the latest touch with the id tiebreak."""
    from lbf_spark.streaming.stream_features import (
        last_touch_attribution,
        stream_attribution_pairs,
    )

    touches = [("u1", 1, 100), ("u1", 2, 150), ("u1", 3, 150),
               ("u1", 4, 400), ("u2", 5, 90), ("u3", 6, 50)]
    convs = [("u1", 101, 160), ("u1", 102, 420), ("u2", 103, 100),
             ("u2", 104, 500), ("u4", 105, 10)]
    t_pd = pd.DataFrame(touches, columns=["entity", "touch_id", "touch_ts"])
    c_pd = pd.DataFrame(convs, columns=["entity", "conv_id", "conv_ts"])
    (tmp_path / "touch").mkdir()
    (tmp_path / "conv").mkdir()
    td, cd = str(tmp_path / "touch"), str(tmp_path / "conv")
    pq.write_table(pa.Table.from_pandas(t_pd, preserve_index=False),
                   td + "/p.parquet")  # single file each is fine
    pq.write_table(pa.Table.from_pandas(c_pd, preserve_index=False),
                   cd + "/p.parquet")
    t_static = spark.read.parquet(td)
    c_static = spark.read.parquet(cd)
    TOL = 100
    batch = stream_attribution_pairs(t_static, c_static, TOL).toPandas()

    t_s = spark.readStream.schema(t_static.schema).parquet(td)
    c_s = spark.readStream.schema(c_static.schema).parquet(cd)
    q = (
        stream_attribution_pairs(t_s, c_s, TOL, watermark="10 seconds")
        .writeStream.format("memory").queryName("attr_tbl")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    streamed = spark.sql("select * from attr_tbl").toPandas()
    cols = ["entity", "touch_id", "conv_id"]
    assert _keys(streamed, cols) == _keys(batch, cols)
    # hand-checked pair set: u1 conv@160 sees touches 1,2,3; conv@420
    # sees touch 4; u2 conv@100 sees 5; conv@500 sees none; u4 none
    assert _keys(batch, ["conv_id", "touch_id"]) == [
        (101, 1), (101, 2), (101, 3), (102, 4), (103, 5)
    ]
    last = last_touch_attribution(batch_df := stream_attribution_pairs(
        t_static, c_static, TOL)).toPandas()
    # conv 101: touches 2 and 3 tie at ts=150 -> larger id (3) wins
    got = {r.conv_id: r.touch_id for r in last.itertuples()}
    assert got == {101: 3, 102: 4, 103: 5}
    # disjoint-columns contract enforced
    with pytest.raises(ValueError, match="disjoint"):
        stream_attribution_pairs(
            t_static.withColumnRenamed("touch_ts", "conv_ts"), c_static, TOL
        )
