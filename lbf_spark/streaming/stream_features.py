"""Structured Streaming restatement of the incremental paths.

The reference is batch-only, but bounds memory by streaming one
BED-group at a time through a lazy iterator
(``/root/reference/src/lbfextract/fextract_batch_coverage/plugin.py:40-111``)
and over-fetches ``extra_bases`` to tolerate boundary-straddling reads
(``fextract/lib.py:68-77``). The streaming analogs:

* watermark = the grace window for late events (extra_bases analog);
* session windows = dyad-gap segmentation (``signal_transformer.py:50-113``)
  via Spark's native ``session_window`` (merge-on-gap semantics);
* tumbling windowed aggregates = positional binning on the time axis.

Batch parity: each function also accepts a static DataFrame — the same
plan runs in either mode (the Structured Streaming unification), which
is how the tests verify streaming results equal the batch oracle.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F


def _with_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Engine ts (int64) → event-time timestamp column `event_time`
    (interpreted as seconds — the unit only has to be consistent)."""
    return df.withColumn("event_time", F.timestamp_seconds(F.col(ts_col)))


def stream_session_stats(
    events: DataFrame,
    gap_seconds: int,
    watermark: str = "600 seconds",
    by: str = "entity",
) -> DataFrame:
    """Per-(entity, session) aggregates with native session windows.

    Sessions close `gap_seconds` after their last event; the watermark
    bounds state (late events beyond it are dropped — the grace-window
    contract). Works identically on a static frame (no watermark needed
    there, but harmless)."""
    df = _with_event_time(events)
    if df.isStreaming:
        df = df.withWatermark("event_time", watermark)
    return (
        df.groupBy(
            F.col(by),
            F.session_window("event_time", f"{gap_seconds} seconds").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            by,
            "session_start",
            "session_end",
            "n_events",
            (F.col("session_end") - F.col("session_start")).alias("session_span"),
        )
    )


def stream_tumbling_counts(
    events: DataFrame,
    window_seconds: int,
    watermark: str = "600 seconds",
    by: str = "entity",
    value_col: str | None = None,
) -> DataFrame:
    """Tumbling-window counts (+ optional value mean) with late-data
    tolerance — the incremental positional-binning analog (A14)."""
    df = _with_event_time(events)
    if df.isStreaming:
        df = df.withWatermark("event_time", watermark)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.avg(value_col).alias("value_mean"))
    return (
        df.groupBy(F.col(by), F.window("event_time", f"{window_seconds} seconds"))
        .agg(*aggs)
        .select(
            by,
            F.unix_timestamp("window.start").alias("bucket_start"),
            *(["n_events", "value_mean"] if value_col else ["n_events"]),
        )
    )


def run_stream_to_memory(
    spark,
    input_path: str,
    transform,
    table_name: str,
    schema=None,
) -> None:
    """Drive a parquet-source stream through `transform` into an
    in-memory sink with trigger availableNow (process-everything-then-
    stop — the batch-equivalence harness used by the tests)."""
    src = spark.readStream.schema(
        schema or spark.read.parquet(input_path).schema
    ).parquet(input_path)
    q = (
        transform(src)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete" if transform(src).isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_asof_enrich(
    tagged: DataFrame,
    by: str = "entity",
    ts_col: str = "ts",
    value_col: str = "v",
    kind_col: str = "kind",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: the
    point-in-time (backward, ts ≤ anchor_ts) as-of join, incrementalized
    — the streaming restatement of ``operators.asof.asof_join``'s
    union+last-carry plan (the engine's core operator; the union
    strategy's "last feature carried forward" IS the group state here).

    Input: ONE tagged stream per entity — feature rows
    (``kind='f'``: ts + value) interleaved with anchor rows
    (``kind='a'``). Each anchor emits the latest feature at or before
    its ts; an anchor before any feature emits nulls (exactly the batch
    left-join semantics). State per entity: one (last_ts, last_value)
    pair — O(1), carried across micro-batches.

    Ordering contract (same as ``stream_rolling_mean_stateful``): rows
    arrive in non-decreasing ts per entity ACROSS triggers; within a
    batch they are sorted (feature-before-anchor at equal ts, matching
    DuckDB/batch ASOF tie semantics).
    """
    import pandas as pd

    out_schema = f"{by} string, anchor_ts long, matched_ts long, matched_v double"
    state_schema = "last_ts long, last_v double"

    def fn(key, pdf_iter, state):
        (entity,) = key
        last_ts, last_v = state.get if state.exists else (None, None)
        for pdf in pdf_iter:
            pdf = pdf.copy()
            # feature sorts before anchor at equal ts ⇒ inclusive match
            pdf["_k"] = (pdf[kind_col] != "f").astype(int)
            pdf = pdf.sort_values([ts_col, "_k"], kind="mergesort")
            rows = []
            for k, t, v in zip(pdf["_k"], pdf[ts_col], pdf[value_col]):
                if k == 0:
                    last_ts, last_v = int(t), float(v)
                else:
                    rows.append((entity, int(t), last_ts, last_v))
            yield pd.DataFrame(
                rows, columns=[by, "anchor_ts", "matched_ts", "matched_v"]
            )
        if last_ts is not None:
            state.update((last_ts, last_v))

    from pyspark.sql.streaming.state import GroupStateTimeout

    return tagged.groupBy(by).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_rolling_mean_stateful(
    events: DataFrame,
    window: int = 16,
    by: str = "entity",
    ts_col: str = "ts",
    value_col: str = "v",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: exact
    trailing rolling mean over the last ``window`` rows per entity,
    with the last ``window-1`` (ts, value) pairs carried in group state
    ACROSS micro-batches — the incremental restatement of
    ``windows.rolling_mean`` (A6, ``signal_transformer.py:158-177``).

    Ordering contract: rows must arrive in non-decreasing ``ts_col``
    order per entity across triggers (rows are sorted within each
    batch; cross-batch order is the source's responsibility — e.g. a
    file source fed time-partitioned files with maxFilesPerTrigger).
    State is O(window) per entity, the same bound the reference's lazy
    per-group iterator gives it (``fextract_batch_coverage/
    plugin.py:40-111``)."""
    import pandas as pd

    out_schema = (
        f"{by} string, {ts_col} long, {value_col} double, roll_mean double"
    )
    state_schema = "tss array<long>, vals array<double>"

    def fn(key, pdf_iter, state):
        (entity,) = key
        tss, vals = state.get if state.exists else ([], [])
        tss, vals = list(tss), list(vals)
        for pdf in pdf_iter:
            pdf = pdf.sort_values([ts_col], kind="mergesort")
            out_rows = []
            for t, v in zip(pdf[ts_col], pdf[value_col]):
                tss.append(int(t))
                vals.append(float(v))
                tail = vals[-window:]
                out_rows.append(
                    (entity, int(t), float(v), sum(tail) / len(tail))
                )
            yield pd.DataFrame(
                out_rows, columns=[by, ts_col, value_col, "roll_mean"]
            )
        # window=1 needs an empty carry: [-0:] would keep ALL history
        tail_n = window - 1
        state.update(
            (tss[-tail_n:] if tail_n else [], vals[-tail_n:] if tail_n else [])
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy(by).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication: keep the first arrival of each
    key, dropping re-deliveries that arrive within ``watermark_delay``
    of the stream's max event time. ``dropDuplicatesWithinWatermark``
    expires key state once the watermark passes it, so state is
    O(distinct keys per watermark window) — the unbounded-state-safe
    streaming analog of batch ``dropDuplicates(keys)`` (which this
    equals whenever true duplicates arrive inside the delay)."""
    src = _with_event_time(df, ts_col)
    return src.withWatermark("event_time", watermark_delay).dropDuplicatesWithinWatermark(
        keys
    )


def stream_table_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    n_buckets: int = 16,
    ts_unit_day: int = 86_400,
    trigger_available_now: bool = True,
):
    """Stream → snapshot table: every micro-batch appends one snapshot
    via the table layer (``sources.table.write_table``), giving the
    stream's output time travel, incremental reads, and manifest
    lineage for free.

    Exactly-once: Structured Streaming replays a failed micro-batch
    (foreachBatch is at-least-once), so the sink is made IDEMPOTENT
    the standard way — each snapshot manifest records its ``batch_id``
    and a replayed batch whose id is already committed is skipped.
    Combined with the streaming checkpoint this yields end-to-end
    exactly-once into the table.

    Returns the StreamingQuery (caller awaits termination)."""

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        table_batch_commit(
            batch_df, batch_id, path,
            n_buckets=n_buckets, ts_unit_day=ts_unit_day,
        )

    writer = stream_df.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _batch_high_water(spark, path: str, prev: dict | None) -> int | None:
    """Highest batch_id already durable in the table at ``path`` —
    O(1) in snapshot count: since round 6 every batch commit carries
    ``batch_hwm`` (max committed batch id so far) forward in its
    manifest, so only the LATEST manifest is consulted. Tables written
    by the pre-hwm sink (manifests tagged ``batch_id`` but no
    ``batch_hwm``) fall back to one full manifest scan — once: the
    next commit writes the hwm forward. Returns None for a table with
    no batch-tagged snapshots (or no table)."""
    from lbf_spark import fsio

    if prev is None:
        return None
    if "batch_hwm" in prev:
        return int(prev["batch_hwm"])
    # legacy/foreign table: one compatibility scan (upgrades on commit)
    meta_dir = fsio.join(path, "metadata")
    ids = [
        json.loads(fsio.read_text(spark, fsio.join(meta_dir, n))).get("batch_id")
        for n in fsio.list_names(spark, meta_dir)
        if n.startswith("snap-") and n.endswith(".json")
    ]
    ids = [i for i in ids if i is not None]
    return max(ids) if ids else None


def table_batch_commit(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    n_buckets: int = 16,
    ts_unit_day: int = 86_400,
) -> dict | None:
    """One micro-batch → one table snapshot, idempotently: the manifest
    records ``batch_id`` and a replayed (already-committed) batch id is
    a no-op. Factored out of ``stream_table_sink`` so the replay
    contract is directly testable. Returns the snapshot, or None if
    skipped/empty.

    ``batch_id`` rides in ``write_table``'s SINGLE exclusive manifest
    commit (the ``extra`` fields) — never patched in afterwards: a
    two-step commit-then-tag would leave a crash window where the
    snapshot is durable but untagged, and the replayed batch would
    append its rows a second time.

    The replay check is O(1) in snapshot count: foreachBatch batch ids
    are strictly increasing within a checkpoint, so a ``batch_hwm``
    high-water mark carried in each manifest decides replay from the
    latest snapshot alone (the pre-r6 implementation re-read EVERY
    manifest per micro-batch — O(n²) driver FS reads over a stream's
    lifetime)."""
    from lbf_spark.sources import table as TBL

    if batch_df.isEmpty():
        return None
    spark = batch_df.sparkSession
    prev = TBL.current_snapshot(path, spark)
    hwm = _batch_high_water(spark, path, prev)
    if hwm is not None and batch_id <= hwm:
        return None  # replayed batch: already durable (idempotence)
    return TBL.write_table(
        batch_df, path, mode="append" if prev is not None else "overwrite",
        n_buckets=n_buckets, ts_unit_day=ts_unit_day,
        extra={"batch_id": batch_id,
               "batch_hwm": max(hwm if hwm is not None else -1, batch_id)},
    )


def cdc_batch_apply(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    keys: list[str],
    ts_col: str = "ts",
    delete_col: str | None = None,
    tiebreak_cols: list[str] | None = None,
    n_buckets: int = 16,
    ts_unit_day: int = 86_400,
) -> dict | None:
    """One CDC micro-batch → latest-per-key reduce → MERGE snapshot,
    idempotent on ``batch_id`` — the streaming composition of q84's
    latest-state semantics with the table layer's copy-on-write MERGE.

    A raw changelog batch may hold several changes per key; the batch
    is first reduced to the newest change per key (``row_number`` over
    the keys ordered by ``ts_col`` desc). The total-order rule is
    ENFORCED, not just documented: pass ``tiebreak_cols`` to break
    same-timestamp ties deterministically (desc), or — when omitted —
    the reduce asserts at execution time that the newest timestamp per
    key is unique in the batch and fails the job on violation
    (``assert_true`` over the same window spec: zero extra shuffle,
    the peer count is a current-row range frame on the identical
    partition/order). The ``batch_id`` rides in the single exclusive
    manifest commit, so a replayed batch (foreachBatch is
    at-least-once) is a no-op and the end-to-end result is
    exactly-once; the replay check is O(1) in snapshot count via the
    ``batch_hwm`` high-water mark in the latest manifest. The FIRST
    batch bootstraps the table (overwrite mode — merge needs an
    existing snapshot).

    Returns the committed snapshot, or None if skipped/empty."""
    from pyspark.sql import Window

    from lbf_spark.sources import table as TBL

    if batch_df.isEmpty():
        return None
    spark = batch_df.sparkSession
    prev = TBL.current_snapshot(path, spark)
    hwm = _batch_high_water(spark, path, prev)
    if hwm is not None and batch_id <= hwm:
        return None  # replayed batch: already durable (idempotence)
    if tiebreak_cols:
        order = [F.desc(ts_col)] + [F.desc(c) for c in tiebreak_cols]
        w = Window.partitionBy(*keys).orderBy(*order)
        latest = (
            batch_df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .drop("__rk")
        )
    else:
        w = Window.partitionBy(*keys).orderBy(F.desc(ts_col))
        peers = F.count(F.lit(1)).over(
            w.rangeBetween(Window.currentRow, Window.currentRow)
        )
        # guard lives in a Filter predicate (assert_true is NULL on
        # success, so isNull() is a tautology that Catalyst cannot fold
        # away) — a standalone projected-then-dropped guard column WOULD
        # be pruned before it ever evaluated. The `__rk != 1` escape
        # keeps the assert correct under conjunct reordering: ties are
        # only an error at the NEWEST timestamp of a key.
        guard = F.assert_true(
            (F.col("__rk") != 1) | (F.col("__peers") == 1),
            F.lit(
                "cdc_batch_apply: duplicate (keys, ts) at the newest "
                "timestamp of a key — merged state would be "
                "nondeterministic; pass tiebreak_cols or dedupe "
                "the changelog upstream"
            ),
        )
        latest = (
            batch_df.withColumn("__rk", F.row_number().over(w))
            .withColumn("__peers", peers)
            .filter((F.col("__rk") == 1) & guard.isNull())
            .drop("__rk", "__peers")
        )
    extra = {"batch_id": batch_id,
             "batch_hwm": max(hwm if hwm is not None else -1, batch_id)}
    if prev is None:  # bootstrap: first batch creates the table
        rows = latest
        if delete_col is not None:
            rows = rows.filter(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
        return TBL.write_table(
            rows, path, mode="overwrite",
            n_buckets=n_buckets, ts_unit_day=ts_unit_day, extra=extra,
        )
    return TBL.merge_upsert(
        spark, path, latest, keys=keys, delete_col=delete_col, extra=extra,
    )


def stream_cdc_apply(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    keys: list[str],
    ts_col: str = "ts",
    delete_col: str | None = None,
    n_buckets: int = 16,
    ts_unit_day: int = 86_400,
    trigger_available_now: bool = True,
):
    """Changelog stream → continuously-merged snapshot table: each
    micro-batch applies as one MERGE snapshot via ``cdc_batch_apply``
    (exactly-once; replay-idempotent), so readers always see the
    latest-per-key state with full time travel across batch boundaries.
    The streaming twin of a warehouse ``MERGE INTO`` pipeline.

    Returns the StreamingQuery (caller awaits termination)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        cdc_batch_apply(
            batch_df, batch_id, path, keys,
            ts_col=ts_col, delete_col=delete_col,
            n_buckets=n_buckets, ts_unit_day=ts_unit_day,
        )

    writer = stream_df.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_feature_batch(
    batch_df: DataFrame,
    batch_id: int,
    raw_path: str,
    feat_path: str,
    feature_fn,
    *,
    lookback: int,
    keys: list[str] | None = None,
    n_buckets: int = 16,
    ts_unit_day: int = 86_400,
) -> dict | None:
    """One micro-batch of raw events → exactly-once maintenance of a
    MATERIALIZED feature table, recomputing only the touched per-entity
    suffixes (``operators/incremental.py`` math; the reference replays
    every interval per run, fextract/lib.py:71-77).

    Two tables, one delta: ``raw_path`` accumulates the event history
    (append-only snapshots), ``feat_path`` holds one feature row per
    (entity, ts). Per batch:

    1. refresh region = raw table scanned with
       ``ts >= min(batch ts) - lookback`` — the global bound feeds
       ``scan``'s manifest ``[ts_min, ts_max]`` file skipping, so
       history files that predate the delta are never opened — then
       narrowed to each touched entity's own suffix;
    2. ``refresh_region_rows`` re-features the region; the result is
       MERGEd into the feature table (file-level copy-on-write), so
       kept feature rows are never rewritten OR re-read;
    3. the batch appends to the raw table.

    Exactly-once under foreachBatch's at-least-once replay: the raw
    append (LAST step) carries the ``batch_hwm`` high-water mark, so a
    fully-committed batch is a no-op on replay; a crash BETWEEN the
    merge and the raw append replays into "merge already durable →
    skip merge (its own hwm), re-do raw append". The merge itself is
    deterministic given (raw table, batch), so even a re-run merge
    replaces rows with identical values.

    Raw history must be unique on (entity, ts) — duplicated instants
    make window features ill-defined. Enforced, not just documented:
    the refresh region (which contains every base row a batch row can
    collide with inside the lookback) is checked and the batch FAILS
    on a duplicate, before anything lands.

    Returns the raw-table snapshot, or None when the batch is empty or
    fully replayed.
    """
    from lbf_spark.operators.incremental import (
        refresh_lower_bound,
        refresh_region_rows,
    )
    from lbf_spark.sources import table as TBL

    if batch_df.isEmpty():
        return None
    keys = list(keys) if keys is not None else ["entity", "ts"]
    spark = batch_df.sparkSession
    raw_prev = TBL.current_snapshot(raw_path, spark)
    raw_hwm = _batch_high_water(spark, raw_path, raw_prev)
    if raw_hwm is not None and batch_id <= raw_hwm:
        return None  # fully committed: replay no-op

    def guard_unique(df: DataFrame) -> None:
        dup = (
            df.groupBy("entity", "ts").count().filter(F.col("count") > 1).limit(1)
        ).collect()
        if dup:
            r = dup[0]
            raise ValueError(
                f"duplicate (entity, ts) in refresh region: "
                f"({r['entity']}, {r['ts']}) ×{r['count']} — dedupe the "
                f"stream to unique instants upstream"
            )

    if raw_prev is None:  # bootstrap: both tables from batch alone
        guard_unique(batch_df)
        TBL.write_table(
            feature_fn(batch_df), feat_path, mode="overwrite",
            n_buckets=n_buckets, ts_unit_day=ts_unit_day,
            extra={"batch_id": batch_id, "batch_hwm": batch_id},
        )
        return table_batch_commit(
            batch_df, batch_id, raw_path,
            n_buckets=n_buckets, ts_unit_day=ts_unit_day,
        )

    lb = refresh_lower_bound(batch_df, lookback=lookback, order="ts")
    base = TBL.scan(
        spark, raw_path, ts_min=lb,
        n_buckets=n_buckets, ts_unit_day=ts_unit_day,
    ).select(*batch_df.columns)
    guard_unique(base.unionByName(batch_df))
    refreshed = refresh_region_rows(
        base, batch_df, feature_fn, lookback=lookback, by="entity", order="ts"
    )
    feat_prev = TBL.current_snapshot(feat_path, spark)
    feat_hwm = _batch_high_water(spark, feat_path, feat_prev)
    if feat_hwm is None or batch_id > feat_hwm:
        TBL.merge_upsert(
            spark, feat_path, refreshed, keys=keys,
            extra={
                "batch_id": batch_id,
                "batch_hwm": max(feat_hwm if feat_hwm is not None else -1, batch_id),
            },
        )
    return table_batch_commit(
        batch_df, batch_id, raw_path,
        n_buckets=n_buckets, ts_unit_day=ts_unit_day,
    )


def stream_incremental_features(
    stream_df: DataFrame,
    raw_path: str,
    feat_path: str,
    checkpoint_dir: str,
    feature_fn,
    *,
    lookback: int,
    keys: list[str] | None = None,
    n_buckets: int = 16,
    ts_unit_day: int = 86_400,
    trigger_available_now: bool = True,
):
    """Event stream → continuously-maintained feature table: each
    micro-batch lands via ``incremental_feature_batch`` (exact suffix
    refresh + exactly-once dual-table commit), so readers always see
    features bit-identical to a from-scratch recompute over the raw
    history, at delta cost per batch. Returns the StreamingQuery."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        incremental_feature_batch(
            batch_df, batch_id, raw_path, feat_path, feature_fn,
            lookback=lookback, keys=keys,
            n_buckets=n_buckets, ts_unit_day=ts_unit_day,
        )

    writer = stream_df.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_attribution_pairs(
    touches: DataFrame,
    conversions: DataFrame,
    tolerance_seconds: int,
    by: str = "entity",
    watermark: str = "600 seconds",
) -> DataFrame:
    """Watermarked stream-stream interval join — the attribution
    primitive: every (touch, conversion) pair of the same entity with
    ``conv_ts − tolerance ≤ touch_ts ≤ conv_ts``. Touch-to-conversion
    matching (ad view→purchase, feature event→label event) is THE
    training-label join of an online feature pipeline; the time-bound
    condition is what lets Structured Streaming expire join state
    (each side keeps only ``watermark + tolerance`` of history —
    bounded state at any stream length). Works identically on static
    frames (unified plan): the batch run IS the oracle for the
    streaming run.

    Contract: both inputs carry ``by`` and an epoch-seconds ``ts``
    column named ``touch_ts`` / ``conv_ts`` respectively; other column
    names must be disjoint across the two sides (pre-alias upstream —
    keeps this a pure join, no hidden renames)."""
    overlap = (set(touches.columns) & set(conversions.columns)) - {by}
    if overlap:
        raise ValueError(
            f"touch/conversion columns must be disjoint apart from {by!r}; "
            f"both sides carry {sorted(overlap)} — alias them upstream"
        )
    t = touches.withColumn("__t_time", F.timestamp_seconds(F.col("touch_ts")))
    c = conversions.withColumn("__c_time", F.timestamp_seconds(F.col("conv_ts")))
    if t.isStreaming:
        t = t.withWatermark("__t_time", watermark)
    if c.isStreaming:
        c = c.withWatermark("__c_time", watermark)
    t = t.withColumnRenamed(by, "__t_by")
    cond = (
        (F.col("__t_by") == F.col(by))
        & (F.col("__t_time") <= F.col("__c_time"))
        & (
            F.col("__t_time")
            >= F.col("__c_time") - F.expr(f"INTERVAL {int(tolerance_seconds)} SECONDS")
        )
    )
    return t.join(c, cond, "inner").drop("__t_by", "__t_time", "__c_time")


def last_touch_attribution(
    pairs: DataFrame,
    conv_id: str = "conv_id",
    touch_ts: str = "touch_ts",
    touch_id: str = "touch_id",
) -> DataFrame:
    """Reduce attribution pairs to last-touch: per conversion, the
    latest touch wins, ties broken by the larger touch id — a TOTAL
    order, per the determinism rules, so the winner is engine- and
    partitioning-exact. Batch stage (run it on the landed pairs table
    or per micro-batch in ``foreachBatch``): one window over conv_id."""
    from pyspark.sql import Window

    w = Window.partitionBy(conv_id).orderBy(
        F.desc(touch_ts), F.desc(touch_id)
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def heavy_hitter_batch_merge(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    col: str,
    k: int = 64,
) -> dict | None:
    """Fold one micro-batch into a persistent Misra-Gries heavy-hitter
    state (operators/sketches.py) — the streaming profiler's "top
    talkers" feature with BOUNDED state: the state file carries ≤ k
    counters + n no matter how many distinct keys the stream has seen.

    The merged estimate obeys ``true − n_total/(k+1) ≤ est ≤ true``
    over the WHOLE stream: per-batch sketches are themselves merged
    per-partition MG summaries, and MG summaries are mergeable with
    additive error (Agarwal et al. 2012) — so batch boundaries, like
    partition boundaries, never break the guarantee.

    Exactly-once under foreachBatch replay: the state JSON records
    ``batch_hwm``; a replayed batch id ≤ hwm is a no-op (same contract
    as ``table_batch_commit``). Single-writer per state path (one
    streaming query), state written via atomic rename. Returns the new
    state dict, or None if skipped."""
    from lbf_spark import fsio
    from lbf_spark.operators.sketches import _mg_update, heavy_hitters_mg

    spark = batch_df.sparkSession
    sfile = fsio.join(state_path, "sketch.json")
    state = (
        json.loads(fsio.read_text(spark, sfile))
        if fsio.exists(spark, sfile)
        else {"counters": {}, "n": 0, "k": int(k), "batch_hwm": -1}
    )
    if int(batch_id) <= int(state["batch_hwm"]):
        return None  # replay of a committed batch — idempotent skip
    if int(state["k"]) != int(k):
        raise ValueError(
            f"state at {state_path} was built with k={state['k']}, got k={k}"
        )
    sketch, n_batch = heavy_hitters_mg(batch_df, col, k=k)
    counters = {i: int(c) for i, c in state["counters"].items()}
    _mg_update(counters, dict(sketch), int(k))
    new_state = {
        "counters": counters,
        "n": int(state["n"]) + int(n_batch),
        "k": int(k),
        "batch_hwm": int(batch_id),
    }
    fsio.mkdirs(spark, state_path)
    fsio.write_text_atomic(spark, sfile, json.dumps(new_state, sort_keys=True))
    return new_state


def stream_heavy_hitters(
    stream_df: DataFrame,
    col: str,
    state_path: str,
    checkpoint_dir: str,
    k: int = 64,
    trigger_available_now: bool = True,
):
    """Streaming heavy hitters: every micro-batch folds into the
    bounded MG state at ``state_path`` via
    ``heavy_hitter_batch_merge``. Returns the StreamingQuery."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        heavy_hitter_batch_merge(batch_df, batch_id, state_path, col, k=k)

    writer = stream_df.writeStream.foreachBatch(commit).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_heavy_hitter_state(spark, state_path: str) -> dict:
    """Load the persisted MG state: {counters, n, k, batch_hwm}."""
    from lbf_spark import fsio

    return json.loads(
        fsio.read_text(spark, fsio.join(state_path, "sketch.json"))
    )


def dedup_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    *,
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict | None:
    """One ingest micro-batch through the STANDING near-dup filter —
    the production crawl-ingest shape: the store keeps the surviving
    corpus (parquet) next to its LSH band postings
    (``dedup.lsh_index``), and each arriving batch (a) drops every doc
    that near-dups a surviving corpus doc (candidates from the
    persisted postings — no corpus re-signing, ``dedup.
    lsh_incremental_pairs``), (b) collapses batch-internal near-dup
    clusters to their min-id keeper (connected components, so
    transitive chains keep exactly one), and (c) appends the
    survivors AND their postings. Invariant maintained by induction:
    NO two surviving docs anywhere form a ≥ threshold pair under the
    algorithm's candidate generation (certified by q188 with a
    from-scratch full-corpus pair scan).

    Store layout: ``corpus/batch-<id>/`` and ``postings/batch-<id>/``
    parquet dirs plus a ``state.json`` high-water mark written LAST
    (atomic). Exactly-once under foreachBatch replay: a replayed
    batch_id ≤ hwm is a no-op; a crash between the parquet writes and
    the hwm replays into overwriting the SAME deterministic content.

    Per-batch cost: O(batch + matched) — the corpus contributes only
    its (bounded) bucket-matched docs to verification; at 10^12 docs
    the postings join is the only corpus-sized input and it's an
    equi-join on (band_id, band_hash)."""
    import json as _json

    from lbf_spark import fsio
    from lbf_spark.operators import dedup

    spark = batch_df.sparkSession
    state_file = fsio.join(store_dir, "state.json")
    try:
        state = _json.loads(fsio.read_text(spark, state_file))
    except Exception:
        state = {"batch_hwm": -1}
    if batch_id <= state["batch_hwm"]:
        return None  # fully committed: replay no-op
    if batch_df.isEmpty():
        return {"batch_id": batch_id, "n_in": 0, "n_kept": 0,
                "n_dropped_corpus": 0, "n_dropped_internal": 0}

    corpus_dir = fsio.join(store_dir, "corpus")
    post_dir = fsio.join(store_dir, "postings")
    have_corpus = state["batch_hwm"] >= 0
    batch = batch_df.select(id_col, text_col)
    if have_corpus:
        corpus = spark.read.parquet(f"{corpus_dir}/batch-*")
        index = spark.read.parquet(f"{post_dir}/batch-*")
        out = dedup.lsh_incremental_pairs(
            corpus, index, batch, threshold=threshold, n=n,
            num_hashes=num_hashes, bands=bands,
            id_col=id_col, text_col=text_col,
        )
        pairs = out["pairs"].select("id_a", "id_b")
        corpus_ids = corpus.select(F.col(id_col).alias("cid"))
        # batch docs pairing with a surviving corpus doc drop outright
        hit_a = pairs.join(
            corpus_ids, pairs["id_b"] == F.col("cid"), "left_semi"
        ).select(F.col("id_a").alias(id_col))
        hit_b = pairs.join(
            corpus_ids, pairs["id_a"] == F.col("cid"), "left_semi"
        ).select(F.col("id_b").alias(id_col))
        corpus_hit = hit_a.unionByName(hit_b).distinct().join(
            batch.select(id_col), id_col, "left_semi"
        )
        remaining = batch.join(corpus_hit, id_col, "left_anti")
        # batch-internal pairs among the remaining docs → min-id keeper
        internal = (
            pairs.join(corpus_ids, pairs["id_a"] == F.col("cid"), "left_anti")
            .join(corpus_ids, pairs["id_b"] == F.col("cid"), "left_anti")
            .join(
                remaining.select(F.col(id_col).alias("id_a")), "id_a",
                "left_semi",
            )
            .join(
                remaining.select(F.col(id_col).alias("id_b")), "id_b",
                "left_semi",
            )
        )
    else:
        out = {"postings": dedup.lsh_index(
            batch, n=n, num_hashes=num_hashes, bands=bands,
            id_col=id_col, text_col=text_col,
        )}
        pairs = dedup.minhash_dedup_pairs(
            batch, id_col=id_col, text_col=text_col, n=n,
            num_hashes=num_hashes, bands=bands, threshold=threshold,
        ).select("id_a", "id_b")
        corpus_hit = batch.select(id_col).limit(0)
        remaining = batch
        internal = pairs
    clusters = dedup.dup_clusters(internal).withColumnRenamed(
        "doc_id", id_col
    )
    drop_internal = clusters.filter(
        F.col(id_col) != F.col("cluster_id")
    ).select(id_col)
    survivors = remaining.join(drop_internal, id_col, "left_anti")
    surv_posts = out["postings"].join(
        survivors.select(id_col), id_col, "left_semi"
    )
    sdf = batch_df.join(survivors.select(id_col), id_col, "left_semi")
    tag = f"batch-{batch_id:05d}"
    sdf.write.mode("overwrite").parquet(f"{corpus_dir}/{tag}")
    surv_posts.write.mode("overwrite").parquet(f"{post_dir}/{tag}")
    stats = {
        "batch_id": batch_id,
        "n_in": batch.count(),
        "n_kept": survivors.count(),
        "n_dropped_corpus": corpus_hit.count(),
    }
    stats["n_dropped_internal"] = (
        stats["n_in"] - stats["n_kept"] - stats["n_dropped_corpus"]
    )
    dedup.release_caches()
    fsio.write_text_atomic(
        spark, state_file,
        _json.dumps({"batch_hwm": batch_id}, sort_keys=True),
    )
    return stats


def stream_dedup_ingest(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **kwargs,
):
    """Streaming wrapper: every micro-batch flows through
    ``dedup_ingest_batch`` against the standing store. Returns the
    StreamingQuery."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        dedup_ingest_batch(batch_df, batch_id, store_dir, **kwargs)

    writer = stream_df.writeStream.foreachBatch(commit).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
