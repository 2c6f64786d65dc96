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
