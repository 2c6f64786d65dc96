"""Streaming = batch parity (the Structured Streaming unification) +
late-data watermark behavior."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

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
