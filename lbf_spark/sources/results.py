"""Results loading for the analysis layer (S9/J3,
``/root/reference/src/lbfextract/transcription_factor_analysis/loaders.py:67-115``).

The reference globs per-sample CSV matrices, keys each file by
md5(path), and joins a sample sheet on that key. Same shape here:
``input_file_name()`` → ``md5`` → broadcast join — the tiny sample
sheet never shuffles the big result set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def load_results(
    spark: SparkSession,
    glob_path: str,
    sample_sheet: DataFrame,
    fmt: str = "parquet",
    path_key: str = "path_md5",
) -> DataFrame:
    """Read per-sample result files (glob ok), tag each row with
    md5(source path), broadcast-join sample metadata on that key.

    ``sample_sheet`` must carry a ``path_md5`` column (md5 hex of the
    absolute file path, as the reference computes it at
    ``loaders.py:67-77``)."""
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    df = reader.load(glob_path).withColumn(
        path_key, F.md5(F.input_file_name())
    )
    return df.join(F.broadcast(sample_sheet), path_key, "left")


def sample_sheet_from_paths(
    spark: SparkSession, rows: list[dict], path_col: str = "path"
) -> DataFrame:
    """Build a sample sheet keyed by md5(file URI) from metadata rows
    each containing the file path."""
    sheet = spark.createDataFrame(rows)  # type: ignore[arg-type]
    return sheet.withColumn("path_md5", F.md5(F.col(path_col))).drop(path_col)
