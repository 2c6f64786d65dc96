"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship north_rule pipeline (as-of join +
windowed features over the synthesized image+caption table) at sf0.001
scale; ``queries()``/``oracle_sql()`` expose the full operator catalog
from ``lbf_spark.queries`` (see queries.py for the DuckDB-oracled vs
rows-only split — the counts live there, next to the registry).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _prepare(spark: SparkSession) -> None:
    """Session prep: ship the package zip to executors (the driver may
    have built the session without our factory) + Arrow on."""
    from lbf_spark.packaging import ship_package

    ship_package(spark)
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: decode → windowed features → point-in-time anchor join →
    flanking-normalized positional matrix → cross-anchor summary."""
    _prepare(spark)
    from lbf_spark.queries import QUERIES

    return QUERIES["q33_image_pipeline"][0](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lbf_spark.queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from lbf_spark.queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
