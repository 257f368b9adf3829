"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``eth_event_stream_spark.plans`` — a registry of
(Spark DataFrame builder, DuckDB oracle SQL) pairs covering the reference's
semantics (SURVEY.md §2) plus the training-data pipeline surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eth_event_stream_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.2: the reference's netflow reducer, B11)
    on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.QUERIES["flagship_user_netflow"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7.3."""
    return plans.queries_dict()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every deterministic query; sketch-based or
    streaming-only queries are omitted (driver records rows-only checks)."""
    return plans.oracle_sql_dict()
