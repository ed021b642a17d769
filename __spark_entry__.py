"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (pricing summary, SURVEY §2.5) at sf0.001.
``queries()`` / ``oracle_sql()`` — the full operator workload from
``eirepolitic_data_pipeline_spark.workload`` (one entry per SURVEY §2
operator family; oracle SQL is DuckDB-compatible and alias-matched).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from eirepolitic_data_pipeline_spark import workload

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload.queries()["q01_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    return workload.oracle_sql()
