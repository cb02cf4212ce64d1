"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query on sf0.001; ``queries()`` exposes every
implemented operator from SURVEY.md §2.B (plus the LLM-pipeline extras);
``oracle_sql()`` provides the DuckDB-equivalent SQL for SQL-tier entries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from overseer_spark.queries.catalog import CATALOG, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in CATALOG.items() if spec.oracle is not None
    }
