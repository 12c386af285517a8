"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship TPC-H Q1-style pricing summary at sf0.001;
``queries``/``oracle_sql`` expose the SURVEY.md §2 registry (one entry
per implemented operator, DuckDB oracle where SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mister_spark import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted → rows-only check)."""
    return dict(registry.ORACLES)
