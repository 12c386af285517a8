"""Query registry wiring operators to the driver contract.

Each operator registers under a SURVEY.md §2 key with an optional DuckDB
oracle SQL string. ``__spark_entry__`` exposes the two dicts verbatim.

Column-name discipline: the driver sorts columns by name and hashes
values, so every computed column is aliased identically in the Spark
callable and its oracle SQL (see SURVEY.md §4 for rounding rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; ``oracle`` as oracle_sql()[name]."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run."""
    from mister_spark import operators  # noqa: F401

    operators.load()
