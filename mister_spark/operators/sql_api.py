"""The SQL front-end: run engine-portable ANSI SQL verbatim.

`Catalog.register_views()` exposes every table as a temp view, after
which users query with plain `spark.sql(...)` — the full Spark SQL
surface (joins, windows, CTEs, set ops) with zero wrapper code. The
query below is deliberately written in the portable ANSI subset and is
passed to BOTH engines as the IDENTICAL string: the strongest possible
demonstration that the SQL surface, not a translation layer, is the
API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mister_spark.operators.common import cat
from mister_spark.registry import query

# runs unmodified on Spark SQL and DuckDB
PORTABLE_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS total,
       FLOOR(AVG(o_totalprice) * 10000 + 0.5) / 10000 AS avg_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderstatus <> 'F'
GROUP BY o_orderpriority
"""


@query("sql_portable", oracle=PORTABLE_SQL)
def sql_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute PORTABLE_SQL verbatim via spark.sql() over registered
    views — oracle parity here proves the raw SQL entry point works,
    byte-identical query text on both engines.

    Scale: identical to the equivalent DataFrame plan — Catalyst
    compiles SQL and DataFrame calls to the same logical plan, so
    pushdown/partial-agg/AQE all apply unchanged."""
    cat(spark, sf_dir).register_views()
    return spark.sql(PORTABLE_SQL)
