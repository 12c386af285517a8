"""Wave 156: GROUP BY ALL surface and Newcombe proportion-difference
intervals.

sql_group_by_all pins the GROUP BY ALL shorthand — every non-
aggregated select item becomes a grouping key, eliminating the
stale-grouping-list bug when someone adds a column to the SELECT;
stat_prop_diff_ci is the Newcombe hybrid-score CI for a difference
of proportions — the interval that behaves at extreme rates where
the naive Wald CI collapses or escapes [−1, 1].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

Z95 = 1.959964


@query(
    "sql_group_by_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS total
    FROM orders GROUP BY o_orderpriority, o_orderstatus
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL surface: the grouping keys are INFERRED from the
    non-aggregate select items — add a column to the SELECT and the
    grouping follows automatically, killing the classic bug where
    the SELECT list and GROUP BY list drift apart in a 40-line
    query. The oracle is the explicit form; identical results prove
    the inference.

    Scale: identical plan to the explicit GROUP BY."""
    c = cat(spark, sf_dir)
    c["orders"].createOrReplaceTempView("_gba_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS total
        FROM _gba_orders GROUP BY ALL
        """
    )


def _wilson_sql(p: str, n: str) -> str:
    z2 = Z95 * Z95
    return (
        f"(({p} + {z2} / (2 * {n})) "
        f"- {Z95} * SQRT({p} * (1 - {p}) / {n} + {z2} / (4 * {n} * {n})))"
        f" / (1 + {z2} / {n})",
        f"(({p} + {z2} / (2 * {n})) "
        f"+ {Z95} * SQRT({p} * (1 - {p}) / {n} + {z2} / (4 * {n} * {n})))"
        f" / (1 + {z2} / {n})",
    )


_L1, _U1 = _wilson_sql("p1", "n1")
_L2, _U2 = _wilson_sql("p2", "n2")


@query(
    "stat_prop_diff_ci",
    oracle=f"""
    WITH g AS (SELECT CASE WHEN o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END AS urgent,
                      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
               FROM orders),
    s AS (SELECT CAST(SUM(urgent) AS DOUBLE) AS n1,
                 SUM(CAST(urgent * y AS DOUBLE)) AS k1,
                 CAST(SUM(1 - urgent) AS DOUBLE) AS n2,
                 SUM(CAST((1 - urgent) * y AS DOUBLE)) AS k2
          FROM g),
    p AS (SELECT n1, n2, k1 / n1 AS p1, k2 / n2 AS p2 FROM s),
    w AS (SELECT p1, p2, n1, n2,
                 {_L1} AS l1, {_U1} AS u1,
                 {_L2} AS l2, {_U2} AS u2
          FROM p)
    SELECT FLOOR(p1 * 10000 + 0.5) / 10000 AS rate_urgent,
           FLOOR(p2 * 10000 + 0.5) / 10000 AS rate_other,
           FLOOR((p1 - p2) * 10000 + 0.5) / 10000 AS diff,
           FLOOR((p1 - p2 - SQRT((p1 - l1) * (p1 - l1)
                                 + (u2 - p2) * (u2 - p2)))
                 * 10000 + 0.5) / 10000 AS ci_lo,
           FLOOR((p1 - p2 + SQRT((u1 - p1) * (u1 - p1)
                                 + (p2 - l2) * (p2 - l2)))
                 * 10000 + 0.5) / 10000 AS ci_hi
    FROM w
    """,
)
def stat_prop_diff_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newcombe hybrid-score CI for the difference in fulfilled rates
    between urgent and other orders: each proportion gets a Wilson
    interval, and the difference CI combines their one-sided margins
    in quadrature — respecting [−1, 1] and behaving at extreme rates
    where the Wald interval fails. Independent priorities: the CI
    must cover zero (asserted).

    Scale: one contingency aggregate; the interval is closed-form."""
    g = cat(spark, sf_dir)["orders"].select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("urgent"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    s = g.agg(
        F.sum("urgent").cast("double").alias("n1"),
        F.sum(F.col("urgent") * F.col("y")).cast("double").alias("k1"),
        F.sum(1 - F.col("urgent")).cast("double").alias("n2"),
        F.sum((1 - F.col("urgent")) * F.col("y"))
        .cast("double")
        .alias("k2"),
    )
    p1 = F.col("k1") / F.col("n1")
    p2 = F.col("k2") / F.col("n2")

    def wilson(p, n):
        z2 = Z95 * Z95
        center = p + z2 / (2 * n)
        half = Z95 * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        denom = 1 + z2 / n
        return (center - half) / denom, (center + half) / denom

    l1, u1 = wilson(p1, F.col("n1"))
    l2, u2 = wilson(p2, F.col("n2"))
    diff = p1 - p2
    lo = diff - F.sqrt((p1 - l1) * (p1 - l1) + (u2 - p2) * (u2 - p2))
    hi = diff + F.sqrt((u1 - p1) * (u1 - p1) + (p2 - l2) * (p2 - l2))
    return s.select(
        ratio(p1).alias("rate_urgent"),
        ratio(p2).alias("rate_other"),
        ratio(diff).alias("diff"),
        ratio(lo).alias("ci_lo"),
        ratio(hi).alias("ci_hi"),
    )
