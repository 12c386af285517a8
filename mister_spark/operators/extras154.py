"""Wave 154: revenue concentration and the range() surface.

ev_revenue_hhi is the Herfindahl–Hirschman concentration index over
customer revenue shares — the antitrust-grade 'how dependent are we
on few customers' number, with the effective-customer count 1/HHI
that makes it readable; sql_range_surface pins Spark SQL's range()
table-valued function (the generator for calendars, grids, and
synthetic keys) against DuckDB's generate_series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query


@query(
    "ev_revenue_hhi",
    oracle="""
    WITH g AS (SELECT o_custkey, SUM(o_totalprice) AS rev
               FROM orders GROUP BY 1),
    t AS (SELECT SUM(rev) AS total FROM g),
    s AS (SELECT SUM((g.rev / t.total) * (g.rev / t.total)) AS hhi,
                 CAST(COUNT(*) AS BIGINT) AS customers
          FROM g, t)
    SELECT customers,
           FLOOR(hhi * 1000000 + 0.5) / 1000000 AS hhi,
           FLOOR(1 / hhi * 100 + 0.5) / 100 AS effective_customers,
           FLOOR(1 / hhi / customers * 10000 + 0.5) / 10000
             AS effective_share
    FROM s
    """,
)
def ev_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: HHI = Σ(share²) over customer revenue
    shares, with the effective customer count 1/HHI — 'our revenue
    behaves as if it came from N equal customers'. effective_share
    near 1 means healthy dispersion; a low value is key-account risk
    as a single number (the curve version is stat_lorenz_curve; the
    inequality scalar is stat_gini — this is the CONCENTRATION
    scalar regulators use).

    Scale: one customer rollup; HHI is one aggregate with the total
    broadcast."""
    g = (
        cat(spark, sf_dir)["orders"]
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    t = g.agg(F.sum("rev").alias("total"))
    share = F.col("rev") / F.col("total")
    s = g.crossJoin(F.broadcast(t)).agg(
        F.sum(share * share).alias("hhi"),
        F.count(F.lit(1)).cast("bigint").alias("customers"),
    )
    return s.select(
        "customers",
        (F.floor(F.col("hhi") * 1000000 + 0.5) / 1000000).alias("hhi"),
        (F.floor(1 / F.col("hhi") * 100 + 0.5) / 100).alias(
            "effective_customers"
        ),
        ratio(1 / F.col("hhi") / F.col("customers")).alias(
            "effective_share"
        ),
    )


@query(
    "sql_range_surface",
    oracle="""
    WITH cal AS (SELECT DATE '1995-01-01' + CAST(i AS INTEGER) AS day
                 FROM generate_series(0, 364) s(i)),
    o AS (SELECT CAST(o_orderdate AS DATE) AS day,
                 CAST(COUNT(*) AS DOUBLE) AS n
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate < TIMESTAMP '1996-01-01'
          GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS calendar_days,
           CAST(SUM(CASE WHEN o.n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS zero_order_days,
           FLOOR(AVG(COALESCE(o.n, 0)) * 10000 + 0.5) / 10000
             AS avg_orders_per_day
    FROM cal LEFT JOIN o ON cal.day = o.day
    """,
)
def sql_range_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range() table-function surface: generate the full 1995
    calendar with spark.range(365) + date arithmetic, LEFT-join the
    order counts, and report zero-order days — the dense-calendar
    pattern (grids, gap detection, as-of scaffolds) that aggregation
    over observed rows alone can never produce, because absent days
    produce no rows to aggregate.

    Scale: range() is a synthetic distributed source (no I/O); the
    join keys on day."""
    cal = spark.range(365).select(
        F.date_add(F.lit("1995-01-01").cast("date"), F.col("id").cast("int"))
        .alias("day")
    )
    o = (
        cat(spark, sf_dir)["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    j = cal.join(o, "day", "left")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("calendar_days"),
        F.sum(F.col("n").isNull().cast("long"))
        .cast("bigint")
        .alias("zero_order_days"),
        ratio(F.avg(F.coalesce("n", F.lit(0.0)))).alias(
            "avg_orders_per_day"
        ),
    )
