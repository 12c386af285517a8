"""Wave 163: ABC-XYZ inventory classification and newsvendor stocking.

ds_abc_xyz crosses the two classic inventory axes — cumulative
revenue share (ABC) and demand variability (XYZ) — into the 3×3
matrix that decides which parts get tight service levels and which
get made-to-order; ds_newsvendor reads the optimal stock level
straight off the empirical demand distribution at the critical
ratio, with the expected leftover and shortage that stock implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

NV_CR = 0.8  # critical ratio cu/(cu+co)


@query(
    "ds_abc_xyz",
    oracle="""
    WITH pr AS (SELECT l_partkey AS pk, SUM(l_extendedprice) AS rev
                FROM lineitem GROUP BY 1),
    tot AS (SELECT SUM(rev) AS t FROM pr),
    cum AS (SELECT pr.pk, pr.rev,
                   SUM(pr.rev) OVER (ORDER BY pr.rev DESC) / tot.t
                     AS cshare
            FROM pr, tot),
    abc AS (SELECT pk, rev,
                   CASE WHEN cshare <= 0.8 THEN 'A'
                        WHEN cshare <= 0.95 THEN 'B'
                        ELSE 'C' END AS abc
            FROM cum),
    mo AS (SELECT l_partkey AS pk,
                  strftime(date_trunc('month', l_shipdate), '%Y-%m')
                    AS mon,
                  SUM(l_quantity) AS q
           FROM lineitem GROUP BY 1, 2),
    xyz AS (SELECT pk,
                   CASE WHEN AVG(q) = 0 THEN 'Z'
                        WHEN STDDEV_POP(q) / AVG(q) <= 0.5 THEN 'X'
                        WHEN STDDEV_POP(q) / AVG(q) <= 1.0 THEN 'Y'
                        ELSE 'Z' END AS xyz
            FROM mo GROUP BY 1)
    SELECT abc.abc AS abc_class, xyz.xyz AS xyz_class,
           CAST(COUNT(*) AS BIGINT) AS parts,
           FLOOR(SUM(abc.rev) * 10000.0 / MAX(tot.t) + 0.5) / 10000
             AS revenue_share
    FROM abc JOIN xyz ON abc.pk = xyz.pk, tot
    GROUP BY 1, 2
    """,
)
def ds_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ matrix: parts class A/B/C by cumulative revenue share
    (80/95 cuts over the revenue-DESC prefix — peers share a cum via
    value-grain RANGE semantics, mirrored exactly by grouping on the
    revenue value before the prefix) × X/Y/Z by the coefficient of
    variation of monthly demand (0.5/1.0 cuts). Cell counts and
    revenue share — the planning matrix: AX gets automated
    replenishment, CZ gets made-to-order.

    Scale: the ABC prefix runs on |distinct revenue values| via
    `bucketed_cumsum` (no single-task sort); XYZ is one bounded
    (part, month) rollup; the cross is a part-grain join."""
    li = cat(spark, sf_dir)["lineitem"]
    pr = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("l_extendedprice").alias("rev")
    )
    tot = pr.agg(F.sum("rev").alias("t"))
    g = pr.groupBy("rev").agg(F.sum("rev").alias("vrev"))
    gneg = g.withColumn("nrev", -F.col("rev"))
    cum = bucketed_cumsum(gneg, "nrev", {"crev": F.col("vrev")})
    abc_v = cum.crossJoin(F.broadcast(tot)).select(
        "rev",
        F.when(F.col("crev") / F.col("t") <= 0.8, "A")
        .when(F.col("crev") / F.col("t") <= 0.95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    abc = pr.join(abc_v, "rev")
    mo = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.date_format(
            F.date_trunc("month", "l_shipdate"), "yyyy-MM"
        ).alias("mon"),
    ).agg(F.sum("l_quantity").alias("q"))
    xyz = mo.groupBy("pk").agg(
        F.when(F.avg("q") == 0, "Z")
        .when(F.stddev_pop("q") / F.avg("q") <= 0.5, "X")
        .when(F.stddev_pop("q") / F.avg("q") <= 1.0, "Y")
        .otherwise("Z")
        .alias("xyz")
    )
    return (
        abc.join(xyz, "pk")
        .crossJoin(F.broadcast(tot))
        .groupBy(
            F.col("abc").alias("abc_class"),
            F.col("xyz").alias("xyz_class"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("parts"),
            (
                F.floor(F.sum("rev") * 10000.0 / F.max("t") + 0.5)
                / 10000
            ).alias("revenue_share"),
        )
    )


@query(
    "ds_newsvendor",
    oracle=f"""
    WITH d AS (SELECT l_shipdate AS day, SUM(l_quantity) AS q
               FROM lineitem GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM d),
    g AS (SELECT q, CAST(COUNT(*) AS DOUBLE) AS c FROM d GROUP BY 1),
    e AS (SELECT q, SUM(c) OVER (ORDER BY q) AS cum FROM g),
    s AS (SELECT MIN(q) AS stock FROM e, n
          WHERE cum >= CEIL({NV_CR} * n.n)),
    ev AS (SELECT AVG(GREATEST(0, s.stock - d.q)) AS exp_leftover,
                  AVG(GREATEST(0, d.q - s.stock)) AS exp_shortage,
                  AVG(d.q) AS mean_demand
           FROM d, s)
    SELECT (SELECT FLOOR(stock * 100 + 0.5) / 100 FROM s)
             AS stock_level,
           FLOOR(mean_demand * 100 + 0.5) / 100 AS mean_demand,
           FLOOR(exp_leftover * 100 + 0.5) / 100 AS exp_leftover,
           FLOOR(exp_shortage * 100 + 0.5) / 100 AS exp_shortage,
           CAST({NV_CR} AS DOUBLE) AS critical_ratio
    FROM ev
    """,
)
def ds_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking: the optimal stock is the EMPIRICAL
    {cr:.0%} demand quantile (critical ratio cu/(cu+co)) read off
    the daily-demand ECDF as an exact order statistic — no
    distributional assumption — plus the expected leftover and
    shortage that stock implies under the same empirical
    distribution. Stock above the mean is the whole point of the
    model: underage at {cr:.0%} costs 4× overage.

    Scale: daily demand is one rollup; the ECDF rides
    `bucketed_cumsum` on |distinct demand| rows and the expectation
    is one broadcast-stock pass."""
    li = cat(spark, sf_dir)["lineitem"]
    d = li.groupBy(F.col("l_shipdate").alias("day")).agg(
        F.sum("l_quantity").alias("q")
    )
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n"))
    g = d.groupBy("q").agg(F.count(F.lit(1)).cast("double").alias("c"))
    e = bucketed_cumsum(g, "q", {"cum": F.col("c")}).crossJoin(
        F.broadcast(n)
    )
    s = e.filter(
        F.col("cum") >= F.ceil(NV_CR * F.col("n"))
    ).agg(F.min("q").alias("stock"))
    ev = d.crossJoin(F.broadcast(s)).agg(
        F.avg(
            F.greatest(F.lit(0.0), F.col("stock") - F.col("q"))
        ).alias("exp_leftover"),
        F.avg(
            F.greatest(F.lit(0.0), F.col("q") - F.col("stock"))
        ).alias("exp_shortage"),
        F.avg("q").alias("mean_demand"),
        F.first("stock").alias("stock"),
    )
    return ev.select(
        (F.floor(F.col("stock") * 100 + 0.5) / 100).alias(
            "stock_level"
        ),
        (F.floor(F.col("mean_demand") * 100 + 0.5) / 100).alias(
            "mean_demand"
        ),
        (F.floor(F.col("exp_leftover") * 100 + 0.5) / 100).alias(
            "exp_leftover"
        ),
        (F.floor(F.col("exp_shortage") * 100 + 0.5) / 100).alias(
            "exp_shortage"
        ),
        F.lit(NV_CR).alias("critical_ratio"),
    )


ds_newsvendor.__doc__ = ds_newsvendor.__doc__.format(cr=NV_CR)
