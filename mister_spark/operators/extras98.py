"""Wave 98: SQL-defined functions, mediation analysis, and ordered
trend testing.

sql_sql_udf pins Spark's SQL scalar function surface (CREATE
TEMPORARY FUNCTION ... RETURNS ... RETURN expr) — reusable business
logic that stays INSIDE Catalyst (inlined into the plan, codegen'd,
pushdown-friendly) where a Python UDF would wall it off;
stat_mediation_sobel runs the Baron–Kenny decomposition with the
Sobel test — how much of x→y flows THROUGH the mediator m;
stat_cochran_armitage is the trend-in-proportions test across
ordered groups — the dose-response question a pairwise χ² can't
answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query


@query(
    "sql_sql_udf",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))
                 * 100 + 0.5) / 100 AS charged,
           CAST(SUM(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)
                AS BIGINT) AS deep_discounted
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def sql_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDF surface: business logic (`charged_amount`,
    `is_deep_discount`) defined once with CREATE TEMPORARY FUNCTION
    ... RETURN <expr> and reused across queries — unlike a Python UDF,
    the body INLINES into the Catalyst plan (whole-stage codegen,
    pushdown intact), which makes SQL UDFs the right home for shared
    formulas. The oracle computes the same numbers with the
    expressions written out, proving the inlining is
    semantics-preserving.

    Scale: the plan is identical to writing the expressions inline —
    one join + one partial-agg shuffle, zero Python."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION charged_amount(
            p DOUBLE, d DOUBLE, t DOUBLE)
        RETURNS DOUBLE RETURN p * (1 - d) * (1 + t)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION is_deep_discount(d DOUBLE)
        RETURNS INT RETURN CASE WHEN d >= 0.05 THEN 1 ELSE 0 END
        """
    )
    c = cat(spark, sf_dir)
    c["lineitem"].createOrReplaceTempView("_udf_li")
    c["orders"].createOrReplaceTempView("_udf_o")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               FLOOR(SUM(charged_amount(l_extendedprice, l_discount, l_tax))
                     * 100 + 0.5) / 100 AS charged,
               CAST(SUM(is_deep_discount(l_discount)) AS BIGINT)
                 AS deep_discounted
        FROM _udf_li JOIN _udf_o ON l_orderkey = o_orderkey
        GROUP BY 1
        """
    )


@query(
    "stat_mediation_sobel",
    oracle="""
    WITH d AS (SELECT l_quantity AS x, l_discount AS m,
                      l_extendedprice * (1 - l_discount) AS y
               FROM lineitem),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 AVG(x) AS mx, AVG(m) AS mm_, AVG(y) AS my,
                 SUM(x * x) AS sxx, SUM(x * m) AS sxm, SUM(x * y) AS sxy,
                 SUM(m * m) AS smm, SUM(m * y) AS smy
          FROM d),
    c AS (SELECT n, mx, mm_, my,
                 sxx - n * mx * mx AS cxx,
                 sxm - n * mx * mm_ AS cxm,
                 sxy - n * mx * my AS cxy,
                 smm - n * mm_ * mm_ AS cmm,
                 smy - n * mm_ * my AS cmy
          FROM s),
    fit AS (SELECT n, cxx, cxm, cmm,
                   cxm / cxx AS a,
                   cxy / cxx AS c_total,
                   (cmy * cxx - cxm * cxy) / (cmm * cxx - cxm * cxm) AS b,
                   (cxy * cmm - cxm * cmy) / (cmm * cxx - cxm * cxm)
                     AS c_direct,
                   cmy, cxy
            FROM c),
    se AS (SELECT *,
                  (cmm - a * a * cxx) / (n - 2) / cxx AS va,
                  ((SELECT SUM((y - c.my) * (y - c.my))
                    FROM d, c) - c_direct * cxy - b * cmy) / (n - 3)
                    / (cmm * (1 - cxm * cxm / (cxx * cmm))) AS vb
           FROM fit)
    SELECT FLOOR(a * 1000000 + 0.5) / 1000000 AS a,
           FLOOR(b * 10000 + 0.5) / 10000 AS b,
           FLOOR(c_total * 10000 + 0.5) / 10000 AS c_total,
           FLOOR(c_direct * 10000 + 0.5) / 10000 AS c_direct,
           FLOOR(a * b / SQRT(b * b * va + a * a * vb) * 10000 + 0.5)
             / 10000 AS sobel_z,
           FLOOR(a * b / c_total * 10000 + 0.5) / 10000 AS prop_mediated
    FROM se
    """,
)
def stat_mediation_sobel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baron–Kenny mediation with the Sobel test on (x = quantity,
    m = discount, y = discounted revenue): path a (x→m), path b (m→y
    controlling x), total and direct effects, Sobel z for the indirect
    path a·b, and the proportion mediated. The decomposition that
    turns 'discount correlates with revenue' into 'X% of quantity's
    effect routes through discounting'. (y is mechanically a function
    of m here — the point is the exact decomposition arithmetic, and
    the data makes the mediated share large by construction.)

    Scale: everything derives from one pass of moment sums (plus one
    for Σ(y−ȳ)²) — two aggregates, closed-form 2-predictor OLS, no
    iteration."""
    d = cat(spark, sf_dir)["lineitem"].select(
        F.col("l_quantity").alias("x"),
        F.col("l_discount").alias("m"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("y"),
    ).localCheckpoint()
    s = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("m").alias("mm_"),
        F.avg("y").alias("my"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("m")).alias("sxm"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
        F.sum(F.col("m") * F.col("y")).alias("smy"),
    )
    n = F.col("n")
    c = s.select(
        "n",
        "mx",
        "mm_",
        "my",
        (F.col("sxx") - n * F.col("mx") * F.col("mx")).alias("cxx"),
        (F.col("sxm") - n * F.col("mx") * F.col("mm_")).alias("cxm"),
        (F.col("sxy") - n * F.col("mx") * F.col("my")).alias("cxy"),
        (F.col("smm") - n * F.col("mm_") * F.col("mm_")).alias("cmm"),
        (F.col("smy") - n * F.col("mm_") * F.col("my")).alias("cmy"),
    )
    syy = d.crossJoin(F.broadcast(c.select("my"))).agg(
        F.sum(
            (F.col("y") - F.col("my")) * (F.col("y") - F.col("my"))
        ).alias("cyy")
    )
    det = F.col("cmm") * F.col("cxx") - F.col("cxm") * F.col("cxm")
    fit = c.crossJoin(F.broadcast(syy)).select(
        "*",
        (F.col("cxm") / F.col("cxx")).alias("a"),
        (F.col("cxy") / F.col("cxx")).alias("c_total"),
        ((F.col("cmy") * F.col("cxx") - F.col("cxm") * F.col("cxy")) / det)
        .alias("b"),
        ((F.col("cxy") * F.col("cmm") - F.col("cxm") * F.col("cmy")) / det)
        .alias("c_direct"),
    )
    va = (F.col("cmm") - F.col("a") * F.col("a") * F.col("cxx")) / (
        F.col("n") - 2
    ) / F.col("cxx")
    vb = (
        (
            F.col("cyy")
            - F.col("c_direct") * F.col("cxy")
            - F.col("b") * F.col("cmy")
        )
        / (F.col("n") - 3)
        / (
            F.col("cmm")
            * (1 - F.col("cxm") * F.col("cxm") / (F.col("cxx") * F.col("cmm")))
        )
    )
    ab = F.col("a") * F.col("b")
    return fit.select(
        rnd(F.col("a"), 6).alias("a"),
        ratio(F.col("b")).alias("b"),
        ratio(F.col("c_total")).alias("c_total"),
        ratio(F.col("c_direct")).alias("c_direct"),
        ratio(
            ab
            / F.sqrt(
                F.col("b") * F.col("b") * va + F.col("a") * F.col("a") * vb
            )
        ).alias("sobel_z"),
        ratio(ab / F.col("c_total")).alias("prop_mediated"),
    )


@query(
    "stat_cochran_armitage",
    oracle="""
    WITH g AS (SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS DOUBLE) AS s,
                      CAST(COUNT(*) AS DOUBLE) AS n,
                      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0
                               END) AS DOUBLE) AS k
               FROM orders GROUP BY 1),
    t AS (SELECT SUM(n) AS nn, SUM(k) / SUM(n) AS p FROM g),
    u AS (SELECT SUM(g.s * (g.k - g.n * t.p)) AS tt,
                 t.p * (1 - t.p)
                   * (SUM(g.s * g.s * g.n)
                      - SUM(g.s * g.n) * SUM(g.s * g.n) / t.nn) AS vv
          FROM g, t GROUP BY t.p, t.nn)
    SELECT FLOOR(tt * 10000 + 0.5) / 10000 AS trend_t,
           FLOOR(vv * 10000 + 0.5) / 10000 AS trend_var,
           FLOOR(tt / SQRT(vv) * 10000 + 0.5) / 10000 AS z
    FROM u
    """,
)
def stat_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend test: is the 'F' (fulfilled) rate
    monotonically related to order priority (scores 1..5)? T = Σ
    sᵢ(kᵢ − nᵢp̄) with its exact null variance; z ~ N(0,1) under no
    trend. The dose-response test — more powerful than an omnibus χ²
    when the alternative is ordered, which priority levels are.

    Scale: one rollup to 5 group rows; the statistic is 5-row
    arithmetic."""
    g = (
        cat(spark, sf_dir)["orders"]
        .groupBy(
            F.substring("o_orderpriority", 1, 1).cast("double").alias("s")
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            )
            .cast("double")
            .alias("k"),
        )
    )
    t = g.agg(
        F.sum("n").alias("nn"), (F.sum("k") / F.sum("n")).alias("p")
    )
    j = g.crossJoin(F.broadcast(t))
    tt = F.sum(F.col("s") * (F.col("k") - F.col("n") * F.col("p")))
    vv = (
        F.first("p")
        * (1 - F.first("p"))
        * (
            F.sum(F.col("s") * F.col("s") * F.col("n"))
            - F.sum(F.col("s") * F.col("n"))
            * F.sum(F.col("s") * F.col("n"))
            / F.first("nn")
        )
    )
    return j.agg(
        ratio(tt).alias("trend_t"),
        ratio(vv).alias("trend_var"),
        ratio(tt / F.sqrt(vv)).alias("z"),
    )
