"""Wave 177: one-way MANOVA and net revenue retention.

stat_wilks_manova extends the Hotelling two-sample test to k groups:
Wilks' lambda = det(W)/det(T) compares within-group to total scatter
across BOTH dimensions jointly — the 2x2 determinants close the
algebra with no linear-algebra library. ev_nrr is the SaaS-ledger
metric done on order revenue: per year, what did LAST year's
customers spend THIS year, split into retained / expansion /
contraction / churn — the decomposition that separates durable growth
from acquisition treadmills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

MANOVA_K = 3


@query(
    "stat_wilks_manova",
    oracle=f"""
    WITH m AS (SELECT label % {MANOVA_K} AS g,
                      CAST(embedding[1] AS DOUBLE) AS x,
                      CAST(embedding[2] AS DOUBLE) AS y
               FROM embeddings),
    s AS (SELECT g, CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * x) AS sxx, SUM(y * y) AS syy,
                 SUM(x * y) AS sxy
          FROM m GROUP BY 1),
    w AS (SELECT SUM(n) AS n, CAST(COUNT(*) AS DOUBLE) AS k,
                 SUM(sxx - sx * sx / n) AS wxx,
                 SUM(syy - sy * sy / n) AS wyy,
                 SUM(sxy - sx * sy / n) AS wxy,
                 SUM(sx) AS tx, SUM(sy) AS ty,
                 SUM(sxx) AS txx, SUM(syy) AS tyy, SUM(sxy) AS txy
          FROM s),
    d AS (SELECT n, k,
                 wxx * wyy - wxy * wxy AS detw,
                 (txx - tx * tx / n) * (tyy - ty * ty / n)
                 - (txy - tx * ty / n) * (txy - tx * ty / n) AS dett
          FROM w),
    l AS (SELECT n, k, detw / dett AS lam FROM d)
    SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS groups,
           FLOOR(lam * 10000 + 0.5) / 10000 AS wilks_lambda,
           FLOOR((1 - SQRT(lam)) / SQRT(lam) * (n - k - 1) / (k - 1)
                 * 10000 + 0.5) / 10000 AS f_stat,
           CAST(2 * (k - 1) AS BIGINT) AS df1,
           CAST(2 * (n - k - 1) AS BIGINT) AS df2
    FROM l
    """,
)
def stat_wilks_manova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way MANOVA on the first two embedding dimensions across
    k={k} label-residue groups: Wilks' lambda = det(W)/det(T) with the
    2x2 within- and total-scatter determinants in closed form, plus
    Rao's exact F transform for p=2:
    F = ((1-sqrt(L))/sqrt(L)) * (N-k-1)/(k-1), df = (2(k-1),
    2(N-k-1)). The k-group generalization the per-dimension ANOVAs
    cannot give you when dimensions correlate.

    Scale: one grouped six-moment aggregate (k rows) summed into a
    single row — every determinant is scalar arithmetic after ONE
    shuffle."""
    m = cat(spark, sf_dir)["embeddings"].select(
        (F.col("label") % MANOVA_K).alias("g"),
        F.col("embedding")[0].cast("double").alias("x"),
        F.col("embedding")[1].cast("double").alias("y"),
    )
    s = m.groupBy("g").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    w = s.agg(
        F.sum("n").alias("n"),
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")).alias(
            "wxx"
        ),
        F.sum(F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")).alias(
            "wyy"
        ),
        F.sum(F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")).alias(
            "wxy"
        ),
        F.sum("sx").alias("tx"),
        F.sum("sy").alias("ty"),
        F.sum("sxx").alias("txx"),
        F.sum("syy").alias("tyy"),
        F.sum("sxy").alias("txy"),
    )
    detw = F.col("wxx") * F.col("wyy") - F.col("wxy") * F.col("wxy")
    dett = (
        (F.col("txx") - F.col("tx") * F.col("tx") / F.col("n"))
        * (F.col("tyy") - F.col("ty") * F.col("ty") / F.col("n"))
        - (F.col("txy") - F.col("tx") * F.col("ty") / F.col("n"))
        * (F.col("txy") - F.col("tx") * F.col("ty") / F.col("n"))
    )
    lam = detw / dett
    return w.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("groups"),
        ratio(lam).alias("wilks_lambda"),
        ratio(
            (1 - F.sqrt(lam))
            / F.sqrt(lam)
            * (F.col("n") - F.col("k") - 1)
            / (F.col("k") - 1)
        ).alias("f_stat"),
        (2 * (F.col("k") - 1)).cast("bigint").alias("df1"),
        (2 * (F.col("n") - F.col("k") - 1)).cast("bigint").alias("df2"),
    )


stat_wilks_manova.__doc__ = stat_wilks_manova.__doc__.format(k=MANOVA_K)


@query(
    "ev_nrr",
    oracle="""
    WITH cy AS (SELECT o_custkey AS ck,
                       EXTRACT(year FROM o_orderdate) AS yr,
                       SUM(o_totalprice) AS rev
                FROM orders GROUP BY 1, 2),
    pairs AS (SELECT p.yr + 1 AS yr, p.ck, p.rev AS prior_rev,
                     COALESCE(c.rev, 0) AS curr_rev
              FROM cy p LEFT JOIN cy c
                ON p.ck = c.ck AND c.yr = p.yr + 1),
    agg AS (SELECT yr,
                   CAST(COUNT(*) AS BIGINT) AS base_customers,
                   SUM(prior_rev) AS base_rev,
                   SUM(curr_rev) AS curr_rev,
                   SUM(LEAST(prior_rev, curr_rev)) AS retained_rev,
                   SUM(GREATEST(curr_rev - prior_rev, 0)) AS expansion,
                   SUM(CASE WHEN curr_rev > 0
                            THEN GREATEST(prior_rev - curr_rev, 0)
                            ELSE 0 END) AS contraction,
                   SUM(CASE WHEN curr_rev = 0 THEN prior_rev
                            ELSE 0 END) AS churned_rev
            FROM pairs GROUP BY 1)
    SELECT yr AS year, base_customers,
           FLOOR(base_rev * 100 + 0.5) / 100 AS base_rev,
           FLOOR(retained_rev * 100 + 0.5) / 100 AS retained_rev,
           FLOOR(expansion * 100 + 0.5) / 100 AS expansion,
           FLOOR(contraction * 100 + 0.5) / 100 AS contraction,
           FLOOR(churned_rev * 100 + 0.5) / 100 AS churned_rev,
           FLOOR(curr_rev / base_rev * 10000 + 0.5) / 10000 AS nrr
    FROM agg
    WHERE yr <= (SELECT MAX(yr) FROM cy)
    ORDER BY 1
    """,
)
def ev_nrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net revenue retention per year: take every customer with
    revenue in year Y-1 (the base book), measure their year-Y revenue,
    and decompose the change — retained (min of the two), expansion
    (growth above prior), contraction (shrinkage while still active),
    churn (prior revenue of customers gone to zero). NRR =
    curr/base; the identity base = retained + contraction + churned
    and curr = retained + expansion holds to the cent by
    construction (pytest-pinned). Above 1.0 the book grows with zero
    acquisition.

    Scale: one (customer, year) rollup, a self-join on
    (customer, year+1) — both sides shuffle once on the same key —
    and a calendar-bounded final aggregate."""
    o = cat(spark, sf_dir)["orders"]
    cy = o.groupBy(
        F.col("o_custkey").alias("ck"),
        F.year("o_orderdate").alias("yr"),
    ).agg(F.sum("o_totalprice").alias("rev")).localCheckpoint()
    # ^ customer-year grain; read by both join sides
    maxyr = cy.agg(F.max("yr").alias("mx"))
    p = cy.select(
        (F.col("yr") + 1).alias("yr"),
        "ck",
        F.col("rev").alias("prior_rev"),
    )
    c = cy.select(
        F.col("yr").alias("c_yr"),
        F.col("ck").alias("c_ck"),
        F.col("rev").alias("c_rev"),
    )
    pairs = p.join(
        c,
        (F.col("ck") == F.col("c_ck")) & (F.col("yr") == F.col("c_yr")),
        "left",
    ).select(
        "yr",
        "prior_rev",
        F.coalesce("c_rev", F.lit(0.0)).alias("curr_rev"),
    )
    money2 = lambda col: F.floor(col * 100 + 0.5) / 100  # noqa: E731
    agg = pairs.groupBy("yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("base_customers"),
        F.sum("prior_rev").alias("base_rev"),
        F.sum("curr_rev").alias("curr_rev"),
        F.sum(F.least("prior_rev", "curr_rev")).alias("retained_rev"),
        F.sum(
            F.greatest(F.col("curr_rev") - F.col("prior_rev"), F.lit(0.0))
        ).alias("expansion"),
        F.sum(
            F.when(
                F.col("curr_rev") > 0,
                F.greatest(F.col("prior_rev") - F.col("curr_rev"), F.lit(0.0)),
            ).otherwise(0.0)
        ).alias("contraction"),
        F.sum(
            F.when(F.col("curr_rev") == 0, F.col("prior_rev")).otherwise(0.0)
        ).alias("churned_rev"),
    )
    return (
        agg.crossJoin(F.broadcast(maxyr))
        .filter(F.col("yr") <= F.col("mx"))
        .select(
            F.col("yr").alias("year"),
            "base_customers",
            money2(F.col("base_rev")).alias("base_rev"),
            money2(F.col("retained_rev")).alias("retained_rev"),
            money2(F.col("expansion")).alias("expansion"),
            money2(F.col("contraction")).alias("contraction"),
            money2(F.col("churned_rev")).alias("churned_rev"),
            ratio(F.col("curr_rev") / F.col("base_rev")).alias("nrr"),
        )
        .orderBy("year")
    )
