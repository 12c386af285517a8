"""Wave 192: inequality decomposition and tail-risk measures.

stat_theil_index decomposes customer-spend inequality into WITHIN-
nation and BETWEEN-nation parts — the additive decomposition that is
Theil's whole advantage over stat_gini (a single number that cannot
say where the inequality lives). fin_expected_shortfall is historical
VaR + CVaR on daily revenue returns: the 95% value-at-risk is an
exact order statistic of the return distribution and the expected
shortfall is the mean of the breach tail — the coherent risk measure
Basel moved to precisely because VaR alone ignores how BAD the bad
days are (ev_drawdown measures a path; this measures the tail law).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, money, rnd
from mister_spark.registry import query


@query(
    "stat_theil_index",
    # Real oracle: per-customer and per-nation spends are summed in
    # exact integer CENTS (the r08 full-suite run caught avg_spend
    # landing exactly on a half-cent floor boundary, where float-sum
    # order flipped the grid), so sums/means divide identical
    # integers; only the x*ln x statistic is float, and the identity
    # T_g = sl_g/s_g - ln(s_g/n_g) keeps its ulps inside the 1e-6
    # grid.
    oracle="""
    WITH x AS (SELECT o.o_custkey AS ck, c.c_nationkey AS nk,
                      SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5)
                               AS BIGINT)) AS xc
               FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
               GROUP BY 1, 2),
    g AS (SELECT nk, CAST(COUNT(*) AS DOUBLE) AS ng, SUM(xc) AS sgc,
                 SUM((CAST(xc AS DOUBLE) / 100.0)
                     * LN(CAST(xc AS DOUBLE) / 100.0)) AS slg
          FROM x GROUP BY nk),
    tot AS (SELECT SUM(ng) AS n, SUM(sgc) AS sc FROM g),
    gg AS (SELECT nk, ng, slg, CAST(sgc AS DOUBLE) / 100.0 AS sg,
                  CAST(sgc AS DOUBLE) / ng AS avg_cents
           FROM g),
    tt AS (SELECT n, CAST(sc AS DOUBLE) / 100.0 AS s FROM tot)
    SELECT gg.nk AS nation_key,
           CAST(gg.ng AS BIGINT) AS n_customers,
           FLOOR(gg.avg_cents + 0.5) / 100 AS avg_spend,
           FLOOR((gg.slg / gg.sg - LN(gg.sg / gg.ng)) * 1e6 + 0.5) / 1e6
               AS theil_group,
           FLOOR(gg.sg / tt.s * (gg.slg / gg.sg - LN(gg.sg / gg.ng))
                 * 1e6 + 0.5) / 1e6 AS within_contrib,
           FLOOR(gg.sg / tt.s * LN((gg.sg / gg.ng) / (tt.s / tt.n))
                 * 1e6 + 0.5) / 1e6 AS between_contrib
    FROM gg, tt
    ORDER BY nation_key
    """,
)
def stat_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality of customer spend, decomposed by nation:
    T = Σ_g (s_g/s)·T_g  +  Σ_g (s_g/s)·ln(μ_g/μ), with the group
    index T_g = (Σ x ln x)/s_g − ln(μ_g). The within/between split
    answers the question Gini cannot: is spend inequality a global
    phenomenon or concentrated inside a few markets? (Summing the
    two contribution columns reproduces total T exactly — gated in
    pytest.)

    Scale: one per-customer rollup (groupBy custkey), one join to the
    customer dim for the nation, ONE nation-level aggregation of
    three sufficient statistics, and a broadcast 1-row global frame.
    No windows, no per-row second pass: the x·ln x trick turns the
    two-pass textbook formula into one map-side-combinable sum."""
    t = cat(spark, sf_dir)
    x = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
            ).alias("xc")
        )
        .join(
            t["customer"].select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_nationkey").alias("nk"),
            ),
            "o_custkey",
        )
    )
    xd = F.col("xc").cast("double") / 100.0
    g = x.groupBy("nk").agg(
        F.count(F.lit(1)).cast("double").alias("ng"),
        F.sum("xc").alias("sgc"),
        F.sum(xd * F.log(xd)).alias("slg"),
    )
    tot = g.agg(F.sum("ng").alias("n"), F.sum("sgc").alias("sc"))
    sg = F.col("sgc").cast("double") / 100.0
    s = F.col("sc").cast("double") / 100.0
    mu_g = sg / F.col("ng")
    t_g = F.col("slg") / sg - F.log(mu_g)
    share = sg / s
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            F.col("nk").alias("nation_key"),
            F.col("ng").cast("bigint").alias("n_customers"),
            # exact half-up on the integer-cent mean: no float-sum
            # knife edge (avg_cents is the same rational both engines)
            (
                F.floor(
                    F.col("sgc").cast("double") / F.col("ng") + 0.5
                )
                / 100
            ).alias("avg_spend"),
            rnd(t_g, 6).alias("theil_group"),
            rnd(share * t_g, 6).alias("within_contrib"),
            rnd(share * F.log(mu_g / (s / F.col("n"))), 6).alias(
                "between_contrib"
            ),
        )
        .orderBy("nation_key")
    )


ES_Q = 0.05  # lower-tail quantile for VaR/ES


@query(
    "fin_expected_shortfall",
    # Real oracle: the VaR cut is an exact order statistic selected
    # from integer cumulative counts over the distinct-return frame;
    # the tail mean averages the identical breach set in both engines
    # (selection compares ~1e-2-scale returns, ulp-stable).
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS t,
                      SUM(o_totalprice) AS y
               FROM orders GROUP BY 1),
    r AS (SELECT c.y / NULLIF(p.y, 0) - 1 AS r
          FROM d c JOIN d p ON p.t = c.t - 1 WHERE p.y > 0),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM r),
    cum AS (SELECT r AS v, SUM(COUNT(*)) OVER (ORDER BY r) AS c
            FROM r GROUP BY r),
    th AS (SELECT MIN(v) AS var95 FROM cum, nn
           WHERE c >= CEIL({ES_Q!r} * nn.m)),
    es AS (SELECT CAST(COUNT(*) AS BIGINT) AS breach_days,
                  AVG(r.r) AS es95, MIN(r.r) AS worst
           FROM r, th WHERE r.r <= th.var95)
    SELECT nn.m AS n_returns,
           FLOOR(th.var95 * 1e6 + 0.5) / 1e6 AS var_95,
           FLOOR(es.es95 * 1e6 + 0.5) / 1e6 AS es_95,
           es.breach_days,
           FLOOR(es.worst * 1e6 + 0.5) / 1e6 AS worst_return
    FROM nn, th, es
    """,
)
def fin_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical VaR(95) and expected shortfall on daily revenue
    returns: VaR is the exact empirical 5th-percentile return, ES the
    mean of all returns at or below it (breach convention: the VaR
    day itself is in the tail). ES is the coherent tail measure —
    two return streams can share a VaR while one's breach days are
    catastrophically worse; ES sees that, VaR does not.

    Scale: the day frame is calendar-bounded after ONE rollup; the
    quantile is the two-phase bucketed prefix sum over the distinct-
    return frame (no single-task global sort), and the tail mean is
    one filtered aggregate with the 1-row cut broadcast."""
    d = (
        cat(spark, sf_dir)["orders"]
        .select(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            ).alias("t"),
            "o_totalprice",
        )
        .groupBy("t")
        .agg(F.sum("o_totalprice").alias("y"))
        .localCheckpoint()  # feeds both lag-join aliases
    )
    cur = d.select(F.col("t"), F.col("y"))
    prv = d.select((F.col("t") + 1).alias("t"), F.col("y").alias("yp"))
    r = (
        cur.join(prv, "t")
        .filter(F.col("yp") > 0)
        .select((F.col("y") / F.col("yp") - 1).alias("r"))
        .localCheckpoint()  # feeds the count, the cut, and the tail agg
    )
    m = r.count()
    k = math.ceil(ES_Q * m)
    dv = r.groupBy("r").agg(F.count(F.lit(1)).alias("w"))
    cum = bucketed_cumsum(dv, "r", {"c": F.col("w")})
    th = cum.agg(
        F.min(F.when(F.col("c") >= k, F.col("r"))).alias("var95")
    )
    es = r.crossJoin(F.broadcast(th)).filter(
        F.col("r") <= F.col("var95")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("breach_days"),
        F.avg("r").alias("es95"),
        F.min("r").alias("worst"),
    )
    return es.crossJoin(F.broadcast(th)).select(
        F.lit(m).cast("bigint").alias("n_returns"),
        rnd(F.col("var95"), 6).alias("var_95"),
        rnd(F.col("es95"), 6).alias("es_95"),
        F.col("breach_days"),
        rnd(F.col("worst"), 6).alias("worst_return"),
    )
