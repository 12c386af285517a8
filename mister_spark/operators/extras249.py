"""Wave 249: normality testing with estimated parameters.

stat_lilliefors is the Kolmogorov-Smirnov normality test done RIGHT
when the mean and standard deviation come from the data: the naive KS
p-value is badly anticonservative with estimated parameters (the fitted
curve hugs the sample), so Lilliefors recalibrates the D statistic's
null distribution (Dallal-Wilkinson's published approximation).
stat_dist_fit_compare reports raw KS distances for model SELECTION;
this turns the normal-fit distance into an honest reject/accept
decision — the gate before any procedure that assumes normality
(t-tests, control limits, process capability).

Exactness: account balances snap to integer cents, so n, mean and sd
are ratios of exact integers; the ECDF steps are integer counts on the
distinct-value collapse; Phi uses the engine-shared erf polynomial and
the Dallal-Wilkinson tail is closed-form algebra on shared literals —
every output digit matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

# Dallal & Wilkinson (1986) approximation constants (public literature)
_DW = (-7.01256, 2.78019, 2.99587, -0.122119, 0.974598, 1.67997)


def _lilliefors_oracle() -> str:
    a0, a1, a2, a3, a4, a5 = _DW
    phi = (
        f"CASE WHEN z >= 0 THEN 1 - {normal_sf_sql('z')} "
        f"ELSE {normal_sf_sql('(-z)')} END"
    )
    return f"""
    WITH x AS (SELECT c_acctbal AS v,
                      CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
               FROM customer),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(cents) / (100.0 * COUNT(*)) AS mu,
                 SQRT((SUM(cents * cents) / 10000.0
                       - COUNT(*) * (SUM(cents) / (100.0 * COUNT(*)))
                         * (SUM(cents) / (100.0 * COUNT(*))))
                      / (COUNT(*) - 1)) AS sd
          FROM x),
    g AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM x GROUP BY 1),
    c AS (SELECT v, cnt, SUM(cnt) OVER (ORDER BY v) AS cum FROM g),
    gaps AS (SELECT c.v, ((c.v - m.mu) / m.sd) AS z,
                    CAST(c.cum AS DOUBLE) / m.n AS fhi,
                    CAST(c.cum - c.cnt AS DOUBLE) / m.n AS flo
             FROM c, m),
    d AS (SELECT MAX(GREATEST(fhi - {phi}, {phi} - flo)) AS d FROM gaps),
    p AS (SELECT m.n, m.mu, m.sd, d.d,
                 CASE WHEN m.n > 100
                      THEN d.d * POWER(m.n / 100.0, 0.49) ELSE d.d END AS kd,
                 CASE WHEN m.n > 100 THEN 100.0
                      ELSE CAST(m.n AS DOUBLE) END AS nn
          FROM m, d)
    SELECT n, FLOOR(mu * 100 + 0.5) / 100 AS mean,
           FLOOR(sd * 100 + 0.5) / 100 AS sd,
           FLOOR(d * 10000 + 0.5) / 10000 AS d_stat,
           FLOOR(LEAST(1.0, EXP({a0!r} * kd * kd * (nn + {a1!r})
                               + {a2!r} * kd * SQRT(nn + {a1!r})
                               + {a3!r} + {a4!r} / SQRT(nn)
                               + {a5!r} / nn))
                 * 1000000 + 0.5) / 1000000 AS p_value,
           CAST(CASE WHEN LEAST(1.0, EXP({a0!r} * kd * kd * (nn + {a1!r})
                               + {a2!r} * kd * SQRT(nn + {a1!r})
                               + {a3!r} + {a4!r} / SQRT(nn)
                               + {a5!r} / nn)) < 0.05
                THEN 1 ELSE 0 END AS BIGINT) AS reject_normal
    FROM p
    """


@query("stat_lilliefors", oracle=_lilliefors_oracle())
def stat_lilliefors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lilliefors normality test on customer account balances: D =
    sup over the sample of max(F_hat(v) - Phi(z), Phi(z) - F_hat(v-))
    against the normal with the SAMPLE mean and sd, with the
    Dallal-Wilkinson tail (the KS null is wrong once parameters are
    estimated — the naive p can be 5-10x too small, waving through
    non-normal data). reject_normal is the 5% gate a downstream
    t-test or control chart should check first.

    Scale: integer-cent moments in one aggregate; the ECDF rides the
    |distinct values| collapse + `bucketed_cumsum` (two-phase prefix
    sum, no single-task sort); the sup is an order-independent MAX."""
    x = cat(spark, sf_dir)["customer"].select(
        F.col("c_acctbal").alias("v"),
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    m = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("cents") / (100.0 * F.count(F.lit(1)))).alias("mu"),
        F.sqrt(
            (
                F.sum(F.col("cents") * F.col("cents")) / 10000.0
                - F.count(F.lit(1))
                * (F.sum("cents") / (100.0 * F.count(F.lit(1))))
                * (F.sum("cents") / (100.0 * F.count(F.lit(1))))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("sd"),
    )
    g = x.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    c = bucketed_cumsum(g, "v", {"cum": F.col("cnt")})
    z = (F.col("v") - F.col("mu")) / F.col("sd")
    phi = F.when(z >= 0, 1 - normal_sf(z)).otherwise(normal_sf(-z))
    gaps = c.crossJoin(F.broadcast(m)).select(
        F.greatest(
            F.col("cum").cast("double") / F.col("n") - phi,
            phi - (F.col("cum") - F.col("cnt")).cast("double") / F.col("n"),
        ).alias("gap")
    )
    d = gaps.agg(F.max("gap").alias("d"))
    a0, a1, a2, a3, a4, a5 = _DW
    kd = F.when(
        F.col("n") > 100, F.col("d") * F.pow(F.col("n") / 100.0, 0.49)
    ).otherwise(F.col("d"))
    nn = F.when(F.col("n") > 100, 100.0).otherwise(F.col("n").cast("double"))
    pv = F.least(
        F.lit(1.0),
        F.exp(
            a0 * kd * kd * (nn + a1)
            + a2 * kd * F.sqrt(nn + F.lit(a1))
            + F.lit(a3)
            + a4 / F.sqrt(nn)
            + a5 / nn
        ),
    )
    return (
        m.crossJoin(F.broadcast(d))
        .select(
            "n",
            rnd(F.col("mu"), 2).alias("mean"),
            rnd(F.col("sd"), 2).alias("sd"),
            rnd(F.col("d"), 4).alias("d_stat"),
            rnd(pv, 6).alias("p_value"),
            F.when(pv < 0.05, 1).otherwise(0).cast("bigint").alias(
                "reject_normal"
            ),
        )
    )
