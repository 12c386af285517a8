"""Wave 155: staffing schedules and order-statistic median CIs.

ev_staffing_schedule turns the hourly arrival profile into the
minimal per-hour staffing that meets a wait-probability target
(Erlang-C inverted over a server grid) — the roster a workforce
planner actually ships, derived end-to-end from event data;
stat_median_ci wraps the median in its distribution-free
order-statistic confidence interval (binomial ranks — no normality,
no bootstrap), the right uncertainty for P50 reporting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.functions.special import ln_fact, ln_fact_sql
from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

ST_SERVICE_PER_HOUR = 30.0
ST_WAIT_TARGET = 0.2
ST_MAX_C = 8
MCI_Z = 1.959964


def _erlang_sum_sql() -> str:
    terms = []
    for k in range(ST_MAX_C):
        terms.append(
            f"CASE WHEN {k} < g.c THEN"
            f" EXP({k} * LN(g.a) - {ln_fact_sql(str(k))}) ELSE 0 END"
        )
    return " + ".join(terms)


@query(
    "ev_staffing_schedule",
    oracle=f"""
    WITH h AS (SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
                      CAST(COUNT(*) AS DOUBLE) AS n
               FROM events GROUP BY 1),
    days AS (SELECT CAST(COUNT(DISTINCT CAST(date_trunc('day', ts) AS DATE))
                         AS DOUBLE) AS d
             FROM events),
    g AS (SELECT h.hr, h.n / days.d AS lam,
                 h.n / days.d / {ST_SERVICE_PER_HOUR} AS a
          FROM h, days),
    grid AS (SELECT g.hr, g.lam, g.a, v.c,
                    g.a / v.c AS rho
             FROM g, (SELECT UNNEST(generate_series(1, {ST_MAX_C})) AS c) v),
    ec AS (SELECT g.hr, g.lam, g.c, g.rho,
                  CASE WHEN g.rho >= 1 THEN 1.0
                       ELSE (EXP(g.c * LN(g.a) - {ln_fact_sql("c")}) / (1 - g.rho))
                            / (({_erlang_sum_sql()})
                               + EXP(g.c * LN(g.a) - {ln_fact_sql("c")})
                                 / (1 - g.rho)) END AS p_wait
           FROM grid g),
    ok AS (SELECT hr, lam, MIN(c) AS c_min FROM ec
           WHERE p_wait <= {ST_WAIT_TARGET} GROUP BY 1, 2)
    SELECT h.hr AS hour,
           FLOOR(g.lam * 10000 + 0.5) / 10000 AS arrivals_per_hour,
           CAST(COALESCE(ok.c_min, {ST_MAX_C + 1}) AS BIGINT)
             AS servers_needed
    FROM h JOIN g ON h.hr = g.hr LEFT JOIN ok ON h.hr = ok.hr
    """,
)
def ev_staffing_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly staffing schedule: per hour-of-day arrival rate →
    smallest server count whose Erlang-C wait probability meets the
    {t:.0%} target (capped grid; {cmax}+1 flags 'target unreachable
    at the cap'). The end-to-end chain measurement→queueing→roster,
    with the engine-shared ln-factorial keeping both engines
    bit-identical.

    Scale: a 24-row hourly profile × an {cmax}-point server grid —
    everything after the one rollup is tiny-frame closed-form."""
    ev = cat(spark, sf_dir)["events"]
    h = ev.groupBy(F.hour("ts").cast("bigint").alias("hr")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    days = ev.agg(
        F.countDistinct(F.date_trunc("day", "ts").cast("date"))
        .cast("double")
        .alias("d")
    )
    g = h.crossJoin(F.broadcast(days)).select(
        "hr",
        (F.col("n") / F.col("d")).alias("lam"),
        (F.col("n") / F.col("d") / ST_SERVICE_PER_HOUR).alias("a"),
    ).localCheckpoint()
    cs = spark.range(1, ST_MAX_C + 1).select(F.col("id").alias("c"))
    grid = g.crossJoin(F.broadcast(cs)).withColumn(
        "rho", F.col("a") / F.col("c")
    )
    top = F.exp(F.col("c") * F.log("a") - ln_fact(F.col("c")))
    ssum = None
    for k in range(ST_MAX_C):
        term = F.when(
            F.lit(k) < F.col("c"),
            F.exp(F.lit(k) * F.log("a") - ln_fact(F.lit(k))),
        ).otherwise(0.0)
        ssum = term if ssum is None else ssum + term
    p_wait = F.when(F.col("rho") >= 1, 1.0).otherwise(
        (top / (1 - F.col("rho"))) / (ssum + top / (1 - F.col("rho")))
    )
    ok = (
        grid.withColumn("p_wait", p_wait)
        .filter(F.col("p_wait") <= ST_WAIT_TARGET)
        .groupBy("hr")
        .agg(F.min("c").alias("c_min"))
    )
    return (
        g.join(ok, "hr", "left")
        .select(
            F.col("hr").alias("hour"),
            ratio(F.col("lam")).alias("arrivals_per_hour"),
            F.coalesce("c_min", F.lit(ST_MAX_C + 1))
            .cast("bigint")
            .alias("servers_needed"),
        )
    )


ev_staffing_schedule.__doc__ = ev_staffing_schedule.__doc__.format(
    t=ST_WAIT_TARGET, cmax=ST_MAX_C
)


@query(
    "stat_median_ci",
    oracle=f"""
    WITH x AS (SELECT o_totalprice AS v FROM orders),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM x),
    g AS (SELECT v, CAST(COUNT(*) AS DOUBLE) AS c FROM x GROUP BY 1),
    e AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM g),
    rk AS (SELECT FLOOR(n.n / 2 - {MCI_Z} * SQRT(n.n) / 2) AS lo_rank,
                  CEIL(n.n / 2 + 1 + {MCI_Z} * SQRT(n.n) / 2) AS hi_rank,
                  n.n
           FROM n),
    med AS (SELECT MIN(v) AS m FROM e, n WHERE cum >= CEIL(0.5 * n.n)),
    lo AS (SELECT MIN(v) AS v FROM e, rk WHERE cum >= rk.lo_rank),
    hi AS (SELECT MIN(v) AS v FROM e, rk WHERE cum >= rk.hi_rank)
    SELECT FLOOR(med.m * 100 + 0.5) / 100 AS median,
           FLOOR(lo.v * 100 + 0.5) / 100 AS ci_lo,
           FLOOR(hi.v * 100 + 0.5) / 100 AS ci_hi
    FROM med, lo, hi
    """,
)
def stat_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free CI for the median of order values: the
    order statistics at ranks n/2 ± z·√n/2 bracket the true median at
    ~95% by the binomial argument — no normality, no bootstrap, and
    EXACT order statistics from the two-phase prefix frame (no
    sketch). The uncertainty bar every P50 dashboard should carry.

    Scale: one |distinct values| collapse + `bucketed_cumsum`; the
    three rank probes are broadcast filters."""
    x = cat(spark, sf_dir)["orders"].select(F.col("o_totalprice").alias("v"))
    n = x.agg(F.count(F.lit(1)).cast("double").alias("n"))
    g = x.groupBy("v").agg(F.count(F.lit(1)).cast("double").alias("c"))
    e = bucketed_cumsum(g, "v", {"cum": F.col("c")})
    j = e.crossJoin(F.broadcast(n))
    med = j.filter(F.col("cum") >= F.ceil(0.5 * F.col("n"))).agg(
        F.min("v").alias("m")
    )
    lo = j.filter(
        F.col("cum")
        >= F.floor(F.col("n") / 2 - MCI_Z * F.sqrt(F.col("n")) / 2)
    ).agg(F.min("v").alias("lo"))
    hi = j.filter(
        F.col("cum")
        >= F.ceil(F.col("n") / 2 + 1 + MCI_Z * F.sqrt(F.col("n")) / 2)
    ).agg(F.min("v").alias("hi"))
    return (
        med.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            money(F.col("m")).alias("median"),
            money(F.col("lo")).alias("ci_lo"),
            money(F.col("hi")).alias("ci_hi"),
        )
    )
