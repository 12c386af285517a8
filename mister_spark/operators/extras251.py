"""Wave 251: survival inference and option pricing on the order book.

stat_log_rank runs the two-group log-rank test on customer REBUY time
(days from first to second order, administrative censoring at {c}
days, BUILDING segment vs the rest): at every distinct event day it
compares the segment's observed rebuys to the hypergeometric
expectation given the at-risk pool, and sums O−E and its variance into
the chi-square that says whether the segment rebuys on a different
CLOCK, not just a different mean — the standard A/B test for
time-to-event outcomes, where a t-test on gaps is wrong under
censoring (one-order customers are information, not missing data).
stat_nelson_aalen emits the cumulative-hazard curve
H(t) = Σ d(s)/n(s) per market segment on the same rebuy clock — the
model-free hazard accumulation whose slope IS the instantaneous rebuy
rate (flat stretches = dormancy), the additive twin of Kaplan-Meier's
multiplicative survival. fin_black_scholes prices a call/put strike
grid per market segment from the segment's own realized revenue
volatility (annualized log-return sigma) — Black-Scholes with the
shared Abramowitz-Stegun normal CDF, the what-would-a-hedge-cost view
of segment revenue risk that fin_expected_shortfall reports
historically.

Exactness: rebuy-gap days and daily revenue cents are integers, so
every death count, at-risk pool, and log-return operand is exact; the
survival sums are integer-ratio accumulations over day-bounded frames;
Black-Scholes shares the normal_sf polynomial both engines evaluate on
identical doubles; outputs round on the 1e-4 grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

LR_CENSOR_DAYS = 365  # administrative censoring horizon (days)
BS_S0 = 100.0  # normalized spot
BS_RATE = 0.02  # risk-free rate
BS_T = 0.5  # half-year expiry
BS_STRIKES = (80, 90, 100, 110, 120)
BS_PERIODS = 12  # monthly returns, annualized by sqrt(12)

# Shared rebuy CTE: per customer, days from first to second order
# (no second order, or a gap past the horizon, = censored at
# LR_CENSOR_DAYS), segment attached for grouping.
_DUCK_REBUY = f"""
    ranked AS (SELECT o_custkey, o_orderdate,
                      ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS rn
               FROM orders),
    gap AS (SELECT f.o_custkey AS custkey,
                   date_diff('day', f.o_orderdate, s.o_orderdate) AS days
            FROM (SELECT * FROM ranked WHERE rn = 1) f
            LEFT JOIN (SELECT * FROM ranked WHERE rn = 2) s
              ON s.o_custkey = f.o_custkey),
    surv0 AS (SELECT g.custkey, c.c_mktsegment AS seg,
                     CASE WHEN g.days IS NOT NULL
                               AND g.days <= {LR_CENSOR_DAYS}
                          THEN g.days ELSE {LR_CENSOR_DAYS} END AS t,
                     CASE WHEN g.days IS NOT NULL
                               AND g.days <= {LR_CENSOR_DAYS}
                          THEN 1 ELSE 0 END AS evt
              FROM gap g JOIN customer c ON c.c_custkey = g.custkey),
    surv AS (SELECT CASE WHEN seg = 'BUILDING' THEN 'building'
                         ELSE 'other' END AS grp, t, evt
             FROM surv0)
"""


def _rebuy_surv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer rebuy survival frame (seg, t, evt): days from the
    first to the second order, administratively censored at
    LR_CENSOR_DAYS (no second order, or a longer gap, = censored).
    One window over orders partitioned BY CUSTOMER (parallel), one
    customer join."""
    c = cat(spark, sf_dir)
    w_rn = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = (
        c["orders"]
        .select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumn("rn", F.row_number().over(w_rn))
    )
    first = ranked.filter(F.col("rn") == 1).select(
        F.col("o_custkey").alias("custkey"), F.col("o_orderdate").alias("d1")
    )
    second = ranked.filter(F.col("rn") == 2).select(
        F.col("o_custkey").alias("custkey"), F.col("o_orderdate").alias("d2")
    )
    gap = first.join(second, "custkey", "left").select(
        "custkey", F.datediff("d2", "d1").alias("days")
    )
    ok = F.col("days").isNotNull() & (F.col("days") <= LR_CENSOR_DAYS)
    return gap.join(
        c["customer"].select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("seg"),
        ),
        "custkey",
    ).select(
        "seg",
        F.when(ok, F.col("days")).otherwise(F.lit(LR_CENSOR_DAYS)).alias("t"),
        F.when(ok, 1).otherwise(0).alias("evt"),
    )



@query(
    "stat_log_rank",
    # Real oracle: identical integer survival table — per-day death
    # counts, cumulative at-risk pools (censoring only at the fixed
    # horizon, so n(t) = N - cum deaths before t for t <= horizon),
    # hypergeometric E and V sums, one chi-square.
    oracle=f"""
    WITH {_DUCK_REBUY},
    tot AS (SELECT
              CAST(SUM(CASE WHEN grp = 'building' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n1,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM surv),
    d AS (SELECT t,
                 CAST(SUM(CASE WHEN grp = 'building' AND evt = 1
                          THEN 1 ELSE 0 END) AS BIGINT) AS d1,
                 CAST(SUM(evt) AS BIGINT) AS dt
          FROM surv GROUP BY 1),
    r AS (SELECT t, d1, dt,
                 tot.n1 - COALESCE(SUM(d1) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS r1,
                 tot.n - COALESCE(SUM(dt) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS rt
          FROM d CROSS JOIN tot WHERE dt > 0),
    s AS (SELECT CAST(SUM(d1) AS DOUBLE) AS o1,
                 SUM(CAST(dt AS DOUBLE) * r1 / rt) AS e1,
                 SUM(CASE WHEN rt > 1 THEN
                     CAST(dt AS DOUBLE) * (CAST(r1 AS DOUBLE) / rt)
                     * (1.0 - CAST(r1 AS DOUBLE) / rt)
                     * (rt - dt) / (rt - 1) ELSE 0.0 END) AS v,
                 CAST(SUM(dt) AS DOUBLE) AS ot
          FROM r)
    SELECT g.grp,
           CAST(CASE WHEN g.grp = 'building' THEN s.o1
                ELSE s.ot - s.o1 END AS BIGINT) AS observed,
           FLOOR((CASE WHEN g.grp = 'building' THEN s.e1
                  ELSE s.ot - s.e1 END) * 10000 + 0.5) / 10000 AS expected,
           FLOOR(CASE WHEN s.v > 0
                 THEN (s.o1 - s.e1) * (s.o1 - s.e1) / s.v
                 ELSE 0.0 END * 10000 + 0.5) / 10000 AS chi2,
           CAST(CASE WHEN g.grp = 'building' THEN tot.n1
                ELSE tot.n - tot.n1 END AS BIGINT) AS n_customers
    FROM (SELECT 'building' AS grp UNION ALL SELECT 'other') g
    CROSS JOIN s CROSS JOIN tot
    ORDER BY grp
    """,
)
def stat_log_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank test on customer rebuy time (days from first
    to second order; BUILDING segment vs the rest; administrative
    censoring at {c} days — one-order customers are censored, not
    dropped): at each event day, the segment's observed rebuys vs the
    hypergeometric expectation d·n1/n given the at-risk pools, summed
    into chi² = (O−E)²/V — the censoring-correct answer to 'does this
    segment rebuy on a different clock?'. Both groups' rows carry the
    shared chi².

    Scale: one per-customer window + customer join builds the survival
    frame (data-sized, fully parallel), then everything runs on the
    ≤ {c}+1-row day table — the cumulative at-risk windows ride that
    bounded frame, never the base data."""
    lat = (
        _rebuy_surv(spark, sf_dir)
        .select(
            F.when(F.col("seg") == "BUILDING", "building")
            .otherwise("other")
            .alias("grp"),
            "t",
            "evt",
        )
        .localCheckpoint()  # feeds totals and the day table
    )
    tot = lat.agg(
        F.sum(F.when(F.col("grp") == "building", 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    d = (
        lat.groupBy("t")
        .agg(
            F.sum(
                F.when((F.col("grp") == "building") & (F.col("evt") == 1), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("d1"),
            F.sum("evt").cast("bigint").alias("dt"),
        )
        .filter(F.col("dt") > 0)
    )
    w = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    r = (
        d.crossJoin(F.broadcast(tot))
        .withColumn(
            "r1", F.col("n1") - F.coalesce(F.sum("d1").over(w), F.lit(0))
        )
        .withColumn(
            "rt", F.col("n") - F.coalesce(F.sum("dt").over(w), F.lit(0))
        )
    )
    s = r.agg(
        F.sum("d1").cast("double").alias("o1"),
        F.sum(F.col("dt").cast("double") * F.col("r1") / F.col("rt")).alias(
            "e1"
        ),
        F.sum(
            F.when(
                F.col("rt") > 1,
                F.col("dt").cast("double")
                * (F.col("r1").cast("double") / F.col("rt"))
                * (1.0 - F.col("r1").cast("double") / F.col("rt"))
                * (F.col("rt") - F.col("dt"))
                / (F.col("rt") - 1),
            ).otherwise(0.0)
        ).alias("v"),
        F.sum("dt").cast("double").alias("ot"),
    )
    groups = spark.createDataFrame(
        [("building",), ("other",)], "grp string"
    )
    return (
        groups.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(tot))
        .select(
            "grp",
            F.when(F.col("grp") == "building", F.col("o1"))
            .otherwise(F.col("ot") - F.col("o1"))
            .cast("bigint")
            .alias("observed"),
            ratio(
                F.when(F.col("grp") == "building", F.col("e1")).otherwise(
                    F.col("ot") - F.col("e1")
                )
            ).alias("expected"),
            ratio(
                F.when(
                    F.col("v") > 0,
                    (F.col("o1") - F.col("e1"))
                    * (F.col("o1") - F.col("e1"))
                    / F.col("v"),
                ).otherwise(0.0)
            ).alias("chi2"),
            F.when(F.col("grp") == "building", F.col("n1"))
            .otherwise(F.col("n") - F.col("n1"))
            .cast("bigint")
            .alias("n_customers"),
        )
        .orderBy("grp")
    )


stat_log_rank.__doc__ = stat_log_rank.__doc__.format(c=LR_CENSOR_DAYS)


@query(
    "stat_nelson_aalen",
    # Real oracle: the identical per-segment event-day table on the
    # rebuy clock — censoring only at the fixed horizon, so at-risk =
    # N minus rebuys before t for every t <= horizon; the hazard
    # increments d/n accumulate in one ordered window per segment.
    oracle=f"""
    WITH {_DUCK_REBUY},
    tot AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n
            FROM surv0 GROUP BY 1),
    d AS (SELECT seg, t, CAST(SUM(evt) AS BIGINT) AS dt
          FROM surv0 GROUP BY 1, 2),
    r AS (SELECT d.seg, d.t, d.dt,
                 tot.n - COALESCE(SUM(d.dt) OVER (PARTITION BY d.seg
                   ORDER BY d.t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
          FROM d JOIN tot ON tot.seg = d.seg),
    h AS (SELECT seg, t, dt, n_risk,
                 SUM(CAST(dt AS DOUBLE) / n_risk) OVER (PARTITION BY seg
                   ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS ch
          FROM r WHERE dt > 0)
    SELECT seg, CAST(t AS BIGINT) AS day, dt AS events,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           FLOOR(CAST(dt AS DOUBLE) / n_risk * 1000000 + 0.5) / 1000000
             AS hazard,
           FLOOR(ch * 1000000 + 0.5) / 1000000 AS cum_hazard
    FROM h ORDER BY seg, day
    """,
)
def stat_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard of customer rebuy time per
    market segment (first→second order gap, censoring at {c} days):
    H(t) = Σ_(s≤t) d(s)/n(s), the model-free hazard accumulation — its
    local slope is the instantaneous rebuy rate (a flat stretch =
    dormancy), and segment curves separate exactly where
    stat_log_rank's chi² says they should. The additive counterpart of
    Kaplan–Meier, preferred when hazards (not survival fractions) are
    the decision quantity.

    Scale: one per-customer window + customer join (data-sized, fully
    parallel); the at-risk and cumulative-hazard windows ride the
    per-segment EVENT-DAY table (≤ {c}+1 rows per segment), never the
    base data."""
    surv = _rebuy_surv(spark, sf_dir).localCheckpoint()
    tot = surv.groupBy("seg").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    d = surv.groupBy("seg", "t").agg(F.sum("evt").cast("bigint").alias("dt"))
    w_prev = (
        W.partitionBy("seg").orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    )
    w_cur = (
        W.partitionBy("seg").orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    )
    r = d.join(F.broadcast(tot), "seg").withColumn(
        "n_risk", F.col("n") - F.coalesce(F.sum("dt").over(w_prev), F.lit(0))
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return (
        r.filter(F.col("dt") > 0)
        .withColumn(
            "ch",
            F.sum(F.col("dt").cast("double") / F.col("n_risk")).over(w_cur),
        )
        .select(
            "seg",
            F.col("t").cast("bigint").alias("day"),
            F.col("dt").alias("events"),
            F.col("n_risk").cast("bigint").alias("n_at_risk"),
            r6(F.col("dt").cast("double") / F.col("n_risk")).alias("hazard"),
            r6(F.col("ch")).alias("cum_hazard"),
        )
        .orderBy("seg", "day")
    )


stat_nelson_aalen.__doc__ = stat_nelson_aalen.__doc__.format(
    c=LR_CENSOR_DAYS
)


def _bs_phi_sql(d: str) -> str:
    # Φ(d) from the shared one-sided survival polynomial (z >= 0 only)
    return (
        f"CASE WHEN ({d}) >= 0 THEN 1.0 - {normal_sf_sql(f'({d})')} "
        f"ELSE {normal_sf_sql(f'(-({d}))')} END"
    )


def _bs_oracle() -> str:
    sig = "sqrt(CAST({td} AS DOUBLE)) * sqrt((srr - sr * sr / n) / (n - 1))".format(
        td=BS_PERIODS
    )
    d1 = (
        f"(LN({BS_S0!r} / k) + ({BS_RATE!r} + sig * sig / 2) * {BS_T!r})"
        f" / (sig * SQRT({BS_T!r}))"
    )
    return f"""
    WITH rev AS (SELECT c.c_mktsegment AS seg,
                        date_trunc('month', o.o_orderdate) AS d,
                        CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS cents
                 FROM orders o JOIN customer c
                   ON c.c_custkey = o.o_custkey
                 GROUP BY 1, 2),
    ret AS (SELECT seg,
                   LN(CAST(cents AS DOUBLE)
                      / LAG(cents) OVER (PARTITION BY seg ORDER BY d))
                     AS r
            FROM rev),
    mom AS (SELECT seg, CAST(COUNT(r) AS DOUBLE) AS n,
                   SUM(r) AS sr, SUM(r * r) AS srr
            FROM ret WHERE r IS NOT NULL GROUP BY 1),
    vol AS (SELECT seg, {sig} AS sig FROM mom),
    px AS (SELECT v.seg, k.k, v.sig,
                  {d1} AS d1,
                  {d1} - v.sig * SQRT({BS_T!r}) AS d2
           FROM vol v CROSS JOIN (SELECT unnest(ARRAY{list(BS_STRIKES)})
                                    AS k) k),
    priced AS (SELECT seg, k, sig,
                      {BS_S0!r} * ({_bs_phi_sql("d1")})
                      - k * EXP(-{BS_RATE!r} * {BS_T!r})
                        * ({_bs_phi_sql("d2")}) AS call
               FROM px)
    SELECT seg, CAST(k AS BIGINT) AS strike,
           FLOOR(sig * 10000 + 0.5) / 10000 AS sigma_ann,
           FLOOR(call * 10000 + 0.5) / 10000 AS call_price,
           FLOOR((call - {BS_S0!r} + k * EXP(-{BS_RATE!r} * {BS_T!r}))
                 * 10000 + 0.5) / 10000 AS put_price
    FROM priced ORDER BY seg, strike
    """


@query("fin_black_scholes", oracle=_bs_oracle())
def fin_black_scholes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Black–Scholes call/put strike grid per market segment, priced
    off the segment's own realized revenue volatility: monthly revenue
    (exact cents) → month-over-month log returns → annualized sigma →
    C = S·Φ(d1) − K·e^(−rT)·Φ(d2) on a {s}-spot normalized grid, puts
    by parity. The what-would-a-hedge-cost view of segment revenue
    risk: fin_expected_shortfall reports the historical tail,
    this prices insuring against it under the lognormal model.

    Scale: one fact join + (segment, day) rollup (map-combinable
    integer cents); returns/moments ride the calendar-bounded panel;
    the strike grid is a 5-row literal cross join. Φ is the shared
    Abramowitz–Stegun polynomial (functions/special.py) both engines
    evaluate on identical doubles."""
    c = cat(spark, sf_dir)
    rev = (
        c["orders"]
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .join(
            c["customer"].select(
                "c_custkey", F.col("c_mktsegment").alias("seg")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy("seg", F.trunc("o_orderdate", "month").alias("d"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    w_lag = W.partitionBy("seg").orderBy("d")
    ret = rev.select(
        "seg",
        F.log(
            F.col("cents").cast("double")
            / F.lag("cents").over(w_lag).cast("double")
        ).alias("r"),
    ).filter(F.col("r").isNotNull())
    mom = ret.groupBy("seg").agg(
        F.count("r").cast("double").alias("n"),
        F.sum("r").alias("sr"),
        F.sum(F.col("r") * F.col("r")).alias("srr"),
    )
    sig = F.sqrt(F.lit(float(BS_PERIODS))) * F.sqrt(
        (F.col("srr") - F.col("sr") * F.col("sr") / F.col("n"))
        / (F.col("n") - 1)
    )
    vol = mom.select("seg", sig.alias("sig"))
    strikes = spark.createDataFrame(
        [(float(k),) for k in BS_STRIKES], "k double"
    )
    px = vol.crossJoin(F.broadcast(strikes))
    d1 = (
        F.log(F.lit(BS_S0) / F.col("k"))
        + (F.lit(BS_RATE) + F.col("sig") * F.col("sig") / 2) * F.lit(BS_T)
    ) / (F.col("sig") * F.sqrt(F.lit(BS_T)))
    px = px.withColumn("d1", d1).withColumn(
        "d2", F.col("d1") - F.col("sig") * F.sqrt(F.lit(BS_T))
    )

    def phi(col):
        return F.when(col >= 0, 1.0 - normal_sf(col)).otherwise(
            normal_sf(-col)
        )

    call = F.lit(BS_S0) * phi(F.col("d1")) - F.col("k") * F.exp(
        F.lit(-BS_RATE * BS_T)
    ) * phi(F.col("d2"))
    return (
        px.withColumn("call", call)
        .select(
            "seg",
            F.col("k").cast("bigint").alias("strike"),
            ratio(F.col("sig")).alias("sigma_ann"),
            ratio(F.col("call")).alias("call_price"),
            ratio(
                F.col("call")
                - F.lit(BS_S0)
                + F.col("k") * F.exp(F.lit(-BS_RATE * BS_T))
            ).alias("put_price"),
        )
        .orderBy("seg", "strike")
    )


fin_black_scholes.__doc__ = fin_black_scholes.__doc__.format(s=int(BS_S0))
