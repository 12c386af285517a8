"""Wave 234: chain-ladder development and uplift evaluation curves.

fin_chain_ladder treats order fulfillment as an actuarial
development triangle: origin = order month, development age = months
from order to ship, cumulative shipped value C[m, k]. Volume-
weighted age-to-age factors f_k = sum C[·, k+1] / sum C[·, k] over
fully-observed origins project each still-developing origin month to
its ULTIMATE — the standard IBNR answer ("how much more will ship
for May's orders?") that a naive completion percentage can't give
because it ignores the lag structure. ml_qini_auuc is the
evaluation layer uplift models get judged by: rank activity buckets
by their T-learner uplift score (extras112's shared synthetic
assignment), sweep the population, and plot Qini(t) = cumulative
treated response minus scaled control response against the random-
targeting diagonal; AUUC is the area between. On the shared
assignment the truth is NO effect, so the curve hugging the
diagonal is the honest pass — and the pytest plants a real effect
to see the curve bow.

Exactness: triangle cells sum in integer cents and factors are
ratios of those sums; Qini runs on integer counts/cent sums with
grid-rounded score ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.hashing import FP_MUL
from mister_spark.operators.common import cat, rnd
from mister_spark.operators.extras112 import (
    IPW_ACT_SPLIT,
    IPW_P_HIGH,
    IPW_P_LOW,
)
from mister_spark.registry import query

CL_ORIGINS = 8  # still-developing origin months reported
CL_MAX_AGE = 5  # development ages tracked (order->ship <= ~4 months)
QN_BUCKETS = 8


@query(
    "fin_chain_ladder",
    # Real oracle: triangle cells are integer-cent sums keyed by
    # integer origin/age months, factors are ratios of those sums
    # over the same observed set, and each ultimate is the product
    # of <= CL_MAX_AGE shared factors, on the rounding grid.
    oracle=f"""
    WITH cells AS (SELECT CAST(date_part('year', CAST(o.o_orderdate AS
                      DATE)) * 12 + date_part('month',
                      CAST(o.o_orderdate AS DATE)) AS BIGINT) AS m,
                      CAST(date_part('year', CAST(l.l_shipdate AS
                      DATE)) * 12 + date_part('month',
                      CAST(l.l_shipdate AS DATE)) AS BIGINT)
                      - CAST(date_part('year', CAST(o.o_orderdate AS
                      DATE)) * 12 + date_part('month',
                      CAST(o.o_orderdate AS DATE)) AS BIGINT) AS k,
                      CAST(SUM(CAST(FLOOR(l.l_extendedprice
                           * (1 - l.l_discount) * 100 + 0.5)
                           AS BIGINT)) AS BIGINT) AS cents
               FROM lineitem l JOIN orders o
                    ON l.l_orderkey = o.o_orderkey
               GROUP BY 1, 2),
    mx AS (SELECT MAX(m + k) AS obs FROM cells),
    cum AS (SELECT c.m, a.k,
                   CAST(SUM(CASE WHEN c.k <= a.k THEN c.cents ELSE 0
                        END) AS BIGINT) AS cc
            FROM cells c
            CROSS JOIN (SELECT unnest(generate_series(0,
                        {CL_MAX_AGE - 1})) AS k) a
            GROUP BY 1, 2),
    fk AS (SELECT a.k,
                  CAST(SUM(CASE WHEN cum.m + a.k + 1 <= mx.obs
                       THEN (SELECT cc FROM cum c2
                             WHERE c2.m = cum.m AND c2.k = a.k + 1)
                       ELSE 0 END) AS DOUBLE)
                  / SUM(CASE WHEN cum.m + a.k + 1 <= mx.obs
                        THEN cum.cc ELSE 0 END) AS f
           FROM (SELECT unnest(generate_series(0, {CL_MAX_AGE - 2}))
                   AS k) a
           JOIN cum ON cum.k = a.k, mx
           WHERE cum.m + a.k + 1 <= mx.obs
           GROUP BY a.k),
    latest AS (SELECT cum.m, mx.obs - cum.m AS age,
                      cum.cc AS shipped
               FROM cum, mx
               WHERE cum.k = LEAST(mx.obs - cum.m, {CL_MAX_AGE - 1})
                 AND mx.obs - cum.m < {CL_MAX_AGE - 1}
                 AND mx.obs - cum.m >= 0),
    proj AS (SELECT l.m, l.age, l.shipped,
                    l.shipped * COALESCE((
                      SELECT EXP(SUM(LN(fk.f))) FROM fk
                      WHERE fk.k >= l.age
                        AND fk.k <= {CL_MAX_AGE - 2}), 1.0) AS ult
             FROM latest l)
    SELECT strftime(make_date(CAST((m - 1) // 12 AS INT),
                    CAST((m - 1) % 12 + 1 AS INT), 1), '%Y-%m')
             AS origin_month,
           CAST(age AS BIGINT) AS dev_age_months,
           FLOOR(CAST(shipped AS DOUBLE) / 100 * 100 + 0.5) / 100
             AS shipped_to_date,
           FLOOR(ult / 100 * 100 + 0.5) / 100 AS ultimate,
           FLOOR(CASE WHEN ult <= 0 THEN 1.0
                      ELSE shipped / ult END * 1e4 + 0.5) / 1e4
             AS completion
    FROM proj
    ORDER BY m DESC LIMIT {CL_ORIGINS}
    """,
)
def fin_chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder projection of order fulfillment: cumulative
    shipped value by (origin month, development age), volume-
    weighted age-to-age factors from the fully-observed part of the
    triangle, and each still-developing origin's ULTIMATE = latest
    cumulative x product of remaining factors. completion < 1 reads
    directly as "this month's orders are still X% shipped" with the
    lag structure priced in — the IBNR estimate finance asks for at
    every close, from one fact-table pass.

    Scale: ONE fact aggregation to the origin x age triangle
    (calendar-bounded); factors and projections are closed-form
    algebra on that model-sized frame."""
    om = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("bigint")
    sm = (F.year("l_shipdate") * 12 + F.month("l_shipdate")).cast("bigint")
    cells = (
        cat(spark, sf_dir)["lineitem"]
        .join(
            cat(spark, sf_dir)["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            om.alias("m"), (sm - om).alias("k"),
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("m", "k")
        .agg(F.sum("cents").alias("cents"))
        .localCheckpoint()  # calendar-bounded triangle
    )
    mx = cells.agg(F.max(F.col("m") + F.col("k")).alias("obs"))
    ages = spark.range(0, CL_MAX_AGE).select(F.col("id").alias("ka"))
    cum = (
        cells.crossJoin(F.broadcast(ages))
        .groupBy("m", "ka")
        .agg(
            F.sum(
                F.when(F.col("k") <= F.col("ka"), F.col("cents")).otherwise(0)
            ).alias("cc")
        )
        .localCheckpoint()  # cumulative triangle
    )
    nxt = cum.select(
        F.col("m").alias("m2"), (F.col("ka") - 1).alias("ka2"),
        F.col("cc").alias("cc_next"),
    )
    fk = (
        cum.join(
            nxt, (F.col("m2") == F.col("m")) & (F.col("ka2") == F.col("ka"))
        )
        .crossJoin(F.broadcast(mx))
        .filter(
            (F.col("m") + F.col("ka") + 1 <= F.col("obs"))
            & (F.col("ka") <= CL_MAX_AGE - 2)
        )
        .groupBy("ka")
        .agg(
            (
                F.sum("cc_next").cast("double") / F.sum("cc")
            ).alias("f")
        )
        .localCheckpoint()  # <= CL_MAX_AGE-1 factors
    )
    latest = (
        cum.crossJoin(F.broadcast(mx))
        .filter(
            (F.col("ka") == F.least(F.col("obs") - F.col("m"), F.lit(CL_MAX_AGE - 1)))
            & (F.col("obs") - F.col("m") < CL_MAX_AGE - 1)
            & (F.col("obs") - F.col("m") >= 0)
        )
        .select(
            "m", (F.col("obs") - F.col("m")).alias("age"),
            F.col("cc").alias("shipped"),
        )
    )
    prod = (
        latest.join(
            F.broadcast(fk), F.col("ka") >= F.col("age"), "left"
        )
        .groupBy("m", "age", "shipped")
        .agg(
            F.coalesce(
                F.exp(F.sum(F.log(F.col("f")))), F.lit(1.0)
            ).alias("cdf")
        )
    )
    ym = F.format_string(
        "%04d-%02d", ((F.col("m") - 1) / 12).cast("int"),
        ((F.col("m") - 1) % 12 + 1).cast("int"),
    )
    return (
        prod.select(
            "m",
            ym.alias("origin_month"),
            F.col("age").cast("bigint").alias("dev_age_months"),
            rnd(F.col("shipped").cast("double") / 100, 2).alias(
                "shipped_to_date"
            ),
            rnd(F.col("shipped") * F.col("cdf") / 100, 2).alias("ultimate"),
            rnd(
                F.when(
                    F.col("shipped") * F.col("cdf") <= 0, F.lit(1.0)
                ).otherwise(
                    F.col("shipped")
                    / (F.col("shipped") * F.col("cdf"))
                ),
                4,
            ).alias("completion"),
        )
        .orderBy(F.col("m").desc())
        .limit(CL_ORIGINS)
        .drop("m")
    )


@query(
    "ml_qini_auuc",
    # Real oracle: the synthetic assignment is the shared integer
    # hash policy, bucket uplifts are exact cent-sum ratios, the
    # rank order is the rounded score with bucket tiebreak, and the
    # Qini points + trapezoid AUUC evaluate identical closed forms.
    oracle=f"""
    WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
                      SUM(CASE WHEN event_type = 'purchase'
                          THEN value ELSE 0 END) AS y
               FROM events GROUP BY 1),
    p AS (SELECT NTILE({QN_BUCKETS}) OVER (ORDER BY n_ev, user_id)
                   AS bucket, y,
                 CASE WHEN (user_id * {FP_MUL}) % 100 <
                      CASE WHEN n_ev < {IPW_ACT_SPLIT}
                           THEN {IPW_P_LOW} ELSE {IPW_P_HIGH} END
                      THEN 1 ELSE 0 END AS a
          FROM u),
    g AS (SELECT bucket,
                 CAST(SUM(a) AS DOUBLE) AS nt,
                 CAST(SUM(1 - a) AS DOUBLE) AS nc,
                 SUM(CASE WHEN a = 1 THEN y ELSE 0 END) AS yt,
                 SUM(CASE WHEN a = 0 THEN y ELSE 0 END) AS yc
          FROM p GROUP BY 1),
    sc AS (SELECT g.*, yt / nt - yc / nc AS score FROM g
           WHERE nt > 0 AND nc > 0),
    rk AS (SELECT sc.*, ROW_NUMBER() OVER (
             ORDER BY FLOOR(score * 1e4 + 0.5) DESC, bucket) AS r
           FROM sc),
    cumt AS (SELECT rk.*,
                    SUM(nt) OVER w AS ct, SUM(nc) OVER w AS cc,
                    SUM(yt) OVER w AS cyt, SUM(yc) OVER w AS cyc,
                    SUM(nt + nc) OVER w AS cn
             FROM rk
             WINDOW w AS (ORDER BY r ROWS UNBOUNDED PRECEDING)),
    tot AS (SELECT SUM(nt + nc) AS n FROM sc),
    q AS (SELECT cumt.r, cumt.bucket, cumt.score,
                 cumt.cn / tot.n AS frac,
                 cumt.cyt - cumt.cyc * cumt.ct / cumt.cc AS qini
          FROM cumt, tot),
    fin AS (SELECT qini AS q_end FROM q ORDER BY r DESC LIMIT 1),
    auuc AS (SELECT SUM((z.qini - z.q_end * z.frac)
                        * (z.frac - z.pfrac)) AS a
             FROM (SELECT q.r, q.frac, q.qini, fin.q_end,
                          COALESCE(LAG(q.frac) OVER (ORDER BY q.r), 0)
                            AS pfrac
                   FROM q, fin) z)
    SELECT q.r AS rank, CAST(q.bucket AS BIGINT) AS bucket,
           FLOOR(q.score * 1e4 + 0.5) / 1e4 AS uplift_score,
           FLOOR(q.frac * 1e4 + 0.5) / 1e4 AS cum_population_frac,
           FLOOR(q.qini * 100 + 0.5) / 100 AS qini,
           FLOOR((SELECT a FROM auuc) * 100 + 0.5) / 100 AS auuc
    FROM q
    """,
)
def ml_qini_auuc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini curve + AUUC for the activity-bucket uplift scores on the
    shared synthetic assignment: buckets ranked by T-learner uplift,
    Qini(t) = cumulative treated response minus control response
    scaled by the treated/control ratio, AUUC = area between the
    curve and the random-targeting diagonal. The assignment carries
    no real effect, so AUUC ~ 0 is the honest corpus read — and the
    op IS the standard way a real uplift model earns its targeting
    budget (ml_uplift_tlearner estimates; this evaluates).

    Scale: one user rollup, bucket-bounded frames everywhere after;
    windows run on <= {b} rows."""
    ev = cat(spark, sf_dir)["events"]
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                0.0
            )
        ).alias("y"),
    )
    a = (
        (F.col("user_id") * FP_MUL) % 100
        < F.when(F.col("n_ev") < IPW_ACT_SPLIT, IPW_P_LOW).otherwise(
            IPW_P_HIGH
        )
    ).cast("int")
    # activity octiles via NTILE with a full (n_ev, user_id) order —
    # the w_ntile precedent; the user-rollup frame is the documented
    # carry (two-phase global_rank at extreme user counts)
    p = u.select(
        F.ntile(QN_BUCKETS)
        .over(W.orderBy("n_ev", "user_id"))
        .alias("bucket"),
        "y", a.alias("a"),
    )
    g = p.groupBy("bucket").agg(
        F.sum("a").cast("double").alias("nt"),
        F.sum(1 - F.col("a")).cast("double").alias("nc"),
        F.sum(F.when(F.col("a") == 1, F.col("y")).otherwise(0.0)).alias("yt"),
        F.sum(F.when(F.col("a") == 0, F.col("y")).otherwise(0.0)).alias("yc"),
    )
    sc = g.filter((F.col("nt") > 0) & (F.col("nc") > 0)).select(
        "*",
        (F.col("yt") / F.col("nt") - F.col("yc") / F.col("nc")).alias(
            "score"
        ),
    ).localCheckpoint()  # bucket-bounded
    rk = sc.select(
        "*",
        F.row_number()
        .over(W.orderBy(F.floor(F.col("score") * 1e4 + 0.5).desc(), "bucket"))
        .alias("r"),
    )
    wspec = W.orderBy("r").rowsBetween(W.unboundedPreceding, 0)
    cumt = rk.select(
        "r", "bucket", "score",
        F.sum("nt").over(wspec).alias("ct"),
        F.sum("nc").over(wspec).alias("cc"),
        F.sum("yt").over(wspec).alias("cyt"),
        F.sum("yc").over(wspec).alias("cyc"),
        F.sum(F.col("nt") + F.col("nc")).over(wspec).alias("cn"),
    )
    tot = sc.agg(F.sum(F.col("nt") + F.col("nc")).alias("n"))
    q = cumt.crossJoin(F.broadcast(tot)).select(
        "r", "bucket", "score",
        (F.col("cn") / F.col("n")).alias("frac"),
        (
            F.col("cyt") - F.col("cyc") * F.col("ct") / F.col("cc")
        ).alias("qini"),
    ).localCheckpoint()
    fin = q.orderBy(F.col("r").desc()).limit(1).select(
        F.col("qini").alias("q_end")
    )
    auuc = (
        q.crossJoin(F.broadcast(fin))
        .select(
            "r", "frac", "qini", "q_end",
            F.coalesce(F.lag("frac").over(W.orderBy("r")), F.lit(0.0)).alias(
                "pfrac"
            ),
        )
        .agg(
            F.sum(
                (F.col("qini") - F.col("q_end") * F.col("frac"))
                * (F.col("frac") - F.col("pfrac"))
            ).alias("a")
        )
    )
    return q.crossJoin(F.broadcast(auuc)).select(
        F.col("r").alias("rank"),
        F.col("bucket").cast("bigint").alias("bucket"),
        rnd(F.col("score"), 4).alias("uplift_score"),
        rnd(F.col("frac"), 4).alias("cum_population_frac"),
        rnd(F.col("qini"), 2).alias("qini"),
        rnd(F.col("a"), 2).alias("auuc"),
    )


ml_qini_auuc.__doc__ = ml_qini_auuc.__doc__.format(b=QN_BUCKETS)
