"""Wave 161: winsorized/trimmed means and least-squares changepoint.

stat_winsorized_mean clamps the tails at exact order-statistic
fences before averaging — the robust mean that keeps every row but
caps outlier leverage (and its harsher cousin, the trimmed mean);
ev_changepoint_binseg finds the single best least-squares split of
the daily revenue series — the first step of binary segmentation,
locating WHERE the level shifted and how much variance the split
explains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

WINS_P = 0.05


@query(
    "stat_winsorized_mean",
    oracle=f"""
    WITH x AS (SELECT o_totalprice AS v FROM orders),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM x),
    g AS (SELECT v, CAST(COUNT(*) AS DOUBLE) AS c FROM x GROUP BY 1),
    e AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM g),
    lo AS (SELECT MIN(v) AS lo FROM e, n
           WHERE cum >= CEIL({WINS_P} * n.n)),
    hi AS (SELECT MIN(v) AS hi FROM e, n
           WHERE cum >= CEIL({1 - WINS_P} * n.n)),
    w AS (SELECT AVG(GREATEST(lo.lo, LEAST(hi.hi, x.v))) AS wmean,
                 AVG(CASE WHEN x.v >= lo.lo AND x.v <= hi.hi
                          THEN x.v END) AS tmean,
                 AVG(x.v) AS rmean
         FROM x, lo, hi)
    SELECT FLOOR(rmean * 100 + 0.5) / 100 AS raw_mean,
           FLOOR(wmean * 100 + 0.5) / 100 AS winsorized_mean,
           FLOOR(tmean * 100 + 0.5) / 100 AS trimmed_mean,
           (SELECT FLOOR(lo * 100 + 0.5) / 100 FROM lo) AS fence_lo,
           (SELECT FLOOR(hi * 100 + 0.5) / 100 FROM hi) AS fence_hi
    FROM w
    """,
)
def stat_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized and trimmed means of order value at the exact
    {p:.0%}/{q:.0%} order-statistic fences (two-phase prefix
    counts — not an approximate percentile sketch): winsorizing
    CLAMPS the tails to the fences, trimming DROPS them. The spread
    between raw, winsorized, and trimmed is a one-row readout of how
    much the tails move the headline average.

    Scale: one |distinct values| collapse + `bucketed_cumsum`; the
    fence probes broadcast back over the data for one clamp pass."""
    x = cat(spark, sf_dir)["orders"].select(F.col("o_totalprice").alias("v"))
    n = x.agg(F.count(F.lit(1)).cast("double").alias("n"))
    g = x.groupBy("v").agg(F.count(F.lit(1)).cast("double").alias("c"))
    e = bucketed_cumsum(g, "v", {"cum": F.col("c")}).crossJoin(
        F.broadcast(n)
    )
    lo = e.filter(
        F.col("cum") >= F.ceil(WINS_P * F.col("n"))
    ).agg(F.min("v").alias("lo"))
    hi = e.filter(
        F.col("cum") >= F.ceil((1 - WINS_P) * F.col("n"))
    ).agg(F.min("v").alias("hi"))
    w = (
        x.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .agg(
            F.avg(
                F.greatest("lo", F.least("hi", F.col("v")))
            ).alias("wmean"),
            F.avg(
                F.when(
                    (F.col("v") >= F.col("lo"))
                    & (F.col("v") <= F.col("hi")),
                    F.col("v"),
                )
            ).alias("tmean"),
            F.avg("v").alias("rmean"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
        )
    )
    return w.select(
        money(F.col("rmean")).alias("raw_mean"),
        money(F.col("wmean")).alias("winsorized_mean"),
        money(F.col("tmean")).alias("trimmed_mean"),
        money(F.col("lo")).alias("fence_lo"),
        money(F.col("hi")).alias("fence_hi"),
    )


stat_winsorized_mean.__doc__ = stat_winsorized_mean.__doc__.format(
    p=WINS_P, q=1 - WINS_P
)


@query(
    "ev_changepoint_binseg",
    oracle="""
    WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                      SUM(CASE WHEN event_type = 'purchase'
                               THEN value ELSE 0 END) AS rev
               FROM events GROUP BY 1),
    p AS (SELECT day, rev,
                 CAST(ROW_NUMBER() OVER (ORDER BY day) AS DOUBLE) AS i,
                 SUM(rev) OVER (ORDER BY day) AS s1,
                 SUM(rev * rev) OVER (ORDER BY day) AS s2
          FROM d),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(rev) AS t1,
                   SUM(rev * rev) AS t2
            FROM d),
    sse AS (SELECT p.day, p.i,
                   (p.s2 - p.s1 * p.s1 / p.i)
                   + ((tot.t2 - p.s2)
                      - (tot.t1 - p.s1) * (tot.t1 - p.s1)
                        / (tot.n - p.i)) AS split_sse,
                   p.s1 / p.i AS left_mean,
                   (tot.t1 - p.s1) / (tot.n - p.i) AS right_mean,
                   tot.t2 - tot.t1 * tot.t1 / tot.n AS null_sse
            FROM p, tot WHERE p.i < tot.n),
    best AS (SELECT * FROM sse
             ORDER BY FLOOR(split_sse * 100 + 0.5) / 100, day LIMIT 1)
    SELECT strftime(day, '%Y-%m-%d') AS split_day,
           FLOOR(left_mean * 100 + 0.5) / 100 AS left_mean,
           FLOOR(right_mean * 100 + 0.5) / 100 AS right_mean,
           FLOOR((1 - split_sse / null_sse) * 10000 + 0.5) / 10000
             AS var_explained
    FROM best
    """,
)
def ev_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single least-squares changepoint on daily revenue (the first
    binary-segmentation step): prefix sums give every candidate
    split's two-segment SSE in closed form, so the argmin needs ONE
    pass over the day series — no per-candidate re-scan. Reports the
    split day, segment means, and the variance the split explains
    (near zero here = no real level shift, which is itself the
    answer).

    Scale: the series is |days| rows after the rollup; prefix sums
    ride the calendar-bounded day frame and the argmin is a top-1."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase", F.col("value")
            ).otherwise(0.0)
        ).alias("rev")
    )
    wd = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    p = d.select(
        "day",
        "rev",
        F.row_number().over(W.orderBy("day")).cast("double").alias("i"),
        F.sum("rev").over(wd).alias("s1"),
        F.sum(F.col("rev") * F.col("rev")).over(wd).alias("s2"),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("rev").alias("t1"),
        F.sum(F.col("rev") * F.col("rev")).alias("t2"),
    )
    sse = (
        p.crossJoin(F.broadcast(tot))
        .filter(F.col("i") < F.col("n"))
        .select(
            "day",
            (
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("i"))
                + (
                    (F.col("t2") - F.col("s2"))
                    - (F.col("t1") - F.col("s1"))
                    * (F.col("t1") - F.col("s1"))
                    / (F.col("n") - F.col("i"))
                )
            ).alias("split_sse"),
            (F.col("s1") / F.col("i")).alias("left_mean"),
            (
                (F.col("t1") - F.col("s1")) / (F.col("n") - F.col("i"))
            ).alias("right_mean"),
            (
                F.col("t2") - F.col("t1") * F.col("t1") / F.col("n")
            ).alias("null_sse"),
        )
    )
    best = sse.orderBy(
        F.floor(F.col("split_sse") * 100 + 0.5) / 100, "day"
    ).limit(1)
    return best.select(
        F.date_format("day", "yyyy-MM-dd").alias("split_day"),
        money(F.col("left_mean")).alias("left_mean"),
        money(F.col("right_mean")).alias("right_mean"),
        ratio(1 - F.col("split_sse") / F.col("null_sse")).alias(
            "var_explained"
        ),
    )
