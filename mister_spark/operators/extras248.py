"""Wave 248: post-hoc pairwise rank tests and bet-sizing ratios.

stat_dunn_test answers the question stat_kruskal_wallis leaves open:
the omnibus H says SOME order priorities differ on total price — Dunn's
test says WHICH pairs, with z-scores built from the same global
midranks and a Benjamini-Hochberg correction across all k(k-1)/2
comparisons so the pair list survives multiple testing. fin_kelly
turns the daily revenue return stream into bet-sizing language: the
discrete Kelly fraction f* = p - (1-p)/b from the win rate and payoff
ratio, and the continuous (mean/variance) form — a revenue stream
whose Kelly fraction is negative is one you would not bet on at all,
the bluntest possible health read of a growth series (fin_sharpe_
sortino prices the same stream's volatility; Kelly prices its EDGE).

Exactness: midranks are exact half-integers on the distinct-value
collapse (the stat_kruskal_wallis machinery), pair z-scores divide
identical operands, and BH is order-deterministic because the p-values
it sorts are already bit-identical; returns snap to integer cents
before any division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

DUNN_ALPHA = 0.05


def _dunn_oracle() -> str:
    return f"""
    WITH x AS (SELECT o_orderpriority AS g, o_totalprice AS v FROM orders),
    rk AS (SELECT g,
                  RANK() OVER (ORDER BY v)
                    + (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0 AS mr
           FROM x),
    byg AS (SELECT g, SUM(mr) AS rsum, CAST(COUNT(*) AS DOUBLE) AS nj
            FROM rk GROUP BY 1),
    tot AS (SELECT SUM(nj) AS n, CAST(COUNT(*) AS BIGINT) AS k FROM byg),
    tie AS (SELECT COALESCE(SUM(t * t * t - t), 0) AS tt
            FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM x GROUP BY v)),
    sig AS (SELECT n, k, (n * (n + 1) / 12.0 - tt / (12.0 * (n - 1)))
                   AS s2
            FROM tot, tie),
    pairs AS (SELECT a.g AS g1, b.g AS g2,
                     a.rsum / a.nj AS m1, b.rsum / b.nj AS m2,
                     a.nj AS n1, b.nj AS n2
              FROM byg a JOIN byg b ON a.g < b.g),
    zp AS (SELECT g1, g2, m1, m2,
                  (m1 - m2) / SQRT(sig.s2 * (1 / n1 + 1 / n2)) AS z,
                  sig.k * (sig.k - 1) / 2 AS m
           FROM pairs, sig),
    praw AS (SELECT g1, g2, m1, m2, z, m,
                    2 * {normal_sf_sql("ABS(z)")} AS p
             FROM zp),
    ranked AS (SELECT praw.*,
                      ROW_NUMBER() OVER (ORDER BY p, g1, g2) AS r
               FROM praw),
    adj AS (SELECT ranked.*,
                   LEAST(1.0, MIN(p * m / r) OVER (
                     ORDER BY r DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                     AS p_bh
            FROM ranked)
    SELECT g1, g2,
           FLOOR(m1 * 10000 + 0.5) / 10000 AS mean_rank_1,
           FLOOR(m2 * 10000 + 0.5) / 10000 AS mean_rank_2,
           FLOOR(z * 10000 + 0.5) / 10000 AS z_score,
           FLOOR(p * 1000000 + 0.5) / 1000000 AS p_raw,
           FLOOR(p_bh * 1000000 + 0.5) / 1000000 AS p_bh,
           CAST(CASE WHEN p_bh < {DUNN_ALPHA!r} THEN 1 ELSE 0 END
                AS BIGINT) AS significant
    FROM adj
    """


@query("stat_dunn_test", oracle=_dunn_oracle())
def stat_dunn_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc pairwise test after Kruskal-Wallis (order
    priorities on total price): pair z = (mean rank difference) /
    sqrt((N(N+1)/12 - T/(12(N-1))) (1/n_i + 1/n_j)) from the SAME
    global midranks the omnibus H used, two-sided normal p, then
    Benjamini-Hochberg across all k(k-1)/2 pairs. The omnibus test
    says "something differs"; this is the pair list you act on, with
    the multiplicity already paid for.

    Scale: midranks ride the |distinct values| collapse +
    `bucketed_cumsum` (no single-task sort) exactly like
    stat_kruskal_wallis; pair algebra and the BH sweep run on the
    k^2-bounded pair frame (its ordered window is a bounded carry)."""
    x = cat(spark, sf_dir)["orders"].select(
        F.col("o_orderpriority").alias("g"), F.col("o_totalprice").alias("v")
    )
    pv = x.groupBy("v", "g").agg(F.count(F.lit(1)).cast("double").alias("c"))
    vc = pv.groupBy("v").agg(F.sum("c").alias("t"))
    cum = bucketed_cumsum(vc, "v", {"cum": F.col("t")})
    mr = cum.select(
        "v", (F.col("cum") - F.col("t") + (F.col("t") + 1) / 2).alias("mr")
    )
    byg = (
        pv.join(mr, "v")
        .groupBy("g")
        .agg(
            F.sum(F.col("mr") * F.col("c")).alias("rsum"),
            F.sum("c").alias("nj"),
        )
        .localCheckpoint()  # k-row group frame
    )
    tie = vc.agg(
        F.coalesce(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")),
            F.lit(0.0),
        ).alias("tt")
    )
    tot = byg.agg(
        F.sum("nj").alias("n"), F.count(F.lit(1)).cast("bigint").alias("k")
    )
    sig = tot.crossJoin(F.broadcast(tie)).select(
        "n", "k",
        (
            F.col("n") * (F.col("n") + 1) / 12.0
            - F.col("tt") / (12.0 * (F.col("n") - 1))
        ).alias("s2"),
    )
    a = byg.select(
        F.col("g").alias("g1"),
        (F.col("rsum") / F.col("nj")).alias("m1"),
        F.col("nj").alias("n1"),
    )
    b = byg.select(
        F.col("g").alias("g2"),
        (F.col("rsum") / F.col("nj")).alias("m2"),
        F.col("nj").alias("n2"),
    )
    pairs = a.join(b, F.col("g1") < F.col("g2")).crossJoin(F.broadcast(sig))
    z = (F.col("m1") - F.col("m2")) / F.sqrt(
        F.col("s2") * (1 / F.col("n1") + 1 / F.col("n2"))
    )
    m = F.col("k") * (F.col("k") - 1) / 2
    praw = pairs.select(
        "g1", "g2", "m1", "m2",
        z.alias("z"),
        m.alias("m"),
        (2 * normal_sf(F.abs(z))).alias("p"),
    )
    ranked = praw.select(
        "*", F.row_number().over(W.orderBy("p", "g1", "g2")).alias("r")
    )
    p_bh = F.least(
        F.lit(1.0),
        F.min(F.col("p") * F.col("m") / F.col("r")).over(
            W.orderBy(F.col("r").desc()).rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    return ranked.select(
        "g1", "g2",
        rnd(F.col("m1"), 4).alias("mean_rank_1"),
        rnd(F.col("m2"), 4).alias("mean_rank_2"),
        rnd(F.col("z"), 4).alias("z_score"),
        rnd(F.col("p"), 6).alias("p_raw"),
        rnd(p_bh, 6).alias("p_bh"),
        F.when(p_bh < DUNN_ALPHA, 1).otherwise(0).cast("bigint").alias(
            "significant"
        ),
    )


@query(
    "fin_kelly",
    # Real oracle: daily revenues snap to integer cents, returns are
    # single divisions of consecutive integers, and both Kelly forms
    # are closed-form algebra on the return moments.
    oracle="""
    WITH rev AS (SELECT o_orderdate AS day,
                        SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS cents
                 FROM orders GROUP BY 1),
    rk AS (SELECT day, cents,
                  ROW_NUMBER() OVER (ORDER BY day) AS t
           FROM rev),
    ret AS (SELECT (CAST(c.cents AS DOUBLE) - p.cents) / p.cents AS r
            FROM rk c JOIN rk p ON p.t = c.t - 1
            WHERE p.cents > 0),
    mth AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(r) AS mu,
                   SUM(r * r) AS srr,
                   CAST(SUM(CASE WHEN r > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS nw,
                   SUM(CASE WHEN r > 0 THEN r ELSE 0.0 END) AS sw,
                   CAST(SUM(CASE WHEN r < 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS nl,
                   SUM(CASE WHEN r < 0 THEN -r ELSE 0.0 END) AS sl
            FROM ret),
    d AS (SELECT n, mu, nw, nl,
                 CAST(nw AS DOUBLE) / n AS p,
                 CASE WHEN nw > 0 THEN sw / nw ELSE 0.0 END AS aw,
                 CASE WHEN nl > 0 THEN sl / nl ELSE 0.0 END AS al,
                 (srr - n * mu * mu) / (n - 1) AS var
          FROM mth)
    SELECT n AS n_returns,
           FLOOR(p * 10000 + 0.5) / 10000 AS win_rate,
           FLOOR(CASE WHEN al <= 0 THEN 0.0 ELSE aw / al END
                 * 10000 + 0.5) / 10000 AS payoff_ratio,
           FLOOR(CASE WHEN al <= 0 OR aw <= 0 THEN
                   CASE WHEN al <= 0 THEN 1.0 ELSE -1.0 END
                 ELSE p - (1 - p) / (aw / al) END
                 * 10000 + 0.5) / 10000 AS kelly_discrete,
           FLOOR(CASE WHEN var <= 0 THEN 0.0 ELSE mu / var END
                 * 10000 + 0.5) / 10000 AS kelly_continuous
    FROM d
    """,
)
def fin_kelly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kelly bet-sizing read of the daily revenue return stream:
    discrete f* = p - (1-p)/b from the win rate p and payoff ratio
    b = avg gain / avg loss (1.0 if there are no losing days, -1.0 if
    no winners), and the continuous mean/variance form mu/sigma^2.
    Positive Kelly = the stream has exploitable edge (growth beats
    its own volatility drag); negative = volatility eats the trend.
    fin_sharpe_sortino scales the same moments for comparison ACROSS
    streams; Kelly answers the absolute question "is this stream
    worth betting on, and how hard".

    Scale: one map-side-combinable daily rollup; the return join and
    the single moment aggregate run on the calendar-bounded
    trading-day frame (ordered windows are bounded carries)."""
    rev = (
        cat(spark, sf_dir)["orders"]
        .select(
            F.col("o_orderdate").alias("day"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"))
        .localCheckpoint()  # calendar-bounded trading-day frame
    )
    rk = rev.select("cents", F.row_number().over(W.orderBy("day")).alias("t"))
    prev = rk.select((F.col("t") + 1).alias("t"), F.col("cents").alias("pc"))
    ret = (
        rk.join(prev, "t")
        .filter(F.col("pc") > 0)
        .select(
            ((F.col("cents").cast("double") - F.col("pc")) / F.col("pc")).alias(
                "r"
            )
        )
    )
    mth = ret.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("r").alias("mu"),
        F.sum(F.col("r") * F.col("r")).alias("srr"),
        F.sum(F.when(F.col("r") > 0, 1).otherwise(0)).cast("bigint").alias(
            "nw"
        ),
        F.sum(F.when(F.col("r") > 0, F.col("r")).otherwise(0.0)).alias("sw"),
        F.sum(F.when(F.col("r") < 0, 1).otherwise(0)).cast("bigint").alias(
            "nl"
        ),
        F.sum(F.when(F.col("r") < 0, -F.col("r")).otherwise(0.0)).alias("sl"),
    )
    p = F.col("nw").cast("double") / F.col("n")
    aw = F.when(F.col("nw") > 0, F.col("sw") / F.col("nw")).otherwise(0.0)
    al = F.when(F.col("nl") > 0, F.col("sl") / F.col("nl")).otherwise(0.0)
    var = (F.col("srr") - F.col("n") * F.col("mu") * F.col("mu")) / (
        F.col("n") - 1
    )
    return mth.select(
        F.col("n").alias("n_returns"),
        rnd(p, 4).alias("win_rate"),
        rnd(F.when(al <= 0, 0.0).otherwise(aw / al), 4).alias("payoff_ratio"),
        rnd(
            F.when(
                (al <= 0) | (aw <= 0),
                F.when(al <= 0, 1.0).otherwise(-1.0),
            ).otherwise(p - (1 - p) / (aw / al)),
            4,
        ).alias("kelly_discrete"),
        rnd(
            F.when(var <= 0, 0.0).otherwise(F.col("mu") / var), 4
        ).alias("kelly_continuous"),
    )
