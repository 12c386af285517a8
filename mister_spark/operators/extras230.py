"""Wave 230: group influence diagnostics and PU-learning priors.

stat_loo_influence asks which nation is DRIVING the revenue trend:
because OLS is linear in y, the leave-one-nation-out slope is a
closed-form downdate — removing z shifts the slope by exactly
sum_t x~_t y_{z,t} / Sxx, nation z's own slope contribution — so
the full influence ranking costs one panel aggregation, not 25
refits. The group-level DFBETA: a trend that one group owns is a
concentration risk, not a trend. ml_pu_prior_elkan handles the
labels a 100 TB corpus actually has — a small POSITIVE set and a
sea of unlabeled: under the SCAR assumption, the labeling frequency
c = E[score | labeled] turns the scorer into a class-prior estimate
pi = E[score]/c and an expected count of hidden positives in the
unlabeled pool (Elkan-Noto). The number that says how much signal
the unlabeled pile still hides before anyone pays for labels.

Exactness: the influence algebra is exact integer-cent panel sums
against shared centered-x terms; the PU estimator runs entirely on
1e-6-snapped scores and integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.operators.extras32 import CAL_POS_LABEL_LT
from mister_spark.registry import query

EPOCH = "1970-01-01"


@query(
    "stat_loo_influence",
    # Real oracle: per-(nation, day) revenue sums in integer cents,
    # the centered-x weights are shared rationals of day integers,
    # and each contribution/downdate is the same closed form on the
    # grid, ordered by rounded |influence| with name tiebreak.
    oracle=f"""
    WITH cell AS (SELECT c.c_nationkey AS z,
                         date_diff('day', DATE '{EPOCH}',
                                   CAST(o.o_orderdate AS DATE)) AS t,
                         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5)
                              AS BIGINT)) AS BIGINT) AS cents
                  FROM orders o JOIN customer c
                       ON o.o_custkey = c.c_custkey
                  GROUP BY 1, 2),
    days AS (SELECT t FROM cell GROUP BY t),
    xm AS (SELECT AVG(CAST(t AS DOUBLE)) AS mt,
                  SUM((CAST(t AS DOUBLE) - (SELECT AVG(CAST(t2.t AS
                       DOUBLE)) FROM days t2))
                      * (CAST(t AS DOUBLE) - (SELECT AVG(CAST(t3.t AS
                       DOUBLE)) FROM days t3))) AS sxx
           FROM days),
    tot AS (SELECT t, CAST(SUM(cents) AS DOUBLE) / 100 AS y
            FROM cell GROUP BY 1),
    b AS (SELECT SUM((CAST(tot.t AS DOUBLE) - xm.mt) * tot.y) / xm.sxx
                   AS slope
          FROM tot, xm GROUP BY xm.sxx, xm.mt),
    contrib AS (SELECT cell.z,
                       SUM((CAST(cell.t AS DOUBLE) - xm.mt)
                           * (CAST(cell.cents AS DOUBLE) / 100))
                       / xm.sxx AS infl
                FROM cell, xm GROUP BY cell.z, xm.sxx, xm.mt)
    SELECT n.n_name AS nation,
           FLOOR(contrib.infl * 1e4 + 0.5) / 1e4 AS slope_contribution,
           FLOOR((b.slope - contrib.infl) * 1e4 + 0.5) / 1e4
             AS slope_without,
           FLOOR(CASE WHEN ABS(b.slope) < 1e-12 THEN 0.0
                      ELSE contrib.infl / b.slope END * 1e4 + 0.5) / 1e4
             AS share_of_slope
    FROM contrib JOIN nation n ON n.n_nationkey = contrib.z, b
    ORDER BY FLOOR(ABS(contrib.infl) * 1e4 + 0.5) DESC, n.n_name
    """,
)
def stat_loo_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-nation-out influence on the daily revenue trend:
    OLS slope is linear in y, so nation z's removal changes the
    slope by exactly its own contribution sum_t x~_t y_{z,t} / Sxx —
    the whole 25-nation influence ranking from ONE panel aggregation
    and closed-form downdates (no refits). slope_without shows the
    counterfactual trend; share_of_slope > 0.5 for one nation means
    the "global" trend is really that nation's story — the
    group-level DFBETA every trend readout should ship with.

    Scale: one fact aggregation to the (nation, day) panel in
    integer cents; the weights and downdates live on the
    dimension x calendar bounded frame."""
    cell = (
        cat(spark, sf_dir)["orders"]
        .join(
            F.broadcast(
                cat(spark, sf_dir)["customer"].select(
                    "c_custkey", F.col("c_nationkey").alias("z")
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "z",
            F.datediff(
                F.date_trunc("day", "o_orderdate"), F.lit(EPOCH)
            ).alias("t"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("z", "t")
        .agg(F.sum("cents").alias("cents"))
        .localCheckpoint()  # bounded panel; feeds weights + contribs
    )
    days = cell.select("t").distinct()
    mt = days.agg(F.avg(F.col("t").cast("double")).alias("mt"))
    xm = (
        days.crossJoin(F.broadcast(mt))
        .agg(
            F.sum(
                (F.col("t").cast("double") - F.col("mt"))
                * (F.col("t").cast("double") - F.col("mt"))
            ).alias("sxx"),
            F.first("mt").alias("mt"),
        )
    )
    tot = cell.groupBy("t").agg(
        (F.sum("cents").cast("double") / 100).alias("y")
    )
    b = (
        tot.crossJoin(F.broadcast(xm))
        .agg(
            (
                F.sum((F.col("t").cast("double") - F.col("mt")) * F.col("y"))
                / F.first("sxx")
            ).alias("slope")
        )
    )
    contrib = (
        cell.crossJoin(F.broadcast(xm))
        .groupBy("z")
        .agg(
            (
                F.sum(
                    (F.col("t").cast("double") - F.col("mt"))
                    * (F.col("cents").cast("double") / 100)
                )
                / F.first("sxx")
            ).alias("infl")
        )
    )
    nat = cat(spark, sf_dir)["nation"].select(
        F.col("n_nationkey").alias("z"), "n_name"
    )
    return (
        contrib.join(F.broadcast(nat), "z")
        .crossJoin(F.broadcast(b))
        .select(
            F.col("n_name").alias("nation"),
            rnd(F.col("infl"), 4).alias("slope_contribution"),
            rnd(F.col("slope") - F.col("infl"), 4).alias("slope_without"),
            rnd(
                F.when(F.abs(F.col("slope")) < 1e-12, F.lit(0.0)).otherwise(
                    F.col("infl") / F.col("slope")
                ),
                4,
            ).alias("share_of_slope"),
        )
        .orderBy(
            F.floor(F.abs(F.col("slope_contribution")) * 1e4 + 0.5).desc(),
            "nation",
        )
    )


@query(
    "ml_pu_prior_elkan",
    # Real oracle: scores snap to the 1e-6 grid, c and the prior are
    # ratios of exact grid sums and integer counts, and the hidden-
    # positive estimate is one closed form on the grid.
    oracle=f"""
    WITH s AS (SELECT CAST(FLOOR((1.0 / (1.0 + exp(-CAST(embedding[1]
                      AS DOUBLE)))) * 1e6 + 0.5) AS BIGINT) AS p6,
                      CASE WHEN label < {CAL_POS_LABEL_LT} THEN 1
                           ELSE 0 END AS lab
               FROM embeddings),
    a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(lab) AS BIGINT) AS nl,
                 SUM(CASE WHEN lab = 1 THEN p6 ELSE 0 END) AS sl,
                 SUM(p6) AS st,
                 SUM(CASE WHEN lab = 0 THEN p6 ELSE 0 END) AS su
          FROM s),
    e AS (SELECT a.*,
                 CAST(sl AS DOUBLE) / nl / 1e6 AS c,
                 CAST(st AS DOUBLE) / n / 1e6
                   / (CAST(sl AS DOUBLE) / nl / 1e6) AS prior
          FROM a)
    SELECT n AS n_total, nl AS n_labeled_pos,
           FLOOR(c * 1e4 + 0.5) / 1e4 AS c_label_freq,
           FLOOR(LEAST(prior, 1.0) * 1e4 + 0.5) / 1e4 AS est_prior,
           FLOOR(GREATEST(LEAST(prior, 1.0) * n - nl, 0.0) * 10 + 0.5)
             / 10 AS est_hidden_positives,
           FLOOR(CAST(su AS DOUBLE) / (n - nl) / 1e6 * 1e4 + 0.5) / 1e4
             AS mean_score_unlabeled
    FROM e
    """,
)
def ml_pu_prior_elkan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elkan-Noto positive-unlabeled prior estimation: treating
    label < {lt} as the LABELED-positive set and everything else as
    unlabeled, the SCAR assumption gives labeling frequency
    c = E[score | labeled] and class prior pi = E[score] / c, hence
    the expected count of hidden positives sitting in the unlabeled
    pool. The honest accounting for the labels a web-scale corpus
    really has — a verified sliver plus an ocean — before anyone
    decides whether mining that ocean is worth an annotation budget.

    Scale: one narrow map + ONE 5-sum aggregate on the 1e-6 score
    grid; map-side combinable, five numbers leave the executors."""
    prob6 = F.floor(
        (1.0 / (1.0 + F.exp(-F.element_at("embedding", 1).cast("double"))))
        * 1e6
        + F.lit(0.5)
    ).cast("bigint")
    s = cat(spark, sf_dir)["embeddings"].select(
        prob6.alias("p6"),
        F.when(F.col("label") < CAL_POS_LABEL_LT, 1).otherwise(0).alias("lab"),
    )
    a = s.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lab").alias("nl"),
        F.sum(F.when(F.col("lab") == 1, F.col("p6")).otherwise(0)).alias("sl"),
        F.sum("p6").alias("st"),
        F.sum(F.when(F.col("lab") == 0, F.col("p6")).otherwise(0)).alias("su"),
    )
    c = F.col("sl").cast("double") / F.col("nl") / 1e6
    prior = (F.col("st").cast("double") / F.col("n") / 1e6) / c
    return a.select(
        F.col("n").cast("bigint").alias("n_total"),
        F.col("nl").cast("bigint").alias("n_labeled_pos"),
        rnd(c, 4).alias("c_label_freq"),
        rnd(F.least(prior, F.lit(1.0)), 4).alias("est_prior"),
        rnd(
            F.greatest(
                F.least(prior, F.lit(1.0)) * F.col("n") - F.col("nl"),
                F.lit(0.0),
            ),
            1,
        ).alias("est_hidden_positives"),
        rnd(
            F.col("su").cast("double") / (F.col("n") - F.col("nl")) / 1e6, 4
        ).alias("mean_score_unlabeled"),
    )


ml_pu_prior_elkan.__doc__ = ml_pu_prior_elkan.__doc__.format(
    lt=CAL_POS_LABEL_LT
)
