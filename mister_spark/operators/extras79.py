"""Wave 79: growth accounting, AQE runtime coalescing, and score
discrimination.

ev_growth_accounting is the product-analytics ledger (new / retained /
resurrected / churned between periods, plus the quick ratio) that
turns a DAU line into a diagnosis; io_aqe_coalesce pins Adaptive Query
Execution's post-shuffle partition coalescing — the runtime re-plan
this repo leans on at 100 TB, made visible and regression-trapped;
ml_ks_discrimination is the credit-scoring KS statistic (max CDF gap
between classes over score bins) — the single-number separation read
next to AUC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

KS_BINS = 50


@query(
    "ev_growth_accounting",
    oracle="""
    WITH e AS (SELECT user_id,
                      date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS dn
               FROM events),
    b AS (SELECT MIN(dn) AS lo, (MIN(dn) + MAX(dn) + 1) // 2 AS mid FROM e),
    u AS (SELECT e.user_id,
                 MAX(CASE WHEN e.dn < b.mid THEN 1 ELSE 0 END) AS p0,
                 MAX(CASE WHEN e.dn >= b.mid THEN 1 ELSE 0 END) AS p1
          FROM e CROSS JOIN b GROUP BY 1),
    c AS (SELECT CAST(SUM(CASE WHEN p0 = 0 AND p1 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS new_users,
                 CAST(SUM(CASE WHEN p0 = 1 AND p1 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS retained,
                 CAST(SUM(CASE WHEN p0 = 1 AND p1 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS churned
          FROM u)
    SELECT new_users, retained, churned,
           CAST(retained + new_users AS BIGINT) AS active_p1,
           FLOOR(CASE WHEN churned > 0
                 THEN CAST(new_users + 0.0 AS DOUBLE) / churned
                 ELSE 0 END * 10000 + 0.5) / 10000 AS quick_ratio
    FROM c
    """,
)
def ev_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting across the calendar-midpoint split: users
    classify as new (P1 only), retained (both), or churned (P0 only),
    and the quick ratio new/churned says whether growth is real or a
    leaky bucket — the ledger identity active_P1 = retained + new
    holds by construction. (Resurrected needs ≥3 periods; the
    two-period ledger is the base case.)

    Scale: one user rollup with two period flags — a single shuffle
    regardless of period count."""
    ev = cat(spark, sf_dir)["events"]
    e = ev.select(
        "user_id",
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias("dn"),
    )
    b = e.agg(((F.min("dn") + F.max("dn") + 1) / 2).cast("long").alias("mid"))
    u = (
        e.join(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.max((F.col("dn") < F.col("mid")).cast("int")).alias("p0"),
            F.max((F.col("dn") >= F.col("mid")).cast("int")).alias("p1"),
        )
    )
    c = u.agg(
        F.sum(((F.col("p0") == 0) & (F.col("p1") == 1)).cast("int"))
        .cast("bigint")
        .alias("new_users"),
        F.sum(((F.col("p0") == 1) & (F.col("p1") == 1)).cast("int"))
        .cast("bigint")
        .alias("retained"),
        F.sum(((F.col("p0") == 1) & (F.col("p1") == 0)).cast("int"))
        .cast("bigint")
        .alias("churned"),
    )
    return c.select(
        "new_users",
        "retained",
        "churned",
        (F.col("retained") + F.col("new_users")).cast("bigint").alias(
            "active_p1"
        ),
        ratio(
            F.when(
                F.col("churned") > 0,
                F.col("new_users").cast("double") / F.col("churned"),
            ).otherwise(0.0)
        ).alias("quick_ratio"),
    )


@query(
    "io_aqe_coalesce",
    # Real oracle: the session pins 32 shuffle partitions and AQE must
    # coalesce the tiny aggregate to 1 - structural constants.
    oracle="""
    SELECT CAST(32 AS BIGINT) AS configured_partitions,
           CAST(1 AS BIGINT) AS runtime_partitions,
           CAST(1 AS BIGINT) AS aqe_enabled,
           CAST(1 AS BIGINT) AS coalesced
    """,
)
def io_aqe_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive Query Execution, made visible: run a groupBy whose
    shuffle writes far fewer bytes than `spark.sql.shuffle.partitions`
    would justify, and read back how many post-shuffle partitions AQE
    COALESCED to at runtime (rdd.getNumPartitions after execution) vs
    the static setting. This is the mechanism that saves 100 TB jobs
    from 10,000 near-empty reducers on small intermediate stages — and
    the regression trap if someone disables AQE.

    Scale: the observation itself is O(1); the property it guards is
    cluster-wide task-count sanity."""
    conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    aqe = spark.conf.get("spark.sql.adaptive.enabled") == "true"
    g = (
        cat(spark, sf_dir)["orders"]
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    runtime_parts = g.rdd.getNumPartitions()
    return spark.createDataFrame(
        [
            (
                int(conf_parts),
                int(runtime_parts),
                int(aqe),
                int(aqe and runtime_parts < conf_parts),
            )
        ],
        "configured_partitions long, runtime_partitions long, aqe_enabled "
        "long, coalesced long",
    )


@query(
    "ml_ks_discrimination",
    oracle=f"""
    WITH s AS (SELECT LEAST(CAST(FLOOR(1.0 / (1.0 + exp(-CAST(embedding[1]
                                                              AS DOUBLE)))
                                       * {KS_BINS}) AS BIGINT),
                            {KS_BINS - 1}) AS bin,
                      CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
               FROM embeddings),
    c AS (SELECT bin,
                 CAST(SUM(y) AS DOUBLE) AS np,
                 CAST(SUM(1 - y) AS DOUBLE) AS nn
          FROM s GROUP BY 1),
    t AS (SELECT SUM(np) AS tp, SUM(nn) AS tn FROM c),
    k AS (SELECT c.bin,
                 SUM(c.np / t.tp) OVER (ORDER BY c.bin
                                        ROWS UNBOUNDED PRECEDING)
                 - SUM(c.nn / t.tn) OVER (ORDER BY c.bin
                                          ROWS UNBOUNDED PRECEDING) AS gap
          FROM c CROSS JOIN t)
    SELECT CAST((SELECT tp FROM t) AS BIGINT) AS n_pos,
           CAST((SELECT tn FROM t) AS BIGINT) AS n_neg,
           FLOOR(MAX(ABS(gap)) * 10000 + 0.5) / 10000 AS ks_stat,
           CAST(MIN(CASE WHEN ABS(gap) = (SELECT MAX(ABS(k2.gap)) FROM k k2)
                    THEN bin END) AS BIGINT) AS ks_bin
    FROM k
    """,
)
def ml_ks_discrimination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS discrimination statistic for the sigmoid scorer: the maximum
    gap between the positive and negative classes' score CDFs over
    {b} bins, plus the bin where it occurs (the natural cutoff) — the
    credit-scoring standard that complements AUC (AUC integrates the
    separation; KS reports its best single point).

    Scale: one {b}-cell rollup; the CDF gap is a bounded window."""
    emb = cat(spark, sf_dir)["embeddings"]
    prob = 1.0 / (1.0 + F.exp(-F.element_at("embedding", 1).cast("double")))
    s = emb.select(
        F.least(
            F.floor(prob * KS_BINS).cast("bigint"), F.lit(KS_BINS - 1)
        ).alias("bin"),
        (F.col("label") < 5).cast("int").alias("y"),
    )
    c = s.groupBy("bin").agg(
        F.sum("y").cast("double").alias("np"),
        F.sum(1 - F.col("y")).cast("double").alias("nn"),
    ).localCheckpoint()
    t = c.agg(F.sum("np").alias("tp"), F.sum("nn").alias("tn"))
    wcum = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    k = c.join(F.broadcast(t)).select(
        "bin",
        (
            F.sum(F.col("np") / F.col("tp")).over(wcum)
            - F.sum(F.col("nn") / F.col("tn")).over(wcum)
        ).alias("gap"),
    ).localCheckpoint()
    mx = k.agg(F.max(F.abs("gap")).alias("mg"))
    best = (
        k.join(F.broadcast(mx))
        .filter(F.abs("gap") == F.col("mg"))
        .agg(F.min("bin").cast("bigint").alias("ks_bin"))
    )
    return (
        t.join(F.broadcast(mx))
        .join(F.broadcast(best))
        .select(
            F.col("tp").cast("bigint").alias("n_pos"),
            F.col("tn").cast("bigint").alias("n_neg"),
            ratio(F.col("mg")).alias("ks_stat"),
            "ks_bin",
        )
    )


ml_ks_discrimination.__doc__ = ml_ks_discrimination.__doc__.format(b=KS_BINS)
