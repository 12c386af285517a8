"""Wave 128: meta-analysis pooling, partition-balance introspection,
and leave-one-out ablation planning.

stat_meta_analysis pools the per-weekday urgent-vs-other spend
effect with BOTH fixed-effect and DerSimonian–Laird random-effects
weights, plus Q and I² — the machinery that says whether strata
share one effect or each has its own; mr_partition_balance measures
actual rows-per-partition after a repartition — the task-skew
number behind straggling stages; ds_loo_ablation_plan emits the
leave-one-source-out training-mix manifests (tokens removed,
renormalized weights) — the ablation table a data-mixture study
executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

PB_PARTS = 16


@query(
    "stat_meta_analysis",
    oracle="""
    WITH d AS (SELECT CAST(isodow(o_orderdate) AS BIGINT) AS stratum,
                      CASE WHEN o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END AS e,
                      o_totalprice AS y
               FROM orders),
    s AS (SELECT stratum,
                 AVG(CASE WHEN e = 1 THEN y END) AS m1,
                 VAR_SAMP(CASE WHEN e = 1 THEN y END) AS v1,
                 CAST(SUM(e) AS DOUBLE) AS n1,
                 AVG(CASE WHEN e = 0 THEN y END) AS m0,
                 VAR_SAMP(CASE WHEN e = 0 THEN y END) AS v0,
                 CAST(SUM(1 - e) AS DOUBLE) AS n0
          FROM d GROUP BY 1),
    eff AS (SELECT stratum, m1 - m0 AS te,
                   v1 / n1 + v0 / n0 AS v
            FROM s),
    fe AS (SELECT SUM(te / v) / SUM(1 / v) AS theta_fe,
                  SUM(1 / v) AS sw,
                  CAST(COUNT(*) AS DOUBLE) AS k
           FROM eff),
    q AS (SELECT SUM((te - fe.theta_fe) * (te - fe.theta_fe) / v) AS qq,
                 SUM(1 / v) AS sw, SUM(1 / (v * v)) AS sw2,
                 fe.k AS k, fe.theta_fe AS theta_fe
          FROM eff, fe GROUP BY fe.k, fe.theta_fe, fe.sw),
    tau AS (SELECT k, theta_fe, qq,
                   GREATEST((qq - (k - 1)) / (sw - sw2 / sw), 0) AS tau2
            FROM q),
    re AS (SELECT tau.k, tau.theta_fe, tau.qq, tau.tau2,
                  SUM(eff.te / (eff.v + tau.tau2))
                  / SUM(1 / (eff.v + tau.tau2)) AS theta_re
           FROM eff, tau GROUP BY tau.k, tau.theta_fe, tau.qq, tau.tau2)
    SELECT CAST(k AS BIGINT) AS strata,
           FLOOR(theta_fe * 100 + 0.5) / 100 AS effect_fixed,
           FLOOR(theta_re * 100 + 0.5) / 100 AS effect_random,
           FLOOR(qq * 10000 + 0.5) / 10000 AS q_stat,
           FLOOR(GREATEST((qq - (k - 1)) / NULLIF(qq, 0), 0) * 10000 + 0.5)
             / 10000 AS i_squared
    FROM re
    """,
)
def stat_meta_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta-analytic pooling of the per-weekday urgent-vs-other mean
    spend effect: fixed-effect (inverse-variance) and
    DerSimonian–Laird random-effects estimates, with Cochran's Q and
    I² = max(0, (Q−df)/Q) quantifying how much strata disagree. When
    I² is high the FE estimate is a fiction and RE (which widens
    toward between-stratum spread) is the honest summary — the same
    math as combining experiments across markets or time.

    Scale: one rollup to 7 stratum rows; everything after is tiny-
    frame arithmetic with the FE scalar broadcast."""
    d = cat(spark, sf_dir)["orders"].select(
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).alias("stratum"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("e"),
        F.col("o_totalprice").alias("y"),
    )
    s = d.groupBy("stratum").agg(
        F.avg(F.when(F.col("e") == 1, F.col("y"))).alias("m1"),
        F.var_samp(F.when(F.col("e") == 1, F.col("y"))).alias("v1"),
        F.sum("e").cast("double").alias("n1"),
        F.avg(F.when(F.col("e") == 0, F.col("y"))).alias("m0"),
        F.var_samp(F.when(F.col("e") == 0, F.col("y"))).alias("v0"),
        F.sum(1 - F.col("e")).cast("double").alias("n0"),
    )
    eff = s.select(
        "stratum",
        (F.col("m1") - F.col("m0")).alias("te"),
        (F.col("v1") / F.col("n1") + F.col("v0") / F.col("n0")).alias("v"),
    ).localCheckpoint()
    fe = eff.agg(
        (F.sum(F.col("te") / F.col("v")) / F.sum(1 / F.col("v"))).alias(
            "theta_fe"
        ),
        F.sum(1 / F.col("v")).alias("sw"),
        F.sum(1 / (F.col("v") * F.col("v"))).alias("sw2"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    j = eff.crossJoin(F.broadcast(fe))
    q = j.agg(
        F.sum(
            (F.col("te") - F.col("theta_fe"))
            * (F.col("te") - F.col("theta_fe"))
            / F.col("v")
        ).alias("qq"),
        F.first("sw").alias("sw"),
        F.first("sw2").alias("sw2"),
        F.first("k").alias("k"),
        F.first("theta_fe").alias("theta_fe"),
    )
    tau = q.withColumn(
        "tau2",
        F.greatest(
            (F.col("qq") - (F.col("k") - 1))
            / (F.col("sw") - F.col("sw2") / F.col("sw")),
            F.lit(0.0),
        ),
    )
    j2 = eff.crossJoin(F.broadcast(tau))
    re = j2.agg(
        F.first("k").alias("k"),
        F.first("theta_fe").alias("theta_fe"),
        F.first("qq").alias("qq"),
        (
            F.sum(F.col("te") / (F.col("v") + F.col("tau2")))
            / F.sum(1 / (F.col("v") + F.col("tau2")))
        ).alias("theta_re"),
    )
    return re.select(
        F.col("k").cast("bigint").alias("strata"),
        (F.floor(F.col("theta_fe") * 100 + 0.5) / 100).alias(
            "effect_fixed"
        ),
        (F.floor(F.col("theta_re") * 100 + 0.5) / 100).alias(
            "effect_random"
        ),
        ratio(F.col("qq")).alias("q_stat"),
        ratio(
            F.greatest(
                (F.col("qq") - (F.col("k") - 1))
                / F.nullif(F.col("qq"), F.lit(0.0)),
                F.lit(0.0),
            )
        ).alias("i_squared"),
    )


@query("mr_partition_balance")  # physical introspection → rows-only
def mr_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-balance introspection: repartition lineitem {p} ways
    on orderkey, count ACTUAL rows per physical partition
    (spark_partition_id), and report the balance profile — max/mean
    ratio and CV. Hash partitioning should land near 1.0; a hot key
    shows up here before it shows up as one straggling task in a
    3-hour stage.

    Scale: the id column is free; the profile is one rollup over
    {p} partitions."""
    li = (
        cat(spark, sf_dir)["lineitem"]
        .repartition(PB_PARTS, "l_orderkey")
        .withColumn("pid", F.spark_partition_id())
    )
    per = li.groupBy("pid").agg(F.count(F.lit(1)).cast("double").alias("n"))
    stats = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("partitions"),
        F.sum("n").cast("bigint").alias("rows"),
        ratio(F.max("n") / F.avg("n")).alias("max_over_mean"),
        ratio(F.stddev_samp("n") / F.avg("n")).alias("cv"),
    )
    return stats


mr_partition_balance.__doc__ = mr_partition_balance.__doc__.format(
    p=PB_PARTS
)


@query(
    "ds_loo_ablation_plan",
    oracle=f"""
    WITH t AS (SELECT source, CAST(SUM(len({DUCK_TOKENS})) AS DOUBLE)
                 AS tok
               FROM documents GROUP BY 1),
    tot AS (SELECT SUM(tok) AS n FROM t)
    SELECT t.source AS held_out,
           CAST(t.tok AS BIGINT) AS tokens_removed,
           CAST(tot.n - t.tok AS BIGINT) AS tokens_remaining,
           FLOOR((tot.n - t.tok) / tot.n * 10000 + 0.5) / 10000
             AS remaining_share
    FROM t, tot
    """,
)
def ds_loo_ablation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out ablation plan: for every source, the
    token volume a LOO run loses and what remains — the manifest a
    data-mixture ablation study executes row by row (each row is one
    training run's data recipe). Pairs with ds_domain_reweight: run
    the ablations this table defines, feed the losses back into the
    reweighting.

    Scale: one token rollup to |sources| rows; the plan is per-row
    arithmetic against the broadcast total."""
    toks = tokens()
    t = (
        cat(spark, sf_dir)["documents"]
        .groupBy("source")
        .agg(F.sum(F.size(toks)).cast("double").alias("tok"))
    )
    tot = t.agg(F.sum("tok").alias("n"))
    return t.crossJoin(F.broadcast(tot)).select(
        F.col("source").alias("held_out"),
        F.col("tok").cast("bigint").alias("tokens_removed"),
        (F.col("n") - F.col("tok")).cast("bigint").alias("tokens_remaining"),
        ratio((F.col("n") - F.col("tok")) / F.col("n")).alias(
            "remaining_share"
        ),
    )
