"""Wave 247: class-based term weighting and blocked rank consistency.

tx_ctfidf is c-TF-IDF (the class-based TF-IDF behind topic labeling):
collapse each SOURCE into one pseudo-document, weight each term by its
in-class rate times log(1 + A / f_t) with A the average class token
count and f_t the term's corpus frequency — terms that are FREQUENT
INSIDE a class and RARE ACROSS classes float up, which is exactly the
"name this cluster/source in five words" primitive (tx_tfidf scores
terms per document; this scores them per CLASS, the curation view).
stat_friedman_test is the nonparametric repeated-measures ANOVA over
the (day x event_type) block design: types are ranked WITHIN each day
(average ranks on ties), and the tie-corrected Q against chi-square
asks whether the volume ordering is consistent across days — robust
to day effects and heavy tails that fool a means comparison.

Exactness: token and day counts are integers; c-TF-IDF divides
identical integer operands (one log per term); within-day ranks are
exact half-integers, so every Friedman moment matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

CT_TOPK = 5

_CT_ORACLE = f"""
    WITH tok AS (SELECT source, unnest({DUCK_TOKENS}) AS w
                 FROM documents),
    tf AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    clen AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS len
             FROM tok GROUP BY 1),
    ft AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY 1),
    a AS (SELECT CAST(SUM(len) AS DOUBLE) / COUNT(*) AS a FROM clen),
    sc AS (SELECT tf.source, tf.w,
                  CAST(tf.tf AS DOUBLE) / clen.len
                  * LN(1 + a.a / ft.f) AS s
           FROM tf JOIN clen ON clen.source = tf.source
                   JOIN ft ON ft.w = tf.w
                   CROSS JOIN a),
    rk AS (SELECT source, w, s,
                  ROW_NUMBER() OVER (
                    PARTITION BY source
                    ORDER BY FLOOR(s * 1e9 + 0.5) DESC, w) AS rk
           FROM sc)
    SELECT source, CAST(rk AS BIGINT) AS rank, w AS term,
           FLOOR(s * 1e6 + 0.5) / 1e6 AS ctfidf
    FROM rk WHERE rk <= {CT_TOPK}
"""


@query("tx_ctfidf", oracle=_CT_ORACLE)
def tx_ctfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c-TF-IDF labels per source: each source is one pseudo-document;
    term score = (tf_in_class / class_len) * ln(1 + A / corpus_tf)
    with A = mean class token count. The top-{k} terms per source are
    the terms frequent HERE and rare ELSEWHERE — the five-word label a
    curation dashboard puts next to each feed (and the naming step of
    any clustering: swap source for cluster id). tx_keyness tests one
    source against the rest pairwise; c-TF-IDF scores all classes in
    one pass.

    Scale: two grouped token passes (per-class tf, corpus tf — both
    map-side combinable) joined back, then a per-class top-k window
    PARTITIONED by source; rank ties break on the 1e-9 score grid then
    the term, so the cut is deterministic cross-engine."""
    tok = (
        cat(spark, sf_dir)["documents"]
        .select("source", F.explode(tokens()).alias("w"))
        .localCheckpoint()  # feeds tf, class length and corpus df
    )
    tf = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    clen = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    ft = tok.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    a = clen.agg(
        (F.sum("len").cast("double") / F.count(F.lit(1))).alias("a")
    )
    sc = (
        tf.join(F.broadcast(clen), "source")
        .join(ft, "w")
        .crossJoin(F.broadcast(a))
        .select(
            "source", "w",
            (
                F.col("tf").cast("double") / F.col("len")
                * F.log(1 + F.col("a") / F.col("f"))
            ).alias("s"),
        )
    )
    rk = sc.select(
        "source", "w", "s",
        F.row_number()
        .over(
            W.partitionBy("source").orderBy(
                F.floor(F.col("s") * 1e9 + F.lit(0.5)).desc(), "w"
            )
        )
        .alias("rk"),
    )
    return rk.filter(F.col("rk") <= CT_TOPK).select(
        "source",
        F.col("rk").cast("bigint").alias("rank"),
        F.col("w").alias("term"),
        rnd(F.col("s"), 6).alias("ctfidf"),
    )


tx_ctfidf.__doc__ = tx_ctfidf.__doc__.format(k=CT_TOPK)


FR_K_TYPES = 5  # event types = treatments; days = blocks


def _friedman_oracle() -> str:
    from mister_spark.functions.special import normal_sf_sql

    return f"""
    WITH daily AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             event_type, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    types AS (SELECT DISTINCT event_type FROM daily),
    days AS (SELECT DISTINCT day FROM daily),
    full_d AS (SELECT d.day, t.event_type, COALESCE(dy.y, 0) AS y
               FROM days d CROSS JOIN types t
               LEFT JOIN daily dy ON dy.day = d.day
                 AND dy.event_type = t.event_type),
    rk AS (SELECT day, event_type, y,
                  (2 * RANK() OVER (PARTITION BY day ORDER BY y)
                   + COUNT(*) OVER (PARTITION BY day, y) - 1) / 2.0 AS r
           FROM full_d),
    ties AS (SELECT day, SUM(t3) AS tsum FROM (
               SELECT day, CAST(COUNT(*) AS BIGINT) AS t,
                      CAST(COUNT(*) AS BIGINT) * COUNT(*) * COUNT(*)
                      - COUNT(*) AS t3
               FROM full_d GROUP BY day, y) q GROUP BY 1),
    nk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM days),
    kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM types),
    rj AS (SELECT event_type, SUM(r) AS rsum, AVG(r) AS rmean
           FROM rk GROUP BY 1),
    q AS (SELECT nk.n, kk.k,
                 12.0 * SUM(rj.rsum * rj.rsum)
                 / (nk.n * kk.k * (kk.k + 1))
                 - 3.0 * nk.n * (kk.k + 1) AS q0,
                 (SELECT SUM(tsum) FROM ties) AS tall
          FROM rj CROSS JOIN nk CROSS JOIN kk
          GROUP BY nk.n, kk.k),
    qc AS (SELECT n, k,
                  CASE WHEN 1.0 - CAST(tall AS DOUBLE)
                            / (n * k * (k * k - 1.0)) <= 0 THEN 0.0
                       ELSE q0 / (1.0 - CAST(tall AS DOUBLE)
                                  / (n * k * (k * k - 1.0))) END AS q
           FROM q),
    z AS (SELECT n, k, q, k - 1 AS dof,
                 (POWER(CASE WHEN q <= 0 THEN 0.0
                        ELSE q / (k - 1) END, 1.0 / 3)
                  - (1 - 2.0 / (9.0 * (k - 1))))
                 / SQRT(2.0 / (9.0 * (k - 1))) AS zs
          FROM qc)
    SELECT rj.event_type,
           FLOOR(rj.rmean * 10000 + 0.5) / 10000 AS mean_rank,
           z.n AS n_days, CAST(z.dof AS BIGINT) AS dof,
           FLOOR(z.q * 10000 + 0.5) / 10000 AS q_stat,
           FLOOR(CASE WHEN z.zs >= 0 THEN {normal_sf_sql("z.zs")}
                 ELSE 1 - {normal_sf_sql("(-z.zs)")} END
                 * 1000000 + 0.5) / 1000000 AS p_value
    FROM rj CROSS JOIN z
    """


@query("stat_friedman_test", oracle=_friedman_oracle())
def stat_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test: do the event types keep a consistent
    volume ORDERING across days? Each day is a block; types are
    ranked within the day (average ranks on ties), and the
    tie-corrected Q statistic against chi-square(k-1) (Wilson-
    Hilferty tail) tests whether mean ranks differ beyond chance.
    The nonparametric repeated-measures ANOVA: stat_anova_f compares
    level means and is fooled by heavy tails and day effects; this
    strips both by ranking WITHIN blocks. mean_rank per type names
    who is consistently on top.

    Scale: one daily rollup shuffle (map-side combinable), a spine
    completion join, and a window PARTITIONED by day on the
    calendar-bounded frame; ranks are exact half-integers so every
    moment is engine-exact."""
    ev = cat(spark, sf_dir)["events"].select(
        F.expr("unix_micros(ts) div 86400000000").alias("day"), "event_type"
    )
    daily = ev.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    types = daily.select("event_type").distinct()
    days = daily.select("day").distinct()
    full_d = (
        days.crossJoin(F.broadcast(types))
        .join(daily, ["day", "event_type"], "left")
        .select(
            "day", "event_type", F.coalesce("y", F.lit(0)).alias("y")
        )
        .localCheckpoint()  # |days| x |types| block frame
    )
    r = (
        2 * F.rank().over(W.partitionBy("day").orderBy("y"))
        + F.count(F.lit(1)).over(W.partitionBy("day", "y"))
        - 1
    ) / 2.0
    rk = full_d.select("day", "event_type", "y", r.alias("r"))
    ties = (
        full_d.groupBy("day", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("tall")
        )
    )
    n = days.count()  # calendar-bounded driver scalar
    k = types.count()  # |event types|
    rj = rk.groupBy("event_type").agg(
        F.sum("r").alias("rsum"), F.avg("r").alias("rmean")
    )
    q0 = rj.agg(
        (
            12.0 * F.sum(F.col("rsum") * F.col("rsum")) / (n * k * (k + 1))
            - 3.0 * n * (k + 1)
        ).alias("q0")
    )
    corr = 1.0 - F.col("tall").cast("double") / (n * k * (k * k - 1.0))
    qc = q0.crossJoin(F.broadcast(ties)).select(
        F.when(corr <= 0, 0.0).otherwise(F.col("q0") / corr).alias("q")
    )
    dof = k - 1
    zs = (
        F.pow(
            F.when(F.col("q") <= 0, 0.0).otherwise(F.col("q") / dof),
            1.0 / 3,
        )
        - (1 - 2.0 / (9.0 * dof))
    ) / F.sqrt(F.lit(2.0 / (9.0 * dof)))
    from mister_spark.functions.special import normal_sf

    z = qc.select(
        "q",
        F.when(zs >= 0, normal_sf(zs)).otherwise(1 - normal_sf(-zs)).alias(
            "p"
        ),
    )
    return rj.crossJoin(F.broadcast(z)).select(
        "event_type",
        rnd(F.col("rmean"), 4).alias("mean_rank"),
        F.lit(n).cast("bigint").alias("n_days"),
        F.lit(dof).cast("bigint").alias("dof"),
        rnd(F.col("q"), 4).alias("q_stat"),
        rnd(F.col("p"), 6).alias("p_value"),
    )
