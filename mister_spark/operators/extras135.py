"""Wave 135: recommender coverage/diversity, experiment duration
planning, and graph edge turnover.

ml_recsys_coverage evaluates the co-purchase recommender on the two
axes accuracy metrics ignore — catalog coverage (what share of
products ever get recommended) and intra-list brand diversity —
the long-tail health check; ev_ab_duration_plan converts daily
active traffic + an MDE grid into 'days until powered' — the
planning table every experiment review wants on screen;
graph_edge_turnover measures relationship churn (co-purchase edges
appearing/disappearing across the mid-corpus split) — the
drift-of-structure number node-level turnover misses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

REC_K = 5
AB_MDES = (0.01, 0.02, 0.05)  # relative MDEs
AB_POWER_Z = 0.8416  # z_{0.8}
AB_ALPHA_Z = 1.959964
SPLIT_DATE = "1998-01-01"


@query(
    "ml_recsys_coverage",
    oracle=f"""
    WITH raw AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    bk AS (SELECT l_orderkey, l_partkey FROM (
             SELECT l_orderkey, l_partkey,
                    ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                       ORDER BY l_partkey) AS rk
             FROM raw) WHERE rk <= 16),
    e AS (SELECT x.l_partkey AS p1, y.l_partkey AS p2,
                 CAST(COUNT(*) AS BIGINT) AS w
          FROM bk x JOIN bk y ON x.l_orderkey = y.l_orderkey
                             AND x.l_partkey < y.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 3),
    sym AS (SELECT p1 AS u, p2 AS v, w FROM e
            UNION ALL SELECT p2, p1, w FROM e),
    topk AS (SELECT u, v FROM (
               SELECT u, v,
                      ROW_NUMBER() OVER (PARTITION BY u
                                         ORDER BY w DESC, v) AS rk
               FROM sym) WHERE rk <= {REC_K}),
    pb AS (SELECT p_partkey, p_brand FROM part),
    div AS (SELECT t.u,
                   CAST(COUNT(DISTINCT b.p_brand) AS DOUBLE)
                     / COUNT(*) AS brand_div
            FROM topk t JOIN pb b ON t.v = b.p_partkey
            GROUP BY 1),
    cat_n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM part)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT u
                                                  FROM topk)) AS sources,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT v
                                                  FROM topk))
             AS recommended_items,
           FLOOR((SELECT COUNT(*) FROM (SELECT DISTINCT v FROM topk))
                 / cat_n.n * 10000 + 0.5) / 10000 AS catalog_coverage,
           FLOOR((SELECT AVG(brand_div) FROM div) * 10000 + 0.5) / 10000
             AS mean_brand_diversity
    FROM cat_n
    """,
)
def ml_recsys_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommender coverage & diversity: for each product, the top-{k}
    co-purchase neighbors form its recommendation list; reported are
    catalog coverage (share of ALL products that appear in any list —
    low coverage means the recommender only ever shows bestsellers)
    and mean intra-list brand diversity. The two health axes
    precision@k ignores, and the first things to collapse when a
    popularity bias creeps in.

    Scale: the top-{k} window partitions per source node; coverage
    and diversity are small-frame rollups with the part dim
    broadcast."""
    from mister_spark.operators.extras47 import _copurchase_edges

    e = _copurchase_edges(spark, sf_dir)
    sym = e.select(
        F.col("p1").alias("u"), F.col("p2").alias("v"), "w"
    ).unionByName(
        e.select(F.col("p2").alias("u"), F.col("p1").alias("v"), "w")
    )
    wnd = W.partitionBy("u").orderBy(F.col("w").desc(), "v")
    topk = (
        sym.withColumn("rk", F.row_number().over(wnd))
        .filter(F.col("rk") <= REC_K)
        .select("u", "v")
        .localCheckpoint()
    )
    part = cat(spark, sf_dir)["part"]
    n_cat = part.count()
    div = (
        topk.join(
            F.broadcast(
                part.select(
                    F.col("p_partkey").alias("v"), F.col("p_brand")
                )
            ),
            "v",
        )
        .groupBy("u")
        .agg(
            (
                F.countDistinct("p_brand").cast("double")
                / F.count(F.lit(1))
            ).alias("brand_div")
        )
    )
    sources = topk.select("u").distinct().count()
    rec_items = topk.select("v").distinct().count()
    mean_div = div.agg(F.avg("brand_div")).collect()[0][0]
    row = (
        int(sources),
        int(rec_items),
        round(rec_items / n_cat, 4),
        round(float(mean_div), 4),
    )
    return spark.createDataFrame(
        [row],
        "sources long, recommended_items long, catalog_coverage double, "
        "mean_brand_diversity double",
    )


ml_recsys_coverage.__doc__ = ml_recsys_coverage.__doc__.format(k=REC_K)


@query(
    "ev_ab_duration_plan",
    oracle=f"""
    WITH base AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS dau_total,
                         CAST(COUNT(DISTINCT CAST(date_trunc('day', ts)
                                                  AS DATE)) AS DOUBLE)
                           AS days,
                         AVG(value) AS mu,
                         STDDEV_SAMP(value) AS sd
                  FROM events),
    grid AS (SELECT v.mde, base.dau_total / base.days AS dau,
                    base.mu, base.sd
             FROM (VALUES {", ".join(f"({m})" for m in AB_MDES)}) v(mde),
                  base),
    plan AS (SELECT mde, dau,
                    2 * ({AB_ALPHA_Z} + {AB_POWER_Z})
                      * ({AB_ALPHA_Z} + {AB_POWER_Z})
                      * (sd / (mu * mde)) * (sd / (mu * mde))
                      AS n_per_arm
             FROM grid)
    SELECT FLOOR(mde * 10000 + 0.5) / 10000 AS relative_mde,
           CAST(CEIL(n_per_arm) AS BIGINT) AS n_per_arm,
           CAST(CEIL(2 * n_per_arm / dau) AS BIGINT) AS days_needed
    FROM plan
    """,
)
def ev_ab_duration_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B duration planner: from measured daily active users and the
    value metric's coefficient of variation, the per-arm sample size
    n = 2(z_α/2+z_β)²·(CV/MDE)² and the DAYS a 50/50 split needs at
    each relative MDE — the honest 'a 1% effect takes HOW long?'
    table that reframes most experiment requests before they launch.

    Scale: one aggregate for traffic + metric moments; the MDE grid
    is a 3-row broadcast of closed-form arithmetic."""
    ev = cat(spark, sf_dir)["events"]
    base = ev.agg(
        F.countDistinct("user_id").cast("double").alias("dau_total"),
        F.countDistinct(F.date_trunc("day", "ts").cast("date"))
        .cast("double")
        .alias("days"),
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sd"),
    )
    grid = spark.createDataFrame([(m,) for m in AB_MDES], "mde double")
    j = grid.crossJoin(F.broadcast(base)).withColumn(
        "dau", F.col("dau_total") / F.col("days")
    )
    z2 = (AB_ALPHA_Z + AB_POWER_Z) ** 2
    n_per_arm = (
        2
        * z2
        * (F.col("sd") / (F.col("mu") * F.col("mde")))
        * (F.col("sd") / (F.col("mu") * F.col("mde")))
    )
    return j.select(
        ratio(F.col("mde")).alias("relative_mde"),
        F.ceil(n_per_arm).cast("bigint").alias("n_per_arm"),
        F.ceil(2 * n_per_arm / F.col("dau"))
        .cast("bigint")
        .alias("days_needed"),
    )


@query(
    "graph_edge_turnover",
    oracle=f"""
    WITH li AS (SELECT l.l_orderkey, l.l_partkey, o.o_orderdate AS d
                FROM lineitem l JOIN orders o
                  ON l.l_orderkey = o.o_orderkey),
    mk AS (SELECT l_orderkey, l_partkey,
                  CASE WHEN d < TIMESTAMP '{SPLIT_DATE}' THEN 0 ELSE 1 END
                    AS half
           FROM li),
    raw AS (SELECT DISTINCT half, l_orderkey, l_partkey FROM mk),
    e AS (SELECT x.half AS half, x.l_partkey AS p1, y.l_partkey AS p2
          FROM raw x JOIN raw y ON x.l_orderkey = y.l_orderkey
                              AND x.half = y.half
                              AND x.l_partkey < y.l_partkey
          GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2),
    a AS (SELECT p1, p2 FROM e WHERE half = 0),
    b AS (SELECT p1, p2 FROM e WHERE half = 1),
    x AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM a) AS na,
                 (SELECT CAST(COUNT(*) AS DOUBLE) FROM b) AS nb,
                 (SELECT CAST(COUNT(*) AS DOUBLE)
                  FROM a JOIN b ON a.p1 = b.p1 AND a.p2 = b.p2) AS nboth)
    SELECT CAST(na AS BIGINT) AS edges_before,
           CAST(nb AS BIGINT) AS edges_after,
           CAST(nboth AS BIGINT) AS edges_both,
           FLOOR(nboth / NULLIF(na + nb - nboth, 0) * 10000 + 0.5) / 10000
             AS jaccard
    FROM x
    """,
)
def graph_edge_turnover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relationship churn: co-purchase edges (support ≥ 2 within each
    half) before vs after the {s} split, with their Jaccard — product
    RELATIONSHIPS churn much faster than the product set itself
    (compare ev_catalog_turnover), which is why co-purchase models
    need fresher retraining than demand models.

    Scale: the per-half pair mining is the capped basket join keyed
    on (half, orderkey); the set algebra is three counts."""
    li = cat(spark, sf_dir)["lineitem"]
    orders = cat(spark, sf_dir)["orders"]
    split = F.lit(SPLIT_DATE).cast("timestamp")
    mk = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == orders.o_orderkey,
        )
        .select(
            "l_orderkey",
            "l_partkey",
            F.when(F.col("o_orderdate") < split, 0).otherwise(1).alias(
                "half"
            ),
        )
        .distinct()
    )
    x = mk.select(
        "half", F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1")
    )
    y = mk.select(
        "half", F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2")
    )
    e = (
        x.join(y, ["half", "o"])
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("half", "p1", "p2")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .localCheckpoint()
    )
    a = e.filter(F.col("half") == 0).select("p1", "p2")
    b = e.filter(F.col("half") == 1).select("p1", "p2")
    na = a.count()
    nb = b.count()
    nboth = a.join(b, ["p1", "p2"]).count()
    denom = na + nb - nboth
    row = (
        int(na),
        int(nb),
        int(nboth),
        round(nboth / denom, 4) if denom else 0.0,
    )
    return spark.createDataFrame(
        [row],
        "edges_before long, edges_after long, edges_both long, "
        "jaccard double",
    )


graph_edge_turnover.__doc__ = graph_edge_turnover.__doc__.format(
    s=SPLIT_DATE
)
