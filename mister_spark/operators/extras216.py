"""Wave 216: heteroscedastic rank testing and cluster validity.

stat_brunner_munzel is the Brunner-Munzel test between urgent and
low-priority order values on the shared $500 value grid:
stat_mannwhitney assumes the two distributions differ only by shift
(equal variances under H0); Brunner-Munzel estimates the stochastic
superiority P(X < Y) + P(X = Y)/2 directly and studentizes it with
PER-GROUP placement variances, staying valid when spread differs
between groups — the rank-test analogue of Welch vs Student.
ml_cluster_validity scores a given partition (order-priority classes
in (value, date) feature space) with the two standard internal
indices: Calinski-Harabasz (between/within variance ratio — higher
is better) and Davies-Bouldin (worst-pair compactness/separation —
lower is better), naming the most confusable cluster pair. The
numbers that say whether a segmentation is geometry or labels.

Exactness: midranks and placements are integer-derived on the
bounded value grid; both validity indices are closed forms over
per-cluster sufficient sums and the k x k centroid grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

BM_BUCKET = 500  # totalprice grid step
BM_A = "1"  # priority digit of group A (urgent)
BM_B = "5"  # priority digit of group B (low)


@query(
    "stat_brunner_munzel",
    # Real oracle: cell counts, cumulative counts, midranks and
    # placements are exact integer-derived values on the shared $500
    # grid; W, the Satterthwaite df and the normal tail evaluate the
    # same closed forms (p_value is the documented large-sample
    # normal approximation of the BM t).
    oracle=f"""
    WITH g AS (SELECT substr(o_orderpriority, 1, 1) AS g,
                      CAST(FLOOR(o_totalprice / {BM_BUCKET}) AS BIGINT) AS v,
                      CAST(COUNT(*) AS BIGINT) AS c
               FROM orders
               WHERE substr(o_orderpriority, 1, 1) IN ('{BM_A}', '{BM_B}')
               GROUP BY 1, 2),
    tv AS (SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM g GROUP BY 1),
    cumall AS (SELECT v, t,
                      COALESCE(SUM(t) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS below
               FROM tv),
    cumg AS (SELECT g, v, c,
                    COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0) AS below_g
             FROM g),
    cells AS (SELECT cg.g, cg.v, cg.c,
                     ca.below + (ca.t + 1) / 2.0 AS r_all,
                     cg.below_g + (cg.c + 1) / 2.0 AS r_in
              FROM cumg cg JOIN cumall ca ON ca.v = cg.v),
    n AS (SELECT g, CAST(SUM(c) AS DOUBLE) AS n FROM g GROUP BY 1),
    s AS (SELECT c1.g, n.n,
                 SUM(c1.c * c1.r_all) / n.n AS rbar,
                 SUM(c1.c * (c1.r_all - c1.r_in)) / n.n AS pbar,
                 SUM(c1.c * (c1.r_all - c1.r_in) * (c1.r_all - c1.r_in))
                   AS psq
          FROM cells c1 JOIN n ON n.g = c1.g
          GROUP BY c1.g, n.n),
    s2 AS (SELECT g, n, rbar,
                  (psq - n * pbar * pbar) / (n - 1) AS sg2
           FROM s),
    x AS (SELECT a.n AS na, b.n AS nb, a.rbar AS ra, b.rbar AS rb,
                 a.sg2 AS sa2, b.sg2 AS sb2
          FROM s2 a, s2 b WHERE a.g = '{BM_A}' AND b.g = '{BM_B}'),
    y AS (SELECT x.*,
                 (rb - (nb + 1) / 2.0) / na AS p_hat,
                 -- zero placement variance = perfect separation:
                 -- sentinel W (sign of the rank gap), additive dof
                 CASE WHEN na * sa2 + nb * sb2 <= 0 THEN
                        CASE WHEN rb > ra THEN 1e6
                             WHEN rb < ra THEN -1e6 ELSE 0.0 END
                      ELSE na * nb * (rb - ra) / (na + nb)
                           / SQRT(na * sa2 + nb * sb2) END AS w,
                 CASE WHEN na * sa2 + nb * sb2 <= 0 THEN na + nb - 2
                      ELSE (na * sa2 + nb * sb2) * (na * sa2 + nb * sb2)
                           / ((na * sa2) * (na * sa2) / (na - 1)
                              + (nb * sb2) * (nb * sb2) / (nb - 1)) END
                   AS dof
          FROM x)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           FLOOR(p_hat * 1e4 + 0.5) / 1e4 AS p_hat,
           FLOOR(w * 1e4 + 0.5) / 1e4 AS w_stat,
           FLOOR(dof * 100 + 0.5) / 100 AS dof,
           FLOOR(2 * {normal_sf_sql("ABS(w)")} * 1e6 + 0.5) / 1e6
             AS p_value
    FROM y
    """,
)
def stat_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel stochastic-superiority test between urgent
    (priority {a}) and low-priority ({b}) order values on the $500
    grid: p_hat estimates P(A < B) + ties/2 from combined midranks,
    and W studentizes it with per-group PLACEMENT variances (overall
    midrank minus within-group midrank), so unequal spread between
    the groups — fatal to Mann-Whitney's variance under H0 — leaves
    the level intact. Satterthwaite dof reported; p_value is the
    large-sample normal tail (n in the thousands here).

    Scale: ONE grid-collapse aggregation, cumulative-count windows on
    the bounded cell frame (the documented model-sized carry), and
    1-row closed-form algebra. The textbook O(n log n) rank sort
    never happens — ranks come from cell cumulatives."""
    g = (
        cat(spark, sf_dir)["orders"]
        .select(
            F.substring("o_orderpriority", 1, 1).alias("g"),
            F.floor(F.col("o_totalprice") / BM_BUCKET)
            .cast("bigint")
            .alias("v"),
        )
        .filter(F.col("g").isin(BM_A, BM_B))
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()  # bounded grid; feeds cumulatives + sizes
    )
    tv = g.groupBy("v").agg(F.sum("c").alias("t"))
    cumall = tv.select(
        "v", "t",
        F.coalesce(
            F.sum("t").over(
                W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("below"),
    )
    cumg = g.select(
        "g", "v", "c",
        F.coalesce(
            F.sum("c").over(
                W.partitionBy("g")
                .orderBy("v")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("below_g"),
    )
    cells = cumg.join(cumall, "v").select(
        "g", "c",
        (F.col("below") + (F.col("t") + 1) / 2.0).alias("r_all"),
        (F.col("below_g") + (F.col("c") + 1) / 2.0).alias("r_in"),
    )
    n = g.groupBy("g").agg(F.sum("c").cast("double").alias("n"))
    p = F.col("r_all") - F.col("r_in")
    s = (
        cells.join(F.broadcast(n), "g")
        .groupBy("g", "n")
        .agg(
            (F.sum(F.col("c") * F.col("r_all")) / F.first("n")).alias("rbar"),
            (F.sum(F.col("c") * p) / F.first("n")).alias("pbar"),
            F.sum(F.col("c") * p * p).alias("psq"),
        )
        .select(
            "g", "n", "rbar",
            (
                (F.col("psq") - F.col("n") * F.col("pbar") * F.col("pbar"))
                / (F.col("n") - 1)
            ).alias("sg2"),
        )
    )
    a = s.filter(F.col("g") == BM_A).select(
        F.col("n").alias("na"), F.col("rbar").alias("ra"),
        F.col("sg2").alias("sa2"),
    )
    b = s.filter(F.col("g") == BM_B).select(
        F.col("n").alias("nb"), F.col("rbar").alias("rb"),
        F.col("sg2").alias("sb2"),
    )
    x = a.join(F.broadcast(b))
    num = F.col("na") * F.col("sa2") + F.col("nb") * F.col("sb2")
    # zero placement variance = perfect separation: sentinel W
    w = F.when(
        num <= 0,
        F.when(F.col("rb") > F.col("ra"), F.lit(1e6))
        .when(F.col("rb") < F.col("ra"), F.lit(-1e6))
        .otherwise(F.lit(0.0)),
    ).otherwise(
        F.col("na") * F.col("nb") * (F.col("rb") - F.col("ra"))
        / (F.col("na") + F.col("nb"))
        / F.sqrt(num)
    )
    dof = F.when(num <= 0, F.col("na") + F.col("nb") - 2).otherwise(
        (num * num)
        / (
            (F.col("na") * F.col("sa2")) * (F.col("na") * F.col("sa2"))
            / (F.col("na") - 1)
            + (F.col("nb") * F.col("sb2")) * (F.col("nb") * F.col("sb2"))
            / (F.col("nb") - 1)
        )
    )
    return x.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        rnd((F.col("rb") - (F.col("nb") + 1) / 2.0) / F.col("na"), 4).alias(
            "p_hat"
        ),
        rnd(w, 4).alias("w_stat"),
        rnd(dof, 2).alias("dof"),
        rnd(2 * normal_sf(F.abs(w)), 6).alias("p_value"),
    )


stat_brunner_munzel.__doc__ = stat_brunner_munzel.__doc__.format(
    a=BM_A, b=BM_B
)


@query(
    "ml_cluster_validity",
    # Real oracle: per-cluster sufficient sums on shared standardized
    # features, CH and DB as closed forms, and the worst pair picked
    # on the ROUNDED ratio with a label tiebreak.
    oracle=f"""
    WITH f0 AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS k,
                       CAST(o_totalprice AS DOUBLE) AS a,
                       CAST(date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS DOUBLE) AS b
                FROM orders),
    st AS (SELECT AVG(a) AS ma, STDDEV_SAMP(a) AS sa,
                  AVG(b) AS mb, STDDEV_SAMP(b) AS sb,
                  CAST(COUNT(*) AS DOUBLE) AS n
           FROM f0),
    f AS (SELECT k, (a - st.ma) / st.sa AS x, (b - st.mb) / st.sb AS y
          FROM f0, st),
    c AS (SELECT k, CAST(COUNT(*) AS DOUBLE) AS nk,
                 AVG(x) AS cx, AVG(y) AS cy,
                 SUM(x * x) AS xx, SUM(y * y) AS yy
          FROM f GROUP BY 1),
    w AS (SELECT k, nk, cx, cy,
                 (xx - nk * cx * cx) + (yy - nk * cy * cy) AS wss
          FROM c),
    gtot AS (SELECT SUM(nk) AS n, SUM(nk * cx) / SUM(nk) AS gx,
                    SUM(nk * cy) / SUM(nk) AS gy,
                    CAST(COUNT(*) AS DOUBLE) AS kk,
                    SUM(wss) AS wtot
             FROM w),
    bss AS (SELECT SUM(nk * ((cx - g.gx) * (cx - g.gx)
                             + (cy - g.gy) * (cy - g.gy))) AS b
            FROM w, gtot g),
    pair AS (SELECT i.k AS ka, j.k AS kb,
                    (SQRT(i.wss / i.nk) + SQRT(j.wss / j.nk))
                    / SQRT((i.cx - j.cx) * (i.cx - j.cx)
                           + (i.cy - j.cy) * (i.cy - j.cy)) AS ratio
             FROM w i JOIN w j ON j.k <> i.k),
    db AS (SELECT ka, MAX(ratio) AS mx FROM pair GROUP BY 1),
    worst AS (SELECT ka, kb FROM pair
              ORDER BY FLOOR(ratio * 1e4 + 0.5) DESC, ka, kb LIMIT 1)
    SELECT CAST(g.n AS BIGINT) AS n_points, CAST(g.kk AS BIGINT) AS k,
           FLOOR((b.b / (g.kk - 1)) / (g.wtot / (g.n - g.kk)) * 1e4
                 + 0.5) / 1e4 AS calinski_harabasz,
           FLOOR((SELECT AVG(mx) FROM db) * 1e4 + 0.5) / 1e4
             AS davies_bouldin,
           (SELECT ka FROM worst) AS worst_pair_a,
           (SELECT kb FROM worst) AS worst_pair_b
    FROM gtot g, bss b
    """,
)
def ml_cluster_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Internal cluster-validity indices for the order-priority
    partition in standardized (value, order-date) space: Calinski-
    Harabasz = (B/(k-1))/(W/(n-k)) rewards tight, well-separated
    clusters with an F-like ratio; Davies-Bouldin averages each
    cluster's worst (s_i + s_j)/d_ij confusion and names that worst
    pair. ml_silhouette prices every point; these two price the
    PARTITION — the cheap first question ("is this segmentation
    geometry or labels?") before any per-point diagnostics.

    Scale: one standardization pass + one per-cluster sufficient-sums
    pass (both map-side combinable); everything downstream lives on
    the k-bounded centroid grid."""
    f0 = cat(spark, sf_dir)["orders"].select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("k"),
        F.col("o_totalprice").cast("double").alias("a"),
        F.datediff(F.date_trunc("day", "o_orderdate"), F.lit("1970-01-01"))
        .cast("double")
        .alias("b"),
    )
    st = f0.agg(
        F.avg("a").alias("ma"), F.stddev_samp("a").alias("sa"),
        F.avg("b").alias("mb"), F.stddev_samp("b").alias("sb"),
    )
    f = f0.crossJoin(F.broadcast(st)).select(
        "k",
        ((F.col("a") - F.col("ma")) / F.col("sa")).alias("x"),
        ((F.col("b") - F.col("mb")) / F.col("sb")).alias("y"),
    )
    c = f.groupBy("k").agg(
        F.count(F.lit(1)).cast("double").alias("nk"),
        F.avg("x").alias("cx"), F.avg("y").alias("cy"),
        F.sum(F.col("x") * F.col("x")).alias("xx"),
        F.sum(F.col("y") * F.col("y")).alias("yy"),
    )
    w = c.select(
        "k", "nk", "cx", "cy",
        (
            (F.col("xx") - F.col("nk") * F.col("cx") * F.col("cx"))
            + (F.col("yy") - F.col("nk") * F.col("cy") * F.col("cy"))
        ).alias("wss"),
    ).localCheckpoint()  # k-bounded; feeds globals + pair grid
    glob = w.agg(
        F.sum("nk").alias("n"),
        (F.sum(F.col("nk") * F.col("cx")) / F.sum("nk")).alias("gx"),
        (F.sum(F.col("nk") * F.col("cy")) / F.sum("nk")).alias("gy"),
        F.count(F.lit(1)).cast("double").alias("kk"),
        F.sum("wss").alias("wtot"),
    )
    bss = (
        w.crossJoin(F.broadcast(glob))
        .agg(
            F.sum(
                F.col("nk")
                * (
                    (F.col("cx") - F.col("gx")) * (F.col("cx") - F.col("gx"))
                    + (F.col("cy") - F.col("gy")) * (F.col("cy") - F.col("gy"))
                )
            ).alias("b")
        )
    )
    i, j = w.alias("i"), w.alias("j")
    ratio = (
        F.sqrt(F.col("i.wss") / F.col("i.nk"))
        + F.sqrt(F.col("j.wss") / F.col("j.nk"))
    ) / F.sqrt(
        (F.col("i.cx") - F.col("j.cx")) * (F.col("i.cx") - F.col("j.cx"))
        + (F.col("i.cy") - F.col("j.cy")) * (F.col("i.cy") - F.col("j.cy"))
    )
    pair = (
        i.join(F.broadcast(j), F.col("j.k") != F.col("i.k"))
        .select(
            F.col("i.k").alias("ka"), F.col("j.k").alias("kb"),
            ratio.alias("ratio"),
        )
        .localCheckpoint()  # k(k-1) rows; feeds DB avg + worst pick
    )
    db = pair.groupBy("ka").agg(F.max("ratio").alias("mx")).agg(
        F.avg("mx").alias("db")
    )
    worst = (
        pair.orderBy(F.floor(F.col("ratio") * 1e4 + 0.5).desc(), "ka", "kb")
        .limit(1)
        .select(
            F.col("ka").alias("worst_pair_a"), F.col("kb").alias("worst_pair_b")
        )
    )
    return (
        glob.crossJoin(F.broadcast(bss))
        .crossJoin(F.broadcast(db))
        .crossJoin(F.broadcast(worst))
        .select(
            F.col("n").cast("bigint").alias("n_points"),
            F.col("kk").cast("bigint").alias("k"),
            rnd(
                (F.col("b") / (F.col("kk") - 1))
                / (F.col("wtot") / (F.col("n") - F.col("kk"))),
                4,
            ).alias("calinski_harabasz"),
            rnd(F.col("db"), 4).alias("davies_bouldin"),
            "worst_pair_a", "worst_pair_b",
        )
    )
