"""Wave 225: kernel two-sample testing and normal-scores ANOVA.

stat_mmd_rbf is the Maximum Mean Discrepancy between the two
embedding label groups with an RBF kernel at the median-heuristic
bandwidth — the kernel-standard distribution-shift statistic
(MMD = 0 iff the distributions agree, for a characteristic kernel).
It complements wave-186's stat_energy_distance: energy distance IS
MMD under a (negative) distance kernel; the RBF version weights
LOCAL structure, so tight cluster displacements that barely move
mean distances still register. stat_van_der_waerden converts the
K-sample location question to NORMAL SCORES: midranks -> quantiles
-> inverse-normal (the shared Acklam closed form, identical decimal
literals in both engines) and an ANOVA on those scores — as robust
as Kruskal-Wallis to outliers but asymptotically as POWERFUL as
classical ANOVA when the data really are normal; the
best-of-both-worlds test the rank family usually leaves on the
table.

Exactness: the MMD sample caps, pairwise squared distances and the
exact order-statistic median bandwidth follow the energy-distance
contract; normal scores are computed per grid CELL from integer
midranks through the shared polynomial, so both engines transform
identical operands.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.special import (
    norm_ppf,
    norm_ppf_sql,
    normal_sf,
    normal_sf_sql,
)
from mister_spark.operators.common import cat, rnd
from mister_spark.operators.extras186 import ENERGY_CAP
from mister_spark.registry import query

VDW_BUCKET = 500  # totalprice grid step

_D2 = (
    "list_aggregate(list_transform(range(1, 65),"
    " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), 'sum')"
)


@query(
    "stat_mmd_rbf",
    # Real oracle: md5-ordered caps and pairwise squared distances
    # follow the energy-distance contract (bit-identical folds); the
    # bandwidth is an exact order statistic of the cross-pair
    # distances with full tiebreaks, and only final summation order
    # differs — absorbed by the grids.
    oracle=f"""
    WITH lab AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                        CASE WHEN label < 5 THEN 1 ELSE 0 END AS grp,
                        md5(CAST(vec_id AS VARCHAR)) AS h
                 FROM embeddings),
    s1 AS (SELECT vec_id, v FROM lab WHERE grp = 1
           ORDER BY h, vec_id LIMIT {ENERGY_CAP}),
    s2 AS (SELECT vec_id, v FROM lab WHERE grp = 0
           ORDER BY h, vec_id LIMIT {ENERGY_CAP}),
    nn AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM s1) AS n1,
                  (SELECT CAST(COUNT(*) AS DOUBLE) FROM s2) AS n2),
    dxy AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
                   {_D2.format(a="a.v", b="b.v")} AS d2
            FROM s1 a, s2 b),
    med AS (SELECT d2 AS s2m FROM (
              SELECT d2, ROW_NUMBER() OVER (ORDER BY d2, ia, ib) AS rk
              FROM dxy), nn
            WHERE rk = CAST(FLOOR((nn.n1 * nn.n2 + 1) / 2) AS BIGINT)),
    bw AS (SELECT GREATEST(s2m, 1e-12) AS s2m FROM med),
    kxy AS (SELECT SUM(EXP(-d2 / (2 * bw.s2m))) AS s FROM dxy, bw),
    kxx AS (SELECT COALESCE(SUM(EXP(-{_D2.format(a="a.v", b="b.v")}
                     / (2 * bw.s2m))), 0.0) AS s
            FROM s1 a, s1 b, bw),
    kyy AS (SELECT COALESCE(SUM(EXP(-{_D2.format(a="a.v", b="b.v")}
                     / (2 * bw.s2m))), 0.0) AS s
            FROM s2 a, s2 b, bw)
    SELECT CAST(nn.n1 AS BIGINT) AS n1, CAST(nn.n2 AS BIGINT) AS n2,
           FLOOR(bw.s2m * 1e4 + 0.5) / 1e4 AS sigma2,
           FLOOR(kxx.s / (nn.n1 * nn.n1) * 1e6 + 0.5) / 1e6
             AS mean_k_within_1,
           FLOOR(kyy.s / (nn.n2 * nn.n2) * 1e6 + 0.5) / 1e6
             AS mean_k_within_2,
           FLOOR(kxy.s / (nn.n1 * nn.n2) * 1e6 + 0.5) / 1e6
             AS mean_k_cross,
           FLOOR((kxx.s / (nn.n1 * nn.n1) + kyy.s / (nn.n2 * nn.n2)
                  - 2 * kxy.s / (nn.n1 * nn.n2)) * 1e6 + 0.5) / 1e6
             AS mmd2
    FROM nn, bw, kxx, kyy, kxy
    """,
)
def stat_mmd_rbf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RBF-kernel Maximum Mean Discrepancy between embedding label
    groups (label < 5 vs rest): bandwidth = the exact median of
    cross-pair squared distances (the median heuristic), kernel
    means within/within/cross, mmd2 = their V-statistic combination
    (zero iff the groups share a distribution). The energy distance
    of wave 186 under a distance kernel; the RBF version is the one
    drift monitors standardize on because local displacements
    register even when global mean distances barely move.

    Scale: the same {cap}-row md5-capped samples as energy distance
    bound every pair join at O(cap^2) regardless of corpus size;
    kernels are JVM fold expressions, no Python."""
    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        F.when(F.col("label") < 5, 1).otherwise(0).alias("grp"),
        F.md5(F.col("vec_id").cast("string")).alias("h"),
    )

    def cap(grp: int) -> DataFrame:
        return (
            emb.filter(F.col("grp") == grp)
            .orderBy("h", "vec_id")
            .limit(ENERGY_CAP)
            .select("vec_id", "v")
            .localCheckpoint()
        )

    s1, s2 = cap(1), cap(0)
    n1, n2 = s1.count(), s2.count()
    d2 = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dxy = (
        s1.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
        .crossJoin(
            F.broadcast(
                s2.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
            )
        )
        .select("ia", "ib", d2.alias("d2"))
        .localCheckpoint()  # cap^2 cross pairs; feeds median + kernel
    )
    med = (
        dxy.select(
            "d2", F.row_number().over(W.orderBy("d2", "ia", "ib")).alias("rk")
        )
        .filter(F.col("rk") == (n1 * n2 + 1) // 2)
        .collect()[0]["d2"]
    )
    s2m = max(float(med), 1e-12)

    def ksum(a: DataFrame, b: DataFrame) -> float:
        out = (
            a.select(F.col("v").alias("va"))
            .crossJoin(F.broadcast(b.select(F.col("v").alias("vb"))))
            .agg(F.sum(F.exp(-d2 / (2 * s2m))))
            .collect()[0][0]
        )
        return float(out or 0.0)

    kxy = dxy.agg(F.sum(F.exp(-F.col("d2") / (2 * s2m)))).collect()[0][0]
    kxx = ksum(s1, s1)
    kyy = ksum(s2, s2)
    m11 = kxx / (n1 * n1)
    m22 = kyy / (n2 * n2)
    m12 = float(kxy) / (n1 * n2)
    g4 = lambda x: math.floor(x * 1e4 + 0.5) / 1e4  # noqa: E731
    g6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    return spark.createDataFrame(
        [
            (
                n1, n2, g4(s2m), g6(m11), g6(m22), g6(m12),
                g6(m11 + m22 - 2 * m12),
            )
        ],
        "n1 bigint, n2 bigint, sigma2 double, mean_k_within_1 double, "
        "mean_k_within_2 double, mean_k_cross double, mmd2 double",
    )


stat_mmd_rbf.__doc__ = stat_mmd_rbf.__doc__.format(cap=ENERGY_CAP)


@query(
    "stat_van_der_waerden",
    # Real oracle: integer midranks on the shared $500 grid, the
    # shared Acklam inverse-normal polynomial (identical decimal
    # literals), and the chi-square/Wilson-Hilferty tail — both
    # engines transform identical operands.
    oracle=f"""
    WITH g AS (SELECT substr(o_orderpriority, 1, 1) AS g,
                      CAST(FLOOR(o_totalprice / {VDW_BUCKET}) AS BIGINT)
                        AS v,
                      CAST(COUNT(*) AS BIGINT) AS c
               FROM orders GROUP BY 1, 2),
    tv AS (SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM g GROUP BY 1),
    n AS (SELECT CAST(SUM(t) AS DOUBLE) AS n FROM tv),
    cum AS (SELECT v, t,
                   COALESCE(SUM(t) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS below
            FROM tv),
    sc AS (SELECT cum.v,
                  {norm_ppf_sql(
                      "(cum.below + (cum.t + 1) / 2.0) / (n.n + 1)"
                  )} AS s
           FROM cum, n),
    cells AS (SELECT g.g, g.c, sc.s FROM g JOIN sc ON sc.v = g.v),
    gj AS (SELECT g, CAST(SUM(c) AS DOUBLE) AS nj,
                  SUM(c * s) AS ssum
           FROM cells GROUP BY 1),
    tot AS (SELECT SUM(c * s * s) AS sq,
                   CAST(SUM(c) AS DOUBLE) AS nn,
                   CAST(COUNT(DISTINCT g) AS DOUBLE) AS k
            FROM cells),
    t1 AS (SELECT tot.nn, tot.k,
                  SUM(gj.nj * (gj.ssum / gj.nj) * (gj.ssum / gj.nj))
                  / (tot.sq / (tot.nn - 1)) AS t
           FROM gj, tot GROUP BY tot.nn, tot.k, tot.sq),
    z AS (SELECT t1.*,
                 (POWER(t / (k - 1), 1.0 / 3)
                  - (1 - 2.0 / (9 * (k - 1))))
                 / SQRT(2.0 / (9 * (k - 1))) AS zs
          FROM t1),
    gm AS (SELECT g, ssum / nj AS ms FROM gj),
    hi AS (SELECT g FROM gm
           ORDER BY FLOOR(ms * 1e4 + 0.5) DESC, g LIMIT 1),
    lo AS (SELECT g FROM gm
           ORDER BY FLOOR(ms * 1e4 + 0.5), g LIMIT 1)
    SELECT CAST(z.nn AS BIGINT) AS n_orders,
           CAST(z.k AS BIGINT) AS n_groups,
           FLOOR(z.t * 1e4 + 0.5) / 1e4 AS t_stat,
           FLOOR({normal_sf_sql("GREATEST(z.zs, -8.0)")} * 1e6 + 0.5)
             / 1e6 AS p_value,
           (SELECT g FROM hi) AS highest_group,
           (SELECT g FROM lo) AS lowest_group
    FROM z
    """,
)
def stat_van_der_waerden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Van der Waerden normal-scores test across the five priority
    classes on the $500 value grid: midranks become quantiles
    r/(n+1), quantiles become standard-normal scores via the shared
    Acklam inverse CDF, and T = sum n_j (mean score_j)^2 / s^2 is
    chi-square(k-1) under H0 (Wilson-Hilferty tail). Rank-robust
    like Kruskal-Wallis but with ANOVA's full asymptotic efficiency
    when the data are actually normal — the strictly-better default
    the rank family rarely ships. Names the highest- and
    lowest-scoring groups.

    Scale: ONE grid-collapse aggregation; midranks and scores live
    on the bounded cell frame (cumulative windows = the documented
    model-sized carry), everything else is closed-form algebra."""
    g = (
        cat(spark, sf_dir)["orders"]
        .select(
            F.substring("o_orderpriority", 1, 1).alias("g"),
            F.floor(F.col("o_totalprice") / VDW_BUCKET)
            .cast("bigint")
            .alias("v"),
        )
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()  # bounded grid
    )
    tv = g.groupBy("v").agg(F.sum("c").alias("t"))
    n = tv.agg(F.sum("t").cast("double").alias("n"))
    cum = tv.select(
        "v", "t",
        F.coalesce(
            F.sum("t").over(
                W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("below"),
    )
    sc = cum.crossJoin(F.broadcast(n)).select(
        "v",
        norm_ppf(
            (F.col("below") + (F.col("t") + 1) / 2.0) / (F.col("n") + 1)
        ).alias("s"),
    )
    cells = g.join(sc, "v").select("g", "c", "s").localCheckpoint()
    gj = cells.groupBy("g").agg(
        F.sum("c").cast("double").alias("nj"),
        F.sum(F.col("c") * F.col("s")).alias("ssum"),
    ).localCheckpoint()
    tot = cells.agg(
        F.sum(F.col("c") * F.col("s") * F.col("s")).alias("sq"),
        F.sum("c").cast("double").alias("nn"),
        F.countDistinct("g").cast("double").alias("k"),
    )
    t1 = (
        gj.crossJoin(F.broadcast(tot))
        .agg(
            F.first("nn").alias("nn"), F.first("k").alias("k"),
            (
                F.sum(
                    F.col("nj")
                    * (F.col("ssum") / F.col("nj"))
                    * (F.col("ssum") / F.col("nj"))
                )
                / (F.first("sq") / (F.first("nn") - 1))
            ).alias("t"),
        )
    )
    km1 = F.col("k") - 1
    zs = (
        F.pow(F.col("t") / km1, 1.0 / 3) - (1 - 2.0 / (9 * km1))
    ) / F.sqrt(2.0 / (9 * km1))
    gm = gj.select("g", (F.col("ssum") / F.col("nj")).alias("ms"))
    hi = (
        gm.orderBy(F.floor(F.col("ms") * 1e4 + 0.5).desc(), "g")
        .limit(1)
        .select(F.col("g").alias("highest_group"))
    )
    lo = (
        gm.orderBy(F.floor(F.col("ms") * 1e4 + 0.5), "g")
        .limit(1)
        .select(F.col("g").alias("lowest_group"))
    )
    return (
        t1.crossJoin(F.broadcast(hi))
        .crossJoin(F.broadcast(lo))
        .select(
            F.col("nn").cast("bigint").alias("n_orders"),
            F.col("k").cast("bigint").alias("n_groups"),
            rnd(F.col("t"), 4).alias("t_stat"),
            rnd(normal_sf(F.greatest(zs, F.lit(-8.0))), 6).alias("p_value"),
            "highest_group", "lowest_group",
        )
    )
