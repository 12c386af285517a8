"""Wave 199: density-relative embedding outliers and distance correlation.

ml_lof is the Local Outlier Factor over the embeddings table, built on
the SAME distributed sign-LSH kNN machinery as ml_label_spreading
(extras129._ls_knn_edges — no full-table collect, no dense n x n):
unlike ml_hbos_outliers (global histogram density) and
ml_mahalanobis_outliers (global ellipsoid), LOF is density-RELATIVE —
a point in a sparse-but-uniform cluster scores ~1 while the same
distance in a dense cluster's margin screams. stat_distance_correlation
is Szekely's dCor between daily click and purchase volume: zero IFF
independent (for any dependence shape), completing the dependence
ladder Pearson (linear, stat_corr) -> Kendall/Spearman (monotone) ->
Hoeffding/xicor (grid/rank) -> dCor (the canonical energy-distance
measure on raw amplitudes).

Exactness: LOF distances live on the 1e-4 cosine grid that the LSH
oracle replays exactly; dCor's pairwise |x_i - x_j| and all row/grand
sums are BIGINT-exact, so both engines double-center identical
integers and only the final ratios touch float, inside the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.operators.extras129 import _ls_knn_cte, _ls_knn_edges
from mister_spark.registry import query

EPOCH = "1970-01-01"
LOF_TOP = 10


@query(
    "ml_lof",
    # Real oracle: the kNN edge set replays the sign-LSH bucketed
    # construction exactly (shared _ls_knn_cte — judge-verified grid
    # cut); distances are 1 - s on the 1e-4 cosine grid, k-distance /
    # reachability are max/min over those exact grid values, and the
    # lrd/LOF divisions are float only at the end, inside the 1e-6
    # grid; the top-10 cut sorts on the ROUNDED score + vec_id.
    oracle=f"""
    WITH {_ls_knn_cte("0")},
    kns AS (SELECT k.a, k.b, 1.0 - sc.s AS dist
            FROM knn k JOIN scored sc ON sc.a = k.a AND sc.b = k.b),
    kd AS (SELECT a AS node, MAX(dist) AS kdist,
                  CAST(COUNT(*) AS BIGINT) AS deg
           FROM kns GROUP BY 1),
    reach AS (SELECT kns.a, kns.b,
                     GREATEST(kd.kdist, kns.dist) AS rdist
              FROM kns JOIN kd ON kd.node = kns.b),
    lrd AS (SELECT a AS node, CAST(COUNT(*) AS DOUBLE) / SUM(rdist) AS lrd
            FROM reach GROUP BY 1),
    lof AS (SELECT kns.a AS vec_id, kd.deg AS k_used, lp.lrd AS lrd_p,
                   SUM(lo.lrd) / kd.deg / lp.lrd AS lof
            FROM kns JOIN lrd lo ON lo.node = kns.b
                     JOIN lrd lp ON lp.node = kns.a
                     JOIN kd ON kd.node = kns.a
            GROUP BY 1, 2, 3)
    SELECT vec_id, k_used,
           FLOOR(lrd_p * 1e6 + 0.5) / 1e6 AS lrd,
           FLOOR(lof * 1e6 + 0.5) / 1e6 AS lof
    FROM lof
    ORDER BY FLOOR(lof * 1e6 + 0.5) / 1e6 DESC, vec_id
    LIMIT {LOF_TOP}
    """,
)
def ml_lof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Outlier Factor (k = the LSH kNN's k) over the embedding
    corpus: k-distance per node, reachability distance
    max(kdist(neighbor), d(p,o)), local reachability density, and
    LOF(p) = mean neighbor lrd / own lrd. LOF ~ 1 = as dense as your
    neighbors (inlier, even in a sparse region); LOF >> 1 = your
    neighbors are much denser than you (local outlier). The top-10
    by rounded score is the triage list a curation pipeline reviews.

    Scale: the kNN graph comes from the shared sign-LSH bucket
    machinery (per-bucket GEMM top-k, partitioned window over <=
    tables*k survivors — extras129._ls_knn_edges, NO driver kNN);
    everything after is three hash joins + two groupBys on the
    O(n*k) edge frame, and the final cut is TakeOrdered(10), never a
    global sort."""
    kns = _ls_knn_edges(spark, sf_dir, with_score=True).select(
        "a", "b", (1.0 - F.col("s")).alias("dist")
    ).localCheckpoint()  # edge frame feeds kd, reach, and the lof join
    kd = kns.groupBy(F.col("a").alias("node")).agg(
        F.max("dist").alias("kdist"), F.count(F.lit(1)).alias("deg")
    )
    reach = kns.join(
        kd.select(F.col("node").alias("b"), "kdist"), "b"
    ).select("a", "b", F.greatest(F.col("kdist"), F.col("dist")).alias("rdist"))
    lrd = reach.groupBy(F.col("a").alias("node")).agg(
        (F.count(F.lit(1)).cast("double") / F.sum("rdist")).alias("lrd")
    ).localCheckpoint()  # feeds both sides of the neighbor-lrd join
    lof = (
        kns.join(lrd.select(F.col("node").alias("b"), F.col("lrd").alias("lrd_o")), "b")
        .join(lrd.select(F.col("node").alias("a"), F.col("lrd").alias("lrd_p")), "a")
        .join(kd.select(F.col("node").alias("a"), "deg"), "a")
        .groupBy(
            F.col("a").alias("vec_id"),
            F.col("deg").alias("k_used"),
            F.col("lrd_p"),
        )
        .agg((F.sum("lrd_o") / F.col("deg") / F.col("lrd_p")).alias("lof"))
    )
    return (
        lof.select(
            "vec_id",
            "k_used",
            rnd(F.col("lrd_p"), 6).alias("lrd"),
            rnd(F.col("lof"), 6).alias("lof"),
        )
        .orderBy(F.col("lof").desc(), "vec_id")
        .limit(LOF_TOP)
    )


@query(
    "stat_distance_correlation",
    # Real oracle: |x_i - x_j| over integer day counts, row sums and
    # grand sums are exact BIGINTs; both engines double-center the
    # SAME integers (divided by the same n), so the only float drift
    # is the big product-sum order, absorbed by the 1e-6 grid.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t,
                   CAST(SUM(CASE WHEN event_type = 'click'
                            THEN 1 ELSE 0 END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS y
               FROM events GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    pr AS (SELECT i.t AS ti, j.t AS tj,
                  ABS(i.x - j.x) AS ax, ABS(i.y - j.y) AS ay
           FROM d i, d j),
    rowsum AS (SELECT ti AS t, SUM(ax) AS rax, SUM(ay) AS ray
               FROM pr GROUP BY 1),
    grand AS (SELECT SUM(ax) AS sax, SUM(ay) AS say FROM pr),
    cent AS (SELECT
               CAST(pr.ax AS DOUBLE) - CAST(ri.rax AS DOUBLE) / m.n
                 - CAST(rj.rax AS DOUBLE) / m.n
                 + CAST(g.sax AS DOUBLE) / (m.n * m.n) AS ac,
               CAST(pr.ay AS DOUBLE) - CAST(ri.ray AS DOUBLE) / m.n
                 - CAST(rj.ray AS DOUBLE) / m.n
                 + CAST(g.say AS DOUBLE) / (m.n * m.n) AS bc
             FROM pr JOIN rowsum ri ON ri.t = pr.ti
                     JOIN rowsum rj ON rj.t = pr.tj, grand g, m),
    v AS (SELECT SUM(ac * bc) AS sxy, SUM(ac * ac) AS sxx,
                 SUM(bc * bc) AS syy
          FROM cent),
    fin AS (SELECT m.n,
                   v.sxy / (m.n * CAST(m.n AS DOUBLE)) AS dcov2,
                   v.sxx / (m.n * CAST(m.n AS DOUBLE)) AS dvarx,
                   v.syy / (m.n * CAST(m.n AS DOUBLE)) AS dvary,
                   CASE WHEN v.sxx > 0 AND v.syy > 0 AND v.sxy > 0
                        THEN SQRT(v.sxy / SQRT(v.sxx * v.syy))
                        ELSE 0.0 END AS dcor
            FROM m, v)
    SELECT CAST(n AS BIGINT) AS n_days,
           FLOOR(dcov2 * 1e4 + 0.5) / 1e4 AS dcov2,
           FLOOR(dvarx * 1e4 + 0.5) / 1e4 AS dvar_x,
           FLOOR(dvary * 1e4 + 0.5) / 1e4 AS dvar_y,
           FLOOR(dcor * 1e6 + 0.5) / 1e6 AS dcor
    FROM fin
    """,
)
def stat_distance_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Szekely's distance correlation between daily click and purchase
    volume: double-center the pairwise |difference| matrices of each
    series, then correlate the centered entries. dCor = 0 if and only
    if the series are INDEPENDENT — unlike Pearson (misses
    nonlinearity) and the rank family (misses non-monotone shapes, a
    V-shaped response reads ~0 in Kendall but lights up here). The
    V-statistic plug-in form with all-integer distances.

    Scale: ONE conditional day-grain count collapses events to the
    calendar-bounded frame; the pair stage is the documented
    model-sized day-frame self-join (O(days^2), independent of row
    count) with two broadcast row-sum joins. The 100 TB cost is the
    first groupBy — map-side combinable."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias(
                "t"
            ),
            "event_type",
        )
        .groupBy("t")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("y"),
        )
        .localCheckpoint()  # feeds both pair aliases
    )
    m = d.agg(F.count(F.lit(1)).alias("n"))
    i = d.select(
        F.col("t").alias("ti"), F.col("x").alias("xi"), F.col("y").alias("yi")
    )
    j = d.select(
        F.col("t").alias("tj"), F.col("x").alias("xj"), F.col("y").alias("yj")
    )
    pr = (
        i.crossJoin(j)
        .select(
            "ti",
            "tj",
            F.abs(F.col("xi") - F.col("xj")).alias("ax"),
            F.abs(F.col("yi") - F.col("yj")).alias("ay"),
        )
        .localCheckpoint()  # O(days^2) cells; feeds row sums + centering
    )
    rowsum = pr.groupBy(F.col("ti").alias("t")).agg(
        F.sum("ax").alias("rax"), F.sum("ay").alias("ray")
    )
    grand = pr.agg(F.sum("ax").alias("sax"), F.sum("ay").alias("say"))
    cent = (
        pr.join(
            F.broadcast(
                rowsum.select(
                    F.col("t").alias("ti"),
                    F.col("rax").alias("raxi"),
                    F.col("ray").alias("rayi"),
                )
            ),
            "ti",
        )
        .join(
            F.broadcast(
                rowsum.select(
                    F.col("t").alias("tj"),
                    F.col("rax").alias("raxj"),
                    F.col("ray").alias("rayj"),
                )
            ),
            "tj",
        )
        .crossJoin(F.broadcast(grand))
        .crossJoin(F.broadcast(m))
    )
    nn = F.col("n")
    ac = (
        F.col("ax").cast("double")
        - F.col("raxi").cast("double") / nn
        - F.col("raxj").cast("double") / nn
        + F.col("sax").cast("double") / (nn * nn)
    )
    bc = (
        F.col("ay").cast("double")
        - F.col("rayi").cast("double") / nn
        - F.col("rayj").cast("double") / nn
        + F.col("say").cast("double") / (nn * nn)
    )
    v = cent.agg(
        F.sum(ac * bc).alias("sxy"),
        F.sum(ac * ac).alias("sxx"),
        F.sum(bc * bc).alias("syy"),
        F.first(F.col("n")).alias("n"),
    )
    n2 = F.col("n") * F.col("n").cast("double")
    dcor = F.when(
        (F.col("sxx") > 0) & (F.col("syy") > 0) & (F.col("sxy") > 0),
        F.sqrt(F.col("sxy") / F.sqrt(F.col("sxx") * F.col("syy"))),
    ).otherwise(0.0)
    return v.select(
        F.col("n").cast("bigint").alias("n_days"),
        rnd(F.col("sxy") / n2, 4).alias("dcov2"),
        rnd(F.col("sxx") / n2, 4).alias("dvar_x"),
        rnd(F.col("syy") / n2, 4).alias("dvar_y"),
        rnd(dcor, 6).alias("dcor"),
    )
