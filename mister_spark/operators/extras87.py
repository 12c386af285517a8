"""Wave 87: heavy-tail estimation, forecast-quality decomposition,
AUC uncertainty, and seeded graph relevance.

stat_pareto_hill fits the tail index of order values with the Hill
estimator on the top-k order statistics — the number that says
whether your revenue tail has finite variance; ml_brier_decomposition
splits the Brier score into Murphy's reliability − resolution +
uncertainty, separating 'badly calibrated' from 'uninformative';
ml_auc_delong_ci attaches the DeLong standard error and 95% CI to the
AUC — the difference between 'AUC 0.54' and 'AUC 0.54 ± 0.05';
graph_ppr is personalized PageRank from a seed product — the
'related to THIS item' relevance that global PageRank can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import global_rank
from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.operators.extras47 import (
    DUCK_COPURCHASE_SYM,
    _copurchase_edges,
)
from mister_spark.registry import query

HILL_K = 100
PPR_ALPHA = 0.15
PPR_ITERS = 6
PPR_TOP = 20


@query(
    "stat_pareto_hill",
    oracle=f"""
    WITH top AS (SELECT o_totalprice AS x FROM orders
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT {HILL_K + 1}),
    xm AS (SELECT MIN(x) AS xmin FROM top),
    s AS (SELECT SUM(LN(x / xmin)) AS slog FROM top, xm WHERE x > xmin
          OR x = xmin)
    SELECT CAST({HILL_K} AS BIGINT) AS k,
           FLOOR(xm.xmin * 100 + 0.5) / 100 AS xmin,
           FLOOR({HILL_K} / (SELECT slog FROM s) * 10000 + 0.5) / 10000
             AS hill_alpha
    FROM xm
    """,
)
def stat_pareto_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimate over the top-{k} order values:
    α̂ = k / Σ ln(x₍ᵢ₎/x₍ₖ₊₁₎). α ≤ 2 means infinite variance — means
    and CIs on such a column are fiction; this is the check before
    trusting any average of it. (Σ includes the boundary term
    ln(x₍ₖ₊₁₎/x₍ₖ₊₁₎)=0, matching both engines.)

    Scale: the top-(k+1) is a distributed TakeOrdered (per-partition
    heads merged on the driver) — no global sort, no full shuffle; the
    estimator then runs on k+1 rows."""
    top = (
        cat(spark, sf_dir)["orders"]
        .select(F.col("o_totalprice").alias("x"), "o_orderkey")
        .orderBy(F.col("x").desc(), "o_orderkey")
        .limit(HILL_K + 1)
    )
    xm = top.agg(F.min("x").alias("xmin"))
    return (
        top.crossJoin(F.broadcast(xm))
        .agg(
            F.lit(HILL_K).cast("bigint").alias("k"),
            money(F.min("xmin")).alias("xmin"),
            ratio(HILL_K / F.sum(F.log(F.col("x") / F.col("xmin")))).alias(
                "hill_alpha"
            ),
        )
    )


stat_pareto_hill.__doc__ = stat_pareto_hill.__doc__.format(k=HILL_K)


@query(
    "ml_brier_decomposition",
    oracle="""
    WITH s AS (SELECT 1.0 / (1.0 + exp(-CAST(embedding[1] AS DOUBLE))) AS p,
                      CAST(label % 2 AS DOUBLE) AS y
               FROM embeddings),
    b AS (SELECT LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bin, p, y FROM s),
    g AS (SELECT bin, CAST(COUNT(*) AS DOUBLE) AS nb,
                 AVG(p) AS pb, AVG(y) AS yb
          FROM b GROUP BY 1),
    t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(y) AS ybar,
                 AVG((p - y) * (p - y)) AS bs
          FROM b)
    SELECT FLOOR(t.bs * 10000 + 0.5) / 10000 AS brier,
           FLOOR(SUM(g.nb * (g.pb - g.yb) * (g.pb - g.yb)) / t.n
                 * 10000 + 0.5) / 10000 AS reliability,
           FLOOR(SUM(g.nb * (g.yb - t.ybar) * (g.yb - t.ybar)) / t.n
                 * 10000 + 0.5) / 10000 AS resolution,
           FLOOR(t.ybar * (1 - t.ybar) * 10000 + 0.5) / 10000 AS uncertainty
    FROM g, t
    GROUP BY t.bs, t.n, t.ybar
    """,
)
def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score over decile probability
    bins: BS ≈ reliability − resolution + uncertainty. Reliability
    isolates miscalibration (fixable by recalibration — see
    ml_isotonic_calibration); resolution is the discrimination the
    model actually earns; uncertainty is the base-rate floor no model
    can beat. Same synthetic sigmoid score as ml_calibration_bins.

    Scale: one pass for the global moments, one partial-agg shuffle to
    10 bin rows, then 10-row arithmetic."""
    emb = cat(spark, sf_dir)["embeddings"]
    s = emb.select(
        (1.0 / (1.0 + F.exp(-F.col("embedding")[0].cast("double")))).alias(
            "p"
        ),
        (F.col("label") % 2).cast("double").alias("y"),
    )
    b = s.withColumn(
        "bin", F.least(F.floor(F.col("p") * 10).cast("bigint"), F.lit(9))
    ).localCheckpoint()
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("double").alias("nb"),
        F.avg("p").alias("pb"),
        F.avg("y").alias("yb"),
    )
    t = b.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("y").alias("ybar"),
        F.avg((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias(
            "bs"
        ),
    )
    return (
        g.crossJoin(F.broadcast(t))
        .groupBy("bs", "n", "ybar")
        .agg(
            ratio(
                F.sum(
                    F.col("nb")
                    * (F.col("pb") - F.col("yb"))
                    * (F.col("pb") - F.col("yb"))
                )
                / F.first("n")
            ).alias("reliability"),
            ratio(
                F.sum(
                    F.col("nb")
                    * (F.col("yb") - F.col("ybar"))
                    * (F.col("yb") - F.col("ybar"))
                )
                / F.first("n")
            ).alias("resolution"),
            ratio(F.first("ybar") * (1 - F.first("ybar"))).alias(
                "uncertainty"
            ),
        )
        .select(
            ratio(F.col("bs")).alias("brier"),
            "reliability",
            "resolution",
            "uncertainty",
        )
    )


@query(
    "ml_auc_delong_ci",
    oracle="""
    WITH s AS (SELECT vec_id,
                      FLOOR(1.0 / (1.0 + exp(-CAST(embedding[1] AS DOUBLE)))
                            * 1000000 + 0.5) / 1000000 AS p,
                      CAST(label % 2 AS BIGINT) AS y
               FROM embeddings),
    r AS (SELECT vec_id, p, y,
                 RANK() OVER (ORDER BY p)
                   + (COUNT(*) OVER (PARTITION BY p) - 1) / 2.0 AS mr,
                 RANK() OVER (PARTITION BY y ORDER BY p)
                   + (COUNT(*) OVER (PARTITION BY y, p) - 1) / 2.0 AS mrc
          FROM s),
    d AS (SELECT CAST(SUM(y) AS DOUBLE) AS n1,
                 CAST(SUM(1 - y) AS DOUBLE) AS n0,
                 SUM(CASE WHEN y = 1 THEN mr END) AS rsum
          FROM r),
    v AS (SELECT VAR_SAMP(CASE WHEN y = 1 THEN (mr - mrc) / d.n0 END) AS s10,
                 VAR_SAMP(CASE WHEN y = 0 THEN 1 - (mr - mrc) / d.n1 END)
                   AS s01,
                 ANY_VALUE(d.n1) AS n1, ANY_VALUE(d.n0) AS n0,
                 ANY_VALUE(d.rsum) AS rsum
          FROM r, d)
    SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
           FLOOR((rsum - n1 * (n1 + 1) / 2) / (n0 * n1) * 10000 + 0.5)
             / 10000 AS auc,
           FLOOR(SQRT(s10 / n1 + s01 / n0) * 10000 + 0.5) / 10000 AS se,
           FLOOR(((rsum - n1 * (n1 + 1) / 2) / (n0 * n1)
                  - 1.96 * SQRT(s10 / n1 + s01 / n0)) * 10000 + 0.5)
             / 10000 AS ci_lo,
           FLOOR(((rsum - n1 * (n1 + 1) / 2) / (n0 * n1)
                  + 1.96 * SQRT(s10 / n1 + s01 / n0)) * 10000 + 0.5)
             / 10000 AS ci_hi
    FROM v
    """,
)
def ml_auc_delong_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC with DeLong standard error and 95% CI (score = sigmoid of
    embedding dim 1, rounded to 1e-6 BEFORE ranking so tie structure
    matches across engines; label = label%2). The structural
    components V10/V01 come from midranks — overall and within-class —
    so the variance estimate is the exact DeLong one, not a bootstrap.
    An AUC whose CI covers 0.5 is not a model; this op makes that
    visible.

    Scale: both rank axes are the two-phase `global_rank`; midranks
    are reconstructed with windows PARTITIONED by the (bounded)
    distinct score value — never an unpartitioned data-sized window.
    Everything after is one aggregate."""
    emb = cat(spark, sf_dir)["embeddings"]
    s = emb.select(
        "vec_id",
        rnd(
            1.0 / (1.0 + F.exp(-F.col("embedding")[0].cast("double"))), 6
        ).alias("p"),
        (F.col("label") % 2).cast("bigint").alias("y"),
    )
    r1 = global_rank(s, "p", "vec_id", rank_col="_rn")
    r1 = r1.withColumn(
        "mr",
        F.min("_rn").over(W.partitionBy("p"))
        + (F.count(F.lit(1)).over(W.partitionBy("p")) - 1) / 2.0,
    )
    r2 = global_rank(
        r1.localCheckpoint(), "y", "p", "vec_id", rank_col="_rnc"
    )
    # within-class rank = class-ordered global rank minus the class
    # offset (count of rows in the preceding class)
    off = r2.groupBy("y").agg(F.min("_rnc").alias("_cls_min"))
    r2 = r2.join(F.broadcast(off), "y").withColumn(
        "_rc", F.col("_rnc") - F.col("_cls_min") + 1
    )
    r2 = r2.withColumn(
        "mrc",
        F.min("_rc").over(W.partitionBy("y", "p"))
        + (F.count(F.lit(1)).over(W.partitionBy("y", "p")) - 1) / 2.0,
    )
    d = r2.agg(
        F.sum("y").cast("double").alias("n1"),
        F.sum(1 - F.col("y")).cast("double").alias("n0"),
        F.sum(F.when(F.col("y") == 1, F.col("mr"))).alias("rsum"),
    )
    j = r2.crossJoin(F.broadcast(d))
    v10 = F.when(F.col("y") == 1, (F.col("mr") - F.col("mrc")) / F.col("n0"))
    v01 = F.when(
        F.col("y") == 0, 1 - (F.col("mr") - F.col("mrc")) / F.col("n1")
    )
    auc = (F.first("rsum") - F.first("n1") * (F.first("n1") + 1) / 2) / (
        F.first("n0") * F.first("n1")
    )
    se = F.sqrt(
        F.var_samp(v10) / F.first("n1") + F.var_samp(v01) / F.first("n0")
    )
    return j.agg(
        F.first("n1").cast("bigint").alias("n_pos"),
        F.first("n0").cast("bigint").alias("n_neg"),
        ratio(auc).alias("auc"),
        ratio(se).alias("se"),
        ratio(auc - 1.96 * se).alias("ci_lo"),
        ratio(auc + 1.96 * se).alias("ci_hi"),
    )


@query(
    "graph_ppr",
    # Real oracle: the personalized power iteration as a recursive CTE.
    # Each step scatters pr/deg along edges, re-bases missing nodes at
    # 0 inflow (the LEFT JOIN), folds the float residual 1 − Σinflow
    # back into the seed (mirroring the Spark loop's collected mass),
    # teleports α to the seed, and stamps it+1. The iteration counter
    # rides a 1-row self-reference so LEFT-JOIN nulls can't eat it.
    oracle=f"""
    WITH RECURSIVE {DUCK_COPURCHASE_SYM},
    nodes AS (SELECT DISTINCT p1 AS node FROM csym),
    deg AS (SELECT p1 AS node, CAST(COUNT(*) AS DOUBLE) AS d
            FROM csym GROUP BY p1),
    seed AS (SELECT MIN(node) AS s FROM nodes),
    ppr AS (
      -- CAST: a bare 1.0/0.0 would type the recursive pr column
      -- DECIMAL and truncate every iterate
      SELECT 0 AS it, n.node,
             CAST(CASE WHEN n.node = sd.s THEN 1.0 ELSE 0.0 END
                  AS DOUBLE) AS pr
      FROM nodes n CROSS JOIN seed sd
      UNION ALL
      SELECT ci.it + 1, sp.node,
             (1.0 - {PPR_ALPHA})
             * (sp.inflow
                + CASE WHEN sp.node = sd.s
                       THEN 1.0 - SUM(sp.inflow) OVER () ELSE 0.0 END)
             + CASE WHEN sp.node = sd.s THEN {PPR_ALPHA} ELSE 0.0 END
      FROM (
        SELECT n.node, COALESCE(c.inflow, 0.0) AS inflow
        FROM nodes n
        LEFT JOIN (SELECT e.p2 AS node, SUM(p.pr / d.d) AS inflow
                   FROM ppr p
                   JOIN deg d ON d.node = p.node
                   JOIN csym e ON e.p1 = p.node
                   GROUP BY e.p2) c ON c.node = n.node
      ) sp
      CROSS JOIN seed sd
      CROSS JOIN (SELECT DISTINCT it FROM ppr) ci
      WHERE ci.it < {PPR_ITERS}
    )
    SELECT node, FLOOR(pr * 1e6 + 0.5) / 1e6 AS ppr
    FROM (SELECT node, pr FROM ppr WHERE it = {PPR_ITERS}
          ORDER BY pr DESC, node LIMIT {PPR_TOP}) t
    """,
)
def graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a seed product (the minimum partkey
    in the co-purchase graph): restart probability {a} teleports to
    the SEED, not uniformly — so scores mean 'related to this item',
    the query behind item-to-item recommendations. {it} power
    iterations, dangling mass returned to the seed; top-{t} nodes.

    Scale: per iteration one edge-join + one aggregate over the
    degree-annotated edge list (deg attached ONCE outside the loop, so
    the loop body carries no second join), materialized ONCE per round
    — the mass readout and the next iterate are both cheap reads of
    that checkpoint, where the former shape re-executed the whole
    join pipeline for each (guide §1.2/§2.4); state is the node-sized
    rank frame, mass conservation is pinned in pytest."""
    e = _copurchase_edges(spark, sf_dir).select("p1", "p2")
    sym = e.select(F.col("p1").alias("src"), F.col("p2").alias("dst")).unionByName(
        e.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("dnode")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # degree-annotated edges, built once: each round's scatter needs
    # pr(src)/deg(src) per edge — same per-row arithmetic as the old
    # r⋈deg⋈sym chain, one join fewer per iteration
    wsym = (
        sym.join(deg, sym.src == deg.dnode)
        .select("src", "dst", "deg")
        .localCheckpoint()
    )
    nodes = deg.select(F.col("dnode").alias("node")).localCheckpoint()
    seed = nodes.agg(F.min("node")).collect()[0][0]
    r = nodes.withColumn(
        "pr", F.when(F.col("node") == seed, 1.0).otherwise(0.0)
    ).localCheckpoint()
    for _ in range(PPR_ITERS):
        contrib = (
            r.join(wsym, r.node == wsym.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        spread = (
            nodes.join(contrib, "node", "left")
            .select(
                "node", F.coalesce("inflow", F.lit(0.0)).alias("inflow")
            )
            .localCheckpoint()
        )
        mass = spread.agg(F.sum("inflow")).collect()[0][0] or 0.0
        dangling = 1.0 - float(mass)
        r = spread.select(
            "node",
            (
                (1 - PPR_ALPHA)
                * (
                    F.col("inflow")
                    + F.when(
                        F.col("node") == seed, F.lit(dangling)
                    ).otherwise(0.0)
                )
                + F.when(F.col("node") == seed, F.lit(PPR_ALPHA)).otherwise(
                    0.0
                )
            ).alias("pr"),
        )  # lazy projection over the checkpointed spread — lineage stays flat
    return (
        r.orderBy(F.col("pr").desc(), "node")
        .limit(PPR_TOP)
        .select("node", rnd(F.col("pr"), 6).alias("ppr"))
    )


graph_ppr.__doc__ = graph_ppr.__doc__.format(
    a=PPR_ALPHA, it=PPR_ITERS, t=PPR_TOP
)
