"""Wave 114: competing-risks survival, sampled closeness centrality,
and DEFAULT column surface.

ev_competing_risks estimates Aalen–Johansen cumulative incidence for
two competing first-actions (purchase vs error) — naive 1−KM per
cause OVERSTATES each risk because it pretends the other cause
doesn't exist; CIF partitions the probability correctly;
graph_closeness_sampled runs multi-source BFS from k deterministic
seeds IN ONE frame (seed is just a column) and reports per-seed
closeness — the landmark approximation that makes closeness feasible
when all-pairs BFS isn't; sql_default_columns pins the DEFAULT
column DDL surface — partial INSERTs materialize declared defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import (
    DUCK_COPURCHASE_SYM,
    _copurchase_edges,
)
from mister_spark.registry import query

CR_HORIZON_H = 48  # report CIF at this hour
CLOSE_SEEDS = 6
CLOSE_ROUNDS = 5


@query(
    "ev_competing_risks",
    oracle=f"""
    WITH u AS (SELECT user_id,
                      MIN(epoch_us(ts)) AS t0,
                      MIN(CASE WHEN event_type = 'purchase'
                               THEN epoch_us(ts) END) AS tp,
                      MIN(CASE WHEN event_type = 'error'
                               THEN epoch_us(ts) END) AS te,
                      MAX(epoch_us(ts)) AS t1
               FROM events GROUP BY 1),
    lab AS (SELECT
              CASE WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te)
                   THEN (tp - t0) // 3600000000
                   WHEN te IS NOT NULL THEN (te - t0) // 3600000000
                   ELSE (t1 - t0) // 3600000000 END AS t,
              CASE WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te) THEN 1
                   WHEN te IS NOT NULL THEN 2 ELSE 0 END AS cause
            FROM u),
    n0 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM lab),
    gt AS (SELECT t, CAST(COUNT(*) AS DOUBLE) AS c,
                  CAST(SUM(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                    AS d1,
                  CAST(SUM(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS DOUBLE)
                    AS d2
           FROM lab GROUP BY 1),
    rk AS (SELECT t, d1, d2,
                  n0.n - (SUM(c) OVER (ORDER BY t) - c) AS r
           FROM gt, n0),
    km AS (SELECT t, d1, d2, r,
                  COALESCE(EXP(SUM(CASE WHEN d1 + d2 < r
                                        THEN LN(1 - (d1 + d2) / r) END)
                           OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING)), 1.0) AS s_minus
           FROM rk WHERE r > 0),
    cif AS (SELECT SUM(CASE WHEN t <= {CR_HORIZON_H}
                            THEN s_minus * d1 / r ELSE 0 END) AS cif1,
                   SUM(CASE WHEN t <= {CR_HORIZON_H}
                            THEN s_minus * d2 / r ELSE 0 END) AS cif2
            FROM km)
    SELECT FLOOR(cif1 * 10000 + 0.5) / 10000 AS cif_purchase,
           FLOOR(cif2 * 10000 + 0.5) / 10000 AS cif_error,
           FLOOR((cif1 + cif2) * 10000 + 0.5) / 10000 AS cif_any,
           CAST({CR_HORIZON_H} AS BIGINT) AS horizon_hours
    FROM cif
    """,
)
def ev_competing_risks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aalen–Johansen cumulative incidence at {h}h for the competing
    first-actions purchase vs error (whichever strikes first claims
    the user): CIF_k(τ) = Σ_{{t≤τ}} S(t⁻)·d_k(t)/n(t). Unlike 1−KM per
    cause, the CIFs cannot exceed 1 jointly — the decomposition that
    answers 'within 2 days, what fraction convert vs hit an error
    FIRST'.

    Scale: same shape as the survival ops — durations collapse to
    |distinct t| rows, at-risk via prefix sums, the KM product over
    the hour-bounded frame (calendar-bounded precedent)."""
    ev = cat(spark, sf_dir)["events"]
    us = F.unix_micros("ts")
    u = ev.groupBy("user_id").agg(
        F.min(us).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("tp"),
        F.min(F.when(F.col("event_type") == "error", us)).alias("te"),
        F.max(us).alias("t1"),
    )
    first_p = F.col("tp").isNotNull() & (
        F.col("te").isNull() | (F.col("tp") <= F.col("te"))
    )
    t_expr = (
        F.when(first_p, F.col("tp"))
        .when(F.col("te").isNotNull(), F.col("te"))
        .otherwise(F.col("t1"))
        - F.col("t0")
    )
    lab = u.select(
        F.floor(t_expr / 3600000000).cast("long").alias("t"),
        F.when(first_p, 1)
        .when(F.col("te").isNotNull(), 2)
        .otherwise(0)
        .alias("cause"),
    ).localCheckpoint()
    n0 = lab.agg(F.count(F.lit(1)).cast("double").alias("n"))
    gt = lab.groupBy("t").agg(
        F.count(F.lit(1)).cast("double").alias("c"),
        F.sum(F.when(F.col("cause") == 1, 1).otherwise(0))
        .cast("double")
        .alias("d1"),
        F.sum(F.when(F.col("cause") == 2, 1).otherwise(0))
        .cast("double")
        .alias("d2"),
    )
    cc = bucketed_cumsum(gt, "t", {"cum": F.col("c")})
    rk = cc.crossJoin(F.broadcast(n0)).select(
        "t",
        "d1",
        "d2",
        (F.col("n") - (F.col("cum") - F.col("c"))).alias("r"),
    ).filter(F.col("r") > 0)  # absorbing row (d==r) is always last
    from pyspark.sql import Window as W

    w_prev = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    km = rk.select(
        "t",
        "d1",
        "d2",
        "r",
        F.coalesce(
            F.exp(
                F.sum(
                    F.when(
                        F.col("d1") + F.col("d2") < F.col("r"),
                        F.log(1 - (F.col("d1") + F.col("d2")) / F.col("r")),
                    )
                ).over(w_prev)
            ),
            F.lit(1.0),
        ).alias("s_minus"),
    )
    cif1 = F.sum(
        F.when(
            F.col("t") <= CR_HORIZON_H,
            F.col("s_minus") * F.col("d1") / F.col("r"),
        ).otherwise(0.0)
    )
    cif2 = F.sum(
        F.when(
            F.col("t") <= CR_HORIZON_H,
            F.col("s_minus") * F.col("d2") / F.col("r"),
        ).otherwise(0.0)
    )
    return km.agg(
        ratio(cif1).alias("cif_purchase"),
        ratio(cif2).alias("cif_error"),
        ratio(cif1 + cif2).alias("cif_any"),
        F.lit(CR_HORIZON_H).cast("bigint").alias("horizon_hours"),
    )


ev_competing_risks.__doc__ = ev_competing_risks.__doc__.format(
    h=CR_HORIZON_H
)


@query(
    "graph_closeness_sampled",
    # Real oracle: the layered multi-source BFS as a dedup-UNION
    # recursive CTE — (seed, node, d) tuples dedup across iterations,
    # so expansion is bounded by seeds x nodes x rounds (no walk
    # blowup), and MIN(d) per (seed, node) under the same round cap is
    # exactly the Spark loop's frontier-layer distance. Integer
    # distances; the two ratios round on the shared floor grid.
    oracle=f"""
    WITH RECURSIVE {DUCK_COPURCHASE_SYM},
    seeds AS (SELECT p1 AS seed FROM (
                SELECT DISTINCT p1 FROM csym ORDER BY p1
                LIMIT {CLOSE_SEEDS}) s),
    bfs AS (
      SELECT seed, seed AS node, 0 AS d FROM seeds
      UNION
      SELECT b.seed, e.p2 AS node, b.d + 1
      FROM bfs b JOIN csym e ON b.node = e.p1
      WHERE b.d < {CLOSE_ROUNDS}
    ),
    dist AS (SELECT seed, node, MIN(d) AS d FROM bfs GROUP BY 1, 2),
    nn AS (SELECT CAST(COUNT(DISTINCT p1) AS DOUBLE) AS n FROM csym)
    SELECT seed, CAST(COUNT(*) AS BIGINT) AS reached,
           FLOOR(COUNT(*) / nn.n * 10000 + 0.5) / 10000 AS coverage,
           FLOOR((COUNT(*) - 1) / GREATEST(CAST(SUM(d) AS DOUBLE), 1.0)
                 * 10000 + 0.5) / 10000 AS closeness
    FROM dist, nn GROUP BY seed, nn.n ORDER BY seed
    """,
)
def graph_closeness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled closeness centrality on the co-purchase graph: {k}
    deterministic landmark seeds (lowest part keys) run BFS
    SIMULTANEOUSLY — the frontier carries a seed column, so k sources
    cost one iterative pipeline, not k — and each seed reports
    closeness = reached/Σdist with its coverage. The landmark scheme
    that replaces all-pairs shortest paths at scale.

    Scale: each round is one frontier⋈edges join + a min-dist
    aggregate keyed (seed, node), localCheckpoint-ed; state is
    (seed×reached-nodes) distances, never paths."""
    e = _copurchase_edges(spark, sf_dir).select("p1", "p2")
    sym = e.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionByName(
        e.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    ).localCheckpoint()
    nodes = sym.select(F.col("u").alias("node")).distinct()
    seeds = nodes.orderBy("node").limit(CLOSE_SEEDS).select(
        F.col("node").alias("seed")
    )
    dist = seeds.select(
        "seed", F.col("seed").alias("node"), F.lit(0).alias("d")
    ).localCheckpoint()
    frontier = dist
    for step in range(1, CLOSE_ROUNDS + 1):
        nxt = (
            frontier.join(sym, frontier.node == sym.u)
            .select("seed", F.col("v").alias("node"), F.lit(step).alias("d"))
            .join(dist.select("seed", "node").withColumn("_seen", F.lit(1)),
                  ["seed", "node"], "left_anti")
            .groupBy("seed", "node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt
    n_nodes = nodes.count()
    out = (
        dist.groupBy("seed")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("reached"),
            F.sum("d").alias("dist_sum"),
        )
        .select(
            "seed",
            "reached",
            ratio(F.col("reached") / F.lit(float(n_nodes))).alias(
                "coverage"
            ),
            ratio(
                (F.col("reached") - 1)
                / F.greatest(F.col("dist_sum"), F.lit(1.0))
            ).alias("closeness"),
        )
        .orderBy("seed")
    )
    return out


graph_closeness_sampled.__doc__ = graph_closeness_sampled.__doc__.format(
    k=CLOSE_SEEDS
)


@query(
    "sql_default_columns",
    # Real oracle: the op's output is a data-independent function of
    # its three INSERTs and the declared defaults — the expected
    # materialization is a fixed relation, pinned literally.
    oracle="""
    SELECT * FROM (VALUES
      ('closed', 'unknown', CAST(1 AS BIGINT)),
      ('open', 'emea', CAST(1 AS BIGINT)),
      ('open', 'unknown', CAST(2 AS BIGINT))) t(status, region, n)
    """,
)
def sql_default_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEFAULT column surface: a table declared with column DEFAULTs
    (status 'open', region 'unknown'), filled by partial INSERTs that
    omit them — the declared defaults must materialize in the stored
    rows. The DDL contract that keeps writer evolution from spraying
    NULLs into downstream logic.

    Scale: pure DDL surface; row volume is incidental."""
    import os
    import shutil

    repo_tmp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp"
    )
    loc = os.path.join(repo_tmp, "default_cols_demo")
    shutil.rmtree(loc, ignore_errors=True)
    spark.sql("DROP TABLE IF EXISTS _def_demo")
    spark.sql(
        f"""
        CREATE TABLE _def_demo (
            id BIGINT,
            status STRING DEFAULT 'open',
            region STRING DEFAULT 'unknown'
        ) USING parquet LOCATION '{loc}'
        """
    )
    spark.sql("INSERT INTO _def_demo (id) VALUES (1), (2)")
    spark.sql("INSERT INTO _def_demo (id, status) VALUES (3, 'closed')")
    spark.sql(
        "INSERT INTO _def_demo VALUES (4, DEFAULT, 'emea')"
    )
    out = (
        spark.table("_def_demo")
        .groupBy("status", "region")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("status", "region")
        .collect()
    )
    spark.sql("DROP TABLE IF EXISTS _def_demo")
    return spark.createDataFrame(
        [(r["status"], r["region"], r["n"]) for r in out],
        "status string, region string, n long",
    )
