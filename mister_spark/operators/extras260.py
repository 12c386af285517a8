"""Wave 260: effective resistance on the weighted trade graph.

graph_effective_resistance treats the symmetrized nation-trade graph
as an electrical network (edge conductance = normalized trade weight)
and computes every nation's effective resistance to a grounded
reference node (nation 0) by solving the reduced graph Laplacian:
R_eff(ref, v) = (L_minor^-1)[v][v]. Effective resistance is the
graph distance that counts ALL routes (two nations linked by many
parallel trade paths are electrically close even if no single path is
heavy) — the metric behind commute times, spectral sparsifiers, and
robustness analysis, and the complement of graph_sssp_weighted's
single-best-path view. The oracle replays the same 24×24 solve
through the shared Cholesky recursion (duck_spd_solve, the
ml_spline_regression machinery) with the identity as the RHS block.

Exactness: edge weights are exact BIGINT trade counts normalized by
their total (one double division per cell in both engines); the
Laplacian minor gets a deterministic 1e-9 ridge (identical in both
engines — guards a disconnected minor without moving any resistance
past the 1e-6 output grid on this well-conditioned graph); Spark's
driver-side solve and DuckDB's Cholesky agree to ~1e-12 on a
condition-number-~1e2 system, far inside the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.duck_linalg import duck_spd_solve
from mister_spark.registry import query

ER_N = 25  # TPC-H nations are fixed 0..24 at every SF
ER_D = ER_N - 1  # minor dimension with nation 0 grounded
ER_RIDGE = 1e-9


def _er_oracle() -> str:
    # weights: symmetrized supplier-nation -> customer-nation lineitem
    # counts, normalized; minor indices i = nationkey (1..24 after
    # grounding nation 0).
    return f"""
    WITH RECURSIVE raw AS (
      SELECT s.s_nationkey AS u, c.c_nationkey AS v,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY 1, 2),
    sym AS (SELECT u, v, CAST(SUM(w) AS BIGINT) AS w FROM (
              SELECT u, v, w FROM raw
              UNION ALL SELECT v AS u, u AS v, w FROM raw) q
            GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(w) AS DOUBLE) AS tw FROM sym),
    wn AS (SELECT u, v, w / tot.tw AS wn FROM sym CROSS JOIN tot),
    deg AS (SELECT u, SUM(wn) AS dg FROM wn GROUP BY 1),
    cells AS (SELECT i.i, j.j,
                     CASE WHEN i.i = j.j
                          THEN COALESCE(d.dg, 0.0) + {ER_RIDGE!r}
                          ELSE -COALESCE(w.wn, 0.0) END AS g
              FROM (SELECT unnest(range(1, {ER_D + 1})) AS i) i
              CROSS JOIN (SELECT unnest(range(1, {ER_D + 1})) AS j) j
              LEFT JOIN deg d ON d.u = i.i
              LEFT JOIN wn w ON w.u = i.i AND w.v = j.j),
    mat AS (SELECT list(row ORDER BY i) AS a FROM (
              SELECT i, list(g ORDER BY j) AS row
              FROM cells GROUP BY i) z),
    rhs AS (SELECT list_transform(range(1, {ER_D + 1}), r ->
              list_transform(range(1, {ER_D + 1}), i ->
                CASE WHEN i = r THEN CAST(1.0 AS DOUBLE)
                     ELSE CAST(0.0 AS DOUBLE) END)) AS b),
    {duck_spd_solve(ER_D, ER_D)}
    SELECT CAST(n.i AS BIGINT) AS nationkey,
           FLOOR(COALESCE(d.dg, 0.0) * 1000000 + 0.5) / 1000000
             AS degree_share,
           FLOOR(sol.x[n.i][n.i] * 1000000 + 0.5) / 1000000 AS r_eff
    FROM (SELECT unnest(range(1, {ER_D + 1})) AS i) n
    CROSS JOIN sol
    LEFT JOIN deg d ON d.u = n.i
    ORDER BY nationkey
    """


@query("graph_effective_resistance", oracle=_er_oracle())
def graph_effective_resistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective resistance from every nation to grounded nation 0 on
    the weight-normalized trade graph: R_eff(0, v) = diag of the
    inverse reduced Laplacian — the all-routes distance (parallel
    trade paths lower it; a single heavy path can't). Low r_eff =
    electrically close to the reference hub = robustly connected;
    the nations with the highest r_eff are the ones a disruption
    isolates first. graph_sssp_weighted gives the best single route;
    this gives the whole network's opinion.

    Scale: one fact-scan edge rollup collapses everything to the
    ≤ {n}×{n} weighted nation graph; the 24×24 grounded-Laplacian
    solve happens ONCE on that model-sized frame (driver-side,
    ≤ 625 collected rows) and the oracle replays it through the
    shared Cholesky recursion. A deterministic 1e-9 ridge guards
    disconnection identically in both engines."""
    import numpy as np

    c = cat(spark, sf_dir)
    raw = (
        c["lineitem"]
        .select("l_suppkey", "l_orderkey")
        .join(
            c["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(
                c["supplier"].select(
                    "s_suppkey", F.col("s_nationkey").alias("u")
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            c["customer"].select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_nationkey").alias("v"),
            ),
            "o_custkey",
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    sym = (
        raw.unionByName(
            raw.select(
                F.col("v").alias("u"), F.col("u").alias("v"), "w"
            )
        )
        .groupBy("u", "v")
        .agg(F.sum("w").cast("bigint").alias("w"))
    )
    # model-sized collect: <= 25*24 weighted nation pairs
    rows = sym.collect()
    tw = float(sum(r["w"] for r in rows))
    W = np.zeros((ER_N, ER_N))
    for r in rows:
        W[r["u"], r["v"]] = r["w"] / tw
    deg = W.sum(axis=1)
    L = np.diag(deg) - W
    minor = L[1:, 1:] + ER_RIDGE * np.eye(ER_D)
    inv = np.linalg.solve(minor, np.eye(ER_D))
    if not np.all(np.isfinite(inv)):
        raise ValueError(
            "graph_effective_resistance: singular grounded Laplacian — "
            "trade graph disconnected from nation 0"
        )
    import math

    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    out = [
        (int(i), r6(float(deg[i])), r6(float(inv[i - 1, i - 1])))
        for i in range(1, ER_N)
    ]
    return spark.createDataFrame(
        out, "nationkey long, degree_share double, r_eff double"
    )


graph_effective_resistance.__doc__ = (
    graph_effective_resistance.__doc__.format(n=ER_N)
)
