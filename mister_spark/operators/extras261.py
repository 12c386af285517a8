"""Wave 261: counting every backbone — Kirchhoff spanning-tree mass.

graph_spanning_trees applies the matrix-tree theorem to the
(unweighted, symmetrized) nation-trade graph: the number of spanning
trees is the product of the Laplacian's nonzero eigenvalues divided by
n — reported as log10 because the count is astronomical on a dense
graph. Where graph_effective_resistance prices one pair's redundancy
and graph_von_neumann_entropy summarizes the spectrum's shape, the
tree count is the graph's TOTAL structural redundancy in one number:
it multiplies over every eigenvalue, so removing any bridge-like
structure collapses it by orders of magnitude (and a disconnected
graph sends it to exactly zero — flagged loudly here, never averaged
away). Eigenvalues come from the same shared tournament-Jacobi
recursion the entropy op validates against LAPACK.

Exactness: Laplacian cells are integers; both engines threshold the
identical spectrum at 1e-8 (nonzero eigenvalues of a connected
integer Laplacian sit at O(0.1+), zeros at ~1e-15 — three decades of
slack each side); the log-sum rounds at 1e-4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat
from mister_spark.operators.duck_linalg import duck_jacobi_eigvals
from mister_spark.registry import query

ST_D = 32  # fixed Jacobi dimension (>= any nation count)
ST_EIG_EPS = 1e-8


@query(
    "graph_spanning_trees",
    # Real oracle: identical integer Laplacian padded into the fixed
    # Jacobi frame; spanning-tree mass = (sum ln of eigenvalues above
    # the shared threshold) - ln n, by the matrix-tree theorem.
    oracle=f"""
    WITH RECURSIVE e0 AS (
      SELECT DISTINCT LEAST(s.s_nationkey, c.c_nationkey) AS a,
             GREATEST(s.s_nationkey, c.c_nationkey) AS b
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE s.s_nationkey <> c.c_nationkey),
    nodes AS (SELECT node, ROW_NUMBER() OVER (ORDER BY node) AS i
              FROM (SELECT DISTINCT node FROM (
                      SELECT a AS node FROM e0
                      UNION ALL SELECT b FROM e0))),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    sym AS (SELECT na.i AS i, nb.i AS j FROM e0
            JOIN nodes na ON na.node = e0.a
            JOIN nodes nb ON nb.node = e0.b
            UNION ALL
            SELECT nb.i, na.i FROM e0
            JOIN nodes na ON na.node = e0.a
            JOIN nodes nb ON nb.node = e0.b),
    deg AS (SELECT i, CAST(COUNT(*) AS DOUBLE) AS d FROM sym GROUP BY 1),
    grid AS (SELECT gi.i, gj.j,
                    CASE WHEN gi.i = gj.j THEN
                         COALESCE((SELECT d FROM deg WHERE deg.i = gi.i),
                                  0.0)
                         WHEN EXISTS (SELECT 1 FROM sym
                                      WHERE sym.i = gi.i
                                        AND sym.j = gj.j)
                         THEN -1.0 ELSE 0.0 END AS v
             FROM (SELECT unnest(generate_series(1, {ST_D})) AS i) gi
             CROSS JOIN (SELECT unnest(generate_series(1, {ST_D}))
                           AS j) gj),
    mat AS (SELECT list(row ORDER BY i) AS a FROM (
              SELECT i, list(CAST(v AS DOUBLE) ORDER BY j) AS row
              FROM grid GROUP BY i)),
    {duck_jacobi_eigvals(d=ST_D, sweeps=10, mat="mat", out="eig")},
    pos AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(LN(x)) AS sl
            FROM (SELECT unnest(eig.ev) AS x FROM eig)
            WHERE x > {ST_EIG_EPS!r})
    SELECT nn.n AS n_nodes,
           pos.k AS n_nonzero_eigs,
           CAST(CASE WHEN pos.k = nn.n - 1 THEN 1 ELSE 0 END AS BIGINT)
             AS connected,
           FLOOR(CASE WHEN pos.k = nn.n - 1
                 THEN (pos.sl - LN(CAST(nn.n AS DOUBLE))) / LN(10.0)
                 ELSE 0.0 END * 10000 + 0.5) / 10000
             AS log10_spanning_trees
    FROM nn CROSS JOIN pos
    """,
)
def graph_spanning_trees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kirchhoff spanning-tree mass of the symmetrized nation-trade
    graph: by the matrix-tree theorem, #trees = Π(nonzero Laplacian
    eigenvalues)/n — reported as log10 (a dense 25-node graph has
    ~10^25+ backbones). `connected` asserts exactly n−1 nonzero
    eigenvalues; a disconnected graph reports 0 trees LOUDLY instead
    of a per-component average. The one-number answer to 'how much
    structural redundancy does this network have?' —
    graph_effective_resistance prices one pair, this multiplies over
    all of them.

    Scale: one fact-scan edge rollup collapses to the nation-bounded
    edge list (collected — ≤ 25·24/2 rows, documented); the {d}×{d}
    eigensolve is driver-side numpy against the oracle's shared
    tournament-Jacobi recursion (validated ~1e-13 vs LAPACK), both
    thresholding the identical spectrum at {e:g}."""
    import math

    import numpy as np

    c = cat(spark, sf_dir)
    sup = c["supplier"].select("s_suppkey", F.col("s_nationkey").alias("sn"))
    cus = c["customer"].select("c_custkey", F.col("c_nationkey").alias("cn"))
    e_rows = (
        c["lineitem"]
        .select("l_suppkey", "l_orderkey")
        .join(
            c["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cus), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("sn") != F.col("cn"))
        .select(
            F.least("sn", "cn").alias("a"), F.greatest("sn", "cn").alias("b")
        )
        .distinct()
        .collect()  # nation-bounded (documented)
    )
    nodes = sorted({r["a"] for r in e_rows} | {r["b"] for r in e_rows})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    L = np.zeros((ST_D, ST_D))
    for r in e_rows:
        i, j = idx[r["a"]], idx[r["b"]]
        L[i, j] -= 1
        L[j, i] -= 1
        L[i, i] += 1
        L[j, j] += 1
    ev = np.linalg.eigvalsh(L)
    pos = [float(x) for x in ev if x > ST_EIG_EPS]
    k = len(pos)
    connected = int(k == n - 1)
    log10_trees = (
        (sum(math.log(x) for x in pos) - math.log(n)) / math.log(10.0)
        if connected
        else 0.0
    )
    return spark.createDataFrame(
        [
            (
                n,
                k,
                connected,
                math.floor(log10_trees * 1e4 + 0.5) / 1e4,
            )
        ],
        "n_nodes long, n_nonzero_eigs long, connected long, "
        "log10_spanning_trees double",
    )


graph_spanning_trees.__doc__ = graph_spanning_trees.__doc__.format(
    d=ST_D, e=ST_EIG_EPS
)
