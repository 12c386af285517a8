"""Wave 240: Markov mixing times and spectral graph entropy.

ev_markov_mixing_time turns ev_markov_stationary's "where does the
chain settle" into "HOW FAST does it settle": estimate the
second-eigenvalue modulus by norm-decay of a stationary-deflated
power iteration (a real, oscillation-proof estimate even when the
chain's subdominant eigenvalues are complex), and report the
spectral gap and relaxation time — the number of steps after which
where-a-user-started stops mattering, i.e. how long attribution
memory actually lasts. graph_von_neumann_entropy compresses the
trade graph's whole Laplacian spectrum (the shared tournament-
Jacobi eigensolver, matrix padded to a fixed 32) into one number:
the von Neumann entropy of L/Tr(L), low for star-like concentrated
structure, high for homogeneous mixing — with the Fiedler value
(algebraic connectivity) reported beside it. The two-number
spectral summary a graph gets before anyone plots it.

Exactness: the chain is integer counts row-normalized identically,
both iterations replay with shared arithmetic (list-carrying
recursions), and the Jacobi spectrum agrees with LAPACK far below
the rounding grid (duck_linalg's validated bound).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.operators.duck_linalg import duck_jacobi_eigvals
from mister_spark.registry import query

MIX_PI_ITERS = 60
MIX_T0, MIX_T1 = 40, 80
VNE_D = 32  # fixed Jacobi dimension (>= any nation count)


@query(
    "ev_markov_mixing_time",
    # Real oracle: the transition matrix is integer counts
    # row-normalized identically; the stationary iteration and the
    # deflated norm-decay iteration replay in one list-carrying
    # recursion with shared arithmetic; outputs round on the grid.
    oracle=f"""
    WITH RECURSIVE s AS (SELECT user_id, event_type,
                      LEAD(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS nxt
               FROM events),
    c AS (SELECT event_type AS a, nxt AS b, CAST(COUNT(*) AS BIGINT) AS n
          FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
    states AS (SELECT a AS st, ROW_NUMBER() OVER (ORDER BY a) AS i
               FROM (SELECT DISTINCT a FROM c)),
    rs AS (SELECT a, CAST(SUM(n) AS DOUBLE) AS tot FROM c GROUP BY 1),
    p AS (SELECT si.i AS i, sj.i AS j, c.n / rs.tot AS pr
          FROM c JOIN states si ON si.st = c.a
               JOIN states sj ON sj.st = c.b
               JOIN rs ON rs.a = c.a
          WHERE c.b IN (SELECT st FROM states)),
    k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states),
    -- phase 1 (it < {MIX_PI_ITERS}): stationary pi by x <- xP / sum;
    -- phase 2: deflated f <- Pf - (pi . f) 1, norms recorded at the
    -- {MIX_T0}/{MIX_T1} marks via the carried n0 slot
    mx AS (
      SELECT 0 AS it,
             (SELECT list(CAST(1.0 AS DOUBLE) / k.k ORDER BY i)
              FROM states, k) AS pi,
             (SELECT list(CAST(CASE WHEN i % 2 = 0 THEN 1.0
                           ELSE -1.0 END AS DOUBLE) ORDER BY i)
              FROM states) AS f
      UNION ALL
      SELECT q.it + 1,
             CASE WHEN q.it < 60 THEN (
               SELECT list(x / (SELECT SUM(
                        (SELECT COALESCE(SUM(p3.pr * q.pi[p3.i]), 0.0)
                         FROM p p3 WHERE p3.j = st.i))
                      FROM states st) ORDER BY i) FROM (
                 SELECT nd.i,
                        (SELECT COALESCE(SUM(p2.pr * q.pi[p2.i]), 0.0)
                         FROM p p2 WHERE p2.j = nd.i) AS x
                 FROM states nd))
             ELSE q.pi END,
             CASE WHEN q.it < 60 THEN q.f
             ELSE (
               SELECT list(g - (SELECT SUM(q.pi[st.i] *
                        (SELECT COALESCE(SUM(p3.pr * q.f[p3.j]), 0.0)
                         FROM p p3 WHERE p3.i = st.i))
                      FROM states st) ORDER BY i) FROM (
                 SELECT nd.i,
                        (SELECT COALESCE(SUM(p2.pr * q.f[p2.j]), 0.0)
                         FROM p p2 WHERE p2.i = nd.i) AS g
                 FROM states nd)) END
      FROM mx q WHERE q.it < 60 + 80),
    f0 AS (SELECT SQRT(SUM(x * x)) AS n0 FROM (
             SELECT unnest(f) AS x FROM mx
             WHERE it = 60 + 40)),
    f1 AS (SELECT SQRT(SUM(x * x)) AS n1 FROM (
             SELECT unnest(f) AS x FROM mx
             WHERE it = 60 + 80)),
    o AS (SELECT k.k, f0.n0, f1.n1,
                 CASE WHEN f0.n0 <= 0 OR f1.n1 <= 0 THEN 0.0
                      ELSE POWER(f1.n1 / f0.n0, 1.0 / 40) END AS rho
          FROM k, f0, f1)
    SELECT k AS n_states,
           FLOOR(rho * 1e4 + 0.5) / 1e4 AS slem,
           FLOOR((1 - rho) * 1e4 + 0.5) / 1e4 AS spectral_gap,
           FLOOR(CASE WHEN rho >= 1 OR rho <= 0 THEN 0.0
                      ELSE 1.0 / (1 - rho) END * 100 + 0.5) / 100
             AS relaxation_time
    FROM o
    """,
)
def ev_markov_mixing_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixing speed of the user event-type chain: after {p} power
    rounds for the stationary pi, iterate the pi-deflated map
    f <- Pf - (pi . Pf) 1 and estimate the second-eigenvalue modulus
    as the norm-decay rate (||f_{t1}|| / ||f_{t0}||)^(1/(t1-t0)) —
    real and oscillation-proof even when the subdominant pair is
    complex. spectral_gap = 1 - slem and relaxation_time = 1/gap
    say how many STEPS of journey history actually matter: a gap
    near 1 means last-touch attribution is already fair; a tiny gap
    means the chain remembers origins for ~1/gap clicks.

    Scale: the one sessionize-shaped shuffle builds the k x k
    integer chain; both iterations are driver arithmetic on that
    model-sized matrix, replayed by the oracle's list recursion."""
    s = cat(spark, sf_dir)["events"].select(
        "user_id", "event_type",
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    )
    c_rows = (
        s.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    )
    states = sorted({r["a"] for r in c_rows})
    idx = {st: i for i, st in enumerate(states)}
    k = len(states)
    tot = [0.0] * k
    for r in c_rows:
        tot[idx[r["a"]]] += r["n"]
    P = [[0.0] * k for _ in range(k)]
    for r in c_rows:
        if r["b"] in idx:
            P[idx[r["a"]]][idx[r["b"]]] = r["n"] / tot[idx[r["a"]]]
    pi = [1.0 / k] * k
    for _ in range(MIX_PI_ITERS):
        nx = [0.0] * k
        for i in range(k):
            for j in range(k):
                if P[i][j]:
                    nx[j] += P[i][j] * pi[i]
        ssum = sum(nx)
        pi = [x / ssum for x in nx]
    f = [1.0 if (i + 1) % 2 == 0 else -1.0 for i in range(k)]

    def step(fv):
        g = [
            sum(P[i][j] * fv[j] for j in range(k) if P[i][j])
            for i in range(k)
        ]
        ip = sum(pi[i] * g[i] for i in range(k))
        return [x - ip for x in g]

    n0 = 0.0
    for t in range(1, MIX_T1 + 1):
        f = step(f)
        if t == MIX_T0:
            n0 = math.sqrt(sum(x * x for x in f))
    n1 = math.sqrt(sum(x * x for x in f))
    rho = (
        (n1 / n0) ** (1.0 / (MIX_T1 - MIX_T0))
        if n0 > 0 and n1 > 0
        else 0.0
    )
    g4 = lambda x: math.floor(x * 1e4 + 0.5) / 1e4  # noqa: E731
    relax = 0.0 if rho >= 1 or rho <= 0 else 1.0 / (1 - rho)
    return spark.createDataFrame(
        [
            (
                k, g4(rho), g4(1 - rho),
                math.floor(relax * 100 + 0.5) / 100,
            )
        ],
        "n_states long, slem double, spectral_gap double, "
        "relaxation_time double",
    )


ev_markov_mixing_time.__doc__ = ev_markov_mixing_time.__doc__.format(
    p=MIX_PI_ITERS, t0=MIX_T0, t1=MIX_T1
)


@query(
    "graph_von_neumann_entropy",
    # Real oracle: the Laplacian cells are integers, the padded
    # matrix feeds the shared tournament-Jacobi eigensolver
    # (validated ~1e-13 vs LAPACK, far below the grid), and the
    # entropy/connectivity reads round identically.
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
             FROM (SELECT unnest(generate_series(1, {VNE_D})) AS i) gi
             CROSS JOIN (SELECT unnest(generate_series(1, {VNE_D}))
                           AS j) gj),
    mat AS (SELECT list(row ORDER BY i) AS a FROM (
              SELECT i, list(CAST(v AS DOUBLE) ORDER BY j) AS row
              FROM grid GROUP BY i)),
    {duck_jacobi_eigvals(d=VNE_D, sweeps=10, mat="mat", out="eig")},
    tr AS (SELECT SUM(x) AS t FROM (SELECT unnest(eig.ev) AS x
                                    FROM eig)),
    ent AS (SELECT SUM(CASE WHEN x / tr.t > 1e-12
                       THEN -(x / tr.t) * LN(x / tr.t) ELSE 0.0 END)
                     AS s,
                   SUM(CASE WHEN x > 1e-9 THEN 1 ELSE 0 END)
                     AS n_pos
            FROM (SELECT unnest(eig.ev) AS x FROM eig), tr
            GROUP BY tr.t),
    fied AS (SELECT MIN(x) AS l2 FROM (
               SELECT unnest(eig.ev) AS x FROM eig)
             WHERE x > 1e-9)
    SELECT nn.n AS n_nodes,
           FLOOR(tr.t * 10 + 0.5) / 10 AS laplacian_trace,
           FLOOR(ent.s * 1e4 + 0.5) / 1e4 AS von_neumann_entropy,
           FLOOR(ent.s / LN(nn.n - 1) * 1e4 + 0.5) / 1e4
             AS normalized_entropy,
           FLOOR(fied.l2 * 1e4 + 0.5) / 1e4 AS algebraic_connectivity
    FROM nn, tr, ent, fied
    """,
)
def graph_von_neumann_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Von Neumann entropy of the trade graph: eigenvalues of the
    Laplacian L = D - A (padded into a fixed {d}x{d} frame for the
    shared Jacobi eigensolver), normalized to a density spectrum
    p = lambda/Tr(L), S = -sum p ln p. Low S = spectrum concentrated
    (star-like, one structure dominates); S near ln(n-1) =
    homogeneous mixing. The Fiedler value (smallest positive
    eigenvalue, algebraic connectivity) rides along: how much it
    costs to disconnect the network. One spectral line summarizing
    what a whole eigen-plot would show.

    Scale: the one fact-scan shuffle builds the edge list; the
    spectrum runs on the dimension-bounded Laplacian (numpy driver
    solve vs the oracle's tournament-Jacobi — the ml_pca
    precedent)."""
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
    L = np.zeros((VNE_D, VNE_D))
    for r in e_rows:
        i, j = idx[r["a"]], idx[r["b"]]
        L[i, j] -= 1
        L[j, i] -= 1
        L[i, i] += 1
        L[j, j] += 1
    ev = np.linalg.eigvalsh(L)
    t = float(ev.sum())
    ps = [float(x) / t for x in ev]
    S = -sum(p * math.log(p) for p in ps if p > 1e-12)
    l2 = min(float(x) for x in ev if x > 1e-9)
    g4 = lambda x: math.floor(x * 1e4 + 0.5) / 1e4  # noqa: E731
    return spark.createDataFrame(
        [
            (
                n, math.floor(t * 10 + 0.5) / 10, g4(S),
                g4(S / math.log(n - 1)), g4(l2),
            )
        ],
        "n_nodes long, laplacian_trace double, von_neumann_entropy double, "
        "normalized_entropy double, algebraic_connectivity double",
    )


graph_von_neumann_entropy.__doc__ = graph_von_neumann_entropy.__doc__.format(
    d=VNE_D
)
