"""Wave 239: zero-truncated counts and trophic hierarchy.

stat_zero_truncated_poisson answers the question activity tables
structurally hide: the users you SEE all have >= 1 event, so the
naive mean overstates the true rate and says nothing about the
silent population. Fitting lambda from the zero-truncated
likelihood (mean = lambda / (1 - e^-lambda), five shared Newton
steps) recovers the untruncated rate, the implied zero-class share,
and the implied TOTAL population — the demand-iceberg estimate
stat_capture_recapture reaches with two samples, here from one.
graph_trophic_levels fits MacKay-Johnson-Rogers trophic levels to
the directed trade flow: each nation gets a HEIGHT solving the
weighted level equation (Jacobi-iterated), and the trophic
incoherence F0 summarizes whether value flows UP a hierarchy
(F0 ~ 0, supply-chain-like) or swirls in loops (F0 ~ 1).
graph_scc_bowtie says who is in the cycle; trophic levels measure
how STEEP the rest of the system is.

Exactness: the ZTP fit is a fixed-step Newton on two exact sums;
trophic levels iterate a shared linear recursion on the
dimension-bounded graph (list-carrying oracle replay), with F0 as
one closed-form ratio over integer edge weights.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

ZTP_NEWTON = 6
TL_ITERS = 80


@query(
    "stat_zero_truncated_poisson",
    # Real oracle: the observed mean is an exact integer ratio, the
    # Newton recursion runs the same {n} steps with shared closed
    # forms (state carried through a recursive CTE), and the implied
    # population algebra divides identical operands on the grid.
    oracle=f"""
    WITH RECURSIVE u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
               FROM events GROUP BY 1),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_obs,
                 CAST(SUM(k) AS DOUBLE) AS tot,
                 SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS ones
          FROM u),
    m AS (SELECT s.*, tot / n_obs AS mbar FROM s),
    nw AS (
      SELECT 0 AS it, GREATEST(m.mbar - 1, 0.1) AS lam FROM m
      UNION ALL
      SELECT it + 1,
             lam - (lam / (1 - EXP(-lam)) - m.mbar)
                   / ((1 - EXP(-lam) - lam * EXP(-lam))
                      / ((1 - EXP(-lam)) * (1 - EXP(-lam))))
      FROM nw, m WHERE it < {ZTP_NEWTON}),
    fit AS (SELECT lam FROM nw WHERE it = {ZTP_NEWTON}),
    o AS (SELECT m.n_obs, m.tot, m.mbar, m.ones, fit.lam,
                 EXP(-fit.lam) AS p0
          FROM m, fit)
    SELECT CAST(n_obs AS BIGINT) AS n_observed_users,
           FLOOR(mbar * 1e4 + 0.5) / 1e4 AS observed_mean,
           FLOOR(lam * 1e4 + 0.5) / 1e4 AS lambda,
           FLOOR(p0 * 1e4 + 0.5) / 1e4 AS implied_zero_share,
           FLOOR(n_obs / (1 - p0) * 10 + 0.5) / 10
             AS implied_total_population,
           FLOOR((n_obs / (1 - p0) - n_obs) * 10 + 0.5) / 10
             AS implied_silent_users
    FROM o
    """,
)
def stat_zero_truncated_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-truncated Poisson fit of events-per-user: the observed
    mean solves mbar = lambda/(1 - e^-lambda) ({n} Newton steps from
    mbar - 1), giving the UNtruncated rate, the zero-class
    probability e^-lambda, and the implied total population
    n_obs/(1 - p0) — how many users exist that the activity table
    never shows. The one-sample sibling of stat_capture_recapture,
    and the correction every "events per active user" metric
    silently needs.

    Scale: one user rollup to two sums; the Newton recursion is
    six shared closed-form steps on one row."""
    u = (
        cat(spark, sf_dir)["events"]
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    s = u.agg(
        F.count(F.lit(1)).cast("double").alias("n_obs"),
        F.sum("k").cast("double").alias("tot"),
    )
    row = s.collect()[0]
    n_obs, tot = row["n_obs"], row["tot"]
    mbar = tot / n_obs
    lam = max(mbar - 1, 0.1)
    for _ in range(ZTP_NEWTON):
        em = math.exp(-lam)
        f = lam / (1 - em) - mbar
        fp = (1 - em - lam * em) / ((1 - em) * (1 - em))
        lam = lam - f / fp
    p0 = math.exp(-lam)
    g = lambda x, sc: math.floor(x * sc + 0.5) / sc  # noqa: E731
    return spark.createDataFrame(
        [
            (
                int(n_obs), g(mbar, 1e4), g(lam, 1e4), g(p0, 1e4),
                g(n_obs / (1 - p0), 10),
                g(n_obs / (1 - p0) - n_obs, 10),
            )
        ],
        "n_observed_users long, observed_mean double, lambda double, "
        "implied_zero_share double, implied_total_population double, "
        "implied_silent_users double",
    )


stat_zero_truncated_poisson.__doc__ = (
    stat_zero_truncated_poisson.__doc__.format(n=ZTP_NEWTON)
)


@query(
    "graph_trophic_levels",
    # Real oracle: integer edge weights, the Jacobi level recursion
    # carries the height list with identical update arithmetic
    # (levels pinned to min 0 each round), and F0 is a closed-form
    # ratio of weighted squared height gaps.
    oracle=f"""
    WITH RECURSIVE e AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY 1, 2),
    nodes AS (SELECT node, CAST(SUM(win) AS BIGINT) AS din,
                     CAST(SUM(wout) AS BIGINT) AS dout,
                     ROW_NUMBER() OVER (ORDER BY node) AS i
              FROM (SELECT dst AS node, w AS win, 0 AS wout FROM e
                    UNION ALL
                    SELECT src, 0, w FROM e)
              GROUP BY node),
    adj AS (SELECT ni.i AS i, nj.i AS j, e.w FROM e
            JOIN nodes ni ON ni.node = e.dst
            JOIN nodes nj ON nj.node = e.src),
    tl AS (
      SELECT 0 AS it,
             (SELECT list(CAST(0.0 AS DOUBLE) ORDER BY i) FROM nodes)
               AS h
      UNION ALL
      SELECT it + 1, list(hn - mn ORDER BY i) FROM (
        SELECT it, i, hn, MIN(hn) OVER () AS mn FROM (
          SELECT tl.it, nd.i,
                 -- 0.5 damping: undamped Jacobi oscillates on
                 -- bipartite flow structures (eigenvalue -1 mode)
                 0.5 * tl.h[nd.i] + 0.5 *
                 ((nd.din + (SELECT COALESCE(SUM(a.w * tl.h[a.j]), 0.0)
                            FROM adj a WHERE a.i = nd.i)
                  + (SELECT COALESCE(SUM(a2.w * (tl.h[a2.i] - 1)), 0.0)
                     FROM adj a2 WHERE a2.j = nd.i))
                 / (nd.din + nd.dout)) AS hn
          FROM tl CROSS JOIN nodes nd
          WHERE tl.it < {TL_ITERS}
        ) q
      ) z GROUP BY it),
    fin AS (SELECT h FROM tl WHERE it = {TL_ITERS}),
    f0 AS (SELECT SUM(a.w * (fin.h[a.i] - fin.h[a.j] - 1)
                      * (fin.h[a.i] - fin.h[a.j] - 1))
                  / SUM(a.w) AS f
           FROM adj a, fin)
    SELECT n.n_name AS nation,
           FLOOR(fin.h[nd.i] * 1e4 + 0.5) / 1e4 AS trophic_level,
           CAST(nd.din AS BIGINT) AS inflow,
           CAST(nd.dout AS BIGINT) AS outflow,
           FLOOR(f0.f * 1e4 + 0.5) / 1e4 AS incoherence
    FROM nodes nd JOIN nation n ON n.n_nationkey = nd.node, fin, f0
    """,
)
def graph_trophic_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trophic levels of the directed trade flow (MacKay-Johnson-
    Rogers): each nation's height h satisfies the weighted level
    equation h_i = (w_in + sum_in w h_up + sum_out w (h_down - 1))
    / (w_in + w_out), Jacobi-iterated {it} rounds and re-floored to
    min 0 each step; incoherence F0 = weighted mean squared
    deviation of edge gaps from 1. F0 ~ 0 reads as a strict
    supplier-to-consumer hierarchy; F0 ~ 1 as loop-dominated trade.
    The continuous HOW-STEEP complement to graph_scc_bowtie's
    who-is-in-the-cycle.

    Scale: one fact-scan weight aggregation; the iteration runs on
    the dimension-bounded node frame (driver arithmetic, list-
    carrying oracle replay; an edge-join + agg per round at web
    scale)."""
    c = cat(spark, sf_dir)
    sup = c["supplier"].select("s_suppkey", F.col("s_nationkey").alias("src"))
    cus = c["customer"].select("c_custkey", F.col("c_nationkey").alias("dst"))
    e_rows = (
        c["lineitem"]
        .select("l_suppkey", "l_orderkey")
        .join(
            c["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cus), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .collect()  # nation-bounded weighted edges (documented)
    )
    nodes = sorted(
        {r["src"] for r in e_rows} | {r["dst"] for r in e_rows}
    )
    idx = {u: i for i, u in enumerate(nodes)}
    k = len(nodes)
    din = [0] * k
    dout = [0] * k
    in_e: list[list] = [[] for _ in range(k)]  # (from, w) into node
    out_e: list[list] = [[] for _ in range(k)]  # (to, w) out of node
    for r in e_rows:
        si, di = idx[r["src"]], idx[r["dst"]]
        w = r["w"]
        dout[si] += w
        din[di] += w
        in_e[di].append((si, w))
        out_e[si].append((di, w))
    h = [0.0] * k
    for _ in range(TL_ITERS):
        hn = [0.0] * k
        for i in range(k):
            acc = float(din[i])
            for j, w in in_e[i]:
                acc += w * h[j]
            for j, w in out_e[i]:
                acc += w * (h[j] - 1)
            hn[i] = 0.5 * h[i] + 0.5 * (acc / (din[i] + dout[i]))
        mn = min(hn)
        h = [x - mn for x in hn]
    num = den = 0.0
    for r in e_rows:
        si, di = idx[r["src"]], idx[r["dst"]]
        gap = h[di] - h[si] - 1
        num += r["w"] * gap * gap
        den += r["w"]
    f0 = num / den if den else 0.0
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in c["nation"].select("n_nationkey", "n_name").collect()
    }
    g4 = lambda x: math.floor(x * 1e4 + 0.5) / 1e4  # noqa: E731
    out = [
        (nat[u], g4(h[idx[u]]), din[idx[u]], dout[idx[u]], g4(f0))
        for u in nodes
    ]
    return spark.createDataFrame(
        out,
        "nation string, trophic_level double, inflow long, outflow long, "
        "incoherence double",
    )


graph_trophic_levels.__doc__ = graph_trophic_levels.__doc__.format(
    it=TL_ITERS
)
