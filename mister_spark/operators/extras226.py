"""Wave 226: contagion stress-testing and label-error estimation.

graph_sir_contagion runs deterministic discrete-time SIR dynamics on
the trade network: seed the highest-degree nation, and per step move
susceptible mass to infected at rate beta times the neighbor
infection average and infected to recovered at rate gamma. The
output epidemic curve (s/i/r shares per step, peak step, final
attack rate) is the standard stress test for "if a disruption starts
at the hub, how far and how fast does it spread?" — a DYNAMIC
question the static centrality family (eigencentrality, k-core)
only hints at. ds_confident_learning estimates how many LABELS are
wrong from the scorer + labels alone (Northcutt's confident joint,
binary form): per-class confidence thresholds = the class's mean
predicted probability, counts of confidently-predicted examples
whose given label disagrees, and the implied label-error rate — the
number that decides whether a relabeling pass is worth the money.

Exactness: SIR is a fixed-step recursion on shared closed-form
updates over the dimension-bounded node frame (list-carried in the
oracle); the confident joint runs on 1e-6-snapped probabilities and
integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.operators.extras32 import CAL_POS_LABEL_LT
from mister_spark.registry import query

SIR_BETA = 0.6
SIR_GAMMA = 0.25
SIR_STEPS = 20
SIR_SEED_I = 0.9  # initial infected share at the seed nation


@query(
    "graph_sir_contagion",
    # Real oracle: the seed pick is an integer (degree, node) argmax,
    # the recursion carries per-node s/i lists with identical
    # update arithmetic (neighbor sums via in-list indexing), and the
    # per-step shares are the same weighted means on the grid.
    oracle=f"""
    WITH RECURSIVE e0 AS (
      SELECT DISTINCT LEAST(s.s_nationkey, c.c_nationkey) AS a,
             GREATEST(s.s_nationkey, c.c_nationkey) AS b
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE s.s_nationkey <> c.c_nationkey),
    sym AS (SELECT a AS u, b AS v FROM e0
            UNION ALL SELECT b, a FROM e0),
    nodes AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg,
                     ROW_NUMBER() OVER (ORDER BY u) AS i
              FROM sym GROUP BY u),
    seed AS (SELECT i AS si FROM nodes
             ORDER BY deg DESC, node LIMIT 1),
    adj AS (SELECT ni.i AS i, nj.i AS j FROM sym
            JOIN nodes ni ON ni.node = sym.u
            JOIN nodes nj ON nj.node = sym.v),
    sir AS (
      SELECT 0 AS it,
             (SELECT list(CASE WHEN n.i = seed.si
                          THEN CAST(1.0 - {SIR_SEED_I} AS DOUBLE)
                          ELSE CAST(1.0 AS DOUBLE) END ORDER BY n.i)
              FROM nodes n, seed) AS s,
             (SELECT list(CASE WHEN n.i = seed.si
                          THEN CAST({SIR_SEED_I} AS DOUBLE)
                          ELSE CAST(0.0 AS DOUBLE) END ORDER BY n.i)
              FROM nodes n, seed) AS iv
      UNION ALL
      SELECT it + 1, list(ns ORDER BY i), list(ni2 ORDER BY i)
      FROM (
        SELECT q.it, q.i,
               q.sv - {SIR_BETA} * q.sv * q.press AS ns,
               q.iv1 + {SIR_BETA} * q.sv * q.press
                 - {SIR_GAMMA} * q.iv1 AS ni2
        FROM (
          SELECT sir.it, nd.i, sir.s[nd.i] AS sv, sir.iv[nd.i] AS iv1,
                 (SELECT COALESCE(SUM(sir.iv[a2.j]), 0)
                  FROM adj a2 WHERE a2.i = nd.i) / nd.deg AS press
          FROM sir CROSS JOIN nodes nd
          WHERE sir.it < {SIR_STEPS}
        ) q
      ) z GROUP BY it),
    curve AS (SELECT sir.it,
                     list_aggregate(sir.s, 'sum') / len(sir.s)
                       AS s_share,
                     list_aggregate(sir.iv, 'sum') / len(sir.iv)
                       AS i_share
              FROM sir),
    pk AS (SELECT it AS peak_step FROM curve
           ORDER BY FLOOR(i_share * 1e6 + 0.5) DESC, it LIMIT 1)
    SELECT curve.it AS step,
           FLOOR(curve.s_share * 1e4 + 0.5) / 1e4 AS s_share,
           FLOOR(curve.i_share * 1e4 + 0.5) / 1e4 AS i_share,
           FLOOR((1 - curve.s_share - curve.i_share) * 1e4 + 0.5) / 1e4
             AS r_share,
           (SELECT peak_step FROM pk) AS peak_step,
           (SELECT FLOOR((1 - s_share) * 1e4 + 0.5) / 1e4 FROM curve
            WHERE it = {SIR_STEPS}) AS final_attack_rate
    FROM curve
    """,
)
def graph_sir_contagion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic SIR on the trade graph: seed the highest-degree
    nation at {si} infected share, then per step
    ds = -beta*s*(neighbor infected mean), di = -ds - gamma*i for
    {t} steps (beta {b}, gamma {g}). Emits the epidemic curve with
    the peak step and the final attack rate 1 - s_T — how much of
    the network a hub-origin disruption ultimately touches, and how
    fast. The dynamic complement to static centrality: two graphs
    with identical degree sequences can have wildly different curves.

    Scale: the one fact-scan shuffle builds the edge list; the
    dynamics run on the dimension-bounded node frame (driver
    arithmetic, ridge-path precedent), and the oracle replays the
    identical recursion carrying s/i lists. On a billion-node graph
    each step is one edge-join + mean-agg (the eigencentrality
    loop's shape) — same math, distributed carrier."""
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
        .collect()  # nation-bounded edge list (documented)
    )
    edges = [(r["a"], r["b"]) for r in e_rows]
    node_ids = sorted({x for ab in edges for x in ab})
    idx = {u: i for i, u in enumerate(node_ids)}
    n = len(node_ids)
    nbrs: list[list[int]] = [[] for _ in range(n)]
    for a, b in edges:
        nbrs[idx[a]].append(idx[b])
        nbrs[idx[b]].append(idx[a])
    deg = [len(x) for x in nbrs]
    seed = max(range(n), key=lambda i: (deg[i], -node_ids[i]))
    s = [1.0] * n
    iv = [0.0] * n
    s[seed] = 1.0 - SIR_SEED_I
    iv[seed] = SIR_SEED_I
    import math

    g4 = lambda x: math.floor(x * 1e4 + 0.5) / 1e4  # noqa: E731
    curve = [(0, sum(s) / n, sum(iv) / n)]
    for t in range(1, SIR_STEPS + 1):
        press = [
            sum(iv[j] for j in nbrs[i]) / deg[i] if deg[i] else 0.0
            for i in range(n)
        ]
        ns = [s[i] - SIR_BETA * s[i] * press[i] for i in range(n)]
        niv = [
            iv[i] + SIR_BETA * s[i] * press[i] - SIR_GAMMA * iv[i]
            for i in range(n)
        ]
        s, iv = ns, niv
        curve.append((t, sum(s) / n, sum(iv) / n))
    peak = min(
        (t for t, _, _ in curve),
        key=lambda t: (-math.floor(curve[t][2] * 1e6 + 0.5), t),
    )
    final_attack = g4(1 - curve[SIR_STEPS][1])
    out = [
        (t, g4(ss), g4(ii), g4(1 - ss - ii), peak, final_attack)
        for t, ss, ii in curve
    ]
    return spark.createDataFrame(
        out,
        "step long, s_share double, i_share double, r_share double, "
        "peak_step long, final_attack_rate double",
    )


graph_sir_contagion.__doc__ = graph_sir_contagion.__doc__.format(
    si=SIR_SEED_I, t=SIR_STEPS, b=SIR_BETA, g=SIR_GAMMA
)


@query(
    "ds_confident_learning",
    # Real oracle: probabilities snap to the 1e-6 grid, per-class
    # thresholds are exact grid means (integer p6 sums / counts,
    # compared cross-multiplied), the confident joint is integer
    # counts, and the error rate is one final ratio.
    oracle=f"""
    WITH s AS (SELECT CAST(FLOOR((1.0 / (1.0 + exp(-CAST(embedding[1]
                      AS DOUBLE)))) * 1e6 + 0.5) AS BIGINT) AS p6,
                      CASE WHEN label < {CAL_POS_LABEL_LT} THEN 1
                           ELSE 0 END AS y
               FROM embeddings),
    th AS (SELECT CAST(SUM(CASE WHEN y = 1 THEN p6 ELSE 0 END)
                       AS BIGINT) AS s1,
                  CAST(SUM(y) AS BIGINT) AS n1,
                  CAST(SUM(CASE WHEN y = 0 THEN 1000000 - p6 ELSE 0 END)
                       AS BIGINT) AS s0,
                  CAST(SUM(1 - y) AS BIGINT) AS n0,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM s),
    -- confident prediction: class c iff its probability clears that
    -- class's mean threshold (integer cross-multiplied compares);
    -- both cleared -> the larger probability side; neither -> skip
    cj AS (SELECT y,
                  CASE
                    WHEN p6 * n1 >= s1 AND (1000000 - p6) * n0 >= s0
                      THEN CASE WHEN p6 >= 500000 THEN 1 ELSE 0 END
                    WHEN p6 * n1 >= s1 THEN 1
                    WHEN (1000000 - p6) * n0 >= s0 THEN 0
                    ELSE -1 END AS yhat
           FROM s, th),
    cnt AS (SELECT CAST(SUM(CASE WHEN yhat = 1 AND y = 1 THEN 1
                           ELSE 0 END) AS BIGINT) AS c11,
                   CAST(SUM(CASE WHEN yhat = 0 AND y = 0 THEN 1
                           ELSE 0 END) AS BIGINT) AS c00,
                   CAST(SUM(CASE WHEN yhat = 1 AND y = 0 THEN 1
                           ELSE 0 END) AS BIGINT) AS c10,
                   CAST(SUM(CASE WHEN yhat = 0 AND y = 1 THEN 1
                           ELSE 0 END) AS BIGINT) AS c01,
                   CAST(SUM(CASE WHEN yhat >= 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS confident
            FROM cj)
    SELECT th.n AS n_scored, cnt.confident AS n_confident,
           FLOOR(CAST(th.s1 AS DOUBLE) / th.n1 / 1e6 * 1e4 + 0.5) / 1e4
             AS threshold_pos,
           FLOOR(CAST(th.s0 AS DOUBLE) / th.n0 / 1e6 * 1e4 + 0.5) / 1e4
             AS threshold_neg,
           cnt.c10 AS flagged_neg_labeled_pos_scored,
           cnt.c01 AS flagged_pos_labeled_neg_scored,
           FLOOR(CAST(cnt.c10 + cnt.c01 AS DOUBLE)
                 / GREATEST(cnt.confident, 1) * 1e4 + 0.5) / 1e4
             AS est_label_error_rate
    FROM th, cnt
    """,
)
def ds_confident_learning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning label-error estimate (binary confident
    joint) on the sigmoid scorer vs the given labels: per-class
    thresholds are the class's own mean predicted probability, an
    example is confidently class c when its probability clears c's
    threshold, and confidently-predicted examples whose GIVEN label
    disagrees are the estimated label errors. est_label_error_rate
    is the fraction of the corpus a relabeling pass should expect to
    flip — computed from scores and labels alone, no clean holdout
    needed. The triage number before paying for annotation.

    Scale: one narrow map + two 1-row integer aggregates; thresholds
    compare cross-multiplied (no float thresholds), map-side
    combinable end to end."""
    prob6 = F.floor(
        (1.0 / (1.0 + F.exp(-F.element_at("embedding", 1).cast("double"))))
        * 1e6
        + F.lit(0.5)
    ).cast("bigint")
    s = cat(spark, sf_dir)["embeddings"].select(
        prob6.alias("p6"),
        F.when(F.col("label") < CAL_POS_LABEL_LT, 1).otherwise(0).alias("y"),
    ).localCheckpoint()  # feeds thresholds + joint
    th = s.agg(
        F.sum(F.when(F.col("y") == 1, F.col("p6")).otherwise(0)).alias("s1"),
        F.sum("y").alias("n1"),
        F.sum(
            F.when(F.col("y") == 0, 1000000 - F.col("p6")).otherwise(0)
        ).alias("s0"),
        F.sum(1 - F.col("y")).alias("n0"),
        F.count(F.lit(1)).alias("n"),
    )
    cj = s.crossJoin(F.broadcast(th)).select(
        "y", "n", "s1", "n1", "s0", "n0",
        F.when(
            (F.col("p6") * F.col("n1") >= F.col("s1"))
            & ((1000000 - F.col("p6")) * F.col("n0") >= F.col("s0")),
            F.when(F.col("p6") >= 500000, 1).otherwise(0),
        )
        .when(F.col("p6") * F.col("n1") >= F.col("s1"), 1)
        .when((1000000 - F.col("p6")) * F.col("n0") >= F.col("s0"), 0)
        .otherwise(-1)
        .alias("yhat"),
    )
    cnt = cj.groupBy("n", "s1", "n1", "s0", "n0").agg(
        F.sum(
            F.when((F.col("yhat") == 1) & (F.col("y") == 0), 1).otherwise(0)
        ).alias("c10"),
        F.sum(
            F.when((F.col("yhat") == 0) & (F.col("y") == 1), 1).otherwise(0)
        ).alias("c01"),
        F.sum(F.when(F.col("yhat") >= 0, 1).otherwise(0)).alias("confident"),
    )
    return cnt.select(
        F.col("n").cast("bigint").alias("n_scored"),
        F.col("confident").cast("bigint").alias("n_confident"),
        rnd(F.col("s1").cast("double") / F.col("n1") / 1e6, 4).alias(
            "threshold_pos"
        ),
        rnd(F.col("s0").cast("double") / F.col("n0") / 1e6, 4).alias(
            "threshold_neg"
        ),
        F.col("c10").cast("bigint").alias("flagged_neg_labeled_pos_scored"),
        F.col("c01").cast("bigint").alias("flagged_pos_labeled_neg_scored"),
        rnd(
            (F.col("c10") + F.col("c01")).cast("double")
            / F.greatest(F.col("confident"), F.lit(1)),
            4,
        ).alias("est_label_error_rate"),
    )
