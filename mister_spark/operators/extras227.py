"""Wave 227: stochastic-dominance auditing and Markov hitting times.

stat_almost_stochastic_order quantifies HOW MUCH of the
distributional gap between urgent and low-priority order values
violates stochastic dominance: on the shared $500 grid,
W1 = integral |F_A - F_B| is the total gap and the violation mass is
the part where F_A > F_B (A's claim to be stochastically larger
fails). The violation ratio in [0, 1] is the "almost stochastic
order" decision quantity used to compare ML model score
distributions — 0 = clean dominance, 0.5 = no order at all —
strictly more informative than Mann-Whitney's single p.
ev_markov_first_passage turns ev_markov's transition matrix into
EXPECTED HITTING TIMES: for every ordered pair of event types, the
mean number of steps from first seeing A to first reaching B, by
value iteration on h = 1 + P_{-t} h. ml_absorbing_markov answers
this for absorbing funnels; this is the recurrent-chain version —
"how far is purchase from error, in clicks?" for every pair.

Exactness: ECDF masses are integer cumulative counts times integer
grid widths; the transition matrix is integer counts row-normalized
identically, and the fixed-round value iteration replays in a
list-carrying recursion with shared arithmetic, grid-rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

ASO_BUCKET = 500
ASO_A = "1"  # claimed stochastically LARGER group (urgent)
ASO_B = "5"
FP_ITERS = 120  # value-iteration rounds (geometric convergence)


@query(
    "stat_almost_stochastic_order",
    # Real oracle: cumulative counts and grid widths are integers,
    # the ECDF differences are rationals of identical operands, and
    # the three integrals (total gap, violation, ratio) round on the
    # shared grid.
    oracle=f"""
    WITH g AS (SELECT substr(o_orderpriority, 1, 1) AS g,
                      CAST(FLOOR(o_totalprice / {ASO_BUCKET}) AS BIGINT)
                        AS v,
                      CAST(COUNT(*) AS BIGINT) AS c
               FROM orders
               WHERE substr(o_orderpriority, 1, 1)
                     IN ('{ASO_A}', '{ASO_B}')
               GROUP BY 1, 2),
    n AS (SELECT CAST(SUM(CASE WHEN g = '{ASO_A}' THEN c ELSE 0 END)
                      AS DOUBLE) AS na,
                 CAST(SUM(CASE WHEN g = '{ASO_B}' THEN c ELSE 0 END)
                      AS DOUBLE) AS nb
          FROM g),
    grid AS (SELECT v,
                    CAST(SUM(CASE WHEN g = '{ASO_A}' THEN c ELSE 0 END)
                         AS BIGINT) AS ca,
                    CAST(SUM(CASE WHEN g = '{ASO_B}' THEN c ELSE 0 END)
                         AS BIGINT) AS cb
             FROM g GROUP BY 1),
    cum AS (SELECT v,
                   SUM(ca) OVER (ORDER BY v) AS cca,
                   SUM(cb) OVER (ORDER BY v) AS ccb,
                   LEAD(v) OVER (ORDER BY v) AS nxt
            FROM grid),
    seg AS (SELECT (CAST(cca AS DOUBLE) / n.na
                    - CAST(ccb AS DOUBLE) / n.nb) AS df,
                   CAST(COALESCE(nxt - v, 0) AS DOUBLE) AS w
            FROM cum, n),
    agg AS (SELECT SUM(ABS(df) * w) * {ASO_BUCKET} AS w1,
                   SUM(GREATEST(df, 0) * w) * {ASO_BUCKET} AS viol
            FROM seg)
    SELECT CAST(n.na AS BIGINT) AS n_a, CAST(n.nb AS BIGINT) AS n_b,
           FLOOR(agg.w1 * 100 + 0.5) / 100 AS w1_distance,
           FLOOR(agg.viol * 100 + 0.5) / 100 AS violation_mass,
           FLOOR(CASE WHEN agg.w1 <= 0 THEN 0.0
                      ELSE agg.viol / agg.w1 END * 1e4 + 0.5) / 1e4
             AS violation_ratio
    FROM n, agg
    """,
)
def stat_almost_stochastic_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Almost-stochastic-order audit of "urgent orders are worth
    stochastically more" ({a} vs {b}) on the $500 grid: the claim
    holds cleanly iff F_A <= F_B everywhere; violation_mass
    integrates the region where it fails and violation_ratio =
    violation / W1 scores it in [0, 1] (0 = clean dominance, ~0.5 =
    no ordering). The dominance-comparison standard for ML score
    distributions, applied to any two business segments: a
    Mann-Whitney p says the groups differ; this says whether the
    ordering CLAIM survives and by how much.

    Scale: ONE grid-collapse aggregation; cumulative windows + one
    LEAD on the bounded cell frame (the documented model-sized
    carry); two closed-form integrals."""
    g = (
        cat(spark, sf_dir)["orders"]
        .select(
            F.substring("o_orderpriority", 1, 1).alias("g"),
            F.floor(F.col("o_totalprice") / ASO_BUCKET)
            .cast("bigint")
            .alias("v"),
        )
        .filter(F.col("g").isin(ASO_A, ASO_B))
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    n = g.agg(
        F.sum(F.when(F.col("g") == ASO_A, F.col("c")).otherwise(0))
        .cast("double")
        .alias("na"),
        F.sum(F.when(F.col("g") == ASO_B, F.col("c")).otherwise(0))
        .cast("double")
        .alias("nb"),
    )
    grid = g.groupBy("v").agg(
        F.sum(F.when(F.col("g") == ASO_A, F.col("c")).otherwise(0)).alias(
            "ca"
        ),
        F.sum(F.when(F.col("g") == ASO_B, F.col("c")).otherwise(0)).alias(
            "cb"
        ),
    )
    cum = grid.select(
        "v",
        F.sum("ca").over(W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)).alias("cca"),
        F.sum("cb").over(W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)).alias("ccb"),
        F.lead("v").over(W.orderBy("v")).alias("nxt"),
    )
    df = F.col("cca").cast("double") / F.col("na") - F.col("ccb").cast(
        "double"
    ) / F.col("nb")
    w = F.coalesce(F.col("nxt") - F.col("v"), F.lit(0)).cast("double")
    agg = cum.crossJoin(F.broadcast(n)).agg(
        (F.sum(F.abs(df) * w) * ASO_BUCKET).alias("w1"),
        (F.sum(F.greatest(df, F.lit(0.0)) * w) * ASO_BUCKET).alias("viol"),
        F.first("na").alias("na"),
        F.first("nb").alias("nb"),
    )
    return agg.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        rnd(F.col("w1"), 2).alias("w1_distance"),
        rnd(F.col("viol"), 2).alias("violation_mass"),
        rnd(
            F.when(F.col("w1") <= 0, F.lit(0.0)).otherwise(
                F.col("viol") / F.col("w1")
            ),
            4,
        ).alias("violation_ratio"),
    )


stat_almost_stochastic_order.__doc__ = (
    stat_almost_stochastic_order.__doc__.format(a=ASO_A, b=ASO_B)
)


@query(
    "ev_markov_first_passage",
    # Real oracle: transition counts are integers from the exact
    # (user, ts, event_id) order, P rows normalize identically, and
    # the fixed-round value iteration replays in a list-carrying
    # recursion per target — shared arithmetic, grid-rounded.
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
               JOIN rs ON rs.a = c.a),
    k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states),
    vi AS (
      SELECT t.i AS tgt, 0 AS it,
             (SELECT list(CAST(0.0 AS DOUBLE) ORDER BY s2.i)
              FROM states s2) AS h
      FROM states t
      UNION ALL
      SELECT tgt, it + 1, list(hn ORDER BY i)
      FROM (
        SELECT vi.tgt, vi.it, nd.i,
               CASE WHEN nd.i = vi.tgt THEN CAST(0.0 AS DOUBLE)
                    ELSE 1.0 + (SELECT COALESCE(SUM(p2.pr *
                           CASE WHEN p2.j = vi.tgt THEN 0.0
                                ELSE vi.h[p2.j] END), 0.0)
                         FROM p p2 WHERE p2.i = nd.i) END AS hn
        FROM vi CROSS JOIN states nd
        WHERE vi.it < {FP_ITERS}
      ) q GROUP BY tgt, it),
    fin AS (SELECT tgt, h FROM vi WHERE it = {FP_ITERS})
    SELECT sa.st AS from_type, sb.st AS to_type,
           FLOOR(fin.h[sa.i] * 1e4 + 0.5) / 1e4 AS expected_steps
    FROM fin JOIN states sb ON sb.i = fin.tgt
         CROSS JOIN states sa
    WHERE sa.i <> fin.tgt
    """,
)
def ev_markov_first_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs expected hitting times of the user event-type chain:
    from ev_markov's row-normalized transition matrix, iterate
    h_t = 1 + P_(-t) h_t for {it} rounds per target t (geometric
    convergence; h(t->t) fixed at 0) and report E[steps from A to
    first B] for every ordered pair. The recurrent-chain sibling of
    ml_absorbing_markov: "how many clicks separate view from
    purchase, or error from recovery?" — journey distances, not just
    one-step probabilities.

    Scale: the transition count is the one sessionize-shaped
    shuffle; the chain is event-type-bounded (k x k), so the value
    iteration is driver arithmetic replayed exactly by the oracle's
    list-carrying recursion."""
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
        .collect()  # k x k integer cells (dimension-bounded)
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
    import math

    out = []
    for t in range(k):
        h = [0.0] * k
        for _ in range(FP_ITERS):
            hn = [0.0] * k
            for i in range(k):
                if i == t:
                    hn[i] = 0.0
                else:
                    acc = 0.0
                    for j in range(k):
                        if P[i][j]:
                            acc += P[i][j] * (0.0 if j == t else h[j])
                    hn[i] = 1.0 + acc
            h = hn
        for i in range(k):
            if i != t:
                out.append(
                    (
                        states[i], states[t],
                        math.floor(h[i] * 1e4 + 0.5) / 1e4,
                    )
                )
    return spark.createDataFrame(
        out, "from_type string, to_type string, expected_steps double"
    )


ev_markov_first_passage.__doc__ = ev_markov_first_passage.__doc__.format(
    it=FP_ITERS
)
