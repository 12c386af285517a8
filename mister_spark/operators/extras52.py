"""Wave 52: experimentation toolkit — sample-ratio-mismatch guard,
Bayesian A/B posterior, permutation test, and Bradley–Terry preference
ratings.

ml_ab_srm is the first gate every experiment platform runs (a biased
assignment invalidates everything downstream); stat_bayes_ab is the
Bayesian read of the same experiment (Beta posteriors + P(B beats A));
stat_permutation_test is the assumption-free significance test done the
scalable way (hash-drawn label flips, one aggregation, no data
duplication); ml_bradley_terry fits the preference model that
reward-model / RLHF data analysis runs on pairwise comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

SRM_ALPHA = 0.001  # industry-standard SRM alarm threshold
PERM_B = 64  # permutations
PERM_A = 1_000_003
PERM_C = 7_919
PERM_M = 1_000_033
BT_ITERS = 30


@query(
    "ml_ab_srm",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_a
          FROM u)
    SELECT n_users, n_a, n_users - n_a AS n_b,
           FLOOR(ABS(CAST(2 * n_a - n_users AS DOUBLE)) / sqrt(n_users)
                 * 10000 + 0.5) / 10000 AS z,
           FLOOR(2 * {normal_sf_sql(
               "ABS(CAST(2 * n_a - n_users AS DOUBLE)) / sqrt(n_users)"
           )} * 10000 + 0.5) / 10000 AS p_srm,
           CAST(CASE WHEN 2 * {normal_sf_sql(
               "ABS(CAST(2 * n_a - n_users AS DOUBLE)) / sqrt(n_users)"
           )} < {SRM_ALPHA} THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
    FROM c
    """,
)
def ml_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check for a 50/50 experiment: variant =
    user_id % 2, z = |n_a − n_b|/√n against the intended split, two-sided
    normal p, alarm at p < {alpha} (the industry SRM bar — a failed SRM
    means the assignment itself is biased and every downstream metric is
    suspect).

    Scale: one distinct-users aggregation (map-side partial over the
    user_id shuffle) to a single row; the test statistic is O(1) driver
    arithmetic in the plan."""
    ev = cat(spark, sf_dir)["events"]
    c = ev.select("user_id").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum((F.col("user_id") % 2 == 0).cast("int"))
        .cast("bigint")
        .alias("n_a"),
    )
    z = F.abs((2 * F.col("n_a") - F.col("n_users")).cast("double")) / F.sqrt(
        F.col("n_users")
    )
    p = 2 * normal_sf(z)
    return c.select(
        "n_users",
        "n_a",
        (F.col("n_users") - F.col("n_a")).alias("n_b"),
        ratio(z).alias("z"),
        ratio(p).alias("p_srm"),
        (p < SRM_ALPHA).cast("bigint").alias("srm_flag"),
    )


ml_ab_srm.__doc__ = ml_ab_srm.__doc__.format(alpha=SRM_ALPHA)


@query(
    "stat_bayes_ab",
    oracle=f"""
    WITH u AS (SELECT user_id,
                      CAST(MAX(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS conv
               FROM events GROUP BY 1),
    v AS (SELECT user_id % 2 AS variant, CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(conv) AS DOUBLE) AS s
          FROM u GROUP BY 1),
    w AS (SELECT MAX(CASE WHEN variant = 0 THEN n END) AS na,
                 MAX(CASE WHEN variant = 0 THEN s END) AS sa,
                 MAX(CASE WHEN variant = 1 THEN n END) AS nb,
                 MAX(CASE WHEN variant = 1 THEN s END) AS sb
          FROM v),
    m AS (SELECT na, sa, nb, sb,
                 (1.0 + sa) / (2.0 + na) AS mua,
                 (1.0 + sb) / (2.0 + nb) AS mub,
                 ((1.0 + sa) / (2.0 + na)) * (1.0 - (1.0 + sa) / (2.0 + na))
                   / (3.0 + na) AS va,
                 ((1.0 + sb) / (2.0 + nb)) * (1.0 - (1.0 + sb) / (2.0 + nb))
                   / (3.0 + nb) AS vb
          FROM w)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(sa AS BIGINT) AS s_a,
           CAST(nb AS BIGINT) AS n_b, CAST(sb AS BIGINT) AS s_b,
           FLOOR(mua * 10000 + 0.5) / 10000 AS mu_a,
           FLOOR(mub * 10000 + 0.5) / 10000 AS mu_b,
           FLOOR((CASE WHEN mub >= mua
                  THEN 1.0 - {normal_sf_sql("(mub - mua) / sqrt(va + vb)")}
                  ELSE {normal_sf_sql("(mua - mub) / sqrt(va + vb)")} END)
                 * 10000 + 0.5) / 10000 AS p_b_beats_a
    FROM m
    """,
)
def stat_bayes_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian A/B on conversion (user made a purchase): Beta(1+s,
    1+n−s) posteriors per variant, reported as posterior means plus
    P(B beats A) under the normal approximation to the posterior
    difference — the closed form both engines can evaluate identically
    (exact Beta tail needs lgamma, which neither exposes portably; at
    n in the thousands the approximation error is far inside the
    4-decimal grid).

    Scale: one user-grain rollup (conversion flag), one 2-group
    aggregation, O(1) arithmetic after — the whole posterior is
    model-sized."""
    ev = cat(spark, sf_dir)["events"]
    u = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    )
    v = u.groupBy((F.col("user_id") % 2).alias("variant")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("conv").cast("double").alias("s"),
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("variant") == 0, F.col("s"))).alias("sa"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("variant") == 1, F.col("s"))).alias("sb"),
    )
    mua = (1.0 + F.col("sa")) / (2.0 + F.col("na"))
    mub = (1.0 + F.col("sb")) / (2.0 + F.col("nb"))
    va = mua * (1.0 - mua) / (3.0 + F.col("na"))
    vb = mub * (1.0 - mub) / (3.0 + F.col("nb"))
    d = (mub - mua) / F.sqrt(va + vb)
    prob = F.when(d >= 0, 1.0 - normal_sf(d)).otherwise(normal_sf(-d))
    return w.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("sa").cast("bigint").alias("s_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("sb").cast("bigint").alias("s_b"),
        ratio(mua).alias("mu_a"),
        ratio(mub).alias("mu_b"),
        ratio(prob).alias("p_b_beats_a"),
    )


@query(
    "stat_permutation_test",
    oracle=f"""
    WITH e AS (SELECT event_id, value,
                      CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
               FROM events WHERE event_type IN ('click', 'view')),
    obs AS (SELECT AVG(CASE WHEN g = 1 THEN value END)
                   - AVG(CASE WHEN g = 0 THEN value END) AS d
            FROM e),
    b AS (SELECT unnest(generate_series(0, {PERM_B - 1})) AS b),
    p AS (SELECT b.b,
                 CASE WHEN ((e.event_id * {PERM_A} + b.b * {PERM_C})
                            % {PERM_M}) % 2 = 1
                      THEN 1 - e.g ELSE e.g END AS gp,
                 e.value
          FROM e CROSS JOIN b),
    pd AS (SELECT b, AVG(CASE WHEN gp = 1 THEN value END)
                     - AVG(CASE WHEN gp = 0 THEN value END) AS d
           FROM p GROUP BY b),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_perms,
                 CAST(SUM(CASE WHEN ABS(pd.d) >= ABS(obs.d)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
          FROM pd CROSS JOIN obs)
    SELECT FLOOR(obs.d * 10000 + 0.5) / 10000 AS obs_diff,
           s.n_perms, s.n_extreme,
           FLOOR(CAST(1 + s.n_extreme AS DOUBLE) / (1 + s.n_perms)
                 * 10000 + 0.5) / 10000 AS p_value
    FROM s CROSS JOIN obs
    """,
)
def stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the click-vs-view mean-value difference:
    {b} label permutations drawn by a deterministic hash bit per
    (event, replicate), p = (1 + #extreme)/(1 + B) — the
    assumption-free test, done without materializing B shuffled copies.

    Scale: like ml_bootstrap_ci, the permutation dimension is a
    broadcast {b}-row explode whose per-(b, group) partials map-side
    combine before the one shuffle; the comparison against the observed
    statistic is a broadcast of a single row. O({b}) result regardless
    of data size."""
    ev = cat(spark, sf_dir)["events"]
    e = ev.filter(F.col("event_type").isin("click", "view")).select(
        "event_id",
        "value",
        (F.col("event_type") == "click").cast("int").alias("g"),
    )
    obs = e.agg(
        (
            F.avg(F.when(F.col("g") == 1, F.col("value")))
            - F.avg(F.when(F.col("g") == 0, F.col("value")))
        ).alias("d")
    )
    b = spark.range(PERM_B).select(F.col("id").alias("b"))
    flip = ((F.col("event_id") * PERM_A + F.col("b") * PERM_C) % PERM_M) % 2
    p = e.join(F.broadcast(b)).select(
        "b",
        "value",
        F.when(flip == 1, 1 - F.col("g")).otherwise(F.col("g")).alias("gp"),
    )
    pd_ = p.groupBy("b").agg(
        (
            F.avg(F.when(F.col("gp") == 1, F.col("value")))
            - F.avg(F.when(F.col("gp") == 0, F.col("value")))
        ).alias("d")
    )
    s = pd_.join(F.broadcast(obs.select(F.col("d").alias("od")))).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_perms"),
        F.sum((F.abs(F.col("d")) >= F.abs(F.col("od"))).cast("int"))
        .cast("bigint")
        .alias("n_extreme"),
    )
    return s.join(F.broadcast(obs)).select(
        ratio(F.col("d")).alias("obs_diff"),
        "n_perms",
        "n_extreme",
        ratio(
            (1 + F.col("n_extreme")).cast("double") / (1 + F.col("n_perms"))
        ).alias("p_value"),
    )


stat_permutation_test.__doc__ = stat_permutation_test.__doc__.format(b=PERM_B)


def bt_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise preference counts: adjacent docs (doc_id, doc_id+1) from
    different sources form a comparison, the longer document (n_chars,
    doc_id tiebreak excluded — ties dropped) wins. Distributed part of
    ml_bradley_terry; returns (winner, loser, wins)."""
    docs = cat(spark, sf_dir)["documents"]
    a = docs.select(
        F.col("doc_id").alias("ida"),
        F.col("source").alias("sa"),
        F.col("n_chars").alias("ca"),
    )
    bfr = docs.select(
        (F.col("doc_id") - 1).alias("ida"),
        F.col("source").alias("sb"),
        F.col("n_chars").alias("cb"),
    )
    pairs = a.join(bfr, "ida").filter(
        (F.col("sa") != F.col("sb")) & (F.col("ca") != F.col("cb"))
    )
    return (
        pairs.select(
            F.when(F.col("ca") > F.col("cb"), F.col("sa"))
            .otherwise(F.col("sb"))
            .alias("winner"),
            F.when(F.col("ca") > F.col("cb"), F.col("sb"))
            .otherwise(F.col("sa"))
            .alias("loser"),
        )
        .groupBy("winner", "loser")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wins"))
    )


@query(
    "ml_bradley_terry",
    # Real oracle: the MM fixed point runs in a recursive CTE over the
    # |sources| strength vector — per step, denom_i = Σ_j
    # N_ij/(γ_i+γ_j) via a double self-join on the working table, the
    # update wi/denom, then the geometric-mean normalization as a
    # window over the step's rows. Mirrors the numpy guards
    # (GREATEST 1e-300, keep γ when denom = 0).
    oracle=f"""
    WITH RECURSIVE docs AS (SELECT doc_id, source, n_chars FROM documents),
    wins AS (SELECT winner, loser, CAST(COUNT(*) AS DOUBLE) AS wins FROM (
               SELECT CASE WHEN a.n_chars > b.n_chars
                           THEN a.source ELSE b.source END AS winner,
                      CASE WHEN a.n_chars > b.n_chars
                           THEN b.source ELSE a.source END AS loser
               FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1
               WHERE a.source <> b.source AND a.n_chars <> b.n_chars) p
             GROUP BY 1, 2),
    nmat AS (SELECT i, j, SUM(cnt) AS cnt FROM (
               SELECT winner AS i, loser AS j, wins AS cnt FROM wins
               UNION ALL SELECT loser, winner, wins FROM wins) u
             GROUP BY 1, 2),
    wsum AS (SELECT winner AS item, SUM(wins) AS wi
             FROM wins GROUP BY 1),
    items AS (SELECT DISTINCT item FROM (
                SELECT winner AS item FROM wins
                UNION ALL SELECT loser FROM wins) v),
    bt AS (
      SELECT 0 AS it, item, CAST(1.0 AS DOUBLE) AS g FROM items
      UNION ALL
      SELECT it, item,
             gn / EXP(AVG(LN(GREATEST(gn, 1e-300))) OVER ()) FROM (
        SELECT b.it + 1 AS it, b.item,
               CASE WHEN d.denom > 0
                    THEN COALESCE(w.wi, 0.0) / GREATEST(d.denom, 1e-300)
                    ELSE b.g END AS gn
        FROM bt b
        JOIN (SELECT b1.item, SUM(n.cnt / (b1.g + b2.g)) AS denom
              FROM bt b1
              JOIN nmat n ON n.i = b1.item
              JOIN bt b2 ON b2.item = n.j
              GROUP BY b1.item) d ON d.item = b.item
        LEFT JOIN wsum w ON w.item = b.item
        WHERE b.it < {BT_ITERS}) s
    ),
    games AS (SELECT i AS item, CAST(SUM(cnt) AS BIGINT) AS games
              FROM nmat GROUP BY 1)
    SELECT b.item AS source,
           FLOOR(b.g * 10000 + 0.5) / 10000 AS strength,
           CAST(COALESCE(w.wi, 0) AS BIGINT) AS wins,
           gm.games
    FROM bt b
    LEFT JOIN wsum w ON w.item = b.item
    JOIN games gm ON gm.item = b.item
    WHERE b.it = {BT_ITERS}
    """,
)
def ml_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley–Terry preference strengths over sources from pairwise
    document comparisons (the model reward-model data analysis fits to
    human preference pairs): γ_i maximizes Π γ_w/(γ_w+γ_l) via {it}
    MM iterations — γ_i ← w_i / Σ_j n_ij/(γ_i+γ_j) — normalized to
    geometric mean 1.

    Scale: the comparisons aggregation is the only data-sized stage
    (one self-join on adjacent doc_id + one groupBy to |sources|² wins
    cells); the MM fixed-point iterates on the collected wins MATRIX —
    O(|items|²) driver state, never O(data) — exactly like ml_kmeans'
    centroid loop. Items here = 20 sources; a 1M-item preference fit
    would move the MM step into Spark joins, same math."""
    import numpy as np

    w = bt_wins(spark, sf_dir)
    cells = w.collect()  # O(|sources|^2) model-sized
    items = sorted({r["winner"] for r in cells} | {r["loser"] for r in cells})
    idx = {s: i for i, s in enumerate(items)}
    k = len(items)
    W = np.zeros((k, k))
    for r in cells:
        W[idx[r["winner"]], idx[r["loser"]]] = r["wins"]
    N = W + W.T
    wi = W.sum(axis=1)
    g = np.ones(k)
    for _ in range(BT_ITERS):
        denom = (N / np.add.outer(g, g)).sum(axis=1)
        g = np.where(denom > 0, wi / np.maximum(denom, 1e-300), g)
        g = g / np.exp(np.log(np.maximum(g, 1e-300)).mean())
    rows = [
        (
            s,
            float(np.floor(g[idx[s]] * 10000 + 0.5) / 10000),
            int(wi[idx[s]]),
            int(N[idx[s]].sum()),
        )
        for s in items
    ]
    return spark.createDataFrame(
        rows, "source string, strength double, wins long, games long"
    ).orderBy(F.desc("strength"), "source")


ml_bradley_terry.__doc__ = ml_bradley_terry.__doc__.format(it=BT_ITERS)
