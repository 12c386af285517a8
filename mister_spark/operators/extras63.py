"""Wave 63: governance + paired testing + calibration + funnel algebra.

io_pseudonymize is the data-governance tokenization pass (deterministic
keyed hashing keeps joins working while the raw identifier never leaves
the boundary — with the referential-integrity proof in the output);
stat_mcnemar is the PAIRED classifier comparison (two models on the
same items — the test ml_auc deltas silently need); ml_platt_scaling is
parametric sigmoid calibration fit by Newton on distributed bins (the
isotonic op's parametric sibling); ev_absorbing_markov solves the
funnel's absorbing-chain algebra — expected steps-to-purchase from
every state via the fundamental matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

PSEUDO_SALT = "ms_salt_v1"
MCN_T1 = 0.5  # classifier A threshold on sigmoid(dim 1)
MCN_T2 = 0.5  # classifier B threshold on sigmoid(dim 2)
PLATT_BINS = 50
PLATT_ITERS = 25
ABSORB_STATE = "purchase"


@query(
    "io_pseudonymize",
    oracle=f"""
    WITH e AS (SELECT md5('{PSEUDO_SALT}' || CAST(user_id AS VARCHAR))
                 AS token, event_type
               FROM events),
    g AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
          FROM e GROUP BY 1),
    chk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST((SELECT COUNT(DISTINCT user_id) FROM events)
                        AS BIGINT) AS n_users
            FROM g)
    SELECT g.token, g.n_events, g.n_types,
           CAST(CASE WHEN chk.n_tokens = chk.n_users THEN 1 ELSE 0 END
                AS BIGINT) AS bijective
    FROM g CROSS JOIN chk
    """,
)
def io_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keyed pseudonymization: user_id → md5(salt‖id)
    token, aggregates computed on the TOKEN only, plus the
    referential-integrity proof (token count == user count, so joins
    and group-bys on the token behave identically to the raw id). The
    governance pattern for shipping analytics outside the PII
    boundary; rotating the salt re-keys the whole corpus in one pass.

    Scale: the hash is a narrow JVM expression; grouping on the token
    shuffles exactly like grouping on the raw id (same cardinality)."""
    ev = cat(spark, sf_dir)["events"]
    e = ev.select(
        F.md5(
            F.concat(F.lit(PSEUDO_SALT), F.col("user_id").cast("string"))
        ).alias("token"),
        "event_type",
    )
    g = e.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
    ).localCheckpoint()
    chk = g.agg(F.count(F.lit(1)).alias("n_tokens")).join(
        F.broadcast(
            ev.agg(F.countDistinct("user_id").alias("n_users"))
        )
    )
    return g.join(F.broadcast(chk)).select(
        "token",
        "n_events",
        "n_types",
        (F.col("n_tokens") == F.col("n_users")).cast("bigint").alias(
            "bijective"
        ),
    )


@query(
    "stat_mcnemar",
    oracle=f"""
    WITH s AS (SELECT CASE WHEN 1.0 / (1.0 + exp(-CAST(embedding[1] AS DOUBLE)))
                            > {MCN_T1} THEN 1 ELSE 0 END AS a,
                      CASE WHEN 1.0 / (1.0 + exp(-CAST(embedding[2] AS DOUBLE)))
                            > {MCN_T2} THEN 1 ELSE 0 END AS b,
                      CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
               FROM embeddings),
    c AS (SELECT CAST(SUM(CASE WHEN a = y AND b <> y THEN 1 ELSE 0 END)
                      AS DOUBLE) AS n01,
                 CAST(SUM(CASE WHEN a <> y AND b = y THEN 1 ELSE 0 END)
                      AS DOUBLE) AS n10,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM s)
    SELECT n, CAST(n01 AS BIGINT) AS a_only_right,
           CAST(n10 AS BIGINT) AS b_only_right,
           FLOOR(CASE WHEN n01 + n10 > 0
                 THEN (ABS(n01 - n10) - 1) * (ABS(n01 - n10) - 1)
                      / (n01 + n10) ELSE 0 END * 10000 + 0.5) / 10000
             AS chi2,
           FLOOR(2 * {normal_sf_sql(
               "sqrt(CASE WHEN n01 + n10 > 0 THEN (ABS(n01 - n10) - 1)"
               " * (ABS(n01 - n10) - 1) / (n01 + n10) ELSE 0 END)"
           )} * 10000 + 0.5) / 10000 AS p_value
    FROM c
    """,
)
def stat_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for two classifiers scored on the SAME items
    (A = sigmoid(dim 0), B = sigmoid(dim 1), truth = label < 5): only
    the discordant cells matter — χ² = (|n01 − n10| − 1)²/(n01 + n10)
    with continuity correction, p from the shared χ²₁ tail. The
    correct replacement for comparing two accuracies as if they were
    independent samples.

    Scale: one pass to a 2×2 contingency — the entire test state is
    four integers."""
    emb = cat(spark, sf_dir)["embeddings"]
    sig1 = 1.0 / (1.0 + F.exp(-F.element_at("embedding", 1).cast("double")))
    sig2 = 1.0 / (1.0 + F.exp(-F.element_at("embedding", 2).cast("double")))
    s = emb.select(
        (sig1 > MCN_T1).cast("int").alias("a"),
        (sig2 > MCN_T2).cast("int").alias("b"),
        (F.col("label") < 5).cast("int").alias("y"),
    )
    c = s.agg(
        F.sum(((F.col("a") == F.col("y")) & (F.col("b") != F.col("y"))).cast("int"))
        .cast("double")
        .alias("n01"),
        F.sum(((F.col("a") != F.col("y")) & (F.col("b") == F.col("y"))).cast("int"))
        .cast("double")
        .alias("n10"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    n01, n10 = F.col("n01"), F.col("n10")
    chi2 = F.when(
        n01 + n10 > 0,
        (F.abs(n01 - n10) - 1) * (F.abs(n01 - n10) - 1) / (n01 + n10),
    ).otherwise(0.0)
    return c.select(
        "n",
        n01.cast("bigint").alias("a_only_right"),
        n10.cast("bigint").alias("b_only_right"),
        ratio(chi2).alias("chi2"),
        ratio(2 * normal_sf(F.sqrt(chi2))).alias("p_value"),
    )


@query(
    "ml_platt_scaling",
    # Real oracle: the 2-parameter Newton loop runs in a recursive CTE
    # whose single working row carries (A, B); each step re-aggregates
    # the 50-bin sufficient statistics for the gradient/Hessian and
    # applies the 2×2 solve. The det < 1e-12 break is mirrored by
    # freezing (A, B) — the frozen state reproduces the same det, so
    # later steps are no-ops exactly like Python's break.
    oracle=f"""
    WITH RECURSIVE bins AS (
      SELECT LEAST(CAST(FLOOR(1.0 / (1.0 + EXP(-CAST(embedding[1] AS DOUBLE)))
                         * {PLATT_BINS}) AS INT),
                   {PLATT_BINS} - 1) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN label < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos
      FROM embeddings GROUP BY 1),
    pts AS (SELECT (bin + 0.5) / {PLATT_BINS} AS s, bin,
                   CAST(n_pos AS DOUBLE) AS np, CAST(n - n_pos AS DOUBLE) AS nn
            FROM bins),
    tots AS (SELECT SUM(np) AS npos, SUM(nn) AS nneg,
                    (SUM(np) + 1.0) / (SUM(np) + 2.0) AS t1,
                    1.0 / (SUM(nn) + 2.0) AS t0
             FROM pts),
    nwt AS (
      SELECT 0 AS it, CAST(0.0 AS DOUBLE) AS a,
             LN((nneg + 1.0) / (npos + 1.0)) AS b
      FROM tots
      UNION ALL
      SELECT it + 1,
             CASE WHEN ABS(det) < 1e-12 THEN a
                  ELSE a - (g_a * h_bb - g_b * h_ab) / det END,
             CASE WHEN ABS(det) < 1e-12 THEN b
                  ELSE b - (g_b * h_aa - g_a * h_ab) / det END
      FROM (
        SELECT q.it, q.a, q.b, q.g_a, q.g_b, q.h_aa, q.h_ab, q.h_bb,
               q.h_aa * q.h_bb - q.h_ab * q.h_ab AS det
        FROM (
          SELECT w.it, w.a, w.b,
                 SUM(((p.np + p.nn) * sg - (p.np * t.t1 + p.nn * t.t0))
                     * p.s) AS g_a,
                 SUM((p.np + p.nn) * sg - (p.np * t.t1 + p.nn * t.t0))
                   AS g_b,
                 SUM(((p.np + p.nn) * sg * (1 - sg) + 1e-9) * p.s * p.s)
                   AS h_aa,
                 SUM(((p.np + p.nn) * sg * (1 - sg) + 1e-9) * p.s) AS h_ab,
                 SUM((p.np + p.nn) * sg * (1 - sg) + 1e-9) AS h_bb
          FROM nwt w
          CROSS JOIN tots t
          CROSS JOIN pts p
          CROSS JOIN LATERAL (SELECT 1.0 / (1.0 + EXP(-(w.a * p.s + w.b)))
                              AS sg) l
          WHERE w.it < {PLATT_ITERS}
          GROUP BY w.it, w.a, w.b) q) f
    ),
    fab AS (SELECT a, b FROM nwt WHERE it = {PLATT_ITERS})
    SELECT p.bin, CAST(p.np + p.nn AS BIGINT) AS n,
           FLOOR(p.np / GREATEST(p.np + p.nn, 1) * 10000 + 0.5) / 10000
             AS rate_raw,
           FLOOR(1.0 / (1.0 + EXP(-(f.a * p.s + f.b))) * 10000 + 0.5)
             / 10000 AS rate_platt,
           FLOOR(f.a * 10000 + 0.5) / 10000 AS coef_a,
           FLOOR(f.b * 10000 + 0.5) / 10000 AS coef_b
    FROM pts p CROSS JOIN fab f
    """,
)
def ml_platt_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Platt scaling: fit P(y=1|s) = σ(A·s + B) by Newton's method on
    the binned sufficient statistics (score-bin n / positives — the
    same {b}-bin frame ml_isotonic_calibration pools), with Platt's
    (n₊+1)/(n₊+2) target smoothing. Parametric where isotonic is
    nonparametric: 2 parameters, monotone by construction, safer on
    small data.

    Scale: one {b}-group shuffle; the Newton loop is O(bins·iters)
    driver arithmetic on the collected frame (model-sized, the
    ml_kmeans contract)."""
    import math

    from mister_spark.operators.extras55 import iso_bins

    rows = sorted(iso_bins(spark, sf_dir).collect(), key=lambda r: r["bin"])
    n_pos = sum(r["n_pos"] for r in rows)
    n_neg = sum(r["n"] - r["n_pos"] for r in rows)
    t1 = (n_pos + 1.0) / (n_pos + 2.0)
    t0 = 1.0 / (n_neg + 2.0)
    # bin center scores back on the sigmoid scale
    pts = []
    for r in rows:
        s = (r["bin"] + 0.5) / PLATT_BINS
        pts.append((s, r["n_pos"], r["n"] - r["n_pos"]))
    A, B = 0.0, math.log((n_neg + 1.0) / (n_pos + 1.0))
    for _ in range(PLATT_ITERS):
        g_a = g_b = h_aa = h_ab = h_bb = 0.0
        for s, np_, nn_ in pts:
            z = A * s + B
            p = 1.0 / (1.0 + math.exp(-z))
            w = np_ * t1 + nn_ * t0  # smoothed positive mass
            tot = np_ + nn_
            g = tot * p - w
            g_a += g * s
            g_b += g
            hw = tot * p * (1 - p) + 1e-9
            h_aa += hw * s * s
            h_ab += hw * s
            h_bb += hw
        det = h_aa * h_bb - h_ab * h_ab
        if abs(det) < 1e-12:
            break
        A -= (g_a * h_bb - g_b * h_ab) / det
        B -= (g_b * h_aa - g_a * h_ab) / det
    out = []
    for s, np_, nn_ in pts:
        z = A * s + B
        p = 1.0 / (1.0 + math.exp(-z))
        raw = np_ / max(np_ + nn_, 1)
        out.append(
            (
                int(round(s * PLATT_BINS - 0.5)),
                int(np_ + nn_),
                math.floor(raw * 10000 + 0.5) / 10000,
                math.floor(p * 10000 + 0.5) / 10000,
                math.floor(A * 10000 + 0.5) / 10000,
                math.floor(B * 10000 + 0.5) / 10000,
            )
        )
    return spark.createDataFrame(
        out,
        "bin int, n long, rate_raw double, rate_platt double, "
        "coef_a double, coef_b double",
    ).orderBy("bin")


ABS_MK_ITERS = 200  # Neumann-series depth in the oracle (rho^200 << 1e-4)


@query(
    "ml_absorbing_markov",
    # The fundamental matrix N = (I-Q)^-1 is a LAPACK solve on the
    # driver, but the quantities REPORTED (N·1 and N·R) are Neumann
    # series N = sum_n Q^n, so the oracle replays the series as a
    # recursive CTE over the same transition matrix: v_{n+1} = Q v_n
    # starting from 1 (expected steps) and from R (absorption prob),
    # accumulated for 200 terms. With every Q row sum <= 1 - p(absorb)
    # the tail is < rho^200, far below the pinned 1e-4 grid, so the
    # series and the solve agree exactly after rounding.
    oracle=f"""
    WITH RECURSIVE tr AS (
      SELECT s, nxt, CAST(COUNT(*) AS DOUBLE) AS c FROM (
        SELECT event_type AS s,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events) WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    states AS (SELECT DISTINCT st FROM (
                 SELECT s AS st FROM tr UNION ALL SELECT nxt FROM tr)),
    trans AS (SELECT st FROM states WHERE st <> '{ABSORB_STATE}'),
    rs AS (SELECT s, SUM(c) AS tot FROM tr GROUP BY s),
    q AS (SELECT tr.s AS i, tr.nxt AS j, tr.c / rs.tot AS p
          FROM tr JOIN rs ON rs.s = tr.s
          WHERE tr.s <> '{ABSORB_STATE}' AND tr.nxt <> '{ABSORB_STATE}'),
    r AS (SELECT t.st AS i,
                 COALESCE((SELECT tr.c / rs.tot
                           FROM tr JOIN rs ON rs.s = tr.s
                           WHERE tr.s = t.st
                             AND tr.nxt = '{ABSORB_STATE}'), 0.0) AS p
          FROM trans t),
    ser AS (
      SELECT 0 AS it, t.st AS i, CAST(1.0 AS DOUBLE) AS v, r.p AS w,
             CAST(1.0 AS DOUBLE) AS sv, r.p AS sw
      FROM trans t JOIN r ON r.i = t.st
      UNION ALL
      SELECT it + 1, i, v2, w2, sv + v2, sw + w2 FROM (
        SELECT s.it, t.st AS i,
               COALESCE(SUM(q.p * s.v), 0.0) AS v2,
               COALESCE(SUM(q.p * s.w), 0.0) AS w2,
               ANY_VALUE(sv0.sv) AS sv, ANY_VALUE(sv0.sw) AS sw
        FROM trans t
        CROSS JOIN (SELECT DISTINCT it FROM ser) s0
        JOIN ser s ON s.it = s0.it
        LEFT JOIN q ON q.i = t.st AND q.j = s.i
        JOIN ser sv0 ON sv0.it = s0.it AND sv0.i = t.st
        GROUP BY s.it, t.st
      ) WHERE it < {ABS_MK_ITERS}
    )
    SELECT i AS state, FLOOR(sv * 10000 + 0.5) / 10000 AS exp_steps,
           FLOOR(sw * 10000 + 0.5) / 10000 AS p_absorb
    FROM ser WHERE it = {ABS_MK_ITERS} ORDER BY state
    """,
)
def ml_absorbing_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorbing-chain funnel algebra: estimate the per-user event-type
    transition matrix (distributed, like ev_markov), make '{a}'
    absorbing, and solve N = (I − Q)⁻¹ on the driver — expected visits
    and expected steps-to-absorption from every transient state, plus
    absorption probability within the observed horizon. The closed-form
    answer to "how far is each state from conversion".

    Scale: transition counts are one (state, next) shuffle; the solve
    is |states|³ driver work on a 5×5 matrix — model-sized."""
    import numpy as np

    from pyspark.sql import Window as W

    ev = cat(spark, sf_dir)["events"]
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select(
            "user_id", "ts", "event_id", F.col("event_type").alias("s")
        )
        .withColumn("nxt", F.lead("s").over(wu))
        .filter(F.col("nxt").isNotNull())
        .groupBy("s", "nxt")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    cells = tr.collect()
    states = sorted({r["s"] for r in cells} | {r["nxt"] for r in cells})
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    C = np.zeros((k, k))
    for r in cells:
        C[idx[r["s"]], idx[r["nxt"]]] = r["c"]
    P = C / np.maximum(C.sum(axis=1, keepdims=True), 1e-12)
    ai = idx[ABSORB_STATE]
    P[ai, :] = 0.0
    P[ai, ai] = 1.0
    trans = [i for i in range(k) if i != ai]
    Q = P[np.ix_(trans, trans)]
    R = P[np.ix_(trans, [ai])]
    N = np.linalg.inv(np.eye(len(trans)) - Q)
    steps = N.sum(axis=1)
    absorb = (N @ R).ravel()
    rows = [
        (
            states[t],
            float(np.floor(steps[j] * 10000 + 0.5) / 10000),
            float(np.floor(absorb[j] * 10000 + 0.5) / 10000),
        )
        for j, t in enumerate(trans)
    ]
    return spark.createDataFrame(
        rows, "state string, exp_steps double, p_absorb double"
    ).orderBy("state")


ml_absorbing_markov.__doc__ = ml_absorbing_markov.__doc__.format(
    a=ABSORB_STATE
)
