"""Wave 141: state-duration accounting and importance-weighted
evaluation.

ev_time_in_state attributes the gap before each next event to the
CURRENT event's type — converting a point-event stream into
time-in-state accounting (where users actually spend their session
time, not just what they click); ml_importance_weighted_eval scores
the logistic probe under serving-distribution importance weights —
the metric correction that makes an offline eval predictive of a
shifted deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.ml import DUCK_LOGREG_GD, LOGREG_ITERS
from mister_spark.registry import query

SESSION_GAP_US = 30 * 60 * 1_000_000


@query(
    "ev_time_in_state",
    oracle=f"""
    WITH t AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id
               FROM events),
    g AS (SELECT event_type,
                 LEAD(tus) OVER (PARTITION BY user_id
                                 ORDER BY tus, event_id) - tus AS gap
          FROM t),
    s AS (SELECT event_type, gap FROM g
          WHERE gap IS NOT NULL AND gap <= {SESSION_GAP_US})
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS intervals,
           FLOOR(SUM(gap) / 3600000000.0 * 10000 + 0.5) / 10000
             AS hours_in_state,
           FLOOR(SUM(gap) / (SELECT CAST(SUM(gap) AS DOUBLE) FROM s)
                 * 10000 + 0.5) / 10000 AS share
    FROM s GROUP BY 1
    """,
)
def ev_time_in_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-in-state accounting: the gap before a user's next event
    is attributed to the CURRENT event's type (gaps above the
    session threshold are dropped as idle) — turning click counts
    into dwell shares. A type with few events but long dwell is
    where the session actually lives; event counts alone invert that
    story.

    Scale: one shuffle on user_id for the lead window; the rollup is
    |types|-sized with the total broadcast."""
    ev = cat(spark, sf_dir)["events"]
    t = ev.select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    g = t.select(
        "event_type", (F.lead("tus").over(w) - F.col("tus")).alias("gap")
    )
    s = g.filter(
        F.col("gap").isNotNull() & (F.col("gap") <= SESSION_GAP_US)
    ).localCheckpoint()
    tot = s.agg(F.sum("gap").cast("double").alias("total"))
    return (
        s.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("intervals"),
            F.sum("gap").alias("gap_sum"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "intervals",
            ratio(F.col("gap_sum") / 3600000000.0).alias("hours_in_state"),
            ratio(F.col("gap_sum") / F.col("total")).alias("share"),
        )
    )


@query(
    "ml_importance_weighted_eval",
    # Real oracle: the probe weights come from the shared
    # DUCK_LOGREG_GD recursive-CTE fragment (the same full-batch GD
    # the Spark side trains), the bin weights are ratios of exact
    # integer counts, and the weighted/unweighted accuracies are two
    # aggregates over the scored rows. Bins absent from the weight
    # table default to 1.0 via the left join, like wts.get(b, 1.0).
    oracle=f"""
    WITH RECURSIVE {DUCK_LOGREG_GD},
    wl AS (SELECT w FROM gd WHERE it = {LOGREG_ITERS}),
    be AS (SELECT CAST(embedding AS DOUBLE[]) AS v,
                  CAST(label % 2 AS DOUBLE) AS y,
                  LEAST(CAST(FLOOR((CAST(embedding[1] AS DOUBLE) + 1.0)
                                   / 0.25) AS INT), 7) AS b,
                  CASE WHEN vec_id % 3 = 0 THEN 1 ELSE 0 END AS srv
           FROM embeddings),
    g AS (SELECT b, CAST(SUM(1 - srv) AS DOUBLE) AS n_train,
                 CAST(SUM(srv) AS DOUBLE) AS n_serve
          FROM be GROUP BY b),
    t AS (SELECT SUM(n_train) AS nt, SUM(n_serve) AS ns FROM g),
    wts AS (SELECT g.b,
                   (g.n_serve / t.ns) / ((g.n_train + 1) / (t.nt + 8))
                     AS bw
            FROM g, t),
    sc AS (SELECT CASE WHEN (CASE WHEN list_aggregate(
                    list_transform(range(1, 65),
                                   i -> be.v[i] * wl.w[i]), 'sum')
                    + wl.w[65] > 0 THEN 1.0 ELSE 0.0 END) = be.y
                  THEN 1.0 ELSE 0.0 END AS ok,
                  COALESCE(wts.bw, 1.0) AS bw
           FROM be CROSS JOIN wl LEFT JOIN wts ON be.b = wts.b)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(SUM(ok) / COUNT(*) * 10000 + 0.5) / 10000 AS accuracy,
           FLOOR(SUM(ok * bw) / SUM(bw) * 10000 + 0.5) / 10000
             AS weighted_accuracy,
           FLOOR(ABS(SUM(ok * bw) / SUM(bw) - SUM(ok) / COUNT(*))
                 * 10000 + 0.5) / 10000 AS gap
    FROM sc
    """,
)
def ml_importance_weighted_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted evaluation of the logistic probe: weight
    each embedding row by the serving/training density ratio of its
    first-dimension bin (the ml_covariate_shift_weights construction
    applied to embeddings) and compare weighted vs unweighted
    accuracy — the correction that makes an offline metric estimate
    SERVING performance. Near-identical numbers certify the shift is
    negligible; a gap is the size of your offline-online discrepancy.

    Scale: weights are a broadcast bin map; scoring is one Arrow
    pass with O(1) partials."""
    import numpy as np
    import pandas as pd

    from mister_spark.operators.ml import logreg_train

    w_vec, _ = logreg_train(spark, sf_dir)
    w_vec = np.asarray(w_vec, dtype=np.float64)
    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        (F.col("label") % 2).cast("double").alias("y"),
    ).localCheckpoint()
    # bin by first dimension; 'serving' slice = vec_id % 3 == 0
    binned = emb.select(
        "v",
        "y",
        F.least(
            F.floor((F.col("v")[0] + 1.0) / 0.25).cast("int"), F.lit(7)
        ).alias("b"),
        (F.col("vec_id") % 3 == 0).cast("int").alias("srv"),
    )
    g = binned.groupBy("b").agg(
        F.sum(1 - F.col("srv")).cast("double").alias("n_train"),
        F.sum("srv").cast("double").alias("n_serve"),
    )
    t = g.agg(F.sum("n_train").alias("nt"), F.sum("n_serve").alias("ns"))
    wts = {
        int(r["b"]): (
            (r["n_serve"] / r["ns"])
            / ((r["n_train"] + 1) / (r["nt"] + 8))
        )
        for r in g.crossJoin(F.broadcast(t)).collect()
    }

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["v"]), dtype=np.float64)
            Xb = np.hstack([X, np.ones((len(X), 1))])
            y = pdf["y"].to_numpy()
            pred = (Xb @ w_vec > 0).astype(float)
            ok = (pred == y).astype(float)
            bw = np.array([wts.get(int(b), 1.0) for b in pdf["b"]])
            yield pd.DataFrame(
                {
                    "ok": [float(ok.sum())],
                    "n": [len(ok)],
                    "wok": [float((ok * bw).sum())],
                    "wsum": [float(bw.sum())],
                }
            )

    rows = binned.mapInPandas(
        score, "ok double, n long, wok double, wsum double"
    ).collect()
    n = sum(r["n"] for r in rows)
    acc = sum(r["ok"] for r in rows) / n
    wacc = sum(r["wok"] for r in rows) / sum(r["wsum"] for r in rows)
    import math

    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
    row = (int(n), r4(acc), r4(wacc), r4(abs(wacc - acc)))
    return spark.createDataFrame(
        [row],
        "n long, accuracy double, weighted_accuracy double, gap double",
    )
