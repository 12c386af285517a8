"""Wave 126: ratio-metric inference, classifier two-sample testing,
and catalog turnover.

stat_ratio_metric_se is the delta-method standard error for a ratio
metric (revenue per order) computed from per-customer totals — the
correction that stops experimenters from treating a ratio of sums as
a mean of ratios; ml_c2st is the classifier two-sample test: train
the logistic probe to tell even- from odd-half embeddings — test
accuracy ≈ 0.5 certifies the halves are exchangeable (and a
significantly higher accuracy is the most interpretable drift alarm
there is); ev_catalog_turnover measures product-catalog churn across
the mid-corpus split (Jaccard, newcomers, dropouts) — assortment
drift as one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

SPLIT_DATE = "1998-01-01"
C2ST_ITERS = 8
C2ST_LR = 0.5


@query(
    "stat_ratio_metric_se",
    oracle="""
    WITH u AS (SELECT o_custkey,
                      SUM(o_totalprice) AS y,
                      CAST(COUNT(*) AS DOUBLE) AS x
               FROM orders GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 AVG(y) AS my, AVG(x) AS mx,
                 VAR_SAMP(y) AS vy, VAR_SAMP(x) AS vx,
                 (SUM(y * x) - COUNT(*) * AVG(y) * AVG(x))
                   / (COUNT(*) - 1) AS cxy
          FROM u),
    r AS (SELECT n, my / mx AS ratio_est,
                 (1 / (mx * mx))
                 * (vy - 2 * (my / mx) * cxy
                    + (my / mx) * (my / mx) * vx) / n AS var_r
          FROM m)
    SELECT CAST(n AS BIGINT) AS customers,
           FLOOR(ratio_est * 100 + 0.5) / 100 AS revenue_per_order,
           FLOOR(SQRT(var_r) * 10000 + 0.5) / 10000 AS delta_se,
           FLOOR((ratio_est - 1.959964 * SQRT(var_r)) * 100 + 0.5) / 100
             AS ci_lo,
           FLOOR((ratio_est + 1.959964 * SQRT(var_r)) * 100 + 0.5) / 100
             AS ci_hi
    FROM r
    """,
)
def stat_ratio_metric_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method inference for the ratio metric revenue-per-order:
    R = ȳ/x̄ over per-customer (revenue, orders) pairs, with
    Var(R) ≈ (1/x̄²)(σ²_y − 2R·σ_xy + R²σ²_x)/n — the covariance term
    is the whole point: treating R as a simple mean understates (or
    overstates) the CI whenever per-unit numerators and denominators
    correlate, which they always do. Ships the 95% CI.

    Scale: one customer rollup; the moments are a single aggregate;
    the CI is scalar arithmetic — the exact shape of cluster-robust
    ratio inference at any scale."""
    u = (
        cat(spark, sf_dir)["orders"]
        .groupBy("o_custkey")
        .agg(
            F.sum("o_totalprice").alias("y"),
            F.count(F.lit(1)).cast("double").alias("x"),
        )
    )
    m = u.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("y").alias("my"),
        F.avg("x").alias("mx"),
        F.var_samp("y").alias("vy"),
        F.var_samp("x").alias("vx"),
        (
            (F.sum(F.col("y") * F.col("x"))
             - F.count(F.lit(1)) * F.avg("y") * F.avg("x"))
            / (F.count(F.lit(1)) - 1)
        ).alias("cxy"),
    )
    r_est = F.col("my") / F.col("mx")
    var_r = (
        (1 / (F.col("mx") * F.col("mx")))
        * (
            F.col("vy")
            - 2 * r_est * F.col("cxy")
            + r_est * r_est * F.col("vx")
        )
        / F.col("n")
    )
    se = F.sqrt(var_r)
    return m.select(
        F.col("n").cast("bigint").alias("customers"),
        money(r_est).alias("revenue_per_order"),
        ratio(se).alias("delta_se"),
        money(r_est - 1.959964 * se).alias("ci_lo"),
        money(r_est + 1.959964 * se).alias("ci_hi"),
    )


@query(
    "ml_c2st",
    # Real oracle: the same list-state GD recursive CTE as the shared
    # logreg fragment, but trained on the vec_id%4<2 split with
    # y = vec_id%2, then scored on the held-out half; the binomial
    # null band is scalar arithmetic on the held-out count.
    oracle=f"""
    WITH RECURSIVE emb AS (SELECT CAST(embedding AS DOUBLE[]) AS v,
                                  CAST(vec_id % 2 AS DOUBLE) AS y
                           FROM embeddings WHERE vec_id % 4 < 2),
    tst AS (SELECT CAST(embedding AS DOUBLE[]) AS v,
                   CAST(vec_id % 2 AS DOUBLE) AS y
            FROM embeddings WHERE vec_id % 4 >= 2),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM emb),
    gd AS (
      SELECT 0 AS it,
             list_transform(range(1, 66), i -> CAST(0.0 AS DOUBLE)) AS w
      UNION ALL
      SELECT q.it + 1, list(q.nw ORDER BY q.dim)
      FROM (
        SELECT r.it, u.dim,
               MAX(r.wd[u.dim])
               - {C2ST_LR} * (SUM((r.p - r.y) * u.x) / MAX(r.n)) AS nw
        FROM (
          SELECT s.it, s.w AS wd, e.y, nx.n,
                 list_append(e.v, CAST(1.0 AS DOUBLE)) AS xv,
                 1.0 / (1.0 + EXP(-(list_aggregate(
                   list_transform(range(1, 65), i -> e.v[i] * s.w[i]),
                   'sum') + s.w[65]))) AS p
          FROM gd s CROSS JOIN emb e CROSS JOIN nn nx
          WHERE s.it < {C2ST_ITERS}
        ) r
        CROSS JOIN LATERAL (SELECT unnest(generate_series(1, 65)) AS dim,
                                   unnest(r.xv) AS x) u
        GROUP BY r.it, u.dim
      ) q
      GROUP BY q.it
    ),
    wl AS (SELECT w FROM gd WHERE it = {C2ST_ITERS}),
    sc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                  SUM(CASE WHEN (CASE WHEN list_aggregate(
                        list_transform(range(1, 65),
                                       i -> t.v[i] * wl.w[i]), 'sum')
                        + wl.w[65] > 0 THEN 1.0 ELSE 0.0 END) = t.y
                        THEN 1.0 ELSE 0.0 END) AS c
           FROM tst t CROSS JOIN wl),
    fin AS (SELECT n, c / n AS acc,
                   1.959964 * SQRT(0.25 / n) AS hw
            FROM sc)
    SELECT CAST(n AS BIGINT) AS n,
           FLOOR(acc * 10000 + 0.5) / 10000 AS accuracy,
           FLOOR((0.5 - hw) * 10000 + 0.5) / 10000 AS null_lo,
           FLOOR((0.5 + hw) * 10000 + 0.5) / 10000 AS null_hi,
           CAST(CASE WHEN acc > 0.5 + hw THEN 1 ELSE 0 END AS BIGINT)
             AS drift_detected
    FROM fin
    """,
)
def ml_c2st(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier two-sample test: label embeddings by vec_id parity,
    train the full-batch logistic probe on half the rows and score
    accuracy on the HELD-OUT half (train accuracy would overfit d=64
    params on n=500 and alarm falsely — measured and avoided).
    Held-out accuracy ≈ 0.5 certifies no distributional
    difference; significantly above 0.5 is the most interpretable
    drift detector there is (the classifier SHOWS you what changed
    via its weights). pytest pins the null behavior.

    Scale: same O(d)-state gradient structure as ml_logreg — partial
    gradients per Arrow batch, no data-sized driver state."""
    import numpy as np
    import pandas as pd

    base = (
        cat(spark, sf_dir)["embeddings"]
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("v"),
            (F.col("vec_id") % 2).cast("double").alias("y"),
        )
        .localCheckpoint()
    )
    emb = base.filter(F.col("vec_id") % 4 < 2)  # train split
    test = base.filter(F.col("vec_id") % 4 >= 2)  # held-out
    d = len(base.first()["v"])
    w = np.zeros(d + 1)
    for _ in range(C2ST_ITERS):
        wb = w.copy()

        def partials(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array(list(pdf["v"]), dtype=np.float64)
                X = np.hstack([X, np.ones((len(X), 1))])
                y = pdf["y"].to_numpy()
                p = 1.0 / (1.0 + np.exp(-(X @ wb)))
                yield pd.DataFrame(
                    {"g": [(X.T @ (p - y)).tolist()], "n": [len(X)]}
                )

        rows = emb.mapInPandas(partials, "g array<double>, n long").collect()
        n = sum(r["n"] for r in rows)
        g = np.sum([np.array(r["g"]) for r in rows], axis=0) / n
        w = w - C2ST_LR * g

    def acc_pass(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["v"]), dtype=np.float64)
            X = np.hstack([X, np.ones((len(X), 1))])
            y = pdf["y"].to_numpy()
            pred = (X @ w > 0).astype(float)
            yield pd.DataFrame(
                {"correct": [float((pred == y).sum())], "n": [len(y)]}
            )

    rows = test.mapInPandas(acc_pass, "correct double, n long").collect()
    n = sum(r["n"] for r in rows)
    acc = sum(r["correct"] for r in rows) / n
    # binomial null band around 0.5
    half_width = 1.959964 * (0.25 / n) ** 0.5
    import math

    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
    row = (
        int(n),
        r4(acc),
        r4(0.5 - half_width),
        r4(0.5 + half_width),
        int(acc > 0.5 + half_width),
    )
    return spark.createDataFrame(
        [row],
        "n long, accuracy double, null_lo double, null_hi double, "
        "drift_detected long",
    )


@query(
    "ev_catalog_turnover",
    oracle=f"""
    WITH li AS (SELECT l.l_partkey AS p, o.o_orderdate AS d
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    a AS (SELECT DISTINCT p FROM li
          WHERE d < TIMESTAMP '{SPLIT_DATE}'),
    b AS (SELECT DISTINCT p FROM li
          WHERE d >= TIMESTAMP '{SPLIT_DATE}'),
    x AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM a) AS na,
                 (SELECT CAST(COUNT(*) AS DOUBLE) FROM b) AS nb,
                 (SELECT CAST(COUNT(*) AS DOUBLE)
                  FROM a JOIN b ON a.p = b.p) AS nboth)
    SELECT CAST(na AS BIGINT) AS parts_before,
           CAST(nb AS BIGINT) AS parts_after,
           CAST(nboth AS BIGINT) AS parts_both,
           FLOOR(nboth / (na + nb - nboth) * 10000 + 0.5) / 10000
             AS jaccard,
           CAST(nb - nboth AS BIGINT) AS newcomers,
           CAST(na - nboth AS BIGINT) AS dropouts
    FROM x
    """,
)
def ev_catalog_turnover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog turnover across the {s} split: distinct purchased
    parts before vs after, their Jaccard, and the newcomer/dropout
    counts — the assortment-drift row that explains why last
    quarter's demand model misses this quarter's SKUs.

    Scale: two distinct-part sets from one join (orderdate rides the
    orderkey join); the set algebra is three counts."""
    li = cat(spark, sf_dir)["lineitem"]
    orders = cat(spark, sf_dir)["orders"]
    j = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == orders.o_orderkey,
    ).select(F.col("l_partkey").alias("p"), "o_orderdate")
    split = F.lit(SPLIT_DATE).cast("timestamp")
    a = j.filter(F.col("o_orderdate") < split).select("p").distinct()
    b = j.filter(F.col("o_orderdate") >= split).select("p").distinct()
    na = a.count()
    nb = b.count()
    nboth = a.join(b, "p").count()
    row = (
        int(na),
        int(nb),
        int(nboth),
        round(nboth / (na + nb - nboth), 4),
        int(nb - nboth),
        int(na - nboth),
    )
    return spark.createDataFrame(
        [row],
        "parts_before long, parts_after long, parts_both long, "
        "jaccard double, newcomers long, dropouts long",
    )


ev_catalog_turnover.__doc__ = ev_catalog_turnover.__doc__.format(s=SPLIT_DATE)
