"""Wave 84: blocked nonparametrics, robust regression, multivariate
outliers, and mixture modeling.

stat_friedman is the repeated-measures rank test (blocks × treatments
— 'does the treatment effect hold within every block?');
stat_huber_regression is IRLS with the Huber loss — the regression
that doesn't hand the fit to the top 0.1% of rows, unrolled to a
fixed iteration count so the DuckDB oracle can replay it exactly;
ml_mahalanobis_outliers scores embedding rows by covariance-corrected
distance (the multivariate z-score — axis-aligned thresholds miss
correlated outliers); ml_gmm_em fits a 1-D Gaussian mixture by EM
with O(K) driver state per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.operators.duck_linalg import duck_emb_cov_inverse
from mister_spark.registry import query

HUBER_DELTA = 1.345
HUBER_ITERS = 3
GMM_K = 3
GMM_ITERS = 8
MAHA_TOP = 20
MAHA_RIDGE = 1e-6


@query(
    "stat_friedman",
    oracle="""
    WITH cell AS (SELECT CAST(isodow(ts) AS BIGINT) AS blk, event_type AS trt,
                         AVG(value) AS m
                  FROM events GROUP BY 1, 2),
    rk AS (SELECT blk, trt,
                  RANK() OVER (PARTITION BY blk ORDER BY m)
                    + (COUNT(*) OVER (PARTITION BY blk, m) - 1) / 2.0 AS r
           FROM cell),
    rj AS (SELECT trt, SUM(r) AS rsum FROM rk GROUP BY 1),
    dims AS (SELECT CAST(COUNT(DISTINCT blk) AS DOUBLE) AS b,
                    CAST(COUNT(DISTINCT trt) AS DOUBLE) AS k
             FROM cell)
    SELECT CAST(k AS BIGINT) AS treatments, CAST(b AS BIGINT) AS blocks,
           CAST(k - 1 AS BIGINT) AS dof,
           FLOOR((12.0 / (b * k * (k + 1)) * (SELECT SUM(rsum * rsum) FROM rj)
                  - 3 * b * (k + 1)) * 10000 + 0.5) / 10000 AS q
    FROM dims
    """,
)
def stat_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test: blocks = ISO weekday, treatments = event
    type, measure = mean event value per cell. Ranks are taken WITHIN
    each block, so a treatment only scores high by beating the others
    under the same block conditions — the paired defense against
    block-level confounding. Q ~ χ²(k−1) under H0.

    Scale: the b×k cell rollup is the only data-sized shuffle; the
    within-block rank window partitions by block (≤k rows per task)
    and everything after is a k-row aggregate."""
    ev = cat(spark, sf_dir)["events"]
    iso = ((F.dayofweek("ts") + 5) % 7) + 1
    cell = (
        ev.groupBy(
            iso.cast("bigint").alias("blk"), F.col("event_type").alias("trt")
        )
        .agg(F.avg("value").alias("m"))
        .localCheckpoint()
    )
    w_rank = W.partitionBy("blk").orderBy("m")
    w_tie = W.partitionBy("blk", "m")
    rk = cell.select(
        "trt",
        (
            F.rank().over(w_rank)
            + (F.count(F.lit(1)).over(w_tie) - 1) / 2.0
        ).alias("r"),
    )
    rj = rk.groupBy("trt").agg(F.sum("r").alias("rsum"))
    dims = cell.agg(
        F.countDistinct("blk").cast("double").alias("b"),
        F.countDistinct("trt").cast("double").alias("k"),
    )
    srj = rj.agg(F.sum(F.col("rsum") * F.col("rsum")).alias("s2"))
    b, k = F.col("b"), F.col("k")
    return (
        dims.crossJoin(F.broadcast(srj))
        .select(
            k.cast("bigint").alias("treatments"),
            b.cast("bigint").alias("blocks"),
            (k - 1).cast("bigint").alias("dof"),
            ratio(
                12.0 / (b * k * (k + 1)) * F.col("s2") - 3 * b * (k + 1)
            ).alias("q"),
        )
    )


def _huber_sql() -> str:
    """Unrolled IRLS CTE chain shared with the docstring contract."""
    base = "SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem"
    sql = f"WITH d AS ({base}),\n"
    sql += """c0 AS (
      SELECT (SUM(x * y) - SUM(x) * SUM(y) / COUNT(*))
               / (SUM(x * x) - SUM(x) * SUM(x) / COUNT(*)) AS b,
             SUM(y) / COUNT(*)
               - (SUM(x * y) - SUM(x) * SUM(y) / COUNT(*))
                 / (SUM(x * x) - SUM(x) * SUM(x) / COUNT(*))
                 * SUM(x) / COUNT(*) AS a
      FROM d),\n"""
    prev = "c0"
    for i in range(1, HUBER_ITERS + 1):
        sql += f"""s{i} AS (
      SELECT SQRT(SUM((y - a - b * x) * (y - a - b * x)) / COUNT(*)) AS sg
      FROM d, {prev}),
    w{i} AS (
      SELECT x, y,
             CASE WHEN ABS(y - a - b * x) <= {HUBER_DELTA} * sg THEN 1.0
                  ELSE {HUBER_DELTA} * sg / ABS(y - a - b * x) END AS w
      FROM d, {prev}, s{i}),
    c{i} AS (
      SELECT (SUM(w * x * y) - SUM(w * x) * SUM(w * y) / SUM(w))
               / (SUM(w * x * x) - SUM(w * x) * SUM(w * x) / SUM(w)) AS b,
             SUM(w * y) / SUM(w)
               - (SUM(w * x * y) - SUM(w * x) * SUM(w * y) / SUM(w))
                 / (SUM(w * x * x) - SUM(w * x) * SUM(w * x) / SUM(w))
                 * SUM(w * x) / SUM(w) AS a,
             SUM(w) / COUNT(*) AS wbar
      FROM w{i}),\n"""
        prev = f"c{i}"
    sql += f"""fin AS (SELECT a, b, wbar FROM c{HUBER_ITERS})
    SELECT FLOOR(a * 10000 + 0.5) / 10000 AS intercept,
           FLOOR(b * 10000 + 0.5) / 10000 AS slope,
           FLOOR(wbar * 10000 + 0.5) / 10000 AS mean_weight
    FROM fin"""
    return sql


@query("stat_huber_regression", oracle=_huber_sql())
def stat_huber_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber-loss robust regression of extendedprice on quantity:
    OLS init, then {it} IRLS rounds — weight w = min(1, δσ/|r|)
    (δ = {d}) caps each row's pull at δσ, so heavy-tail rows inform
    the fit without owning it. mean_weight reports how much mass was
    downweighted. The iteration count is FIXED so the DuckDB oracle
    replays the identical computation.

    Scale: every IRLS round is one full-scan aggregate with the
    current (a, b, σ) carried as a broadcast 1-row frame — coefficient
    state never exceeds O(1), and rounds re-scan rather than cache
    (exactly how you'd run it on 100 TB; cache the 2-column projection
    if it fits)."""
    d = (
        cat(spark, sf_dir)["lineitem"]
        .select(F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y"))
        .localCheckpoint()
    )
    x, y = F.col("x"), F.col("y")
    n = F.count(F.lit(1))
    sb = (F.sum(x * y) - F.sum(x) * F.sum(y) / n) / (
        F.sum(x * x) - F.sum(x) * F.sum(x) / n
    )
    coef = d.agg(
        sb.alias("b"), (F.sum(y) / n - sb * F.sum(x) / n).alias("a")
    ).withColumn("wbar", F.lit(1.0))
    for _ in range(HUBER_ITERS):
        r = y - F.col("a") - F.col("b") * x
        sg = d.crossJoin(F.broadcast(coef.select("a", "b"))).agg(
            F.sqrt(F.sum(r * r) / F.count(F.lit(1))).alias("sg")
        )
        wexpr = F.when(
            F.abs(r) <= HUBER_DELTA * F.col("sg"), F.lit(1.0)
        ).otherwise(HUBER_DELTA * F.col("sg") / F.abs(r))
        wd = (
            d.crossJoin(F.broadcast(coef.select("a", "b")))
            .crossJoin(F.broadcast(sg))
            .select(x, y, wexpr.alias("w"))
        )
        w = F.col("w")
        wb = (F.sum(w * x * y) - F.sum(w * x) * F.sum(w * y) / F.sum(w)) / (
            F.sum(w * x * x) - F.sum(w * x) * F.sum(w * x) / F.sum(w)
        )
        coef = wd.agg(
            wb.alias("b"),
            (F.sum(w * y) / F.sum(w) - wb * F.sum(w * x) / F.sum(w)).alias("a"),
            (F.sum(w) / F.count(F.lit(1))).alias("wbar"),
        )
    return coef.select(
        ratio(F.col("a")).alias("intercept"),
        ratio(F.col("b")).alias("slope"),
        ratio(F.col("wbar")).alias("mean_weight"),
    )


stat_huber_regression.__doc__ = stat_huber_regression.__doc__.format(
    it=HUBER_ITERS, d=HUBER_DELTA
)


def _emb_cov_stats(spark: SparkSession, sf_dir: str):
    """One Arrow pass → (n, mean[d], cov[d,d]); collected state is
    O(d²) per partition (the ml.pca_train split)."""
    import numpy as np
    import pandas as pd

    emb = cat(spark, sf_dir)["embeddings"].select(
        F.col("embedding").cast("array<double>").alias("v")
    )

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["v"]), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "ss": [(X.T @ X).ravel().tolist()],
                }
            )

    rows = emb.mapInPandas(
        partials, "n long, s array<double>, ss array<double>"
    ).collect()
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(d, d) for r in rows], axis=0)
    mu = s / n
    cov = (ss - np.outer(s, s) / n) / (n - 1)
    return n, mu, cov


@query(
    "ml_mahalanobis_outliers",
    # Real oracle: Σ+ridge·I inverted by the shared Cholesky recursion
    # (duck_linalg, 64 identity RHS), then the per-row quadratic form
    # and top-20 in plain SQL; the 1e-4 grid absorbs the ~1e-13
    # Cholesky-vs-LU float drift.
    oracle=f"""
    WITH RECURSIVE
    {duck_emb_cov_inverse(1e-6)},
    d2 AS (SELECT e.vec_id AS vec_id,
                  list_aggregate(list_transform(range(1, 65), i ->
                    (e.v[i] - mx.mu[i])
                    * list_aggregate(list_transform(range(1, 65), j ->
                        sol.x[i][j] * (e.v[j] - mx.mu[j])), 'sum')),
                    'sum') AS q
           FROM ex e CROSS JOIN emu mx CROSS JOIN sol)
    SELECT vec_id, FLOOR(q * 1e4 + 0.5) / 1e4 AS d2
    FROM d2 ORDER BY 2 DESC, vec_id LIMIT 20
    """,
)
def ml_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{top} multivariate outliers among the embeddings by squared
    Mahalanobis distance (x−μ)ᵀ Σ⁻¹ (x−μ) — the covariance-corrected
    distance that catches points no per-dimension z-score flags.
    Σ is ridge-regularized (+{r}·I) before inversion.

    Scale: Σ comes from one Arrow-batched sufficient-statistics pass
    (O(d²) per partition, never data-sized); the d×d inverse is a
    driver-side O(d³) solve broadcast back through the task closure;
    scoring is a second narrow Arrow pass and the top-{top} is a
    distributed TakeOrdered."""
    import numpy as np
    import pandas as pd

    _, mu, cov = _emb_cov_stats(spark, sf_dir)
    d = len(mu)
    vi = np.linalg.inv(cov + MAHA_RIDGE * np.eye(d))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["v"]), dtype=np.float64) - mu
            d2 = np.einsum("ij,jk,ik->i", X, vi, X)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "d2": np.floor(d2 * 1e4 + 0.5) / 1e4,
                }
            )

    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return (
        emb.mapInPandas(score, "vec_id long, d2 double")
        .orderBy(F.col("d2").desc(), "vec_id")
        .limit(MAHA_TOP)
    )


ml_mahalanobis_outliers.__doc__ = ml_mahalanobis_outliers.__doc__.format(
    top=MAHA_TOP, r=MAHA_RIDGE
)


def gmm_train(spark: SparkSession, sf_dir: str):
    """EM for a {k}-component 1-D Gaussian mixture on event value.
    Driver state is (π, μ, σ) — O(K); each iteration is ONE aggregate
    over the scan computing responsibility-weighted sufficient stats
    as JVM expressions (no Python in the row path). Deterministic
    init: μ at the exact 25/50/75 percentiles (engine-portable linear
    interpolation, so the DuckDB oracle replays the identical
    trajectory; at corpus scale swap the init — and only the init —
    to percentile_approx: EM is robust to an O(n/accuracy)-rank init
    perturbation), shared σ, uniform π.

    Returns (pis, mus, sigmas, logliks-per-iteration)."""
    ev = (
        cat(spark, sf_dir)["events"]
        .select(F.col("value").alias("x"))
        .localCheckpoint()
    )
    init = ev.agg(
        F.expr("percentile(x, array(0.25D, 0.5D, 0.75D))").alias("q"),
        F.stddev_samp("x").alias("sd"),
    ).collect()[0]
    mus = [float(v) for v in init["q"]]
    sigmas = [float(init["sd"])] * GMM_K
    pis = [1.0 / GMM_K] * GMM_K
    x = F.col("x")
    logliks = []
    ln2pi = 1.8378770664093453
    for _ in range(GMM_ITERS):
        dens = []
        for k in range(GMM_K):
            z = (x - mus[k]) / sigmas[k]
            dens.append(
                F.lit(pis[k])
                * F.exp(-0.5 * z * z - F.lit(0.5 * ln2pi))
                / sigmas[k]
            )
        tot = dens[0]
        for k in range(1, GMM_K):
            tot = tot + dens[k]
        aggs = [F.sum(F.log(tot)).alias("ll"), F.count(F.lit(1)).alias("n")]
        for k in range(GMM_K):
            g = dens[k] / tot
            aggs += [
                F.sum(g).alias(f"n{k}"),
                F.sum(g * x).alias(f"s{k}"),
                F.sum(g * x * x).alias(f"ss{k}"),
            ]
        row = ev.agg(*aggs).collect()[0]
        logliks.append(float(row["ll"]) / float(row["n"]))
        for k in range(GMM_K):
            nk = float(row[f"n{k}"])
            sk = float(row[f"s{k}"])
            ssk = float(row[f"ss{k}"])
            pis[k] = nk / float(row["n"])
            mus[k] = sk / nk
            var = max(ssk / nk - mus[k] * mus[k], 1e-12)
            sigmas[k] = var**0.5
    return pis, mus, sigmas, logliks


def _gmm_dens(k: int) -> str:
    """SQL: component k's weighted normal density at e.x under the
    recursive state s — the exact expression gmm_train builds in Spark
    (0.5*ln(2π) folded as the same double literal product)."""
    z = f"((e.x - s.mus[{k}]) / s.sgs[{k}])"
    return (
        f"s.pis[{k}] * EXP(-0.5 * {z} * {z}"
        f" - 0.5 * 1.8378770664093453) / s.sgs[{k}]"
    )


def _gmm_oracle() -> str:
    """EM replay as a recursive CTE: state (π, μ, σ, mean loglik),
    one responsibility-weighted aggregate over events per step — the
    DUCK_LOGREG_GD pattern with K=3 scalar sufficient statistics."""
    dens = " + ".join(f"d.d{k}" for k in (1, 2, 3))
    sums = ",\n           ".join(
        f"SUM(d.d{k} / ({dens})) AS n{k},"
        f" SUM(d.d{k} / ({dens}) * e.x) AS s{k},"
        f" SUM(d.d{k} / ({dens}) * e.x * e.x) AS ss{k}"
        for k in (1, 2, 3)
    )
    new_sg = ", ".join(
        f"SQRT(GREATEST(r.ss{k} / r.n{k}"
        f" - (r.s{k} / r.n{k}) * (r.s{k} / r.n{k}), 1e-12))"
        for k in (1, 2, 3)
    )
    return f"""
    WITH RECURSIVE evx AS (SELECT CAST(value AS DOUBLE) AS x FROM events),
    gi AS (SELECT quantile_cont(x, [0.25, 0.5, 0.75]) AS q,
                  stddev_samp(x) AS sd
           FROM evx),
    em AS (
      SELECT 0 AS it,
             [CAST(1.0 / 3 AS DOUBLE), 1.0 / 3, 1.0 / 3] AS pis,
             [q[1], q[2], q[3]] AS mus, [sd, sd, sd] AS sgs,
             CAST(0.0 AS DOUBLE) AS ll
      FROM gi
      UNION ALL
      SELECT r.it + 1,
             [r.n1 / r.n, r.n2 / r.n, r.n3 / r.n],
             [r.s1 / r.n1, r.s2 / r.n2, r.s3 / r.n3],
             [{new_sg}],
             r.lls / r.n
      FROM (
        SELECT s.it AS it, CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(LN({dens})) AS lls,
           {sums}
        FROM em s CROSS JOIN evx e
        CROSS JOIN LATERAL (
          SELECT {_gmm_dens(1)} AS d1, {_gmm_dens(2)} AS d2,
                 {_gmm_dens(3)} AS d3) d
        WHERE s.it < {GMM_ITERS}
        GROUP BY s.it
      ) r
    ),
    fin AS (SELECT pis, mus, sgs, ll FROM em WHERE it = {GMM_ITERS}),
    comp AS (SELECT u.k AS k, fin.pis[u.k] AS pi, fin.mus[u.k] AS mu,
                    fin.sgs[u.k] AS sg, fin.ll AS ll
             FROM fin CROSS JOIN LATERAL
               (SELECT unnest(range(1, 4)) AS k) u)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY mu, k) - 1 AS BIGINT)
             AS component,
           FLOOR(pi * 1e6 + 0.5) / 1e6 AS weight,
           FLOOR(mu * 1e4 + 0.5) / 1e4 AS mu,
           FLOOR(sg * 1e4 + 0.5) / 1e4 AS sigma,
           FLOOR(ll * 1e6 + 0.5) / 1e6 AS final_loglik
    FROM comp
    """


@query(
    "ml_gmm_em",
    # Real oracle: the full EM trajectory replays as a recursive CTE
    # (exact-percentile init is engine-portable; every iteration is
    # the same responsibility-weighted aggregate in both engines).
    oracle=_gmm_oracle(),
)
def ml_gmm_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{k}-component Gaussian mixture over event value fit by {it} EM
    iterations — the distributional upgrade from a single mean/σ
    summary (multi-modal value traffic shows up as separated μs).
    Components are reported sorted by μ with the final mean
    log-likelihood.

    Scale: see gmm_train — O(K) driver state, one JVM-expression
    aggregate per iteration, no Python row path."""
    import math

    pis, mus, sigmas, logliks = gmm_train(spark, sf_dir)
    order = sorted(range(GMM_K), key=lambda k: mus[k])
    # floor-grid rounding — identical double arithmetic to the oracle
    rows = [
        (
            i,
            math.floor(pis[k] * 1e6 + 0.5) / 1e6,
            math.floor(mus[k] * 1e4 + 0.5) / 1e4,
            math.floor(sigmas[k] * 1e4 + 0.5) / 1e4,
            math.floor(logliks[-1] * 1e6 + 0.5) / 1e6,
        )
        for i, k in enumerate(order)
    ]
    return spark.createDataFrame(
        rows,
        "component long, weight double, mu double, sigma double, "
        "final_loglik double",
    )


ml_gmm_em.__doc__ = ml_gmm_em.__doc__.format(k=GMM_K, it=GMM_ITERS)
