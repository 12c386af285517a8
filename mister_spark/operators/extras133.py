"""Wave 133: weak-supervision label modeling, map-type SQL surface,
and control variates.

ml_label_model estimates labeling-function accuracies WITHOUT ground
truth from pairwise agreement rates (the Snorkel/method-of-moments
identity c_i·c_j = 2·agree_ij − 1) — the junk function gets exposed
at accuracy ≈ 0.5 by algebra alone, which is the whole magic of
label models; sql_map_ops pins the MAP column surface
(map_from_entries, map_concat, element_at) against a relational
oracle; stat_control_variates applies the Monte-Carlo variance-
reduction identity to a real metric — using a correlated covariate
with known mean to shrink the estimator's variance by a measured
factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.hashing import FP_MOD, FP_MUL
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query


@query(
    "ml_label_model",
    # Real oracle: the independence-identity algebra is three scalar
    # aggregates — pairwise agreement AVGs (exact integer sums over n)
    # feed c_i = clamp(sqrt(p_ij * p_ik / p_jk)). Spark percentile and
    # DuckDB quantile_cont share the linear-interpolation definition,
    # so the two median gates agree bitwise; hash parity is pure
    # BIGINT arithmetic.
    oracle=f"""
    WITH d AS (SELECT doc_id,
                      CAST(len({DUCK_TOKENS}) AS BIGINT) AS n,
                      CAST(len(list_distinct({DUCK_TOKENS})) AS DOUBLE)
                        / len({DUCK_TOKENS}) AS dr
               FROM documents WHERE len({DUCK_TOKENS}) > 0),
    med AS (SELECT quantile_cont(n, 0.5) AS mn,
                   quantile_cont(dr, 0.5) AS mdr FROM d),
    lf AS (SELECT CASE WHEN d.n > med.mn THEN 1 ELSE 0 END AS l1,
                  CASE WHEN d.dr < med.mdr THEN 1 ELSE 0 END AS l2,
                  CAST((d.doc_id * {FP_MUL} + 29) % {FP_MOD} % 2 AS INT)
                    AS l3
           FROM d, med),
    ag AS (SELECT AVG(CASE WHEN l1 = l2 THEN 1.0 ELSE 0.0 END) AS a12,
                  AVG(CASE WHEN l1 = l3 THEN 1.0 ELSE 0.0 END) AS a13,
                  AVG(CASE WHEN l2 = l3 THEN 1.0 ELSE 0.0 END) AS a23
           FROM lf),
    p AS (SELECT 2 * a12 - 1 AS p12, 2 * a13 - 1 AS p13,
                 2 * a23 - 1 AS p23 FROM ag),
    c AS (SELECT p12, p13, p23,
                 CASE WHEN ABS(p23) < 1e-6 OR p12 * p13 / p23 <= 0 THEN 0.0
                      ELSE LEAST(SQRT(p12 * p13 / p23), 1.0) END AS c1,
                 CASE WHEN ABS(p13) < 1e-6 OR p12 * p23 / p13 <= 0 THEN 0.0
                      ELSE LEAST(SQRT(p12 * p23 / p13), 1.0) END AS c2,
                 CASE WHEN ABS(p12) < 1e-6 OR p13 * p23 / p12 <= 0 THEN 0.0
                      ELSE LEAST(SQRT(p13 * p23 / p12), 1.0) END AS c3
          FROM p)
    SELECT labeling_fn,
           FLOOR((1 + cc) / 2 * 10000 + 0.5) / 10000 AS est_accuracy,
           FLOOR(ps * 10000 + 0.5) / 10000 AS pair_signal
    FROM (SELECT 'length_gt_median' AS labeling_fn, c1 AS cc, p12 AS ps
          FROM c
          UNION ALL
          SELECT 'distinct_ratio_lt_median', c2, p13 FROM c
          UNION ALL
          SELECT 'junk_hash_parity', c3, p23 FROM c) u
    """,
)
def ml_label_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak-supervision label model over three labeling functions on
    documents — LF1: length above corpus median; LF2: distinct-token
    ratio BELOW median (long docs repeat tokens, so LF2 agrees with
    LF1 — a correlated pair);
    LF3: a deliberate JUNK function (hash parity). From pairwise
    agreement rates alone, the independence identity
    (2·acc_i−1)(2·acc_j−1) = 2·agree_ij − 1 recovers each LF's
    accuracy-proxy c_i — and the junk LF's c must collapse toward 0
    (asserted), with NO ground truth consulted. This is how label
    models triage heuristics before anyone labels anything.

    Scale: the LFs are narrow expressions; agreements are ONE
    aggregate of three products; the algebra is driver-side
    scalars."""
    import math

    toks = tokens()
    docs = cat(spark, sf_dir)["documents"].select(
        "doc_id",
        F.size(toks).alias("n"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "dr"
        ),
    ).filter(F.col("n") > 0)
    med = docs.agg(
        F.expr("percentile(n, 0.5)").alias("mn"),
        F.expr("percentile(dr, 0.5)").alias("mdr"),
    ).collect()[0]
    lf = docs.select(
        (F.col("n") > float(med["mn"])).cast("int").alias("l1"),
        (F.col("dr") < float(med["mdr"])).cast("int").alias("l2"),
        ((F.col("doc_id") * FP_MUL + 29) % FP_MOD % 2).cast("int").alias(
            "l3"
        ),
    )
    ag = lf.agg(
        F.avg((F.col("l1") == F.col("l2")).cast("double")).alias("a12"),
        F.avg((F.col("l1") == F.col("l3")).cast("double")).alias("a13"),
        F.avg((F.col("l2") == F.col("l3")).cast("double")).alias("a23"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    p12 = 2 * ag["a12"] - 1
    p13 = 2 * ag["a13"] - 1
    p23 = 2 * ag["a23"] - 1

    def safe_c(num1, num2, den):
        if abs(den) < 1e-6:
            return 0.0
        v = num1 * num2 / den
        if v <= 0:
            return 0.0
        # the identity assumes conditional independence; clamp into
        # the feasible range so violations read as certainty-capped
        return min(math.sqrt(v), 1.0)

    c1 = safe_c(p12, p13, p23)
    c2 = safe_c(p12, p23, p13)
    c3 = safe_c(p13, p23, p12)
    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
    rows = [
        ("length_gt_median", r4((1 + c1) / 2), r4(p12)),
        ("distinct_ratio_lt_median", r4((1 + c2) / 2), r4(p13)),
        ("junk_hash_parity", r4((1 + c3) / 2), r4(p23)),
    ]
    return spark.createDataFrame(
        rows, "labeling_fn string, est_accuracy double, pair_signal double"
    )


@query(
    "sql_map_ops",
    oracle="""
    SELECT o_orderpriority,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def sql_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP column surface: per priority, build a map<status, count>
    with map_from_entries(collect_list(struct)), read entries back
    with explode — the oracle computes the same cells relationally,
    proving the map round-trip lossless. Maps are the right shape for
    sparse per-entity counters that would otherwise explode into
    hundreds of mostly-null columns.

    Scale: the map builds inside a grouped aggregate (bounded value
    sets per key — the applicable regime for map columns); explode
    restores relational form without a join."""
    orders = cat(spark, sf_dir)["orders"]
    cell = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    mapped = cell.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderstatus", "n")))
        ).alias("status_counts")
    )
    back = mapped.select(
        "o_orderpriority",
        F.explode("status_counts").alias("o_orderstatus", "n"),
    )
    return back.select("o_orderpriority", "o_orderstatus", "n")


@query(
    "stat_control_variates",
    oracle="""
    WITH d AS (SELECT l_extendedprice AS y, l_quantity AS x FROM lineitem),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(y) AS my, AVG(x) AS mx,
                 VAR_SAMP(y) AS vy, VAR_SAMP(x) AS vx,
                 (SUM(y * x) - COUNT(*) * AVG(y) * AVG(x)) / (COUNT(*) - 1)
                   AS cxy
          FROM d),
    known AS (SELECT 25.5 AS mu_x),
    cv AS (SELECT m.n, m.my, m.vy,
                  m.cxy / m.vx AS c,
                  m.my - (m.cxy / m.vx) * (m.mx - known.mu_x) AS theta_cv,
                  m.vy - m.cxy * m.cxy / m.vx AS vy_cv
           FROM m, known)
    SELECT FLOOR(my * 100 + 0.5) / 100 AS naive_mean,
           FLOOR(theta_cv * 100 + 0.5) / 100 AS cv_mean,
           FLOOR(c * 10000 + 0.5) / 10000 AS cv_coef,
           FLOOR(vy_cv / vy * 10000 + 0.5) / 10000 AS variance_ratio
    FROM cv
    """,
)
def stat_control_variates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control-variates variance reduction for mean extendedprice:
    use quantity (assumed known population mean 25.5 — the uniform
    design center) as the control — θ_cv = ȳ − c(x̄ − μ_x) with
    c = cov/var(x); the variance ratio 1 − ρ² is the fraction of
    estimator variance the control removes. On weakly-correlated
    columns the ratio ≈ 1 and the op SAYS so — buying variance
    reduction requires correlation, not ceremony.

    Scale: one moments pass; the estimator is scalar algebra —
    identical shape at any scale (and the same identity CUPED uses
    with pre-period data as the control)."""
    d = cat(spark, sf_dir)["lineitem"].select(
        F.col("l_extendedprice").alias("y"), F.col("l_quantity").alias("x")
    )
    m = d.agg(
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
    c = F.col("cxy") / F.col("vx")
    theta = F.col("my") - c * (F.col("mx") - 25.5)
    vy_cv = F.col("vy") - F.col("cxy") * F.col("cxy") / F.col("vx")
    return m.select(
        (F.floor(F.col("my") * 100 + 0.5) / 100).alias("naive_mean"),
        (F.floor(theta * 100 + 0.5) / 100).alias("cv_mean"),
        ratio(c).alias("cv_coef"),
        ratio(vy_cv / F.col("vy")).alias("variance_ratio"),
    )
