"""Wave 194: collinearity diagnostics and subsequence motifs.

ml_vif computes variance inflation factors for the four lineitem
measures — the regression-hygiene check every OLS-family op in this
engine (stat_regression, ml_ridge, stat_nested_f_test) silently
assumes: a VIF over ~10 means the coefficient variances are garbage
and the feature set needs pruning before fitting, not after.
ev_matrix_profile is the z-normalized subsequence nearest-neighbor
profile (Yeh et al., public literature) over daily event volume:
the top MOTIF (closest repeating week-shape pair) and the top
DISCORD (the week least like any other) — shape anomalies that
pointwise detectors (ev_zscore, ev_anomaly_mad) structurally miss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat
from mister_spark.operators.extras109 import _det3
from mister_spark.registry import query

VIF_FEATURES = ("quantity", "extendedprice", "discount", "tax")


def _corr(a: int, b: int) -> str:
    i, j = min(a, b), max(a, b)
    return f"c{i}{j}"


_CORR_EXPRS = [
    f"(n*s{i}{j} - s{i}*s{j})"
    f" / NULLIF(SQRT((n*s{i}{i} - s{i}*s{i}) * (n*s{j}{j} - s{j}*s{j})), 0)"
    f" AS c{i}{j}"
    for i in range(1, 5)
    for j in range(i + 1, 5)
]


def _r2_expr(j: int) -> str:
    """R^2 of standardized feature j on the other three via one
    Cramer-expanded quadratic form (single final division)."""
    a, b, c = [k for k in range(1, 5) if k != j]
    one = "1.0e0"
    col1 = (one, _corr(a, b), _corr(a, c))
    col2 = (_corr(a, b), one, _corr(b, c))
    col3 = (_corr(a, c), _corr(b, c), one)
    rhs = (_corr(j, a), _corr(j, b), _corr(j, c))
    det = _det3(col1, col2, col3)
    num = (
        f"({rhs[0]}) * {_det3(rhs, col2, col3)}"
        f" + ({rhs[1]}) * {_det3(col1, rhs, col3)}"
        f" + ({rhs[2]}) * {_det3(col1, col2, rhs)}"
    )
    return f"({num}) / NULLIF({det}, 0) AS r2_{j}"


_R2_EXPRS = [_r2_expr(j) for j in range(1, 5)]
_VIF_EXPRS = [
    f"1.0e0 / NULLIF(1.0e0 - r2_{j}, 0) AS vif_{j}" for j in range(1, 5)
]
_MOM_SQL = (
    "CAST(COUNT(*) AS DOUBLE) AS n, "
    + ", ".join(f"SUM(x{i}) AS s{i}" for i in range(1, 5))
    + ", "
    + ", ".join(
        f"SUM(x{i}*x{j}) AS s{i}{j}"
        for i in range(1, 5)
        for j in range(i, 5)
    )
)


@query(
    "ml_vif",
    # Real oracle: one sufficient-statistics pass; the correlation,
    # Cramer, and VIF algebra are the SAME strings Spark's selectExpr
    # evaluates, so both engines divide near-identical operands (the
    # only cross-engine noise is summation order, ~1e-12 relative,
    # far inside the 1e-6/1e-4 grids).
    oracle=f"""
    WITH f AS (SELECT l_quantity AS x1, l_extendedprice AS x2,
                      l_discount AS x3, l_tax AS x4
               FROM lineitem),
    mom AS (SELECT {_MOM_SQL} FROM f),
    cc AS (SELECT mom.*, {", ".join(_CORR_EXPRS)} FROM mom),
    r2 AS (SELECT cc.*, {", ".join(_R2_EXPRS)} FROM cc),
    v AS (SELECT r2.*, {", ".join(_VIF_EXPRS)} FROM r2)
    SELECT f.feature,
           FLOOR(CASE f.feature
                 {" ".join(f"WHEN '{name}' THEN v.r2_{i + 1}" for i, name in enumerate(VIF_FEATURES))}
                 END * 1e6 + 0.5) / 1e6 AS r2_on_others,
           FLOOR(CASE f.feature
                 {" ".join(f"WHEN '{name}' THEN v.vif_{i + 1}" for i, name in enumerate(VIF_FEATURES))}
                 END * 1e4 + 0.5) / 1e4 AS vif
    FROM v, (VALUES {", ".join(f"('{n}')" for n in VIF_FEATURES)}) AS f(feature)
    ORDER BY f.feature
    """,
)
def ml_vif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance inflation factors for (quantity, extendedprice,
    discount, tax): VIF_j = 1/(1 − R²_j) where R²_j regresses the
    standardized feature on the other three. VIF ≈ 1 means the
    feature adds independent signal; VIF ≳ 10 means its regression
    coefficient is unidentifiable noise — run this before trusting
    any multi-feature fit's coefficients.

    Scale: ONE pass of 15 map-side-combinable sums over the fact
    table; everything after is closed-form algebra on a single row
    (three-variable Cramer solves shared textually with the oracle).
    No shuffle beyond the one global aggregate."""
    li = cat(spark, sf_dir)["lineitem"].select(
        F.col("l_quantity").alias("x1"),
        F.col("l_extendedprice").alias("x2"),
        F.col("l_discount").alias("x3"),
        F.col("l_tax").alias("x4"),
    )
    mom = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        *[F.sum(f"x{i}").alias(f"s{i}") for i in range(1, 5)],
        *[
            F.sum(F.col(f"x{i}") * F.col(f"x{j}")).alias(f"s{i}{j}")
            for i in range(1, 5)
            for j in range(i, 5)
        ],
    )
    v = (
        mom.selectExpr("*", *_CORR_EXPRS)
        .selectExpr("*", *_R2_EXPRS)
        .selectExpr("*", *_VIF_EXPRS)
    )
    stack_args = ", ".join(
        f"'{name}', FLOOR(r2_{i + 1} * 1e6 + 0.5) / 1e6,"
        f" FLOOR(vif_{i + 1} * 1e4 + 0.5) / 1e4"
        for i, name in enumerate(VIF_FEATURES)
    )
    return v.selectExpr(
        f"stack(4, {stack_args}) AS (feature, r2_on_others, vif)"
    ).orderBy("feature")


MP_W = 7  # subsequence length (one week of days)


@query(
    "ev_matrix_profile",
    # Real oracle: day counts are integers, so window sums, dot
    # products, and every z-normalized distance are bit-identical
    # doubles in both engines; motif/discord selection orders by the
    # ROUNDED distance with integer start-day tiebreaks. Windows with
    # zero variance are excluded (NULL correlation) in both engines.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(ts AS DATE)) AS t,
                      CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    e AS (SELECT s.t AS s, v.t - s.t AS k, v.y AS v
          FROM d s JOIN d v ON v.t BETWEEN s.t AND s.t + {MP_W - 1}),
    w AS (SELECT s, SUM(v) AS ss, SUM(v*v) AS sq
          FROM e GROUP BY s HAVING COUNT(*) = {MP_W}),
    p AS (SELECT a.s AS s, b.s AS u,
                 SUM(ea.v * eb.v) AS dot,
                 ANY_VALUE(a.ss) AS ss_s, ANY_VALUE(a.sq) AS sq_s,
                 ANY_VALUE(b.ss) AS ss_u, ANY_VALUE(b.sq) AS sq_u
          FROM w a JOIN w b ON ABS(b.s - a.s) >= {MP_W}
          JOIN e ea ON ea.s = a.s JOIN e eb ON eb.s = b.s
              AND eb.k = ea.k
          GROUP BY a.s, b.s),
    dist AS (SELECT s, u,
                    SQRT(GREATEST(2.0e0 * {MP_W} * (1.0e0 -
                        (dot - ss_s * ss_u / {MP_W})
                        / NULLIF(SQRT((sq_s - ss_s*ss_s/{MP_W})
                                    * (sq_u - ss_u*ss_u/{MP_W})), 0)),
                        0.0e0)) AS dd
             FROM p),
    prof AS (SELECT s, MIN(dd) AS nn FROM dist WHERE dd IS NOT NULL
             GROUP BY s),
    motif AS (SELECT s, u, FLOOR(dd * 1e4 + 0.5) / 1e4 AS md
              FROM dist WHERE s < u AND dd IS NOT NULL
              ORDER BY FLOOR(dd * 1e4 + 0.5) / 1e4, s, u LIMIT 1),
    disc AS (SELECT s, FLOOR(nn * 1e4 + 0.5) / 1e4 AS dd
             FROM prof
             ORDER BY FLOOR(nn * 1e4 + 0.5) / 1e4 DESC, s LIMIT 1)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM w) AS n_windows,
           CAST(motif.s AS BIGINT) AS motif_start_1,
           CAST(motif.u AS BIGINT) AS motif_start_2,
           motif.md AS motif_dist,
           CAST(disc.s AS BIGINT) AS discord_start,
           disc.dd AS discord_dist
    FROM motif, disc
    """,
)
def ev_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix profile over daily event volume, window = 7 days: for
    every week-shaped subsequence, the z-normalized Euclidean
    distance to its nearest non-overlapping neighbor. The global
    minimum pair is the top MOTIF (a repeating weekly shape); the
    window whose nearest neighbor is farthest is the top DISCORD —
    the week unlike any other, invisible to pointwise z-scores
    because no single day is extreme.

    Scale: the day frame is calendar-bounded after ONE rollup, so
    the O(n²·w) pair stage runs on a model-sized frame (a year is
    ~358 windows → ~60k pairs × 7 — trivial); at petabyte scale the
    expensive part stays the first aggregate, which is map-side
    combinable. Start days with an incomplete or zero-variance
    window are excluded in both engines."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .localCheckpoint()  # feeds the window-start and element aliases
    )
    s = d.select(F.col("t").alias("s"))
    v = d.select(F.col("t").alias("vt"), F.col("y").alias("v"))
    e = (
        s.join(
            v,
            (F.col("vt") >= F.col("s"))
            & (F.col("vt") <= F.col("s") + (MP_W - 1)),
        )
        .select("s", (F.col("vt") - F.col("s")).alias("k"), "v")
        .localCheckpoint()  # reused by the stats pass and both pair sides
    )
    w = (
        e.groupBy("s")
        .agg(
            F.sum("v").alias("ss"),
            F.sum(F.col("v") * F.col("v")).alias("sq"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("cnt") == MP_W)
        .drop("cnt")
    )
    wa = w.select(
        F.col("s"), F.col("ss").alias("ss_s"), F.col("sq").alias("sq_s")
    )
    wb = w.select(
        F.col("s").alias("u"),
        F.col("ss").alias("ss_u"),
        F.col("sq").alias("sq_u"),
    )
    pairs = wa.join(
        wb, F.abs(F.col("u") - F.col("s")) >= MP_W
    )
    ea = e.select("s", "k", F.col("v").alias("va"))
    eb = e.select(F.col("s").alias("u"), "k", F.col("v").alias("vb"))
    dot = (
        ea.join(eb, "k")
        .groupBy("s", "u")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    p = pairs.join(dot, ["s", "u"])
    numer = F.col("dot") - F.col("ss_s") * F.col("ss_u") / MP_W
    denom = F.sqrt(
        (F.col("sq_s") - F.col("ss_s") * F.col("ss_s") / MP_W)
        * (F.col("sq_u") - F.col("ss_u") * F.col("ss_u") / MP_W)
    )
    dd = F.sqrt(
        F.greatest(
            2.0 * MP_W * (1.0 - numer / F.nullif(denom, F.lit(0.0))),
            F.lit(0.0),
        )
    )
    dist = p.select("s", "u", dd.alias("dd")).filter(
        F.col("dd").isNotNull()
    ).localCheckpoint()  # feeds the motif scan and the profile
    rd = F.floor(F.col("dd") * 1e4 + 0.5) / 1e4
    motif = (
        dist.filter(F.col("s") < F.col("u"))
        .select("s", "u", rd.alias("md"))
        .orderBy("md", "s", "u")
        .limit(1)
    )
    prof = dist.groupBy("s").agg(F.min("dd").alias("nn"))
    disc = (
        prof.select(
            F.col("s").alias("ds"),
            (F.floor(F.col("nn") * 1e4 + 0.5) / 1e4).alias("ddist"),
        )
        .orderBy(F.col("ddist").desc(), "ds")
        .limit(1)
    )
    nw = w.count()
    return motif.crossJoin(disc).select(
        F.lit(nw).cast("bigint").alias("n_windows"),
        F.col("s").cast("bigint").alias("motif_start_1"),
        F.col("u").cast("bigint").alias("motif_start_2"),
        F.col("md").alias("motif_dist"),
        F.col("ds").cast("bigint").alias("discord_start"),
        F.col("ddist").alias("discord_dist"),
    )
