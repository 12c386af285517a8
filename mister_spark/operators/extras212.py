"""Wave 212: sparse regression paths and structural-break testing.

ml_lasso_cd is the lasso solved by cyclic coordinate descent in
CORRELATION form: one distributed sufficient-statistics pass reduces
the table to the 3x3 correlation matrix + 3 response correlations,
and the entire lambda path costs driver-side arithmetic — the sparse
complement to ml_ridge_path (ridge shrinks, lasso SELECTS: each
lambda reports which features survive). stat_chow_test asks whether
the daily-volume trend line BREAKS at the calendar midpoint: fit OLS
pooled and per-segment from one conditional-aggregation pass and
compare SSEs with the Chow F — with df1 = 2 the F tail has the exact
closed form (1 + 2F/d2)^(-d2/2), no incomplete-beta needed.

Exactness: both ops reduce to O(1) sufficient statistics whose
closed-form combinations are identical expressions in both engines;
the CD recursion replays in a recursive CTE with the same operation
order, and every reported value lands on a rounding grid that
absorbs sum-order ulp drift.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

LASSO_LAMBDAS = (0.0, 0.1, 0.3, 0.6)  # on the |corr| <= 1 scale
LASSO_ITERS = 40  # cyclic CD sweeps; geometric convergence at p=3
EPOCH = "1970-01-01"

_SOFT = "CASE WHEN {z} > lam THEN {z} - lam WHEN {z} < -lam THEN {z} + lam ELSE 0.0 END"


def _lasso_oracle() -> str:
    lams = ", ".join(f"({v!r})" for v in LASSO_LAMBDAS)
    s1 = _SOFT.format(z="(r1y - r12 * b2 - r13 * b3)")
    s2 = _SOFT.format(z="(r2y - r12 * b1n - r23 * b3)")
    s3 = _SOFT.format(z="(r3y - r13 * b1n - r23 * b2n)")
    return f"""
    WITH RECURSIVE
    f AS (SELECT CAST(isodow(CAST(o_orderdate AS DATE)) AS DOUBLE) AS x1,
                 CAST(substr(o_orderpriority, 1, 1) AS DOUBLE) AS x2,
                 CAST(date_diff('day', DATE '{EPOCH}',
                      CAST(o_orderdate AS DATE)) AS DOUBLE) AS x3,
                 CAST(o_totalprice AS DOUBLE) AS y
          FROM orders),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 AVG(x1) AS m1, AVG(x2) AS m2, AVG(x3) AS m3, AVG(y) AS my,
                 SUM(x1*x1) AS xx11, SUM(x1*x2) AS xx12,
                 SUM(x1*x3) AS xx13, SUM(x2*x2) AS xx22,
                 SUM(x2*x3) AS xx23, SUM(x3*x3) AS xx33,
                 SUM(x1*y) AS xy1, SUM(x2*y) AS xy2, SUM(x3*y) AS xy3,
                 SUM(y*y) AS yy
          FROM f),
    c AS (SELECT (xx12 - n*m1*m2)
                   / SQRT((xx11 - n*m1*m1) * (xx22 - n*m2*m2)) AS r12,
                 (xx13 - n*m1*m3)
                   / SQRT((xx11 - n*m1*m1) * (xx33 - n*m3*m3)) AS r13,
                 (xx23 - n*m2*m3)
                   / SQRT((xx22 - n*m2*m2) * (xx33 - n*m3*m3)) AS r23,
                 (xy1 - n*m1*my)
                   / SQRT((xx11 - n*m1*m1) * (yy - n*my*my)) AS r1y,
                 (xy2 - n*m2*my)
                   / SQRT((xx22 - n*m2*m2) * (yy - n*my*my)) AS r2y,
                 (xy3 - n*m3*my)
                   / SQRT((xx33 - n*m3*m3) * (yy - n*my*my)) AS r3y
          FROM s),
    cd AS (SELECT 0 AS it, CAST(lv.lam AS DOUBLE) AS lam,
                  -- CAST: a bare 0.0 seed types the CTE columns
                  -- DECIMAL(2,1) and silently rounds every iterate
                  CAST(0.0 AS DOUBLE) AS b1, CAST(0.0 AS DOUBLE) AS b2,
                  CAST(0.0 AS DOUBLE) AS b3
           FROM (VALUES {lams}) AS lv(lam)
           UNION ALL
           SELECT it + 1, lam, b1n, b2n,
                  {s3} AS b3n
           FROM (SELECT it, lam, b1n,
                        {s2} AS b2n,
                        b3, r13, r23, r3y
                 FROM (SELECT cd.it, cd.lam,
                              {s1} AS b1n,
                              cd.b2, cd.b3, c.*
                       FROM cd CROSS JOIN c
                       WHERE cd.it < {LASSO_ITERS}) q1) q2),
    fin AS (SELECT cd.*, c.* FROM cd CROSS JOIN c
            WHERE it = {LASSO_ITERS})
    SELECT lam,
           CAST(CASE WHEN b1 <> 0 THEN 1 ELSE 0 END
                + CASE WHEN b2 <> 0 THEN 1 ELSE 0 END
                + CASE WHEN b3 <> 0 THEN 1 ELSE 0 END AS BIGINT)
             AS n_nonzero,
           FLOOR(b1 * 1e6 + 0.5) / 1e6 AS coef_weekday,
           FLOOR(b2 * 1e6 + 0.5) / 1e6 AS coef_priority,
           FLOOR(b3 * 1e6 + 0.5) / 1e6 AS coef_epochday,
           FLOOR((2 * (b1*r1y + b2*r2y + b3*r3y)
                  - (b1*b1 + b2*b2 + b3*b3
                     + 2 * (b1*b2*r12 + b1*b3*r13 + b2*b3*r23)))
                 * 1e6 + 0.5) / 1e6 AS r2
    FROM fin
    """


@query("ml_lasso_cd", oracle=_lasso_oracle())
def ml_lasso_cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lasso path for order totalprice on (weekday, priority digit,
    epoch-day) via cyclic coordinate descent on the CORRELATION
    system: b_j <- soft(r_jy - sum_k r_jk b_k, lambda), 40 sweeps per
    lambda. On the |corr| <= 1 scale lambda is dimensionless:
    lambda = 0 is OLS, lambda >= max|r_jy| kills every coefficient,
    and the reported n_nonzero per lambda IS the feature-selection
    story ridge can't tell (ridge never produces an exact zero).

    Scale: ONE sufficient-statistics pass (O(p^2) per partition,
    map-side combinable) reduces any row count to 9 numbers; the CD
    sweeps and the whole lambda grid are driver arithmetic on that
    3x3 system. The oracle replays the identical recursion as a
    recursive CTE — same operation order, grid-rounded outputs."""
    d = cat(spark, sf_dir)["orders"].select(
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1)
        .cast("double")
        .alias("x1"),
        F.substring("o_orderpriority", 1, 1).cast("double").alias("x2"),
        F.datediff(F.date_trunc("day", "o_orderdate"), F.lit(EPOCH))
        .cast("double")
        .alias("x3"),
        F.col("o_totalprice").cast("double").alias("y"),
    )
    feats = ["x1", "x2", "x3"]
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for f1 in feats + ["y"]:
        aggs.append(F.avg(f1).alias(f"m_{f1}"))
    for i, f1 in enumerate(feats):
        for f2 in feats[i:]:
            aggs.append(F.sum(F.col(f1) * F.col(f2)).alias(f"xx_{f1}{f2}"))
        aggs.append(F.sum(F.col(f1) * F.col("y")).alias(f"xy_{f1}"))
    aggs.append(F.sum(F.col("y") * F.col("y")).alias("yy"))
    row = d.agg(*aggs).collect()[0]
    n = row["n"]
    m = {f: row[f"m_{f}"] for f in feats + ["y"]}

    def ctr(a: str, b: str) -> float:
        key = f"xx_{a}{b}" if f"xx_{a}{b}" in row else f"xx_{b}{a}"
        return row[key] - n * m[a] * m[b]

    s11, s22, s33 = ctr("x1", "x1"), ctr("x2", "x2"), ctr("x3", "x3")
    syy = row["yy"] - n * m["y"] * m["y"]
    r12 = ctr("x1", "x2") / math.sqrt(s11 * s22)
    r13 = ctr("x1", "x3") / math.sqrt(s11 * s33)
    r23 = ctr("x2", "x3") / math.sqrt(s22 * s33)
    r1y = (row["xy_x1"] - n * m["x1"] * m["y"]) / math.sqrt(s11 * syy)
    r2y = (row["xy_x2"] - n * m["x2"] * m["y"]) / math.sqrt(s22 * syy)
    r3y = (row["xy_x3"] - n * m["x3"] * m["y"]) / math.sqrt(s33 * syy)

    def soft(z: float, lam: float) -> float:
        # mirror the oracle's CASE exactly (same compares, same order)
        if z > lam:
            return z - lam
        if z < -lam:
            return z + lam
        return 0.0

    out = []
    for lam in LASSO_LAMBDAS:
        b1 = b2 = b3 = 0.0
        for _ in range(LASSO_ITERS):
            b1 = soft(r1y - r12 * b2 - r13 * b3, lam)
            b2 = soft(r2y - r12 * b1 - r23 * b3, lam)
            b3 = soft(r3y - r13 * b1 - r23 * b2, lam)
        r2fit = 2 * (b1 * r1y + b2 * r2y + b3 * r3y) - (
            b1 * b1 + b2 * b2 + b3 * b3
            + 2 * (b1 * b2 * r12 + b1 * b3 * r13 + b2 * b3 * r23)
        )
        g = lambda v, k: math.floor(v * k + 0.5) / k  # noqa: E731
        out.append(
            (
                float(lam),
                int(b1 != 0) + int(b2 != 0) + int(b3 != 0),
                g(b1, 1e6),
                g(b2, 1e6),
                g(b3, 1e6),
                g(r2fit, 1e6),
            )
        )
    return spark.createDataFrame(
        out,
        "lam double, n_nonzero long, coef_weekday double, "
        "coef_priority double, coef_epochday double, r2 double",
    )


@query(
    "stat_chow_test",
    # Real oracle: day counts and the midpoint split are integers,
    # the per-segment/pooled OLS sums are one conditional pass, and
    # the Chow F plus its EXACT df1=2 tail (1+2F/d2)^(-d2/2) divide
    # identical operands — float only inside the rounding grid.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t, CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    b AS (SELECT CAST(FLOOR((MIN(t) + MAX(t)) / 2.0) AS BIGINT) AS mid
          FROM d),
    s AS (SELECT CASE WHEN d.t <= b.mid THEN 0 ELSE 1 END AS seg,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(CAST(d.t AS DOUBLE)) AS st, SUM(d.y) AS sy,
                 SUM(CAST(d.t AS DOUBLE) * d.t) AS stt,
                 SUM(CAST(d.t AS DOUBLE) * d.y) AS sty,
                 SUM(d.y * d.y) AS syy
          FROM d, b GROUP BY 1),
    e AS (SELECT seg, n, st, sy, stt, sty, syy,
                 (sty - st * sy / n) / (stt - st * st / n) AS slope,
                 (syy - sy * sy / n)
                 - (sty - st * sy / n) * (sty - st * sy / n)
                   / (stt - st * st / n) AS sse
          FROM s),
    p AS (SELECT SUM(n) AS n, SUM(st) AS st, SUM(sy) AS sy,
                 SUM(stt) AS stt, SUM(sty) AS sty, SUM(syy) AS syy,
                 SUM(sse) AS sse_split
          FROM e),
    q AS (SELECT p.n,
                 (p.syy - p.sy * p.sy / p.n)
                 - (p.sty - p.st * p.sy / p.n)
                   * (p.sty - p.st * p.sy / p.n)
                   / (p.stt - p.st * p.st / p.n) AS sse_pool,
                 p.sse_split,
                 (SELECT slope FROM e WHERE seg = 0) AS slope_pre,
                 (SELECT slope FROM e WHERE seg = 1) AS slope_post
          FROM p),
    z AS (SELECT q.*,
                 -- zero split-SSE with pooled residue left = a
                 -- PERFECT break (sentinel F, p=0); both zero = no
                 -- signal at all
                 CASE WHEN sse_split <= 0 AND sse_pool <= 0 THEN 0.0
                      WHEN sse_split <= 0 THEN 1e6
                      ELSE ((sse_pool - sse_split) / 2)
                           / (sse_split / (n - 4)) END AS fs
          FROM q)
    SELECT CAST(n AS BIGINT) AS n_days,
           strftime(DATE '{EPOCH}' + CAST(b.mid AS INT), '%Y-%m-%d')
             AS break_date,
           FLOOR(fs * 1e4 + 0.5) / 1e4 AS f_stat,
           FLOOR(POWER(1 + 2 * GREATEST(fs, 0.0) / (n - 4),
                       -(n - 4) / 2.0) * 1e6 + 0.5) / 1e6 AS p_value,
           FLOOR(slope_pre * 1e4 + 0.5) / 1e4 AS slope_pre,
           FLOOR(slope_post * 1e4 + 0.5) / 1e4 AS slope_post,
           FLOOR(CASE WHEN sse_pool <= 0 THEN 0.0
                      ELSE 1 - sse_split / sse_pool END * 1e4 + 0.5) / 1e4
             AS sse_reduction
    FROM z, b
    """,
)
def stat_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow structural-break test on the daily-volume trend: OLS of
    count on day index fit pooled and separately on each side of the
    calendar midpoint, F = ((SSE_pool - SSE_1 - SSE_2)/2) /
    ((SSE_1 + SSE_2)/(n-4)). With 2 numerator df the F tail is the
    EXACT closed form (1 + 2F/(n-4))^(-(n-4)/2). Rejecting means one
    straight line is a lie — the growth story changed slope or level
    mid-window (the parametric sibling of ev_pettitt_test, which
    finds WHERE; Chow certifies THAT, with slopes attached).

    Scale: ONE day-grain count, a 1-row min/max for the split, then
    one conditional-aggregation pass over the calendar-bounded day
    frame; all downstream algebra is on two 6-number rows."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .localCheckpoint()  # calendar-bounded; feeds split + sums
    )
    b = d.agg(
        F.floor((F.min("t") + F.max("t")) / 2.0).cast("bigint").alias("mid")
    )
    td = F.col("t").cast("double")
    s = (
        d.crossJoin(F.broadcast(b))
        .groupBy(
            F.when(F.col("t") <= F.col("mid"), 0).otherwise(1).alias("seg")
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(td).alias("st"),
            F.sum("y").alias("sy"),
            F.sum(td * F.col("t")).alias("stt"),
            F.sum(td * F.col("y")).alias("sty"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    sxy = F.col("sty") - F.col("st") * F.col("sy") / F.col("n")
    sxx = F.col("stt") - F.col("st") * F.col("st") / F.col("n")
    e = s.select(
        "seg", "n", "st", "sy", "stt", "sty", "syy",
        (sxy / sxx).alias("slope"),
        (
            (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
            - sxy * sxy / sxx
        ).alias("sse"),
    ).localCheckpoint()  # 2 rows; feeds pooled sums + slope picks
    p = e.agg(
        F.sum("n").alias("n"),
        F.sum("st").alias("st"),
        F.sum("sy").alias("sy"),
        F.sum("stt").alias("stt"),
        F.sum("sty").alias("sty"),
        F.sum("syy").alias("syy"),
        F.sum("sse").alias("sse_split"),
    )
    slopes = e.groupBy().pivot("seg", [0, 1]).agg(F.first("slope"))
    sse_pool = (
        (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
        - (F.col("sty") - F.col("st") * F.col("sy") / F.col("n"))
        * (F.col("sty") - F.col("st") * F.col("sy") / F.col("n"))
        / (F.col("stt") - F.col("st") * F.col("st") / F.col("n"))
    )
    q = (
        p.crossJoin(F.broadcast(slopes))
        .crossJoin(F.broadcast(b))
        .select(
            "n", "mid", "sse_split",
            sse_pool.alias("sse_pool"),
            F.col("0").alias("slope_pre"),
            F.col("1").alias("slope_post"),
        )
    )
    f_stat = (
        F.when(
            (F.col("sse_split") <= 0) & (F.col("sse_pool") <= 0), F.lit(0.0)
        )
        .when(F.col("sse_split") <= 0, F.lit(1e6))
        .otherwise(
            ((F.col("sse_pool") - F.col("sse_split")) / 2)
            / (F.col("sse_split") / (F.col("n") - 4))
        )
    )
    return q.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.date_format(
            F.date_add(F.lit(EPOCH).cast("date"), F.col("mid").cast("int")),
            "yyyy-MM-dd",
        ).alias("break_date"),
        rnd(f_stat, 4).alias("f_stat"),
        rnd(
            F.pow(
                1 + 2 * F.greatest(f_stat, F.lit(0.0)) / (F.col("n") - 4),
                -(F.col("n") - 4) / 2.0,
            ),
            6,
        ).alias("p_value"),
        rnd(F.col("slope_pre"), 4).alias("slope_pre"),
        rnd(F.col("slope_post"), 4).alias("slope_post"),
        rnd(
            F.when(F.col("sse_pool") <= 0, F.lit(0.0)).otherwise(
                1 - F.col("sse_split") / F.col("sse_pool")
            ),
            4,
        ).alias("sse_reduction"),
    )
