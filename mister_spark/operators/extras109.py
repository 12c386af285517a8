"""Wave 109: regularization paths, graph random walks, forecast
combination, and nested-model testing.

ml_ridge_path traces the ridge coefficient path over a λ grid from
ONE sufficient-statistics pass (the grid costs driver solves, not
scans) with GCV picking the winner; graph_random_walks generates
deterministic hash-driven random walks over the co-purchase graph —
the corpus node2vec-style embedding trainers consume, built with
per-step distributed joins; ev_forecast_ensemble backtests three
cheap forecasters on a held-out week and combines them with
inverse-MAE weights — the combination that beats its average member
almost always; stat_nested_f_test is the partial F-test: does adding
discount to the quantity model actually explain more of price than
chance?
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.hashing import FP_MOD, FP_MUL
from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import (
    DUCK_COPURCHASE_SYM,
    _copurchase_edges,
)
from mister_spark.registry import query

RIDGE_LAMBDAS = (0.0, 1.0, 10.0, 100.0, 1000.0)
WALK_LEN = 5
WALKS_PER_NODE = 2
FC_H = 7


def _det3(c1, c2, c3) -> str:
    """SQL string: determinant of the 3×3 matrix with columns c1..c3
    (each a 3-tuple of scalar SQL expressions)."""
    (a, d, g), (b, e, h), (c, f, i) = c1, c2, c3
    return (
        f"({a}*({e}*{i}-{f}*{h}) - {b}*({d}*{i}-{f}*{g})"
        f" + {c}*({d}*{h}-{e}*{g}))"
    )


def _ridge_path_oracle() -> str:
    """Standardized 3×3 ridge path in pure SQL: sufficient statistics,
    closed-form symmetric eigenvalues (trigonometric cubic — agrees
    with LAPACK to ~1e-10, absorbed by the 1e-4 df grid), and per-λ
    Cramer solves. No recursion needed at p = 3."""
    col1 = ("a11", "a12", "a13")
    col2 = ("a12", "a22", "a23")
    col3 = ("a13", "a23", "a33")
    cyc = ("cy1", "cy2", "cy3")
    det = _det3(col1, col2, col3)
    b1 = f"{_det3(cyc, col2, col3)} / {det}"
    b2 = f"{_det3(col1, cyc, col3)} / {det}"
    b3 = f"{_det3(col1, col2, cyc)} / {det}"
    bcol1 = ("b11", "b12", "b13")
    bcol2 = ("b12", "b22", "b23")
    bcol3 = ("b13", "b23", "b33")
    detb = _det3(bcol1, bcol2, bcol3)
    lams = ", ".join(f"({v!r})" for v in RIDGE_LAMBDAS)
    return f"""
    WITH f AS (SELECT CAST(isodow(CAST(o_orderdate AS DATE)) AS DOUBLE) AS x1,
                      CAST(substr(o_orderpriority, 1, 1) AS DOUBLE) AS x2,
                      CAST(date_diff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS DOUBLE) AS x3,
                      CAST(o_totalprice AS DOUBLE) AS y
               FROM orders),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 AVG(x1) AS m1, AVG(x2) AS m2, AVG(x3) AS m3,
                 STDDEV_SAMP(x1) AS s1, STDDEV_SAMP(x2) AS s2,
                 STDDEV_SAMP(x3) AS s3, AVG(y) AS my,
                 SUM(x1*x1) AS xx11, SUM(x1*x2) AS xx12,
                 SUM(x1*x3) AS xx13, SUM(x2*x2) AS xx22,
                 SUM(x2*x3) AS xx23, SUM(x3*x3) AS xx33,
                 SUM(x1*y) AS xy1, SUM(x2*y) AS xy2, SUM(x3*y) AS xy3,
                 SUM(y*y) AS yy
          FROM f),
    c AS (SELECT n,
                 (xx11 - n*m1*m1)/(s1*s1) AS c11,
                 (xx12 - n*m1*m2)/(s1*s2) AS c12,
                 (xx13 - n*m1*m3)/(s1*s3) AS c13,
                 (xx22 - n*m2*m2)/(s2*s2) AS c22,
                 (xx23 - n*m2*m3)/(s2*s3) AS c23,
                 (xx33 - n*m3*m3)/(s3*s3) AS c33,
                 (xy1 - n*m1*my)/s1 AS cy1,
                 (xy2 - n*m2*my)/s2 AS cy2,
                 (xy3 - n*m3*my)/s3 AS cy3,
                 yy - n*my*my AS syy
          FROM s),
    e0 AS (SELECT c.*, (c11 + c22 + c33) / 3 AS q,
                  SQRT(((c11-(c11+c22+c33)/3)*(c11-(c11+c22+c33)/3)
                        + (c22-(c11+c22+c33)/3)*(c22-(c11+c22+c33)/3)
                        + (c33-(c11+c22+c33)/3)*(c33-(c11+c22+c33)/3)
                        + 2*(c12*c12 + c13*c13 + c23*c23)) / 6) AS pp
           FROM c),
    e1 AS (SELECT e0.*, (c11-q)/pp AS b11, c12/pp AS b12, c13/pp AS b13,
                  (c22-q)/pp AS b22, c23/pp AS b23, (c33-q)/pp AS b33
           FROM e0),
    e2 AS (SELECT e1.*,
                  ACOS(LEAST(GREATEST({detb} / 2, -1.0), 1.0)) / 3 AS phi
           FROM e1),
    ev AS (SELECT e2.*, q + 2*pp*COS(phi) AS ev1,
                  q + 2*pp*COS(phi + 2.0943951023931953) AS ev3
           FROM e2),
    lp AS (SELECT ev.*, lv.lam AS lam,
                  c11 + lv.lam AS a11, c12 AS a12, c13 AS a13,
                  c22 + lv.lam AS a22, c23 AS a23, c33 + lv.lam AS a33
           FROM ev CROSS JOIN (VALUES {lams}) AS lv(lam)),
    bt AS (SELECT lp.*, {b1} AS bb1, {b2} AS bb2, {b3} AS bb3 FROM lp),
    gv AS (SELECT lam, n, syy,
                  SQRT(bb1*bb1 + bb2*bb2 + bb3*bb3) AS coef_norm,
                  syy - 2*(bb1*cy1 + bb2*cy2 + bb3*cy3)
                      + (bb1*(c11*bb1 + c12*bb2 + c13*bb3)
                         + bb2*(c12*bb1 + c22*bb2 + c23*bb3)
                         + bb3*(c13*bb1 + c23*bb2 + c33*bb3)) AS sse,
                  CASE WHEN lam > 0
                       THEN ev1/(ev1+lam)
                            + (3*q - ev1 - ev3)/((3*q - ev1 - ev3)+lam)
                            + ev3/(ev3+lam)
                       ELSE 3.0 END AS df
           FROM bt),
    gg AS (SELECT lam, coef_norm, sse / syy AS sse_ratio, df,
                  sse / ((n - df) * (n - df)) AS gcv
           FROM gv),
    g0 AS (SELECT gcv AS gcv0 FROM gg WHERE lam = 0)
    SELECT lam,
           FLOOR(coef_norm * 1e6 + 0.5) / 1e6 AS coef_norm,
           FLOOR(sse_ratio * 1e6 + 0.5) / 1e6 AS sse_ratio,
           FLOOR(df * 1e4 + 0.5) / 1e4 AS eff_df,
           FLOOR(gcv / gcv0 * 1e8 + 0.5) / 1e8 AS gcv_rel
    FROM gg CROSS JOIN g0
    """


@query("ml_ridge_path", oracle=_ridge_path_oracle())
def ml_ridge_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regularization path for predicting order totalprice from
    (weekday, priority, epoch-day) — one XᵀX/Xᵀy sufficient-statistics
    pass, then a driver-side solve PER λ on the standardized system:
    coefficients shrink along the path and GCV = SSE/(n−df(λ))²
    (df = Σ dᵢ²/(dᵢ²+λ)) picks the operating point without a single
    extra scan. The model-selection curve at one-pass cost.

    Scale: sufficient statistics are O(p²) per partition; the λ grid
    multiplies DRIVER solves only — the data is scanned once (plus
    once more for centering stats folded into the same pass)."""
    import numpy as np

    orders = cat(spark, sf_dir)["orders"]
    d = orders.select(
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1)
        .cast("double")
        .alias("x1"),
        F.substring("o_orderpriority", 1, 1).cast("double").alias("x2"),
        F.datediff(
            F.date_trunc("day", "o_orderdate"), F.lit("1970-01-01")
        )
        .cast("double")
        .alias("x3"),
        F.col("o_totalprice").alias("y"),
    )
    feats = ["x1", "x2", "x3"]
    p = len(feats)
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for f1 in feats:
        aggs.append(F.avg(f1).alias(f"m_{f1}"))
        aggs.append(F.stddev_samp(f1).alias(f"s_{f1}"))
    aggs.append(F.avg("y").alias("m_y"))
    for i, f1 in enumerate(feats):
        for f2 in feats[i:]:
            aggs.append(F.sum(F.col(f1) * F.col(f2)).alias(f"xx_{f1}_{f2}"))
        aggs.append(F.sum(F.col(f1) * F.col("y")).alias(f"xy_{f1}"))
    aggs.append(F.sum(F.col("y") * F.col("y")).alias("yy"))
    row = d.agg(*aggs).collect()[0]
    n = row["n"]
    mu = np.array([row[f"m_{f}"] for f in feats])
    sd = np.array([row[f"s_{f}"] for f in feats])
    my = row["m_y"]
    XX = np.zeros((p, p))
    Xy = np.zeros(p)
    for i, f1 in enumerate(feats):
        for j2 in range(i, p):
            f2 = feats[j2]
            XX[i, j2] = XX[j2, i] = row[f"xx_{f1}_{f2}"]
        Xy[i] = row[f"xy_{f1}"]
    # centered+standardized moments
    C = (XX - n * np.outer(mu, mu)) / np.outer(sd, sd)
    cy = (Xy - n * mu * my) / sd
    syy = row["yy"] - n * my * my
    evals = np.linalg.eigvalsh(C)
    path = []
    for lam in RIDGE_LAMBDAS:
        beta = np.linalg.solve(C + lam * np.eye(p), cy)
        sse = float(syy - 2 * beta @ cy + beta @ C @ beta)
        df = float(np.sum(evals / (evals + lam))) if lam > 0 else float(p)
        path.append((lam, beta, sse, df, sse / (n - df) ** 2))
    import math

    gcv0 = path[0][4]
    # floor-grid rounding (common.rnd's form) — identical double
    # arithmetic to the oracle's FLOOR(x*10^n+0.5)/10^n
    out = [
        (
            float(lam),
            math.floor(float(np.linalg.norm(beta)) * 1e6 + 0.5) / 1e6,
            math.floor(sse / syy * 1e6 + 0.5) / 1e6,
            math.floor(df * 1e4 + 0.5) / 1e4,
            math.floor(gcv / gcv0 * 1e8 + 0.5) / 1e8,
        )
        for lam, beta, sse, df, gcv in path
    ]
    return spark.createDataFrame(
        out,
        "lam double, coef_norm double, sse_ratio double, eff_df double, "
        "gcv_rel double",
    )


@query(
    "graph_random_walks",
    # Real oracle: the hash-driven walks replay as a recursive CTE —
    # adjacency pre-ranked per node, the step pick is the same 60 md5
    # bits mod degree on both engines, and the stats aggregate over
    # the CTE's cumulative (walk_id, step, node) output.
    oracle=f"""
    WITH RECURSIVE {DUCK_COPURCHASE_SYM},
    adj AS (SELECT p1 AS u, p2 AS v,
                   ROW_NUMBER() OVER (PARTITION BY p1 ORDER BY p2) - 1
                     AS rk
            FROM csym),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
            FROM adj GROUP BY u),
    wk AS (
      SELECT CAST(d.u AS VARCHAR) || '_' || CAST(w.w AS VARCHAR)
               AS walk_id,
             d.u AS cur, 0 AS steps
      FROM deg d, (SELECT unnest(range(0, {WALKS_PER_NODE})) AS w) w
      UNION ALL
      SELECT f.walk_id, a.v, f.steps + 1
      FROM wk f
      JOIN deg dg ON dg.u = f.cur
      JOIN adj a ON a.u = f.cur
              AND a.rk = CAST('0x' || substr(md5(
                    f.walk_id || ':' || CAST(f.steps + 1 AS VARCHAR)),
                    1, 15) AS BIGINT) % dg.deg
      WHERE f.steps < {WALK_LEN}),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
    nw AS (SELECT CAST(COUNT(DISTINCT walk_id) AS BIGINT) AS w
           FROM wk),
    cov AS (SELECT CAST(COUNT(DISTINCT cur) AS BIGINT) AS c FROM wk),
    au AS (SELECT AVG(uq) AS a FROM (
             SELECT walk_id, CAST(COUNT(DISTINCT cur) AS DOUBLE) AS uq
             FROM wk GROUP BY walk_id) q)
    SELECT nn.n AS nodes, nw.w AS walks,
           CAST({WALK_LEN} AS BIGINT) AS walk_len,
           cov.c AS covered_nodes,
           FLOOR(CAST(cov.c AS DOUBLE) / nn.n * 10000 + 0.5) / 10000
             AS coverage,
           FLOOR(au.a * 10000 + 0.5) / 10000 AS avg_unique_per_walk
    FROM nn, nw, cov, au
    """,
)
def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random walks over the co-purchase graph: each
    node launches {w} walks of length {l}; at every step the walker
    picks neighbor rank h(walk_id, step) mod degree — hash-driven, so
    the 'random' corpus is reproducible anywhere (the property actual
    node2vec pipelines give up). Emits walk-corpus statistics:
    walks, completed length histogram, node coverage.

    Scale: each step is ONE equi-join of the frontier against the
    indexed adjacency (neighbors pre-ranked per node — the only
    shuffle per step is on the current node key); walk state is
    (walk_id, position), never materialized paths."""
    import math

    e = _copurchase_edges(spark, sf_dir).select("p1", "p2")
    sym = e.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionByName(
        e.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    )
    from pyspark.sql import Window as W

    adj = sym.withColumn(
        "rk",
        F.row_number().over(W.partitionBy("u").orderBy("v")) - 1,
    ).localCheckpoint()
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select("u", "deg")
    frontier = None
    for wid in range(WALKS_PER_NODE):
        f0 = nodes.select(
            F.concat_ws("_", F.col("u").cast("string"), F.lit(str(wid))).alias(
                "walk_id"
            ),
            F.col("u").alias("start"),
            F.col("u").alias("cur"),
            F.lit(0).alias("steps"),
        )
        frontier = f0 if frontier is None else frontier.unionByName(f0)
    frontier = frontier.localCheckpoint()
    visited = frontier.select("walk_id", F.col("cur").alias("node"))
    for step in range(1, WALK_LEN + 1):
        nxt = (
            frontier.join(deg.withColumnRenamed("u", "cur"), "cur")
            .withColumn(
                "pick",
                # md5-derived step hash: cross-engine-deterministic
                # (DuckDB lacks Spark's murmur hash; 60 md5 bits are
                # identical on both engines, same as dd_simhash)
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    ":", "walk_id", F.lit(str(step))
                                )
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.col("deg")
                ).cast("int"),
            )
            .join(
                adj.select(
                    F.col("u").alias("cur"),
                    F.col("v").alias("nxt"),
                    F.col("rk").alias("pick"),
                ),
                ["cur", "pick"],
            )
            .select(
                "walk_id",
                "start",
                F.col("nxt").alias("cur"),
                F.lit(step).alias("steps"),
            )
            .localCheckpoint()
        )
        visited = visited.unionByName(
            nxt.select("walk_id", F.col("cur").alias("node"))
        )
        frontier = nxt
    n_nodes = nodes.count()
    n_walks = frontier.select("walk_id").distinct().count()
    covered = visited.select("node").distinct().count()
    avg_unique = (
        visited.groupBy("walk_id")
        .agg(F.countDistinct("node").alias("uq"))
        .agg(F.avg("uq"))
        .collect()[0][0]
    )
    row = (
        int(n_nodes),
        int(n_walks),
        WALK_LEN,
        int(covered),
        math.floor(float(covered) / n_nodes * 10000 + 0.5) / 10000,
        math.floor(float(avg_unique) * 10000 + 0.5) / 10000,
    )
    return spark.createDataFrame(
        [row],
        "nodes long, walks long, walk_len long, covered_nodes long, "
        "coverage double, avg_unique_per_walk double",
    )


graph_random_walks.__doc__ = graph_random_walks.__doc__.format(
    w=WALKS_PER_NODE, l=WALK_LEN
)


@query(
    "ev_forecast_ensemble",
    # Real oracle: the three cheap models are index arithmetic on the
    # day series (scalar subqueries at L, 1, and the seasonal offset),
    # run twice — once from the validation cut to learn inverse-MAE
    # weights, once from the full train cut for the test MAEs — then
    # the weighted ensemble. No recursion needed.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS day,
                      CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    idx AS (SELECT y, ROW_NUMBER() OVER (ORDER BY day) AS i FROM d),
    hh AS (SELECT LEAST({FC_H}, GREATEST(COUNT(*) - 10, 1)) AS h,
                  COUNT(*) AS n
           FROM idx),
    phases AS (SELECT 'v' AS phase, n - 2 * h AS L FROM hh
               UNION ALL SELECT 't', n - h FROM hh),
    js AS (SELECT unnest(generate_series(1, h)) AS j FROM hh),
    fc AS (
      SELECT ph.phase, ph.L, js.j, 'naive' AS model,
             (SELECT y FROM idx WHERE i = ph.L) AS f
      FROM phases ph CROSS JOIN js
      UNION ALL
      SELECT ph.phase, ph.L, js.j, 'snaive7',
             CASE WHEN ph.L >= 7
                  THEN (SELECT y FROM idx
                        WHERE i = ph.L - 6 + ((js.j - 1) % 7))
                  ELSE (SELECT y FROM idx WHERE i = ph.L) END
      FROM phases ph CROSS JOIN js
      UNION ALL
      SELECT ph.phase, ph.L, js.j, 'drift',
             (SELECT y FROM idx WHERE i = ph.L)
             + ((SELECT y FROM idx WHERE i = ph.L)
                - (SELECT y FROM idx WHERE i = 1))
               / GREATEST(ph.L - 1, 1) * js.j
      FROM phases ph CROSS JOIN js
    ),
    act AS (SELECT ph.phase, js.j,
                   (SELECT y FROM idx WHERE i = ph.L + js.j) AS a
            FROM phases ph CROSS JOIN js),
    maev AS (SELECT f.model, SUM(ABS(f.f - a.a)) / MAX(hh.h) AS mae
             FROM fc f JOIN act a ON a.phase = f.phase AND a.j = f.j
             CROSS JOIN hh
             WHERE f.phase = 'v' GROUP BY f.model),
    wts AS (SELECT model,
                   (1.0 / GREATEST(mae, 1e-9))
                   / SUM(1.0 / GREATEST(mae, 1e-9)) OVER () AS w
            FROM maev),
    maet AS (SELECT f.model, SUM(ABS(f.f - a.a)) / MAX(hh.h) AS mae
             FROM fc f JOIN act a ON a.phase = f.phase AND a.j = f.j
             CROSS JOIN hh
             WHERE f.phase = 't' GROUP BY f.model),
    ens AS (SELECT f.j, SUM(w.w * f.f) AS e
            FROM fc f JOIN wts w USING (model)
            WHERE f.phase = 't' GROUP BY f.j),
    maee AS (SELECT SUM(ABS(e.e - a.a)) / MAX(hh.h) AS mae
             FROM ens e JOIN act a ON a.phase = 't' AND a.j = e.j
             CROSS JOIN hh)
    SELECT m.model, FLOOR(w.w * 10000 + 0.5) / 10000 AS weight,
           FLOOR(m.mae * 10000 + 0.5) / 10000 AS mae
    FROM maet m JOIN wts w USING (model)
    UNION ALL
    SELECT 'ensemble', 1.0, FLOOR(mae * 10000 + 0.5) / 10000 FROM maee
    """,
)
def ev_forecast_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast combination backtest on daily event counts: train
    everything but the last {h} days, forecast with three cheap
    models (naive-last, seasonal-naive-7, drift) plus their
    inverse-MAE weighted ensemble (weights from a 7-day validation
    tail INSIDE the training window — no test leakage). Emits MAE per
    model; the ensemble should sit at or below the best single most
    of the time, which is the whole point of combination.

    Scale: one daily rollup; model math is O(days) driver arithmetic
    (calendar-bounded, theta/DTW precedent)."""
    ev = cat(spark, sf_dir)["events"]
    rows = (
        ev.groupBy(
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias(
                "day"
            )
        )
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .orderBy("day")
        .collect()
    )
    ys = [float(r["y"]) for r in rows]
    n = len(ys)
    h = min(FC_H, max(n - 10, 1))
    train, test = ys[: n - h], ys[n - h :]

    def forecast(series, horizon):
        last = series[-1]
        drift = (series[-1] - series[0]) / max(len(series) - 1, 1)
        out = {}
        out["naive"] = [last] * horizon
        out["snaive7"] = [
            series[-7 + (j % 7)] if len(series) >= 7 else last
            for j in range(horizon)
        ]
        out["drift"] = [last + drift * (j + 1) for j in range(horizon)]
        return out

    # validation tail inside train to learn weights
    vtrain, val = train[:-h], train[-h:]
    vfc = forecast(vtrain, h)
    maes = {
        m: sum(abs(f - a) for f, a in zip(fc, val)) / h
        for m, fc in vfc.items()
    }
    inv = {m: 1.0 / max(e, 1e-9) for m, e in maes.items()}
    tot = sum(inv.values())
    wts = {m: v / tot for m, v in inv.items()}
    tfc = forecast(train, h)
    ens = [
        sum(wts[m] * tfc[m][j] for m in tfc) for j in range(h)
    ]
    import math

    # cross-engine floor rounding (common.rnd's rule) for oracle parity
    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
    out = []
    for m, fc in tfc.items():
        mae = sum(abs(f - a) for f, a in zip(fc, test)) / h
        out.append((m, r4(wts[m]), r4(mae)))
    mae_e = sum(abs(f - a) for f, a in zip(ens, test)) / h
    out.append(("ensemble", 1.0, r4(mae_e)))
    return spark.createDataFrame(out, "model string, weight double, mae double")


ev_forecast_ensemble.__doc__ = ev_forecast_ensemble.__doc__.format(h=FC_H)


@query(
    "stat_nested_f_test",
    oracle="""
    WITH d AS (SELECT l_quantity AS x1, l_discount AS x2,
                      l_extendedprice AS y
               FROM lineitem),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 AVG(x1) AS m1, AVG(x2) AS m2, AVG(y) AS my,
                 SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12,
                 SUM(x2 * x2) AS s22,
                 SUM(x1 * y) AS c1, SUM(x2 * y) AS c2,
                 SUM(y * y) AS syy
          FROM d),
    c AS (SELECT n,
                 s11 - n * m1 * m1 AS a11, s12 - n * m1 * m2 AS a12,
                 s22 - n * m2 * m2 AS a22,
                 c1 - n * m1 * my AS b1, c2 - n * m2 * my AS b2,
                 syy - n * my * my AS cyy
          FROM s),
    fit AS (SELECT n, cyy,
                   cyy - b1 * b1 / a11 AS sse_small,
                   cyy - (b1 * (b1 * a22 - b2 * a12)
                          + b2 * (b2 * a11 - b1 * a12))
                         / (a11 * a22 - a12 * a12) AS sse_full
            FROM c)
    SELECT FLOOR((sse_small - sse_full) / (sse_full / (n - 3))
                 * 10000 + 0.5) / 10000 AS f_stat,
           CAST(1 AS BIGINT) AS df1,
           CAST(n - 3 AS BIGINT) AS df2,
           FLOOR((1 - sse_full / cyy) * 10000 + 0.5) / 10000 AS r2_full,
           FLOOR((1 - sse_small / cyy) * 10000 + 0.5) / 10000 AS r2_small
    FROM fit
    """,
)
def stat_nested_f_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial F-test for nested models: price ~ quantity (small) vs
    price ~ quantity + discount (full). F = ΔSSE/(SSE_full/(n−3))
    with 1 numerator df — the correct way to ask 'did the extra
    regressor earn its place', where comparing raw R²s never is.

    Scale: both fits come from ONE moments pass (closed-form 1- and
    2-predictor OLS); the test is scalar arithmetic."""
    d = cat(spark, sf_dir)["lineitem"].select(
        F.col("l_quantity").alias("x1"),
        F.col("l_discount").alias("x2"),
        F.col("l_extendedprice").alias("y"),
    )
    s = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x1").alias("m1"),
        F.avg("x2").alias("m2"),
        F.avg("y").alias("my"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("c1"),
        F.sum(F.col("x2") * F.col("y")).alias("c2"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    a11 = F.col("s11") - n * F.col("m1") * F.col("m1")
    a12 = F.col("s12") - n * F.col("m1") * F.col("m2")
    a22 = F.col("s22") - n * F.col("m2") * F.col("m2")
    b1 = F.col("c1") - n * F.col("m1") * F.col("my")
    b2 = F.col("c2") - n * F.col("m2") * F.col("my")
    cyy = F.col("syy") - n * F.col("my") * F.col("my")
    sse_small = cyy - b1 * b1 / a11
    sse_full = cyy - (
        b1 * (b1 * a22 - b2 * a12) + b2 * (b2 * a11 - b1 * a12)
    ) / (a11 * a22 - a12 * a12)
    return s.select(
        ratio((sse_small - sse_full) / (sse_full / (n - 3))).alias("f_stat"),
        F.lit(1).cast("bigint").alias("df1"),
        (n - 3).cast("bigint").alias("df2"),
        ratio(1 - sse_full / cyy).alias("r2_full"),
        ratio(1 - sse_small / cyy).alias("r2_small"),
    )
