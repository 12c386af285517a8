"""Wave 56: causal inference + long-memory diagnostics — stratified
ATT, Hurst exponent, seed-clustering purity, and adstock carryover.

ev_stratified_att is observational causal inference done the
pre-ML way (stratify on a confounder, weight treated-stratum effects);
stat_hurst measures long-range dependence (H > 0.5 = trending,
< 0.5 = mean-reverting) via classic rescaled-range analysis;
ml_cluster_purity evaluates a deterministic seed-based clustering
against the stored labels (the purity eval every embedding-clustering
pipeline reports); ev_adstock applies the marketing-science geometric
carryover transform and shows whether it tightens the click→purchase
correlation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

ATT_STRATA_DIV = 10  # n_events // 10, capped (synthetic users run 49-88
# events, so this yields ~5 populated strata)
ATT_STRATA_CAP = 9
HURST_SIZES = (8, 16, 32)
ADSTOCK_LAMBDA = 0.6
ADSTOCK_LAGS = 14
PURITY_SEEDS = 10


@query(
    "ev_stratified_att",
    oracle=f"""
    WITH u AS (SELECT user_id, CAST(user_id % 2 AS BIGINT) AS treat,
                      CAST(COUNT(*) AS BIGINT) AS n_ev,
                      SUM(CASE WHEN event_type = 'purchase'
                          THEN value ELSE 0 END) AS y
               FROM events GROUP BY 1),
    s AS (SELECT LEAST(n_ev // {ATT_STRATA_DIV}, {ATT_STRATA_CAP}) AS stratum,
                 treat, y
          FROM u),
    g AS (SELECT stratum,
                 CAST(SUM(treat) AS BIGINT) AS n_treat,
                 CAST(SUM(1 - treat) AS BIGINT) AS n_ctrl,
                 SUM(CASE WHEN treat = 1 THEN y END)
                   / NULLIF(SUM(treat), 0) AS yt,
                 SUM(CASE WHEN treat = 0 THEN y END)
                   / NULLIF(SUM(1 - treat), 0) AS yc
          FROM s GROUP BY 1),
    k AS (SELECT * FROM g WHERE n_treat > 0 AND n_ctrl > 0),
    a AS (SELECT SUM(CAST(n_treat AS DOUBLE) * (yt - yc)) / SUM(n_treat)
                   AS att
          FROM k)
    SELECT CAST(k.stratum AS BIGINT) AS stratum, k.n_treat, k.n_ctrl,
           FLOOR(k.yt * 10000 + 0.5) / 10000 AS y_treat,
           FLOOR(k.yc * 10000 + 0.5) / 10000 AS y_ctrl,
           FLOOR((k.yt - k.yc) * 10000 + 0.5) / 10000 AS diff,
           FLOOR(a.att * 10000 + 0.5) / 10000 AS att
    FROM k CROSS JOIN a
    """,
)
def ev_stratified_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified average-treatment-effect-on-treated: users stratify
    on activity (event count buckets — the observable confounder),
    treatment = user_id % 2, outcome = total purchase value; ATT
    weights each stratum's treated-minus-control mean by its treated
    population. Strata missing either arm drop (positivity).

    Scale: one user rollup, one |strata| rollup, a 1-row ATT broadcast
    back onto the strata rows — no per-user state survives the second
    shuffle."""
    ev = cat(spark, sf_dir)["events"]
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0.0)
        ).alias("y"),
    ).select(
        (F.col("user_id") % 2).cast("bigint").alias("treat"),
        F.least(
            F.floor(F.col("n_ev") / ATT_STRATA_DIV), F.lit(ATT_STRATA_CAP)
        ).alias("stratum"),
        "y",
    )
    g = u.groupBy("stratum").agg(
        F.sum("treat").cast("bigint").alias("n_treat"),
        F.sum(1 - F.col("treat")).cast("bigint").alias("n_ctrl"),
        (
            F.sum(F.when(F.col("treat") == 1, F.col("y")))
            / F.nullif(F.sum("treat"), F.lit(0))
        ).alias("yt"),
        (
            F.sum(F.when(F.col("treat") == 0, F.col("y")))
            / F.nullif(F.sum(1 - F.col("treat")), F.lit(0))
        ).alias("yc"),
    )
    k = g.filter((F.col("n_treat") > 0) & (F.col("n_ctrl") > 0)).localCheckpoint()
    a = k.agg(
        (
            F.sum(F.col("n_treat").cast("double") * (F.col("yt") - F.col("yc")))
            / F.sum("n_treat")
        ).alias("att")
    )
    return k.join(F.broadcast(a)).select(
        F.col("stratum").cast("bigint").alias("stratum"),
        "n_treat",
        "n_ctrl",
        ratio(F.col("yt")).alias("y_treat"),
        ratio(F.col("yc")).alias("y_ctrl"),
        ratio(F.col("yt") - F.col("yc")).alias("diff"),
        ratio(F.col("att")).alias("att"),
    )


_HURST_SIZES_SQL = ", ".join(str(m) for m in HURST_SIZES)


@query(
    "stat_hurst",
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS t,
                      CAST(COUNT(*) AS DOUBLE) AS x
               FROM events GROUP BY 1),
    i AS (SELECT ROW_NUMBER() OVER (ORDER BY t) - 1 AS idx, x FROM d),
    m AS (SELECT unnest([{_HURST_SIZES_SQL}]) AS m),
    c AS (SELECT m.m, i.idx // m.m AS chunk, i.idx, i.x
          FROM i CROSS JOIN m),
    fc AS (SELECT m, chunk FROM c GROUP BY 1, 2
           HAVING COUNT(*) = MAX(m)),
    cs AS (SELECT c.m, c.chunk, AVG(c.x) AS mu,
                  sqrt(AVG(c.x * c.x) - AVG(c.x) * AVG(c.x)) AS s
           FROM c JOIN fc USING (m, chunk) GROUP BY 1, 2),
    pd AS (SELECT c.m, c.chunk, c.idx,
                  SUM(c.x - cs.mu) OVER (PARTITION BY c.m, c.chunk
                                         ORDER BY c.idx
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS dev,
                  cs.s
           FROM c JOIN cs ON c.m = cs.m AND c.chunk = cs.chunk),
    rs AS (SELECT m, chunk,
                  (MAX(dev) - MIN(dev)) / MAX(s) AS rs
           FROM pd WHERE s > 0 GROUP BY 1, 2),
    pm AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS n_chunks,
                  AVG(rs) AS mean_rs
           FROM rs GROUP BY 1),
    fit AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k,
                   SUM(ln(CAST(m AS DOUBLE))) AS sx,
                   SUM(ln(mean_rs)) AS sy,
                   SUM(ln(CAST(m AS DOUBLE)) * ln(CAST(m AS DOUBLE))) AS sxx,
                   SUM(ln(CAST(m AS DOUBLE)) * ln(mean_rs)) AS sxy
            FROM pm)
    SELECT pm.m, pm.n_chunks,
           FLOOR(pm.mean_rs * 10000 + 0.5) / 10000 AS mean_rs,
           FLOOR((fit.k * fit.sxy - fit.sx * fit.sy)
                 / (fit.k * fit.sxx - fit.sx * fit.sx) * 10000 + 0.5) / 10000
             AS hurst
    FROM pm CROSS JOIN fit
    """,
)
def stat_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the daily event-count series via rescaled-range
    analysis: for window sizes {sizes}, chunk the series, compute each
    chunk's range-of-cumulative-deviations over its std (R/S), average
    per size, and fit the log-log slope — H ≈ 0.5 is memoryless,
    higher is trending/long-memory.

    Scale: the series is calendar-bounded; the only windows partition
    by (size, chunk) — ≤ {mx} rows each — and the log-log fit runs on
    {k} aggregate rows."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias("t")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    i = d.select(
        (F.row_number().over(W.orderBy("t")) - 1).alias("idx"), "x"
    )
    m = spark.createDataFrame([(v,) for v in HURST_SIZES], "m long")
    c = i.join(F.broadcast(m)).select(
        "m", (F.col("idx") / F.col("m")).cast("long").alias("chunk"), "idx", "x"
    )
    full = (
        c.groupBy("m", "chunk")
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("m").alias("mm"))
        .filter(F.col("cnt") == F.col("mm"))
        .select("m", "chunk")
    )
    cf = c.join(full, ["m", "chunk"]).localCheckpoint()
    cs = cf.groupBy("m", "chunk").agg(
        F.avg("x").alias("mu"),
        F.sqrt(F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")).alias(
            "s"
        ),
    )
    wch = W.partitionBy("m", "chunk").orderBy("idx").rowsBetween(
        W.unboundedPreceding, 0
    )
    pd_ = cf.join(cs, ["m", "chunk"]).withColumn(
        "dev", F.sum(F.col("x") - F.col("mu")).over(wch)
    )
    rs = (
        pd_.filter(F.col("s") > 0)
        .groupBy("m", "chunk")
        .agg(((F.max("dev") - F.min("dev")) / F.max("s")).alias("rs"))
    )
    pm = rs.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.avg("rs").alias("mean_rs"),
    ).localCheckpoint()
    lx = F.log(F.col("m").cast("double"))
    ly = F.log(F.col("mean_rs"))
    fit = pm.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * lx).alias("sxx"),
        F.sum(lx * ly).alias("sxy"),
    )
    hurst = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return pm.join(F.broadcast(fit)).select(
        "m",
        "n_chunks",
        ratio(F.col("mean_rs")).alias("mean_rs"),
        ratio(hurst).alias("hurst"),
    )


stat_hurst.__doc__ = stat_hurst.__doc__.format(
    sizes=HURST_SIZES, mx=max(HURST_SIZES), k=len(HURST_SIZES)
)


@query(
    "ml_cluster_purity",
    oracle=f"""
    WITH q AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
               FROM embeddings WHERE vec_id < {PURITY_SEEDS}),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
          FROM embeddings),
    a AS (SELECT vec_id, label, cid
          FROM (SELECT c.vec_id, c.label, q.cid,
                       ROW_NUMBER() OVER (
                         PARTITION BY c.vec_id
                         ORDER BY FLOOR(list_cosine_similarity(c.v, q.cv)
                                        * 10000 + 0.5) / 10000 DESC, q.cid)
                         AS rn
                FROM c CROSS JOIN q)
          WHERE rn = 1),
    l AS (SELECT cid, label, CAST(COUNT(*) AS BIGINT) AS nl
          FROM a GROUP BY 1, 2),
    t AS (SELECT cid, CAST(SUM(nl) AS BIGINT) AS n,
                 MAX(nl) AS top
          FROM l GROUP BY 1),
    mj AS (SELECT l.cid, MIN(l.label) AS majority_label
           FROM l JOIN t ON l.cid = t.cid AND l.nl = t.top GROUP BY 1)
    SELECT t.cid, t.n, CAST(mj.majority_label AS BIGINT) AS majority_label,
           FLOOR(CAST(t.top AS DOUBLE) / t.n * 10000 + 0.5) / 10000 AS purity
    FROM t JOIN mj ON t.cid = mj.cid
    """,
)
def ml_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purity of a deterministic seed clustering: every vector assigns
    to its most-cosine-similar of the first {s} vectors (seed = cluster
    id), then each cluster reports its size, majority stored label
    (min-id tiebreak), and purity = majority share — the standard
    embedding-clustering quality read, with a fully SQL-checkable
    assignment (k-means' iterative twin is ml_kmeans).

    Scale: seeds broadcast (10 rows), scoring is a narrow map, the
    per-vector argmin window is 10 rows per key, and the label
    contingency is |clusters|·|labels| cells."""
    emb = cat(spark, sf_dir)["embeddings"]
    q = emb.filter(F.col("vec_id") < PURITY_SEEDS).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    c = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    from mister_spark.functions.vectors import cosine

    scored = c.join(F.broadcast(q)).select(
        "vec_id",
        "label",
        "cid",
        ratio(cosine(F.col("v"), F.col("cv"))).alias("cos"),
    )
    wv = W.partitionBy("vec_id").orderBy(F.desc("cos"), "cid")
    a = (
        scored.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("label", "cid")
    )
    l = a.groupBy("cid", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("nl")
    ).localCheckpoint()
    t = l.groupBy("cid").agg(
        F.sum("nl").cast("bigint").alias("n"), F.max("nl").alias("top")
    )
    mj = (
        l.join(t, "cid")
        .filter(F.col("nl") == F.col("top"))
        .groupBy("cid")
        .agg(F.min("label").cast("bigint").alias("majority_label"))
    )
    return t.join(mj, "cid").select(
        "cid",
        "n",
        "majority_label",
        ratio(F.col("top").cast("double") / F.col("n")).alias("purity"),
    )


ml_cluster_purity.__doc__ = ml_cluster_purity.__doc__.format(s=PURITY_SEEDS)


@query(
    "ev_adstock",
    oracle=f"""
    WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type
               FROM events WHERE event_type IN ('click', 'purchase')),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM e),
    grid AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                         AS DATE) AS day
             FROM bounds),
    d AS (SELECT g.day,
                 COALESCE(SUM(CASE WHEN e.event_type = 'click'
                              THEN 1 ELSE 0 END), 0) AS x,
                 COALESCE(SUM(CASE WHEN e.event_type = 'purchase'
                              THEN 1 ELSE 0 END), 0) AS y
          FROM grid g LEFT JOIN e ON g.day = e.day GROUP BY 1),
    t AS (SELECT date_diff('day', DATE '1970-01-01', day) AS t,
                 CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y
          FROM d),
    kk AS (SELECT unnest(generate_series(0, {ADSTOCK_LAGS})) AS k),
    ad AS (SELECT cur.t, MAX(cur.y) AS y, MAX(cur.x) AS x,
                  SUM(POWER({ADSTOCK_LAMBDA}, kk.k) * lag.x) AS a
           FROM t cur CROSS JOIN kk
                JOIN t lag ON lag.t = cur.t - kk.k
           GROUP BY cur.t),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(x) AS sx, SUM(y) AS sy, SUM(a) AS sa,
                 SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(a * a) AS saa,
                 SUM(x * y) AS sxy, SUM(a * y) AS say
          FROM ad)
    SELECT {ADSTOCK_LAMBDA} AS lam, CAST(n AS BIGINT) AS n_days,
           FLOOR((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                 * 10000 + 0.5) / 10000 AS corr_raw,
           FLOOR((n * say - sa * sy)
                 / sqrt((n * saa - sa * sa) * (n * syy - sy * sy))
                 * 10000 + 0.5) / 10000 AS corr_adstock
    FROM s
    """,
)
def ev_adstock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric adstock carryover: transform daily clicks with
    a_t = Σ_k λ^k·x_(t−k) (λ={lam}, {lags}-day memory) and compare the
    click→purchase correlation before and after — the marketing-science
    transform for delayed response.

    Scale: the lag expansion is a ({lags}+1)-row broadcast against the
    calendar-bounded day grid; the correlation is one
    sufficient-statistics row. At 100 TB the day grid is still a day
    grid."""
    ev = cat(spark, sf_dir)["events"].filter(
        F.col("event_type").isin("click", "purchase")
    )
    e = ev.select(F.date_trunc("day", "ts").alias("day"), "event_type")
    bounds = e.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    d = (
        F.broadcast(grid)
        .join(e, "day", "left")
        .groupBy("day")
        .agg(
            F.sum(
                F.coalesce((F.col("event_type") == "click").cast("int"), F.lit(0))
            ).cast("double").alias("x"),
            F.sum(
                F.coalesce(
                    (F.col("event_type") == "purchase").cast("int"), F.lit(0)
                )
            ).cast("double").alias("y"),
        )
        .select(
            F.datediff("day", F.lit("1970-01-01")).alias("t"), "x", "y"
        )
        .localCheckpoint()
    )
    kk = spark.range(ADSTOCK_LAGS + 1).select(F.col("id").alias("k"))
    lag = d.select(F.col("t").alias("lt"), F.col("x").alias("lx"))
    ad = (
        d.join(F.broadcast(kk))
        .join(lag, F.col("lt") == F.col("t") - F.col("k"))
        .groupBy("t")
        .agg(
            F.max("y").alias("y"),
            F.max("x").alias("x"),
            F.sum(
                F.pow(F.lit(ADSTOCK_LAMBDA), F.col("k")) * F.col("lx")
            ).alias("a"),
        )
    )
    x, y, a = F.col("x"), F.col("y"), F.col("a")
    s = ad.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(a).alias("sa"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(a * a).alias("saa"),
        F.sum(x * y).alias("sxy"),
        F.sum(a * y).alias("say"),
    )
    n, sx, sy, sa = F.col("n"), F.col("sx"), F.col("sy"), F.col("sa")
    sxx, syy, saa = F.col("sxx"), F.col("syy"), F.col("saa")
    sxy, say = F.col("sxy"), F.col("say")
    return s.select(
        F.lit(ADSTOCK_LAMBDA).alias("lam"),
        n.cast("bigint").alias("n_days"),
        ratio(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("corr_raw"),
        ratio(
            (n * say - sa * sy)
            / F.sqrt((n * saa - sa * sa) * (n * syy - sy * sy))
        ).alias("corr_adstock"),
    )


ev_adstock.__doc__ = ev_adstock.__doc__.format(
    lam=ADSTOCK_LAMBDA, lags=ADSTOCK_LAGS
)
