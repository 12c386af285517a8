"""Wave 174: Croston intermittent demand and Jelinek-Mercer smoothing.

ev_croston forecasts INTERMITTENT demand (many zero days — where SES
on the raw series chases zeros and classical forecasting breaks):
separate exponential smoothing of nonzero demand SIZES and of the
INTERVALS between them, rate = size/interval, plus the
Syntetos-Boylan approximation that removes Croston's positive bias.
tx_jm_interpolation sweeps the Jelinek-Mercer mixture weight between
bigram and unigram maximum-likelihood LMs on held-out NLL — the
simplest interpolated smoother, the baseline Kneser-Ney is measured
against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

CR_ALPHA = 0.2
CR_TOP = 12  # brands reported (by demand-day count, then name)
JM_LAMBDAS = (0.1, 0.25, 0.5, 0.75, 0.9)

_JM_VALUES = ", ".join(f"({l})" for l in JM_LAMBDAS)


@query(
    "ev_croston",
    oracle=f"""
    WITH d AS (SELECT p.p_brand AS brand, l.l_shipdate AS day,
                      SUM(l.l_quantity) AS z
               FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
               GROUP BY 1, 2),
    seq AS (SELECT brand, day, z,
                   ROW_NUMBER() OVER (PARTITION BY brand ORDER BY day)
                     AS i,
                   COUNT(*) OVER (PARTITION BY brand) AS n,
                   COALESCE(date_diff('day',
                     LAG(day) OVER (PARTITION BY brand ORDER BY day),
                     day), 1) AS gap
            FROM d),
    ses AS (SELECT brand, MAX(n) AS n,
                   SUM(CASE WHEN i = 1
                            THEN POWER(1 - {CR_ALPHA}, n - 1) * z
                            ELSE {CR_ALPHA}
                                 * POWER(1 - {CR_ALPHA}, n - i) * z
                       END) AS zhat,
                   SUM(CASE WHEN i = 1
                            THEN POWER(1 - {CR_ALPHA}, n - 1) * gap
                            ELSE {CR_ALPHA}
                                 * POWER(1 - {CR_ALPHA}, n - i) * gap
                       END) AS xhat
            FROM seq GROUP BY brand)
    SELECT brand, CAST(n AS BIGINT) AS demand_days,
           FLOOR(zhat * 10000 + 0.5) / 10000 AS size_hat,
           FLOOR(xhat * 10000 + 0.5) / 10000 AS interval_hat,
           FLOOR(zhat / xhat * 10000 + 0.5) / 10000 AS croston_rate,
           FLOOR(zhat / xhat * (1 - {CR_ALPHA} / 2) * 10000 + 0.5)
             / 10000 AS sba_rate
    FROM ses
    ORDER BY n DESC, brand LIMIT {CR_TOP}
    """,
)
def ev_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method per brand over daily shipped quantity: on the
    COMPACTED demand-day series (zero days never materialize — that is
    the method's point and also the scale win), SES(alpha={a}) of the
    demand sizes and of the inter-demand gaps via the closed form
    s_n = alpha * sum (1-alpha)^(n-i) v_i + (1-alpha)^(n-1) v_1 —
    one weighted aggregate per brand, no recursion. Reports the
    Croston rate z_hat/x_hat and the Syntetos-Boylan bias-corrected
    rate (x (1 - alpha/2)) for the {t} brands with the most demand
    days. The demand-rate number behind reorder points for
    slow-moving parts.

    Scale: the (brand, day) rollup is one shuffle; the SES weights
    ride a window partitioned BY BRAND over demand days only
    (calendar-bounded); the closed form makes the whole fit one
    aggregate — no per-step iteration."""
    li = cat(spark, sf_dir)["lineitem"]
    p = cat(spark, sf_dir)["part"]
    d = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_shipdate").alias("day"),
        )
        .agg(F.sum("l_quantity").alias("z"))
    )
    w = W.partitionBy("brand").orderBy("day")
    seq = d.select(
        "brand",
        "z",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(W.partitionBy("brand")).alias("n"),
        F.coalesce(
            F.datediff(F.col("day"), F.lag("day").over(w)), F.lit(1)
        ).alias("gap"),
    )
    a = CR_ALPHA
    wgt_z = F.when(
        F.col("i") == 1, F.pow(1 - a, F.col("n") - 1) * F.col("z")
    ).otherwise(a * F.pow(1 - a, F.col("n") - F.col("i")) * F.col("z"))
    wgt_x = F.when(
        F.col("i") == 1, F.pow(1 - a, F.col("n") - 1) * F.col("gap")
    ).otherwise(a * F.pow(1 - a, F.col("n") - F.col("i")) * F.col("gap"))
    ses = seq.groupBy("brand").agg(
        F.max("n").alias("n"),
        F.sum(wgt_z).alias("zhat"),
        F.sum(wgt_x).alias("xhat"),
    )
    return (
        ses.select(
            "brand",
            F.col("n").cast("bigint").alias("demand_days"),
            ratio(F.col("zhat")).alias("size_hat"),
            ratio(F.col("xhat")).alias("interval_hat"),
            ratio(F.col("zhat") / F.col("xhat")).alias("croston_rate"),
            ratio(F.col("zhat") / F.col("xhat") * (1 - a / 2)).alias(
                "sba_rate"
            ),
        )
        .orderBy(F.col("demand_days").desc(), "brand")
        .limit(CR_TOP)
    )


ev_croston.__doc__ = ev_croston.__doc__.format(a=CR_ALPHA, t=CR_TOP)


@query(
    "tx_jm_interpolation",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {DUCK_TOKENS} AS ts FROM documents),
    bg AS (SELECT doc_id, UNNEST(ts[1:len(ts) - 1]) AS v,
                  UNNEST(ts[2:len(ts)]) AS w FROM tk),
    tr AS (SELECT v, w, CAST(COUNT(*) AS DOUBLE) AS c FROM bg
           WHERE doc_id % 4 <> 0 GROUP BY 1, 2),
    ctx AS (SELECT v, SUM(c) AS cv FROM tr GROUP BY 1),
    uni AS (SELECT w, SUM(c) AS cw FROM tr GROUP BY 1),
    tot AS (SELECT SUM(c) AS t FROM tr),
    ev AS (SELECT e.v, e.w, COALESCE(tr.c, 0) AS c, ctx.cv, uni.cw,
                  tot.t
           FROM (SELECT v, w FROM bg WHERE doc_id % 4 = 0) e
           JOIN ctx ON e.v = ctx.v
           JOIN uni ON e.w = uni.w
           LEFT JOIN tr ON e.v = tr.v AND e.w = tr.w, tot),
    lam(l) AS (VALUES {_JM_VALUES}),
    p AS (SELECT lam.l,
                 lam.l * (ev.c / ev.cv)
                 + (1 - lam.l) * (ev.cw / ev.t) AS pjm
          FROM ev, lam),
    nll AS (SELECT l, CAST(COUNT(*) AS BIGINT) AS eval_pairs,
                   FLOOR(AVG(-LN(pjm)) * 10000 + 0.5) / 10000 AS g
            FROM p GROUP BY 1)
    SELECT l AS lambda, eval_pairs, g AS heldout_nll,
           CASE WHEN g = (SELECT MIN(g) FROM nll) THEN 1 ELSE 0 END
             AS best
    FROM nll ORDER BY 1
    """,
)
def tx_jm_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer interpolation sweep: held-out NLL of
    p = lambda * p_ML(w|v) + (1 - lambda) * p_ML(w) for lambda in
    {ls}, trained on the doc_id%4!=0 quarter-split (the Kneser-Ney
    convention — held-out pairs whose context or word never trained
    are excluded by inner joins on both engines). The sweep's argmin (on the
    emitted 1e-4 grid, so near-ties flag every tied lambda — the
    honest answer when the data cannot separate them) is the one
    hyperparameter this smoother has; the bigram ML term
    is what the unigram mixture rescues from zero counts.

    Scale: three count tables (bigram/context/unigram) from one
    training-split shuffle, all vocab-bounded and broadcast into the
    eval join; the lambda grid is a {n}-row broadcast cross join; the
    sweep is one aggregate per lambda."""
    bg_docs = cat(spark, sf_dir)["documents"].select(
        "doc_id", tokens().alias("ts")
    )
    n = F.size("ts")
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice("ts", 1, n - 1),
            F.slice("ts", 2, n - 1),
            lambda x, y: F.struct(x.alias("v"), y.alias("w")),
        ),
    ).otherwise(F.array().cast("array<struct<v:string,w:string>>"))
    bg = bg_docs.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.v").alias("v"), F.col("p.w").alias("w")
    )
    tr = (
        bg.filter(F.col("doc_id") % 4 != 0)
        .groupBy("v", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .localCheckpoint()  # vocab^2-bounded; read by 4 branches
    )
    ctx = tr.groupBy("v").agg(F.sum("c").alias("cv"))
    uni = tr.groupBy("w").agg(F.sum("c").alias("cw"))
    tot = tr.agg(F.sum("c").alias("t"))
    lam = spark.createDataFrame(
        [(l,) for l in JM_LAMBDAS], "l double"
    )
    ev = (
        bg.filter(F.col("doc_id") % 4 == 0)
        .select("v", "w")
        .join(F.broadcast(ctx), "v")
        .join(F.broadcast(uni), "w")
        .join(F.broadcast(tr), ["v", "w"], "left")
        .crossJoin(F.broadcast(tot))
        .withColumn("c", F.coalesce("c", F.lit(0.0)))
    )
    p = ev.crossJoin(F.broadcast(lam)).select(
        "l",
        (
            F.col("l") * (F.col("c") / F.col("cv"))
            + (1 - F.col("l")) * (F.col("cw") / F.col("t"))
        ).alias("pjm"),
    )
    nll = p.groupBy("l").agg(
        F.count(F.lit(1)).cast("bigint").alias("eval_pairs"),
        ratio(F.avg(-F.log("pjm"))).alias("g"),
    )
    best = nll.agg(F.min("g").alias("mn"))
    return (
        nll.crossJoin(F.broadcast(best))
        .select(
            F.col("l").alias("lambda"),
            "eval_pairs",
            F.col("g").alias("heldout_nll"),
            F.when(F.col("g") == F.col("mn"), 1).otherwise(0).alias(
                "best"
            ),
        )
        .orderBy("lambda")
    )


tx_jm_interpolation.__doc__ = tx_jm_interpolation.__doc__.format(
    ls=list(JM_LAMBDAS), n=len(JM_LAMBDAS)
)
