"""Wave 203: consensus-based robust regression and cross-spectral
coherence.

stat_ransac fits the quantity -> extendedprice line by RANSAC:
propose candidate lines from deterministically-sampled row pairs,
score each by its inlier CONSENSUS, refit on the winning consensus
set. Theil-Sen (median of slopes) and Huber (soft loss) both degrade
gracefully; RANSAC is the one that stays exact under gross structured
contamination because losers simply never vote. stat_spectral_
coherence is the frequency-domain twin of ev_cross_correlation: per
frequency band, how much of the click/purchase relationship is a
SHARED cycle? Two series can correlate near zero in time yet cohere
at 0.9 on the weekly band — the number that says "same weekly driver"
rather than "same direction today".

Exactness: RANSAC's sample selection orders by md5 hex (identical
strings), candidate algebra and the inlier test compare identical
doubles against a tolerance derived from integer-cent sums — the
consensus COUNTS are exact integers. Coherence runs on scaled integer
residuals (n*y - sum y) so only COS/SIN/final ratios are float,
inside the grid.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
RANSAC_SAMPLES = 32  # rows drawn -> RANSAC_SAMPLES/2 candidate lines
RANSAC_TAU_FRAC = 0.25  # inlier tolerance as a fraction of mean(y)
# (mean, not sd: the integer-cent mean is overflow-safe and exact in
# BIGINT at any scale, where sum(cents^2) would overflow ~sf1)


@query(
    "stat_ransac",
    # Real oracle: both engines pick the SAME 32 sample rows (ORDER BY
    # md5 hex of the line key), build the same candidate lines from
    # identical doubles, and run the same |y - (a + b*x)| <= tau test
    # (tau from integer-cent moment sums) — so candidate ids, inlier
    # counts, and the winning consensus set are all exact; the OLS
    # refit divides identical moment sums, inside the grid.
    oracle=f"""
    WITH d AS (SELECT l_quantity AS x, l_extendedprice AS y,
                      md5(CAST(l_orderkey AS VARCHAR) || ':'
                          || CAST(l_linenumber AS VARCHAR)) AS h
               FROM lineitem),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(FLOOR(y * 100 + 0.5) AS BIGINT)) AS syc
          FROM d),
    tau AS (SELECT n,
                   {RANSAC_TAU_FRAC} * (CAST(syc AS DOUBLE) / n) / 100.0
                     AS tol
            FROM m),
    samp AS (SELECT x, y, ROW_NUMBER() OVER (ORDER BY h) AS r
             FROM d QUALIFY r <= {RANSAC_SAMPLES}),
    cand AS (SELECT (a.r + 1) // 2 AS cid,
                    (b.y - a.y) / (b.x - a.x) AS slope,
                    a.y - (b.y - a.y) / (b.x - a.x) * a.x AS icept
             FROM samp a JOIN samp b ON b.r = a.r + 1
             WHERE a.r % 2 = 1 AND a.x <> b.x),
    votes AS (SELECT c.cid, c.slope, c.icept,
                     CAST(COUNT(*) FILTER (WHERE
                       ABS(d.y - (c.icept + c.slope * d.x)) <= tau.tol)
                       AS BIGINT) AS inliers
              FROM cand c, d, tau GROUP BY 1, 2, 3),
    best AS (SELECT * FROM votes
             ORDER BY inliers DESC, cid LIMIT 1),
    refit AS (SELECT CAST(COUNT(*) AS DOUBLE) AS ni, SUM(d.x) AS sx,
                     SUM(d.y) AS sy, SUM(d.x * d.x) AS sxx,
                     SUM(d.x * d.y) AS sxy
              FROM d, best b, tau
              WHERE ABS(d.y - (b.icept + b.slope * d.x)) <= tau.tol)
    SELECT (SELECT CAST(n AS BIGINT) FROM m) AS n_rows,
           b.cid AS best_candidate,
           b.inliers AS consensus_size,
           FLOOR(CAST(b.inliers AS DOUBLE)
                 / (SELECT n FROM m) * 1e4 + 0.5) / 1e4 AS inlier_share,
           FLOOR(b.slope * 1e4 + 0.5) / 1e4 AS cand_slope,
           FLOOR((r.ni * r.sxy - r.sx * r.sy)
                 / (r.ni * r.sxx - r.sx * r.sx) * 1e4 + 0.5) / 1e4
             AS refit_slope,
           FLOOR((r.sy - r.sx * (r.ni * r.sxy - r.sx * r.sy)
                         / (r.ni * r.sxx - r.sx * r.sx)) / r.ni
                 * 100 + 0.5) / 100 AS refit_intercept
    FROM best b, refit r
    """,
)
def stat_ransac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC line fit of extendedprice on quantity: 16 candidate
    lines from md5-ordered sample-row pairs, each scored by how many
    rows fall within tau = 0.25*mean(y) of it, then an OLS refit on the
    winner's consensus set. Where OLS bends toward outliers and
    Theil-Sen dilutes them into a median, RANSAC lets contaminated
    rows cast NO vote at all — the estimator of choice when the bad
    rows are structured (a corrupted source, a mispriced batch)
    rather than diffuse noise. consensus_size/n is the fitted model's
    own estimate of the clean fraction.

    Scale: sampling is a TakeOrdered(32) over a hash — no shuffle;
    scoring is ONE pass over the fact table against a 16-row
    broadcast candidate frame (map-side combinable counts); the refit
    is one more filtered moments pass. Candidate count is constant,
    so cost is a handful of column-pruned scans regardless of corpus
    size. Each pass scans the parquet columns it needs (x, y; the md5
    sampling hash is computed ONLY in the TakeOrdered pass, never
    materialized corpus-wide), and the model-sized intermediates
    (moments row, 32-row sample, 1-row winner) are checkpointed so
    the broadcast chains re-read one-row frames instead of re-running
    full scans (guide §1.2/§2.3)."""
    li = cat(spark, sf_dir)["lineitem"]
    d = li.select(
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    yc = F.floor(F.col("y") * 100 + 0.5).cast("bigint")
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(yc).alias("syc"),
    ).localCheckpoint()  # one row; feeds tau, votes, refit, the report
    tau = m.select(
        "n",
        (
            RANSAC_TAU_FRAC
            * (F.col("syc").cast("double") / F.col("n"))
            / 100.0
        ).alias("tol"),
    )
    samp = (
        # TakeOrdered(32) over the hash, then a 32-row window — the
        # single-partition window runs on the sampled frame only
        li.select(
            F.col("l_quantity").alias("x"),
            F.col("l_extendedprice").alias("y"),
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            ).alias("h"),
        )
        .orderBy("h")
        .limit(RANSAC_SAMPLES)
        .select("x", "y", F.row_number().over(W.orderBy("h")).alias("r"))
        .localCheckpoint()  # 32 rows; feeds both candidate branches
    )
    a = samp.filter(F.col("r") % 2 == 1).select(
        ((F.col("r") + 1) / 2).cast("bigint").alias("cid"),
        F.col("r").alias("ra"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = samp.select(
        (F.col("r") - 1).alias("ra"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    slope = (F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))
    cand = (
        a.join(b, "ra")
        .filter(F.col("xa") != F.col("xb"))
        .select(
            "cid",
            slope.alias("slope"),
            (F.col("ya") - slope * F.col("xa")).alias("icept"),
        )
    )
    resid_ok = (
        F.abs(
            F.col("y") - (F.col("icept") + F.col("slope") * F.col("x"))
        )
        <= F.col("tol")
    )
    votes = (
        d.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(tau.select("tol")))
        .groupBy("cid", "slope", "icept")
        .agg(F.sum(F.when(resid_ok, 1).otherwise(0)).alias("inliers"))
    )
    best = (
        votes.orderBy(F.col("inliers").desc(), "cid")
        .limit(1)
        .localCheckpoint()  # one row; read by refit AND the report
    )
    refit = (
        d.crossJoin(F.broadcast(best))
        .crossJoin(F.broadcast(tau.select("tol")))
        .filter(resid_ok)
        .agg(
            F.count(F.lit(1)).cast("double").alias("ni"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    rslope = (F.col("ni") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("ni") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    fin = (
        best.crossJoin(F.broadcast(refit)).crossJoin(
            F.broadcast(m.select("n"))
        )
    )
    return fin.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("cid").cast("bigint").alias("best_candidate"),
        F.col("inliers").cast("bigint").alias("consensus_size"),
        rnd(F.col("inliers").cast("double") / F.col("n"), 4).alias(
            "inlier_share"
        ),
        rnd(F.col("slope"), 4).alias("cand_slope"),
        rnd(rslope, 4).alias("refit_slope"),
        rnd((F.col("sy") - F.col("sx") * rslope) / F.col("ni"), 2).alias(
            "refit_intercept"
        ),
    )


COH_K = 9  # spectra computed at k = 1..K, coherence reported at 2..K-1
TWO_PI = 2.0 * math.pi


@query(
    "stat_spectral_coherence",
    # Real oracle: residuals are the exact integers n*y - sum(y); the
    # DFT sums multiply them by COS/SIN of identical double arguments
    # (libm-ulp drift only), band averages are 3-term means, and the
    # coherence ratio is rounded on the grid in both engines.
    oracle=f"""
    WITH raw AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                     AS t,
                     CAST(SUM(CASE WHEN event_type = 'click'
                              THEN 1 ELSE 0 END) AS BIGINT) AS x,
                     CAST(SUM(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS BIGINT) AS y
                 FROM events GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx,
                 SUM(y) AS sy, MIN(t) AS t0
          FROM raw),
    u AS (SELECT raw.t - m.t0 AS i,
                 CAST(m.n * raw.x - m.sx AS DOUBLE) AS ux,
                 CAST(m.n * raw.y - m.sy AS DOUBLE) AS uy,
                 m.n
          FROM raw, m),
    dft AS (SELECT ks.k,
                   SUM(ux * COS({TWO_PI!r} * ks.k * i / n)) AS ax,
                   SUM(ux * SIN({TWO_PI!r} * ks.k * i / n)) AS bx,
                   SUM(uy * COS({TWO_PI!r} * ks.k * i / n)) AS ay,
                   SUM(uy * SIN({TWO_PI!r} * ks.k * i / n)) AS by,
                   MAX(n) AS n
            FROM u, (SELECT unnest(range(1, {COH_K + 1})) AS k) ks
            GROUP BY 1),
    band AS (SELECT c.k,
                    AVG(o.ax * o.ax + o.bx * o.bx) AS sxx,
                    AVG(o.ay * o.ay + o.by * o.by) AS syy,
                    AVG(o.ax * o.ay + o.bx * o.by) AS cre,
                    AVG(o.bx * o.ay - o.ax * o.by) AS cim,
                    MAX(c.n) AS n
             FROM dft c JOIN dft o ON o.k BETWEEN c.k - 1 AND c.k + 1
             WHERE c.k BETWEEN 2 AND {COH_K - 1}
             GROUP BY 1)
    SELECT k AS freq_k,
           FLOOR(CAST(n AS DOUBLE) / k * 100 + 0.5) / 100 AS period_days,
           FLOOR((cre * cre + cim * cim) / NULLIF(sxx * syy, 0)
                 * 1e6 + 0.5) / 1e6 AS coherence
    FROM band
    ORDER BY k
    """,
)
def stat_spectral_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-averaged cross-spectral coherence between daily click and
    purchase volume at harmonics k = 2..{hi} of the observation span:
    DFT the integer residual series, smooth auto/cross spectra over
    3-frequency bands (raw single-taper coherence is identically 1 —
    the smoothing IS the statistic), and report |Sxy|^2/(Sxx*Syy) in
    [0,1] per band. Coherence near 1 on the ~weekly band with low
    time-domain correlation (ev_cross_correlation) is the classic
    signature of a shared periodic driver hitting the two series at
    different phases.

    Scale: ONE conditional day-grain count, then a {k}-frequency
    broadcast trig pass over the calendar-bounded frame (map-side
    combinable sums), a 9-row band join, closed-form ratios."""
    raw = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias(
                "t"
            ),
            "event_type",
        )
        .groupBy("t")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("y"),
        )
    )
    m = raw.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.min("t").alias("t0"),
    )
    u = raw.crossJoin(F.broadcast(m)).select(
        (F.col("t") - F.col("t0")).alias("i"),
        (F.col("n") * F.col("x") - F.col("sx")).cast("double").alias("ux"),
        (F.col("n") * F.col("y") - F.col("sy")).cast("double").alias("uy"),
        "n",
    )
    ks = spark.range(1, COH_K + 1).select(F.col("id").alias("k"))
    arg = TWO_PI * F.col("k") * F.col("i") / F.col("n")
    dft = (
        u.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.col("ux") * F.cos(arg)).alias("ax"),
            F.sum(F.col("ux") * F.sin(arg)).alias("bx"),
            F.sum(F.col("uy") * F.cos(arg)).alias("ay"),
            F.sum(F.col("uy") * F.sin(arg)).alias("by"),
            F.max("n").alias("n"),
        )
        .localCheckpoint()  # 9 rows; feeds both band aliases
    )
    c = dft.select(F.col("k"), F.col("n"))
    o = dft.select(
        F.col("k").alias("ko"), "ax", "bx", "ay", "by"
    )
    band = (
        c.filter((F.col("k") >= 2) & (F.col("k") <= COH_K - 1))
        .join(
            F.broadcast(o),
            (F.col("ko") >= F.col("k") - 1) & (F.col("ko") <= F.col("k") + 1),
        )
        .groupBy("k")
        .agg(
            F.avg(F.col("ax") * F.col("ax") + F.col("bx") * F.col("bx")).alias(
                "sxx"
            ),
            F.avg(F.col("ay") * F.col("ay") + F.col("by") * F.col("by")).alias(
                "syy"
            ),
            F.avg(F.col("ax") * F.col("ay") + F.col("bx") * F.col("by")).alias(
                "cre"
            ),
            F.avg(F.col("bx") * F.col("ay") - F.col("ax") * F.col("by")).alias(
                "cim"
            ),
            F.max("n").alias("n"),
        )
    )
    return band.select(
        F.col("k").alias("freq_k"),
        rnd(F.col("n").cast("double") / F.col("k"), 2).alias("period_days"),
        rnd(
            (F.col("cre") * F.col("cre") + F.col("cim") * F.col("cim"))
            / F.nullif(F.col("sxx") * F.col("syy"), F.lit(0.0)),
            6,
        ).alias("coherence"),
    ).orderBy("freq_k")


stat_spectral_coherence.__doc__ = stat_spectral_coherence.__doc__.format(
    hi=COH_K - 1, k=COH_K
)
