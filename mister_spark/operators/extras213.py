"""Wave 213: fractal scaling diagnostics and sliding-window sketching.

ev_dfa is detrended fluctuation analysis on daily event volume: build
the cumulative-deviation profile, detrend it per non-overlapping
window at scales 3/5/10/15 days (DFA_SCALES, chosen to fit the 30-day
shipped calendar), and regress log F(s) on log s. The
slope alpha is the scaling exponent that stays readable under the
nonstationarity that breaks ev_hurst's rescaled-range estimate
(alpha ~ 0.5 = uncorrelated, > 0.5 = persistent long memory, ~1.5 =
integrated noise). sketch_dgim is the Datar-Gionis-Indyk-Motwani
sliding-window bit counter over the hourly activity stream: O(log W)
buckets answer "how many active hours in the last W?" with a <= 50%
worst-case (typically ~couple %) error — the canonical way a
100 TB stream keeps windowed counts without storing the window. The
implementation exploits the DGIM invariant that the bucket structure
after m ones IS the unique base-2 representation of m with digits
{1,2}: the streaming merge cascade collapses to a closed form over
the ranked 1-positions, identical in both engines.

Exactness: DFA reduces to per-window integer-index OLS sums on the
calendar-bounded profile; DGIM is pure integer arithmetic (digit
extraction, rank joins, window cutoffs) with one final ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

DFA_SCALES = (3, 5, 10, 15)  # fits the 30-day shipped calendar
DGIM_WINDOW = 512  # hours
EPOCH = "1970-01-01"


@query(
    "ev_dfa",
    # Real oracle: the profile is an exact cumsum of (count - mean),
    # window ids are integer divisions of the day rank, per-window
    # detrended SSE is the closed-form Syy - Sxy^2/Sxx on integer x,
    # and the log-log alpha regression runs over the 4 scale points.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t, CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    m AS (SELECT AVG(y) AS mu, CAST(COUNT(*) AS BIGINT) AS n FROM d),
    prof AS (SELECT ROW_NUMBER() OVER (ORDER BY t) - 1 AS i,
                    SUM(y - m.mu) OVER (ORDER BY t) AS x
             FROM d, m),
    w AS (SELECT s.s, CAST(FLOOR(p.i / s.s) AS BIGINT) AS win,
                 CAST(p.i AS DOUBLE) AS ix, p.x
          FROM prof p CROSS JOIN (VALUES {", ".join(f"({s})" for s in DFA_SCALES)}) AS s(s)
          WHERE p.i < s.s * FLOOR((SELECT n FROM m) / s.s)),
    ws AS (SELECT s, win, CAST(COUNT(*) AS DOUBLE) AS cnt,
                  SUM(ix) AS sx, SUM(x) AS sy, SUM(ix * ix) AS sxx,
                  SUM(ix * x) AS sxy, SUM(x * x) AS syy
           FROM w GROUP BY 1, 2),
    sse AS (SELECT s, win,
                   (syy - sy * sy / cnt)
                   - (sxy - sx * sy / cnt) * (sxy - sx * sy / cnt)
                     / (sxx - sx * sx / cnt) AS e2, cnt
            FROM ws),
    fs AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n_windows,
                  SQRT(GREATEST(SUM(e2), 0.0) / SUM(cnt)) AS f
           FROM sse GROUP BY 1),
    reg AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k,
                   SUM(LN(CAST(s AS DOUBLE))) AS sx,
                   SUM(LN(GREATEST(f, 1e-12))) AS sy,
                   SUM(LN(CAST(s AS DOUBLE)) * LN(CAST(s AS DOUBLE))) AS sxx,
                   SUM(LN(CAST(s AS DOUBLE)) * LN(GREATEST(f, 1e-12))) AS sxy
            FROM fs)
    SELECT fs.s AS scale, fs.n_windows,
           FLOOR(fs.f * 1e4 + 0.5) / 1e4 AS fluctuation,
           FLOOR((reg.sxy - reg.sx * reg.sy / reg.k)
                 / (reg.sxx - reg.sx * reg.sx / reg.k) * 1e4 + 0.5) / 1e4
             AS alpha
    FROM fs, reg
    """,
)
def ev_dfa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detrended fluctuation analysis of daily volume: integrate the
    mean-removed series into a profile, least-squares-detrend each
    non-overlapping window at scales {scales}, and fit alpha as the
    log-log slope of fluctuation vs scale. Hurst's R/S (ev_hurst)
    inflates under trends and level shifts; DFA removes the local
    trend INSIDE each window first, so alpha isolates genuine long-
    range correlation — the number that says whether yesterday's
    traffic still echoes today (persistent, alpha > 0.5) or the days
    are independent draws (alpha ~ 0.5).

    Scale: ONE day-grain count; the profile cumsum, window grouping
    and per-window OLS sums all live on the calendar-bounded frame
    (the documented model-sized carry); the alpha regression is a
    4-point aggregate."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .localCheckpoint()  # calendar-bounded day frame
    )
    m = d.agg(F.avg("y").alias("mu"), F.count(F.lit(1)).alias("n"))
    prof = (
        d.crossJoin(F.broadcast(m))
        .select(
            (F.row_number().over(W.orderBy("t")) - 1).alias("i"),
            F.col("y"),
            F.col("mu"),
            F.col("n"),
        )
        .select(
            "i",
            F.sum(F.col("y") - F.col("mu")).over(
                W.orderBy("i").rowsBetween(W.unboundedPreceding, 0)
            ).alias("x"),
            "n",
        )
        .localCheckpoint()  # bounded profile; feeds all four scales
    )
    scales = spark.range(0, len(DFA_SCALES)).select(
        F.element_at(
            F.array(*[F.lit(s) for s in DFA_SCALES]), (F.col("id") + 1).cast("int")
        ).alias("s")
    )
    w = (
        prof.crossJoin(F.broadcast(scales))
        .filter(F.col("i") < F.col("s") * F.floor(F.col("n") / F.col("s")))
        .select(
            "s",
            F.floor(F.col("i") / F.col("s")).alias("win"),
            F.col("i").cast("double").alias("ix"),
            "x",
        )
    )
    ws = w.groupBy("s", "win").agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.sum("ix").alias("sx"),
        F.sum("x").alias("sy"),
        F.sum(F.col("ix") * F.col("ix")).alias("sxx"),
        F.sum(F.col("ix") * F.col("x")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("syy"),
    )
    sxy_c = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("cnt")
    sxx_c = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("cnt")
    sse = ws.select(
        "s", "cnt",
        (
            (F.col("syy") - F.col("sy") * F.col("sy") / F.col("cnt"))
            - sxy_c * sxy_c / sxx_c
        ).alias("e2"),
    )
    fs = (
        sse.groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sqrt(
                F.greatest(F.sum("e2"), F.lit(0.0)) / F.sum("cnt")
            ).alias("f"),
        )
        .localCheckpoint()  # 4 rows; feeds output + alpha regression
    )
    ls = F.log(F.col("s").cast("double"))
    lf = F.log(F.greatest(F.col("f"), F.lit(1e-12)))
    reg = fs.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(ls).alias("rsx"),
        F.sum(lf).alias("rsy"),
        F.sum(ls * ls).alias("rsxx"),
        F.sum(ls * lf).alias("rsxy"),
    )
    alpha = (F.col("rsxy") - F.col("rsx") * F.col("rsy") / F.col("k")) / (
        F.col("rsxx") - F.col("rsx") * F.col("rsx") / F.col("k")
    )
    return fs.crossJoin(F.broadcast(reg)).select(
        F.col("s").cast("int").alias("scale"),
        F.col("n_windows").cast("bigint").alias("n_windows"),
        rnd(F.col("f"), 4).alias("fluctuation"),
        rnd(alpha, 4).alias("alpha"),
    )


ev_dfa.__doc__ = ev_dfa.__doc__.format(scales=DFA_SCALES)


@query(
    "sketch_dgim",
    # Real oracle: the DGIM bucket state after m ones is the unique
    # {{1,2}}-digit base-2 representation of m (the merge cascade IS
    # a carry chain), so buckets, timestamps, expiry and the
    # half-oldest estimate are all integer closed forms over the
    # ranked 1-hours — identical in both engines.
    oracle=f"""
    WITH ones AS (SELECT DISTINCT date_diff('hour',
                      TIMESTAMP '{EPOCH} 00:00:00',
                      date_trunc('hour', ts)) AS h
                  FROM events),
    rk AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h DESC) AS r FROM ones),
    mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, MAX(h) AS t_now FROM rk),
    lvl AS (SELECT m, t_now,
                   -- floor(log2(m+1)) via the binary-string length:
                   -- exact integers, no float edge at powers of two
                   CAST(LENGTH(bin(m + 1)) - 1 AS BIGINT) AS lv,
                   t_now - {DGIM_WINDOW} + 1 AS cutoff
            FROM mm WHERE m > 0),
    dig AS (SELECT l.m, l.t_now, l.cutoff, g.i,
                   m - ((1::BIGINT << lv) - 1) AS mp,
                   1 + (((m - ((1::BIGINT << lv) - 1)) >> g.i) & 1) AS c,
                   ((1::BIGINT << g.i) - 1)
                   + ((m - ((1::BIGINT << lv) - 1))
                      & ((1::BIGINT << g.i) - 1)) AS cum_before
            FROM lvl l CROSS JOIN generate_series(0, 62) AS g(i)
            WHERE g.i < l.lv),
    bk AS (SELECT d.i, k.k, d.cutoff,
                  (1::BIGINT << d.i) AS size,
                  d.cum_before + (k.k - 1) * (1::BIGINT << d.i) + 1
                    AS r_newest
           FROM dig d CROSS JOIN (VALUES (1), (2)) AS k(k)
           WHERE k.k <= d.c),
    kept AS (SELECT bk.size, bk.r_newest, rk.h
             FROM bk JOIN rk ON rk.r = bk.r_newest
             WHERE rk.h >= bk.cutoff),
    est AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
                   CAST(COALESCE(SUM(size), 0) AS DOUBLE)
                   - CAST(COALESCE(MAX(CASE WHEN r_newest =
                         (SELECT MAX(r_newest) FROM kept) THEN size END),
                         0) AS DOUBLE) / 2 AS est_count
            FROM kept),
    tru AS (SELECT CAST(COUNT(*) AS BIGINT) AS true_count
            FROM rk, lvl WHERE rk.h >= lvl.cutoff)
    SELECT CAST({DGIM_WINDOW} AS BIGINT) AS window_hours,
           lvl.m AS m_total_ones,
           est.n_buckets,
           FLOOR(est.est_count * 10 + 0.5) / 10 AS est_count,
           tru.true_count,
           FLOOR(ABS(est.est_count - tru.true_count)
                 / GREATEST(CAST(tru.true_count AS DOUBLE), 1.0)
                 * 1e4 + 0.5) / 1e4 AS rel_error
    FROM lvl, est, tru
    """,
)
def sketch_dgim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DGIM sliding-window counter: how many ACTIVE hours in the last
    {w}? The streaming algorithm keeps O(log W) exponentially-sized
    buckets and answers with the sum of in-window buckets minus half
    the oldest — bounded 50% error, pennies of state. The batch replay
    uses the DGIM invariant that after m ones the bucket sizes are
    exactly the unique base-2 representation of m with digits {{1,2}}
    (each arriving 1 is an increment, each merge a carry), so the
    final sketch state — and therefore the estimate a live stream
    would serve — is computed closed-form from the ranked 1-hours,
    no simulation loop. rel_error against the true windowed count
    demonstrates the accuracy actually delivered.

    Scale: ONE hour-grain distinct (map-side combinable), then rank/
    digit arithmetic on the bounded hour frame; at stream scale the
    sketch itself is O(log W) state per key — this op certifies the
    estimate that state serves."""
    ones = (
        cat(spark, sf_dir)["events"]
        .select(
            (
                F.floor(
                    (
                        F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
                    ) / 3600
                )
            ).cast("bigint").alias("h")
        )
        .distinct()
        .localCheckpoint()  # bounded hour frame
    )
    rk = ones.select(
        "h", F.row_number().over(W.orderBy(F.col("h").desc())).alias("r")
    ).localCheckpoint()  # feeds digit join + truth
    mm = rk.agg(F.count(F.lit(1)).alias("m"), F.max("h").alias("t_now"))
    lvl = mm.filter(F.col("m") > 0).select(
        "m", "t_now",
        (F.length(F.bin(F.col("m") + 1)) - 1).cast("bigint").alias("lv"),
        (F.col("t_now") - DGIM_WINDOW + 1).alias("cutoff"),
    )
    g = spark.range(0, 63).select(F.col("id").cast("bigint").alias("i"))
    # pyspark's shiftleft/shiftright only take literal bit counts, so
    # the column-count shifts go through SQL expressions
    mp = "(m - (shiftleft(CAST(1 AS BIGINT), CAST(lv AS INT)) - 1))"
    p2i = "shiftleft(CAST(1 AS BIGINT), CAST(i AS INT))"
    dig = (
        lvl.crossJoin(F.broadcast(g))
        .filter(F.col("i") < F.col("lv"))
        .select(
            "m", "t_now", "cutoff", "i",
            F.expr(f"1 + (shiftright({mp}, CAST(i AS INT)) & 1)").alias("c"),
            F.expr(f"({p2i} - 1) + ({mp} & ({p2i} - 1))").alias(
                "cum_before"
            ),
        )
    )
    k = spark.range(1, 3).select(F.col("id").cast("int").alias("k"))
    bk = (
        dig.crossJoin(F.broadcast(k))
        .filter(F.col("k") <= F.col("c"))
        .select(
            "cutoff",
            F.expr(p2i).alias("size"),
            F.expr(f"cum_before + (k - 1) * {p2i} + 1").alias("r_newest"),
        )
    )
    kept = (
        bk.join(rk, bk.r_newest == rk.r)
        .filter(F.col("h") >= F.col("cutoff"))
        .select("size", "r_newest")
        .localCheckpoint()  # O(log W) buckets
    )
    oldest = kept.agg(F.max("r_newest").alias("r_old"))
    est = kept.crossJoin(F.broadcast(oldest)).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        (
            F.coalesce(F.sum("size"), F.lit(0)).cast("double")
            - F.coalesce(
                F.max(
                    F.when(F.col("r_newest") == F.col("r_old"), F.col("size"))
                ),
                F.lit(0),
            ).cast("double")
            / 2
        ).alias("est_count"),
    )
    tru = (
        rk.crossJoin(F.broadcast(lvl.select("cutoff")))
        .filter(F.col("h") >= F.col("cutoff"))
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    return (
        lvl.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(tru))
        .select(
            F.lit(DGIM_WINDOW).cast("bigint").alias("window_hours"),
            F.col("m").cast("bigint").alias("m_total_ones"),
            F.col("n_buckets").cast("bigint").alias("n_buckets"),
            rnd(F.col("est_count"), 1).alias("est_count"),
            F.col("true_count").cast("bigint").alias("true_count"),
            rnd(
                F.abs(F.col("est_count") - F.col("true_count"))
                / F.greatest(F.col("true_count").cast("double"), F.lit(1.0)),
                4,
            ).alias("rel_error"),
        )
    )


sketch_dgim.__doc__ = sketch_dgim.__doc__.format(w=f"{DGIM_WINDOW} hours")
