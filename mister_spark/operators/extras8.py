"""Wave 8: distribution tests (KS, Mann-Whitney, Gini, Benford),
Zipf-law fit, EWMA smoothing, autocorrelation, interval coverage, and
top event paths.

Statistical comparison and time-series diagnostics a data team runs
daily: nonparametric two-sample tests for drift detection, inequality /
first-digit profiles for anomaly screening, Zipf fit for corpus health,
EWMA and ACF for monitoring, interval merging for true-activity
coverage, and journey path mining. Every float contract is built from
raw sums / integer arithmetic so both engines evaluate the identical
formula (see stat_regression for the pattern rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum, global_rank
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query

_SEG_FILTER = "c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')"


def _two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v, ga, gb) rows for the two compared segments."""
    cust = cat(spark, sf_dir)["customer"]
    return cust.filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY")
    ).select(
        F.col("c_acctbal").alias("v"),
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1).otherwise(0).alias("ga"),
        F.when(F.col("c_mktsegment") == "MACHINERY", 1).otherwise(0).alias("gb"),
    )


@query(
    "stat_ks_test",
    oracle=f"""
    WITH s AS (
      SELECT c_acctbal AS v,
             CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS ga,
             CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS gb
      FROM customer WHERE {_SEG_FILTER}),
    g AS (SELECT v, SUM(ga) AS da, SUM(gb) AS db FROM s GROUP BY 1),
    c AS (SELECT SUM(da) OVER (ORDER BY v) AS ca,
                 SUM(db) OVER (ORDER BY v) AS cb FROM g),
    t AS (SELECT CAST(SUM(ga) AS DOUBLE) AS na,
                 CAST(SUM(gb) AS DOUBLE) AS nb FROM s)
    SELECT CAST(t.na AS BIGINT) AS na, CAST(t.nb AS BIGINT) AS nb,
           FLOOR(MAX(ABS(c.ca / t.na - c.cb / t.nb)) * 10000 + 0.5) / 10000
             AS ks_d
    FROM c, t GROUP BY 1, 2
    """,
)
def stat_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between two segments'
    balance distributions: D = max over pooled values of the ECDF gap —
    the standard nonparametric "did this distribution drift" test.
    ECDFs step only at observed values, so grouping by value first and
    taking cumulative integer counts is exact, not an approximation.

    Scale: the fact table collapses to |distinct values| rows in ONE
    partial-agg shuffle before any window runs; the cumulative counts
    are then a two-phase distributed prefix sum (`bucketed_cumsum`:
    approx-percentile range buckets → parallel partitioned window →
    broadcast cross-bucket carry), so no task ever sorts the whole
    collapsed frame even when |distinct doubles| is data-sized."""
    s = _two_sample(spark, sf_dir)
    g = s.groupBy("v").agg(F.sum("ga").alias("da"), F.sum("gb").alias("db"))
    c = bucketed_cumsum(g, "v", {"ca": F.col("da"), "cb": F.col("db")})
    t = s.agg(
        F.sum("ga").cast("double").alias("na"),
        F.sum("gb").cast("double").alias("nb"),
    )
    return (
        c.crossJoin(F.broadcast(t))
        .groupBy(
            F.col("na").cast("bigint").alias("na"),
            F.col("nb").cast("bigint").alias("nb"),
        )
        .agg(
            ratio(
                F.max(F.abs(F.col("ca") / F.col("na") - F.col("cb") / F.col("nb")))
            ).alias("ks_d")
        )
    )


@query(
    "stat_mannwhitney",
    oracle=f"""
    WITH s AS (
      SELECT c_acctbal AS v,
             CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS ga,
             CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS gb
      FROM customer WHERE {_SEG_FILTER}),
    g AS (SELECT v, SUM(ga) AS da, SUM(gb) AS db, COUNT(*) AS cnt
          FROM s GROUP BY 1),
    c AS (SELECT da, cnt,
                 SUM(cnt) OVER (ORDER BY v) - cnt AS below FROM g),
    r AS (SELECT SUM(da * (below + (cnt + 1) / 2.0)) AS ra FROM c),
    t AS (SELECT CAST(SUM(ga) AS DOUBLE) AS na,
                 CAST(SUM(gb) AS DOUBLE) AS nb FROM s)
    SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
           FLOOR((ra - na * (na + 1) / 2) * 100 + 0.5) / 100 AS u_a,
           FLOOR((na * nb - (ra - na * (na + 1) / 2)) * 100 + 0.5) / 100
             AS u_b,
           FLOOR((2 * (ra - na * (na + 1) / 2) / (na * nb) - 1) * 10000 + 0.5)
             / 10000 AS r_rb
    FROM r, t
    """,
)
def stat_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U between the two segments with exact midrank tie
    handling: per distinct value, average rank = (count below) +
    (count at value + 1)/2; U_A = rank-sum_A − n_A(n_A+1)/2; also the
    rank-biserial effect size 2U_A/(n_A·n_B) − 1. Ranks are dyadic
    rationals from integer counts, so every intermediate is exactly
    representable — bit-identical across engines by construction.

    Scale: same collapsed-by-value shape as stat_ks_test — one
    partial-agg shuffle, then the same two-phase `bucketed_cumsum`
    prefix sum over |distinct values| (no single-task global window)."""
    s = _two_sample(spark, sf_dir)
    g = s.groupBy("v").agg(
        F.sum("ga").alias("da"),
        F.sum("gb").alias("db"),
        F.count(F.lit(1)).alias("cnt"),
    )
    c = bucketed_cumsum(g, "v", {"cum": F.col("cnt")}).select(
        "da", "cnt", (F.col("cum") - F.col("cnt")).alias("below")
    )
    r = c.agg(
        F.sum(F.col("da") * (F.col("below") + (F.col("cnt") + 1) / 2.0)).alias("ra")
    )
    t = s.agg(
        F.sum("ga").cast("double").alias("na"),
        F.sum("gb").cast("double").alias("nb"),
    )
    na, nb, ra = F.col("na"), F.col("nb"), F.col("ra")
    ua = ra - na * (na + 1) / 2
    return r.crossJoin(F.broadcast(t)).select(
        na.cast("bigint").alias("na"),
        nb.cast("bigint").alias("nb"),
        money(ua).alias("u_a"),
        money(na * nb - ua).alias("u_b"),
        ratio(2 * ua / (na * nb) - 1).alias("r_rb"),
    )


@query(
    "stat_gini",
    oracle="""
    WITH sp AS (
      SELECT CAST(FLOOR(SUM(o_totalprice) * 100 + 0.5) AS BIGINT) AS xc,
             o_custkey
      FROM orders GROUP BY o_custkey),
    r AS (SELECT xc,
                 ROW_NUMBER() OVER (ORDER BY xc, o_custkey) AS i FROM sp)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(CAST(SUM(xc) AS DOUBLE) / 100 * 100 + 0.5) / 100 AS total,
           FLOOR(CAST(2 * SUM(i * xc) - (COUNT(*) + 1) * SUM(xc) AS DOUBLE)
                 / CAST(COUNT(*) * SUM(xc) AS DOUBLE) * 10000 + 0.5) / 10000
             AS gini
    FROM r
    """,
)
def stat_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend concentration:
    G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) over ascending-sorted spend
    (ties broken by custkey). Spend is converted to integer cents first
    so the rank-weighted sum is exact 64-bit integer arithmetic — no
    float summation order to disagree on.

    Scale: spend-per-customer is one partial-agg shuffle. The rank IS
    the two-phase distributed ranking (`functions/ranks.global_rank`:
    range-partitioned sort + per-partition row-count offsets) — no
    single-task global sort anywhere in the plan. Σ i·x stays within
    int64 up to ~10⁹ customers at cent scale; beyond that,
    decimal(38)."""
    orders = cat(spark, sf_dir)["orders"]
    sp = orders.groupBy("o_custkey").agg(
        F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("xc")
    )
    r = global_rank(sp, "xc", "o_custkey", rank_col="i").select("xc", "i")
    n = F.count(F.lit(1))
    s = F.sum("xc")
    si = F.sum(F.col("i") * F.col("xc"))
    return r.agg(
        n.cast("bigint").alias("n"),
        money(s.cast("double") / 100).alias("total"),
        ratio(
            (2 * si - (n + 1) * s).cast("double") / (n * s).cast("double")
        ).alias("gini"),
    )


@query(
    "stat_benford",
    oracle="""
    WITH d AS (
      SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                               AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0),
    c AS (SELECT digit, CAST(COUNT(*) AS DOUBLE) AS n FROM d GROUP BY 1),
    t AS (SELECT SUM(n) AS tot FROM c)
    SELECT digit, CAST(n AS BIGINT) AS n,
           FLOOR(n / tot * 10000 + 0.5) / 10000 AS share,
           FLOOR(log10(1 + 1.0 / digit) * 10000 + 0.5) / 10000 AS expected,
           FLOOR((n - tot * log10(1 + 1.0 / digit))
                 * (n - tot * log10(1 + 1.0 / digit))
                 / (tot * log10(1 + 1.0 / digit)) * 10000 + 0.5) / 10000
             AS chi2_part
    FROM c, t
    """,
)
def stat_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of order totals: observed
    leading-digit shares vs log10(1+1/d) expectation plus each digit's
    χ² contribution — the classic fabricated-data / anomaly screen.
    The leading digit is extracted from the integer-cents DECIMAL
    STRING (never via float log10, whose 1-ulp cross-engine differences
    flip the digit exactly at powers of ten).

    Scale: a narrow map to one digit per row, then a 9-key partial-agg
    rollup — the shuffle moves 9 rows per map partition."""
    orders = cat(spark, sf_dir)["orders"]
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    d = orders.filter(F.col("o_totalprice") > 0).select(
        F.substring(cents.cast("string"), 1, 1).cast("bigint").alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).cast("double").alias("n"))
    t = c.agg(F.sum("n").alias("tot"))
    exp_share = F.log10(1 + 1.0 / F.col("digit"))
    dev = F.col("n") - F.col("tot") * exp_share
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        ratio(F.col("n") / F.col("tot")).alias("share"),
        ratio(exp_share).alias("expected"),
        ratio(dev * dev / (F.col("tot") * exp_share)).alias("chi2_part"),
    )


ZIPF_TOP = 500


@query(
    "tx_zipf",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({DUCK_TOKENS}) AS tk FROM documents),
    cnt AS (SELECT tk, CAST(COUNT(*) AS DOUBLE) AS c FROM tok GROUP BY 1),
    rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tk) AS rank
           FROM cnt),
    p AS (SELECT LN(CAST(rank AS DOUBLE)) AS x, LN(c) AS y FROM rk
          WHERE rank <= {ZIPF_TOP}),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
          FROM p)
    SELECT CAST(n AS BIGINT) AS n_terms,
           FLOOR((n * sxy - sx * sy) / (n * sxx - sx * sx) * 10000 + 0.5)
             / 10000 AS zipf_slope,
           FLOOR((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                 * 10000 + 0.5) / 10000 AS intercept,
           FLOOR((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                 * 10000 + 0.5) / 10000 AS r2
    FROM s
    """,
)
def tx_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit for corpus health: OLS slope of ln(freq) ~ ln(rank)
    over the top-{ZIPF_TOP} tokens (natural text runs slope ≈ −1; a
    crawl full of boilerplate or spam drifts away). Rank ties break on
    token text so both engines fit the same points; the regression uses
    the raw-moment-sum closed form (see stat_regression).

    Scale: token counting is the only corpus-sized step (one
    partial-agg shuffle). The vocabulary-sized rank window is PRUNED
    FIRST: the global top-{ZIPF_TOP} under (count desc, token) is a
    subset of every partition's local top-{ZIPF_TOP}, and the local
    rank comes free from `monotonically_increasing_id` after a
    sortWithinPartitions (no exchange, no window) — so the only
    unpartitioned window orders ≤ {ZIPF_TOP}·#partitions survivor
    rows, a plan constant independent of vocabulary size."""
    docs = cat(spark, sf_dir)["documents"]
    cnt = (
        docs.select(F.explode(tokens()).alias("tk"))
        .groupBy("tk")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    shift = 33  # monotonically_increasing_id: id = pid << 33 | row
    mid = F.monotonically_increasing_id()
    pruned = (
        cnt.sortWithinPartitions(F.desc("c"), "tk")
        .withColumn("_mid", mid)
        .withColumn(
            "_local",
            (
                F.col("_mid")
                - F.shiftleft(F.shiftright("_mid", shift), shift)
            )
            + 1,
        )
        .filter(F.col("_local") <= ZIPF_TOP)
        .drop("_mid", "_local")
    )
    rk = pruned.select(
        "c", F.row_number().over(W.orderBy(F.desc("c"), "tk")).alias("rank")
    ).filter(F.col("rank") <= ZIPF_TOP)
    p = rk.select(
        F.log(F.col("rank").cast("double")).alias("x"), F.log("c").alias("y")
    )
    x, y = F.col("x"), F.col("y")
    s = p.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    return s.select(
        n.cast("bigint").alias("n_terms"),
        ratio(slope).alias("zipf_slope"),
        ratio((sy - slope * sx) / n).alias("intercept"),
        ratio(cov_n * cov_n / (var_x * var_y)).alias("r2"),
    )


EWMA_ALPHA = 0.3


@query(
    "ev_ewma",
    oracle=f"""
    WITH b AS (SELECT date_trunc('day', MIN(ts)) AS lo,
                      date_trunc('day', MAX(ts)) AS hi FROM events),
    g AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM b),
    ty AS (SELECT DISTINCT event_type FROM events),
    dc AS (SELECT date_trunc('day', ts) AS d, event_type,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
    f AS (SELECT ty.event_type, g.d, COALESCE(dc.n, 0) AS n,
                 ROW_NUMBER() OVER (PARTITION BY ty.event_type ORDER BY g.d)
                   AS i
          FROM g CROSS JOIN ty
          LEFT JOIN dc ON dc.d = g.d AND dc.event_type = ty.event_type),
    e AS (SELECT event_type, d, n, i,
                 SUM(n * POWER(1 - {EWMA_ALPHA}, -i)) OVER (
                   PARTITION BY event_type ORDER BY i) AS acc
          FROM f)
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n,
           FLOOR({EWMA_ALPHA} * acc * POWER(1 - {EWMA_ALPHA}, i)
                 / (1 - POWER(1 - {EWMA_ALPHA}, i)) * 10000 + 0.5) / 10000
             AS ewma
    FROM e
    """,
)
def ev_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily event counts per
    type (α = {EWMA_ALPHA}, weight-normalized like pandas adjust=True)
    over a dense zero-filled day grid — the monitoring smoother.
    The recursion is re-expressed as one prefix sum:
    ewma_i = α·(1−α)^i·Σ_j n_j·(1−α)^(−j) / (1 − (1−α)^i), using the
    geometric closed form for the weight total.

    Scale: daily counts are one partial-agg shuffle; the window runs
    per type over days (tiny). The (1−α)^(−j) scaling stays in double
    range for series up to ~2000 points — chunk longer series (restart
    the prefix per chunk and carry one scalar across) before it
    overflows; at 30-day monitoring horizons it is exact."""
    ev = cat(spark, sf_dir)["events"]
    dc = ev.groupBy(F.date_trunc("day", "ts").alias("d"), "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )
    types = ev.select("event_type").distinct()
    f = (
        F.broadcast(grid.crossJoin(types))
        .join(dc, ["d", "event_type"], "left")
        .select(
            "event_type",
            "d",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        )
        .withColumn(
            "i", F.row_number().over(W.partitionBy("event_type").orderBy("d"))
        )
    )
    q = 1 - EWMA_ALPHA
    wacc = W.partitionBy("event_type").orderBy("i").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    acc = F.sum(F.col("n") * F.pow(F.lit(q), -F.col("i"))).over(wacc)
    e = f.withColumn("acc", acc)
    return e.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n",
        ratio(
            EWMA_ALPHA
            * F.col("acc")
            * F.pow(F.lit(q), F.col("i"))
            / (1 - F.pow(F.lit(q), F.col("i")))
        ).alias("ewma"),
    )


@query(
    "ev_autocorr",
    oracle="""
    WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
                      date_trunc('hour', MAX(ts)) AS hi FROM events),
    g AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
    hc AS (SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
    f AS (SELECT CAST(COALESCE(hc.n, 0) AS DOUBLE) AS x,
                 ROW_NUMBER() OVER (ORDER BY g.h) AS i
          FROM g LEFT JOIN hc ON hc.h = g.h),
    l AS (SELECT lag AS k, f.x AS x, p.x AS y
          FROM (VALUES (1), (24)) AS lags(lag)
          JOIN f ON TRUE JOIN f p ON p.i = f.i - lags.lag),
    s AS (SELECT k, CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
          FROM l GROUP BY 1)
    SELECT CAST(k AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
           FLOOR((n * sxy - sx * sy)
                 / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy))
                 * 10000 + 0.5) / 10000 AS acf
    FROM s
    """,
)
def ev_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the global hourly event-count series at lags
    1 and 24 — the seasonality diagnostic (a strong lag-24 ACF means
    daily periodicity; monitoring thresholds should be day-of-hour
    aware). Pearson r computed from raw moment sums over lag-aligned
    pairs on a dense zero-filled grid, so both engines evaluate the
    same closed form on the same pairs.

    Scale: the corpus-sized step is the hourly partial agg (one
    shuffle); the series itself is hours-in-range rows, and the lag
    alignment is a self-join on the tiny series."""
    ev = cat(spark, sf_dir)["events"]
    hc = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    )
    f = (
        F.broadcast(grid)
        .join(hc, "h", "left")
        .select(F.coalesce("n", F.lit(0)).cast("double").alias("x"), "h")
        .withColumn("i", F.row_number().over(W.orderBy("h")))
        .select("x", "i")
    )
    lags = spark.createDataFrame([(1,), (24,)], "k long")
    p = f.select(F.col("x").alias("y"), F.col("i").alias("pi"))
    l = (
        f.crossJoin(F.broadcast(lags))
        .join(p, F.col("pi") == F.col("i") - F.col("k"))
        .select("k", "x", "y")
    )
    x, y = F.col("x"), F.col("y")
    s = l.groupBy("k").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        F.col("k").cast("bigint").alias("lag"),
        n.cast("bigint").alias("n_pairs"),
        ratio(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("acf"),
    )


INTERVAL_PAD_US = 900 * 1_000_000  # 15 minutes


@query(
    "ev_interval_merge",
    oracle=f"""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS st,
             epoch_us(ts) + {INTERVAL_PAD_US} AS en, event_id
      FROM events),
    m AS (SELECT user_id, st, en,
                 MAX(en) OVER (PARTITION BY user_id ORDER BY st, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS pmax
          FROM s),
    fl AS (SELECT user_id, st, en,
                  CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END
                    AS isnew
           FROM m),
    isl AS (SELECT user_id, st, en,
                   SUM(isnew) OVER (PARTITION BY user_id ORDER BY st, en
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS island
            FROM fl),
    iv AS (SELECT user_id, island, MIN(st) AS istart, MAX(en) AS iend
           FROM isl GROUP BY 1, 2)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(iend - istart) AS BIGINT) AS covered_us
    FROM iv GROUP BY 1
    """,
)
def ev_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union (gaps-and-islands): pad each event to a 15-minute
    activity interval, merge overlaps per user, and report interval
    count + total covered time — "how long was this user actually
    active", the honest denominator for engagement rates (naive
    n_events × 15 min double-counts overlaps). Pure integer-microsecond
    arithmetic; island boundaries via the classic running-max-of-ends
    flag + prefix sum.

    Scale: everything is ONE shuffle on user_id — both windows and both
    aggregations share that partitioning, so Catalyst reuses a single
    exchange (windows sort within partitions, no second shuffle)."""
    ev = cat(spark, sf_dir)["events"]
    us = F.unix_micros("ts")
    s = ev.select(
        "user_id",
        us.alias("st"),
        (us + INTERVAL_PAD_US).alias("en"),
        "event_id",
    )
    wprev = (
        W.partitionBy("user_id")
        .orderBy("st", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    m = s.withColumn("pmax", F.max("en").over(wprev))
    fl = m.withColumn(
        "isnew",
        F.when(
            F.col("pmax").isNull() | (F.col("st") > F.col("pmax")), 1
        ).otherwise(0),
    )
    wisl = (
        W.partitionBy("user_id")
        .orderBy("st", "en")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    isl = fl.withColumn("island", F.sum("isnew").over(wisl))
    iv = isl.groupBy("user_id", "island").agg(
        F.min("st").alias("istart"), F.max("en").alias("iend")
    )
    return iv.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum(F.col("iend") - F.col("istart")).cast("bigint").alias("covered_us"),
    )


@query(
    "ev_top_paths",
    oracle="""
    WITH s AS (
      SELECT event_type AS a,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS b,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS c
      FROM events),
    p AS (SELECT a || '>' || b || '>' || c AS path FROM s
          WHERE b IS NOT NULL AND c IS NOT NULL)
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n
    FROM p GROUP BY 1
    ORDER BY n DESC, path LIMIT 20
    """,
)
def ev_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step user journey paths (event-type trigrams within
    each user's timeline) — the path-mining view behind "what do users
    do right before purchasing". Both LEADs share one (user_id; ts,
    event_id) window, and the top-k tiebreak is (count desc, path asc)
    so both engines pick identical rows.

    Scale: one shuffle on user_id for the window, one partial-agg
    shuffle on path (trigram cardinality is |types|³ bounded), then a
    global top-20 via TakeOrdered — no full sort."""
    ev = cat(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    )
    p = s.filter(F.col("b").isNotNull() & F.col("c").isNotNull()).select(
        F.concat_ws(">", "a", "b", "c").alias("path")
    )
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )
