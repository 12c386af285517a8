"""Wave 45: inference hygiene — exact tests, multiple-comparison
correction, and residual diagnostics.

stat_fisher_exact is the small-cell contingency test chi2 can't cover
(expected counts < 5 break the asymptotic approximation);
stat_bh_fdr is the guardrail for the metric-sweep anti-pattern (35
segment hypotheses at α=0.05 expect ~2 false "wins" — BH caps the
false-discovery RATE instead); stat_durbin_watson detects serially
correlated residuals that silently invalidate every OLS confidence
interval stat_regression reports; stat_partial_corr removes a
confounder before claiming two series couple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.special import (
    ln_fact,
    ln_fact_sql,
    normal_sf,
    normal_sf_sql,
)
from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

DAY_US = 86_400_000_000
FISHER_LONG_CHARS = 1500  # col split: doc length
FISHER_LANG = "en"  # row split: language
FISHER_TIE_EPS = 1e-7  # two-sided tie slack (shared formula ⇒ safe)
FISHER_CHUNK = 4096  # support-explosion chunk size
BH_ALPHA = 0.05
BH_VALUE_THRESHOLD = 100.0  # "high-value" event (mirrors stat_wilson_ci)

_FISHER_L = (
    "({lf_r1} + {lf_r2} + {lf_c1} + {lf_c2} - {lf_n}"
    " - {lf_k} - {lf_r1k} - {lf_c1k} - {lf_rest})"
)


@query(
    "stat_fisher_exact",
    oracle=f"""
    WITH d AS (SELECT (lang = '{FISHER_LANG}') AS r,
                      (n_chars > {FISHER_LONG_CHARS}) AS c
               FROM documents),
    cells AS (SELECT
        CAST(SUM(CASE WHEN r AND c THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN r AND NOT c THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN NOT r AND c THEN 1 ELSE 0 END) AS BIGINT) AS cc,
        CAST(SUM(CASE WHEN NOT r AND NOT c THEN 1 ELSE 0 END) AS BIGINT) AS dd
      FROM d),
    m AS (SELECT a, b, cc, dd,
                 a + b AS r1, cc + dd AS r2, a + cc AS c1, b + dd AS c2,
                 a + b + cc + dd AS n
          FROM cells),
    base AS (SELECT *,
        {_FISHER_L.format(lf_r1=ln_fact_sql('r1'), lf_r2=ln_fact_sql('r2'),
                    lf_c1=ln_fact_sql('c1'), lf_c2=ln_fact_sql('c2'),
                    lf_n=ln_fact_sql('n'), lf_k=ln_fact_sql('a'),
                    lf_r1k=ln_fact_sql('(r1 - a)'),
                    lf_c1k=ln_fact_sql('(c1 - a)'),
                    lf_rest=ln_fact_sql('(n - r1 - c1 + a)'))} AS l_obs
      FROM m),
    ks AS (SELECT base.*, UNNEST(GENERATE_SERIES(
               GREATEST(0, r1 + c1 - n), LEAST(r1, c1))) AS k
           FROM base),
    probs AS (SELECT a, b, cc, dd, l_obs,
        EXP({_FISHER_L.format(lf_r1=ln_fact_sql('r1'), lf_r2=ln_fact_sql('r2'),
                        lf_c1=ln_fact_sql('c1'), lf_c2=ln_fact_sql('c2'),
                        lf_n=ln_fact_sql('n'), lf_k=ln_fact_sql('k'),
                        lf_r1k=ln_fact_sql('(r1 - k)'),
                        lf_c1k=ln_fact_sql('(c1 - k)'),
                        lf_rest=ln_fact_sql('(n - r1 - c1 + k)'))}) AS p
      FROM ks)
    SELECT a, b, CAST(cc AS BIGINT) AS c, CAST(dd AS BIGINT) AS d,
           FLOOR(EXP(l_obs) * 10000 + 0.5) / 10000 AS p_obs,
           FLOOR(SUM(CASE WHEN p <= EXP(l_obs) * (1 + {FISHER_TIE_EPS})
                          THEN p ELSE 0 END) * 10000 + 0.5) / 10000
             AS p_two_sided
    FROM probs GROUP BY a, b, cc, dd, l_obs
    """,
)
def stat_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's exact test on the 2×2 table (lang = '{FISHER_LANG}') ×
    (n_chars > {FISHER_LONG_CHARS}): two-sided p = Σ of hypergeometric
    probabilities ≤ the observed table's (with 1e-7 tie slack) — the
    correct independence test when chi2's expected-count-≥5 assumption
    fails. Probabilities come from `functions/special.ln_fact`, the
    SAME Stirling formula the oracle evaluates, so both engines agree
    bit-for-bit at the rounding grid.

    Scale: the corpus collapses to 4 counts in ONE partial-agg pass.
    The hypergeometric support (≤ min(r1, c1) terms) is exploded in
    TWO levels — a chunk-start sequence, repartitioned, then ≤{FISHER_CHUNK}
    inner terms per chunk — so no single task materializes a
    data-sized support; the final p is one more tiny aggregate. (For
    large-n tables chi2 is the right tool; this exists for the small
    cells chi2 can't handle.)"""
    docs = cat(spark, sf_dir)["documents"]
    d = docs.select(
        (F.col("lang") == FISHER_LANG).alias("r"),
        (F.col("n_chars") > FISHER_LONG_CHARS).alias("c"),
    )
    yes = lambda x: F.sum(F.when(x, 1).otherwise(0)).cast("bigint")  # noqa: E731
    cells = d.agg(
        yes(F.col("r") & F.col("c")).alias("a"),
        yes(F.col("r") & ~F.col("c")).alias("b"),
        yes(~F.col("r") & F.col("c")).alias("cc"),
        yes(~F.col("r") & ~F.col("c")).alias("dd"),
    )
    m = cells.select(
        "a",
        "b",
        "cc",
        "dd",
        (F.col("a") + F.col("b")).alias("r1"),
        (F.col("cc") + F.col("dd")).alias("r2"),
        (F.col("a") + F.col("cc")).alias("c1"),
        (F.col("b") + F.col("dd")).alias("c2"),
        (F.col("a") + F.col("b") + F.col("cc") + F.col("dd")).alias("n"),
    )

    def log_prob(k):
        return (
            ln_fact(F.col("r1"))
            + ln_fact(F.col("r2"))
            + ln_fact(F.col("c1"))
            + ln_fact(F.col("c2"))
            - ln_fact(F.col("n"))
            - ln_fact(k)
            - ln_fact(F.col("r1") - k)
            - ln_fact(F.col("c1") - k)
            - ln_fact(F.col("n") - F.col("r1") - F.col("c1") + k)
        )

    base = m.withColumn("l_obs", log_prob(F.col("a"))).withColumn(
        "klo", F.greatest(F.lit(0), F.col("r1") + F.col("c1") - F.col("n"))
    ).withColumn("khi", F.least("r1", "c1"))
    chunks = base.select(
        "*",
        F.explode(
            F.sequence(F.col("klo"), F.col("khi"), F.lit(FISHER_CHUNK))
        ).alias("k0"),
    ).repartition("k0")
    probs = chunks.select(
        "a",
        "b",
        "cc",
        "dd",
        "l_obs",
        F.explode(
            F.sequence(
                F.col("k0"),
                F.least(F.col("k0") + (FISHER_CHUNK - 1), F.col("khi")),
            )
        ).alias("k"),
        "r1",
        "r2",
        "c1",
        "c2",
        "n",
    ).withColumn("p", F.exp(log_prob(F.col("k"))))
    return probs.groupBy("a", "b", "cc", "dd", "l_obs").agg(
        F.sum(
            F.when(
                F.col("p") <= F.exp("l_obs") * (1 + FISHER_TIE_EPS), F.col("p")
            ).otherwise(0.0)
        ).alias("_pt")
    ).select(
        "a",
        "b",
        F.col("cc").cast("bigint").alias("c"),
        F.col("dd").cast("bigint").alias("d"),
        ratio(F.exp("l_obs")).alias("p_obs"),
        ratio(F.col("_pt")).alias("p_two_sided"),
    )


@query(
    "stat_bh_fdr",
    oracle=f"""
    WITH e AS (SELECT event_type,
                      (epoch_us(ts) // {DAY_US}) % 7 AS weekday,
                      CASE WHEN value > {BH_VALUE_THRESHOLD} THEN 1 ELSE 0 END
                        AS hi
               FROM events),
    cell AS (SELECT event_type, weekday,
                    CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(hi) AS BIGINT) AS k
             FROM e GROUP BY 1, 2),
    gl AS (SELECT CAST(SUM(hi) AS DOUBLE) / COUNT(*) AS p0 FROM e),
    zs AS (SELECT event_type, weekday, n, k,
                  ABS((CAST(k AS DOUBLE) / n - p0)
                      / SQRT(p0 * (1 - p0) / n)) AS az
           FROM cell, gl),
    ps AS (SELECT event_type, weekday, n, k,
                  2 * {normal_sf_sql('az')} AS p
           FROM zs),
    rk AS (SELECT *, CAST(ROW_NUMBER() OVER
                       (ORDER BY p, event_type, weekday) AS BIGINT) AS i,
                  CAST(COUNT(*) OVER () AS BIGINT) AS m
           FROM ps),
    adj AS (SELECT *, LEAST(1.0, MIN(p * m / i) OVER
                       (ORDER BY i DESC ROWS UNBOUNDED PRECEDING)) AS p_adj
            FROM rk)
    SELECT event_type, CAST(weekday AS BIGINT) AS weekday, n, k,
           FLOOR(p * 10000 + 0.5) / 10000 AS p,
           FLOOR(p_adj * 10000 + 0.5) / 10000 AS p_adj,
           (p_adj <= {BH_ALPHA}) AS reject
    FROM adj
    """,
)
def stat_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR correction across the (event_type ×
    weekday) grid of high-value-rate hypotheses: per-cell two-sided
    z-test against the global rate, then p_adj(i) = min_{{j≥i}}
    p(j)·m/j — the step every segment-sweep dashboard skips right
    before it ships a false positive (35 cells at α=.05 expect ~2 by
    chance). The normal tail is `functions/special.normal_sf`, the
    same polynomial the oracle runs. Weekday is pure epoch-day mod 7
    arithmetic so both engines bucket identically.

    Scale: events collapse to ≤ |types|×7 cells in one partial-agg
    pass; the BH windows order that MODEL-SIZED frame (bounded by the
    hypothesis grid, not the data), so the unpartitioned window is
    safe at any corpus size."""
    ev = cat(spark, sf_dir)["events"]
    e = ev.select(
        "event_type",
        (F.expr(f"unix_micros(ts) div {DAY_US}") % 7).alias("weekday"),
        F.when(F.col("value") > BH_VALUE_THRESHOLD, 1).otherwise(0).alias("hi"),
    )
    cell = e.groupBy("event_type", "weekday").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("hi").cast("bigint").alias("k"),
    )
    glob = e.agg(
        (F.sum("hi").cast("double") / F.count(F.lit(1))).alias("p0")
    )
    zs = cell.crossJoin(F.broadcast(glob)).withColumn(
        "az",
        F.abs(
            (F.col("k").cast("double") / F.col("n") - F.col("p0"))
            / F.sqrt(F.col("p0") * (1 - F.col("p0")) / F.col("n"))
        ),
    )
    ps = zs.withColumn("p", 2 * normal_sf(F.col("az")))
    w_rank = W.orderBy("p", "event_type", "weekday")
    rk = ps.withColumn(
        "i", F.row_number().over(w_rank).cast("bigint")
    ).withColumn("m", F.count(F.lit(1)).over(W.partitionBy()).cast("bigint"))
    w_suffix = W.orderBy(F.col("i").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    adj = rk.withColumn(
        "p_adj",
        F.least(
            F.lit(1.0), F.min(F.col("p") * F.col("m") / F.col("i")).over(w_suffix)
        ),
    )
    return adj.select(
        "event_type",
        F.col("weekday").cast("bigint").alias("weekday"),
        "n",
        "k",
        ratio(F.col("p")).alias("p"),
        ratio(F.col("p_adj")).alias("p_adj"),
        (F.col("p_adj") <= BH_ALPHA).alias("reject"),
    )


@query(
    "stat_durbin_watson",
    oracle=f"""
    WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
                                    CAST(o_orderdate AS DATE)) AS t,
                          CAST(FLOOR(SUM(o_totalprice) * 100 + 0.5) AS BIGINT)
                            AS y
                   FROM orders GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(t) AS DOUBLE) AS st, CAST(SUM(y) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(t AS HUGEINT) * y) AS DOUBLE) AS sty,
                 CAST(SUM(CAST(t AS HUGEINT) * t) AS DOUBLE) AS stt
          FROM daily),
    fit AS (SELECT n, (n * sty - st * sy) / (n * stt - st * st) AS slope,
                   (sy - (n * sty - st * sy) / (n * stt - st * st) * st) / n
                     AS icept
            FROM m),
    r AS (SELECT t, y - (slope * t + icept) AS e, n
          FROM daily, fit),
    l AS (SELECT e, LAG(e) OVER (ORDER BY t) AS ep, n FROM r)
    SELECT MAX(n) AS n_days,
           FLOOR((SELECT slope FROM fit) / 100 * 100 + 0.5) / 100 AS slope,
           FLOOR(SUM(CASE WHEN ep IS NULL THEN 0 ELSE (e - ep) * (e - ep) END)
                 / SUM(e * e) * 10000 + 0.5) / 10000 AS dw
    FROM l
    """,
)
def stat_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson serial-correlation diagnostic on the residuals of
    the daily-revenue-vs-time OLS fit: DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² — ≈2
    means independent residuals, →0 positive autocorrelation (the
    common case that makes stat_regression's standard errors
    fictitious), →4 negative. Moments are exact int64/int128 (cents ×
    epoch-day); the fit and DW are identical-formula doubles.

    Scale: orders collapse to the #days grid in one partial-agg pass;
    the OLS moments are a second tiny aggregate broadcast back; the
    single lag window orders the CALENDAR-BOUNDED day grid (≈2.6k rows
    for 7 years regardless of corpus size)."""
    orders = cat(spark, sf_dir)["orders"]
    daily = orders.groupBy(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).alias("t")
    ).agg(
        F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("y")
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("double").alias("st"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("t").cast("decimal(38,0)") * F.col("y"))
        .cast("double")
        .alias("sty"),
        F.sum(F.col("t").cast("decimal(38,0)") * F.col("t"))
        .cast("double")
        .alias("stt"),
    )
    nn = F.col("n").cast("double")
    slope = (nn * F.col("sty") - F.col("st") * F.col("sy")) / (
        nn * F.col("stt") - F.col("st") * F.col("st")
    )
    fit = m.select(
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("st")) / nn).alias("icept"),
    )
    r = daily.crossJoin(F.broadcast(fit)).select(
        "t",
        "n",
        "slope",
        (
            F.col("y").cast("double")
            - (F.col("slope") * F.col("t") + F.col("icept"))
        ).alias("e"),
    )
    lw = W.orderBy("t")
    l = r.withColumn("ep", F.lag("e").over(lw))
    num = F.sum(
        F.when(F.col("ep").isNull(), 0.0).otherwise(
            (F.col("e") - F.col("ep")) * (F.col("e") - F.col("ep"))
        )
    )
    return l.agg(
        F.max("n").alias("n_days"),
        money(F.max("slope") / 100).alias("slope"),
        ratio(num / F.sum(F.col("e") * F.col("e"))).alias("dw"),
    )


@query(
    "stat_partial_corr",
    oracle=f"""
    WITH d AS (SELECT epoch_us(ts) // {DAY_US} AS day,
        CAST(FLOOR(SUM(CASE WHEN event_type = 'purchase' THEN value
                       ELSE 0 END) * 100 + 0.5) AS BIGINT) AS x,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             AS BIGINT) AS y,
        CAST(COUNT(*) AS BIGINT) AS z
      FROM events GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        CAST(SUM(z) AS DOUBLE) AS sz,
        CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
        CAST(SUM(CAST(x AS HUGEINT) * z) AS DOUBLE) AS sxz,
        CAST(SUM(CAST(y AS HUGEINT) * z) AS DOUBLE) AS syz,
        CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
        CAST(SUM(CAST(z AS HUGEINT) * z) AS DOUBLE) AS szz
      FROM d),
    c AS (SELECT n,
        (n*sxy - sx*sy) / SQRT((n*sxx - sx*sx) * (n*syy - sy*sy)) AS rxy,
        (n*sxz - sx*sz) / SQRT((n*sxx - sx*sx) * (n*szz - sz*sz)) AS rxz,
        (n*syz - sy*sz) / SQRT((n*syy - sy*sy) * (n*szz - sz*sz)) AS ryz
      FROM m)
    SELECT n AS n_days,
           FLOOR(rxy * 10000 + 0.5) / 10000 AS r_xy,
           FLOOR(rxz * 10000 + 0.5) / 10000 AS r_xz,
           FLOOR(ryz * 10000 + 0.5) / 10000 AS r_yz,
           FLOOR((rxy - rxz * ryz)
                 / SQRT((1 - rxz*rxz) * (1 - ryz*ryz)) * 10000 + 0.5) / 10000
             AS r_partial
    FROM c
    """,
)
def stat_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation between daily purchase revenue
    (x) and daily error count (y) CONTROLLING for daily event volume
    (z): r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) — the
    confounder check stat_corr skips (busy days inflate both series,
    manufacturing correlation where none exists per-event). All nine
    moments are exact decimal(38)/int128 sums of int64 cents/counts,
    so partition order can't perturb the doubles both engines then
    derive identically.

    Scale: one partial-agg rollup to the day grid, one 9-moment
    aggregate to a single row — no window, no join, no second scan."""
    ev = cat(spark, sf_dir)["events"]
    d = (
        ev.select(
            F.expr(f"unix_micros(ts) div {DAY_US}").alias("day"),
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0.0)
            .alias("pv"),
            (F.col("event_type") == "error").cast("long").alias("ec"),
        )
        .groupBy("day")
        .agg(
            F.floor(F.sum("pv") * 100 + F.lit(0.5)).cast("long").alias("x"),
            F.sum("ec").cast("long").alias("y"),
            F.count(F.lit(1)).cast("long").alias("z"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("z").cast("double").alias("sz"),
        F.sum(dec("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(dec("x") * F.col("z")).cast("double").alias("sxz"),
        F.sum(dec("y") * F.col("z")).cast("double").alias("syz"),
        F.sum(dec("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(dec("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(dec("z") * F.col("z")).cast("double").alias("szz"),
    )
    nn = F.col("n").cast("double")

    def corr(sab, saa, sbb, sa, sb):
        return (nn * F.col(sab) - F.col(sa) * F.col(sb)) / F.sqrt(
            (nn * F.col(saa) - F.col(sa) * F.col(sa))
            * (nn * F.col(sbb) - F.col(sb) * F.col(sb))
        )

    c = m.select(
        "n",
        corr("sxy", "sxx", "syy", "sx", "sy").alias("rxy"),
        corr("sxz", "sxx", "szz", "sx", "sz").alias("rxz"),
        corr("syz", "syy", "szz", "sy", "sz").alias("ryz"),
    )
    return c.select(
        F.col("n").alias("n_days"),
        ratio(F.col("rxy")).alias("r_xy"),
        ratio(F.col("rxz")).alias("r_xz"),
        ratio(F.col("ryz")).alias("r_yz"),
        ratio(
            (F.col("rxy") - F.col("rxz") * F.col("ryz"))
            / F.sqrt(
                (1 - F.col("rxz") * F.col("rxz"))
                * (1 - F.col("ryz") * F.col("ryz"))
            )
        ).alias("r_partial"),
    )
