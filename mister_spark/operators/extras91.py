"""Wave 91: Python UDTF surface, content-defined chunking, conjugate
rate shrinkage, and the Theta forecaster.

sql_python_udtf exercises Spark's Python user-defined TABLE function
API (one input row → many output rows, registered and callable from
SQL) — the surface check, not a hot path; dd_cdc_chunking is
rsync/borg-style content-defined chunking: rolling-hash boundaries
split documents into chunks whose identity survives insertions, the
dedup mode fixed-size blocks can't express; stat_gamma_poisson is the
Gamma-Poisson conjugate posterior per event type — the Poisson-rate
twin of the repo's normal EB shrinkage, with credible intervals from
the shared Wilson-Hilferty tail; ev_theta_forecast is the Theta
method (SES on the theta-line + half the linear drift), the
embarrassingly simple M3-competition winner, backtested against the
held-out final week.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.hashing import FP_MOD, FP_MUL
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

CDC_W = 4  # rolling-hash window (tokens)
CDC_MASK = 16  # boundary when hash % CDC_MASK == 0 → ~16-token chunks
GP_PRIOR_A = 2.0  # Gamma prior shape
GP_PRIOR_B = 1.0  # Gamma prior rate (per user-day exposure)
THETA_H = 7  # held-out horizon (days)
SES_ALPHA = 0.3

MILESTONES = (0.25, 0.5, 0.75, 1.0)


@query(
    "sql_python_udtf",
    oracle=f"""
    SELECT o.o_orderkey AS o_orderkey, m.pct,
           FLOOR(o.o_totalprice * m.pct * 100 + 0.5) / 100 AS amount
    FROM orders o,
         (VALUES {", ".join(f"({p})" for p in MILESTONES)}) AS m(pct)
    WHERE o.o_totalprice > 400000
    """,
)
def sql_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface: a table function expanding each qualifying
    order into its payment-milestone schedule (25/50/75/100%), created
    with @udtf, registered, and invoked FROM SQL with a lateral join —
    the one-row-to-many-rows API that plain UDFs can't express.

    Scale note: Python UDTFs run rows through the Python worker
    (BatchEvalPythonUDTF) — this op pins the API surface; the
    equivalent hot path stays JVM-side (explode over a literal array,
    exactly what the oracle does)."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pct double, amount double")
    class Milestones:
        def eval(self, totalprice: float):
            for p in MILESTONES:
                import math

                yield p, math.floor(totalprice * p * 100 + 0.5) / 100

    spark.udtf.register("order_milestones", Milestones)
    orders = cat(spark, sf_dir)["orders"]
    orders.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey", "o_totalprice"
    ).createOrReplaceTempView("_udtf_orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, m.pct, m.amount
        FROM _udtf_orders o,
             LATERAL order_milestones(o.o_totalprice) m
        """
    )


@query(
    "dd_cdc_chunking",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, i AS pos,
             (ASCII(toks[i]) * 131 + LENGTH(toks[i])) AS code
      FROM (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents) d,
           generate_series(1, 4096) s(i)
      WHERE i <= len(toks)),
    rh AS (
      SELECT doc_id, pos, code,
             ((((LAG(code, 3) OVER w * {FP_MUL} + LAG(code, 2) OVER w)
                % {FP_MOD}) * {FP_MUL} + LAG(code, 1) OVER w)
              % {FP_MOD} * {FP_MUL} + code) % {FP_MOD} AS h
      FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    b AS (
      SELECT doc_id, pos, code,
             CASE WHEN pos >= {CDC_W} AND h % {CDC_MASK} = 0
                  THEN 1 ELSE 0 END AS boundary
      FROM rh),
    cid AS (
      SELECT doc_id, pos, code,
             SUM(boundary) OVER (PARTITION BY doc_id ORDER BY pos) AS chunk
      FROM b),
    fp AS (
      SELECT doc_id, chunk, COUNT(*) AS clen,
             STRING_AGG(CAST(code AS VARCHAR), ',' ORDER BY pos) AS sig
      FROM cid GROUP BY 1, 2)
    SELECT CAST(COUNT(*) AS BIGINT) AS total_chunks,
           CAST(COUNT(DISTINCT sig) AS BIGINT) AS distinct_chunks,
           CAST(COUNT(*) - COUNT(DISTINCT sig) AS BIGINT) AS dup_chunks,
           FLOOR(CAST(COUNT(*) - COUNT(DISTINCT sig) AS DOUBLE) / COUNT(*)
                 * 10000 + 0.5) / 10000 AS dup_ratio,
           FLOOR(AVG(clen) * 10000 + 0.5) / 10000 AS avg_chunk_len
    FROM fp
    """,
)
def dd_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup: a {w}-token rolling polynomial
    hash marks a chunk boundary wherever hash % {m} == 0, so chunk
    boundaries move WITH the content — insert a word and only the
    local chunk changes, unlike fixed-size blocks where everything
    downstream shifts. Reports the chunk-level duplication profile
    (the dedupable fraction a CDC store would reclaim).

    Scale: tokens explode once and every window is PARTITIONED by
    doc_id (per-doc frames, the sessionize partitioning); the chunk
    signature is an integer-code join key — in production xxhash64 of
    it (dd_exact's trick); the string form here keeps the oracle
    exact."""
    docs = cat(spark, sf_dir)["documents"]
    tok = docs.select(
        "doc_id", F.posexplode(tokens()).alias("pos0", "tk")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        (F.ascii("tk") * 131 + F.length("tk")).cast("long").alias("code"),
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    h = (
        (
            (F.lag("code", 3).over(w) * FP_MUL + F.lag("code", 2).over(w))
            % FP_MOD
        )
        * FP_MUL
        + F.lag("code", 1).over(w)
    ) % FP_MOD * FP_MUL + F.col("code")
    rh = tok.withColumn("h", h % FP_MOD)
    b = rh.withColumn(
        "boundary",
        F.when(
            (F.col("pos") >= CDC_W) & (F.col("h") % CDC_MASK == 0), 1
        ).otherwise(0),
    )
    cid = b.withColumn("chunk", F.sum("boundary").over(w))
    ch = cid.groupBy("doc_id", "chunk").agg(
        F.count(F.lit(1)).alias("clen"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "code"))),
                lambda s: s["code"].cast("string"),
            ),
            ",",
        ).alias("sig"),
    )
    return ch.agg(
        F.count(F.lit(1)).cast("bigint").alias("total_chunks"),
        F.countDistinct("sig").cast("bigint").alias("distinct_chunks"),
        (F.count(F.lit(1)) - F.countDistinct("sig"))
        .cast("bigint")
        .alias("dup_chunks"),
        ratio(
            (F.count(F.lit(1)) - F.countDistinct("sig")).cast("double")
            / F.count(F.lit(1))
        ).alias("dup_ratio"),
        ratio(F.avg("clen")).alias("avg_chunk_len"),
    )


dd_cdc_chunking.__doc__ = dd_cdc_chunking.__doc__.format(w=CDC_W, m=CDC_MASK)


@query(
    "stat_gamma_poisson",
    oracle=f"""
    WITH dd AS (SELECT CAST(COUNT(DISTINCT CAST(date_trunc('day', ts)
                                                AS DATE)) AS DOUBLE) AS days
                FROM events),
    g AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS k FROM events
          GROUP BY 1),
    p AS (SELECT g.event_type, g.k, dd.days,
                 {GP_PRIOR_A} + g.k AS a, {GP_PRIOR_B} + dd.days AS b
          FROM g, dd)
    SELECT event_type,
           FLOOR(k / days * 10000 + 0.5) / 10000 AS mle_rate,
           FLOOR(a / b * 10000 + 0.5) / 10000 AS posterior_rate,
           FLOOR((a / b) * POW(GREATEST(1 - 1.0 / (9 * a)
                 - 1.959964 / (3 * SQRT(a)), 0), 3) * 10000 + 0.5) / 10000
             AS ci_lo,
           FLOOR((a / b) * POW(1 - 1.0 / (9 * a)
                 + 1.959964 / (3 * SQRT(a)), 3) * 10000 + 0.5) / 10000
             AS ci_hi
    FROM p
    """,
)
def stat_gamma_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gamma-Poisson conjugate posterior for per-day event rates by
    type: prior Gamma({a}, {b}) + observed (k events over d days) →
    posterior Gamma({a}+k, {b}+d), reported as posterior mean and a
    95% credible interval via the Wilson–Hilferty cube-root gamma
    quantile (the engine-shared approximation — see stat_ljung_box).
    The Poisson-rate twin of stat_eb_shrinkage: small-count types get
    pulled toward the prior, and the CI says by how much to trust it.

    Scale: one rollup to |types| rows plus a 1-row day count; the
    posterior is per-row arithmetic."""
    ev = cat(spark, sf_dir)["events"]
    dd = ev.agg(
        F.countDistinct(F.date_trunc("day", "ts").cast("date"))
        .cast("double")
        .alias("days")
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("k")
    )
    p = g.crossJoin(F.broadcast(dd)).select(
        "event_type",
        "k",
        "days",
        (F.lit(GP_PRIOR_A) + F.col("k")).alias("a"),
        (F.lit(GP_PRIOR_B) + F.col("days")).alias("b"),
    )
    z = 1.959964
    wh_lo = F.pow(
        F.greatest(
            1 - 1.0 / (9 * F.col("a")) - z / (3 * F.sqrt(F.col("a"))),
            F.lit(0.0),
        ),
        3,
    )
    wh_hi = F.pow(1 - 1.0 / (9 * F.col("a")) + z / (3 * F.sqrt(F.col("a"))), 3)
    pm = F.col("a") / F.col("b")
    return p.select(
        "event_type",
        ratio(F.col("k") / F.col("days")).alias("mle_rate"),
        ratio(pm).alias("posterior_rate"),
        ratio(pm * wh_lo).alias("ci_lo"),
        ratio(pm * wh_hi).alias("ci_hi"),
    )


stat_gamma_poisson.__doc__ = stat_gamma_poisson.__doc__.format(
    a=GP_PRIOR_A, b=GP_PRIOR_B
)


def theta_series(spark: SparkSession, sf_dir: str):
    """Daily event-count series, ascending (calendar-bounded)."""
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
    return [int(r["day"]) for r in rows], [float(r["y"]) for r in rows]


@query(
    "ev_theta_forecast",
    # Real oracle: the SES recursion over the theta line has the
    # closed form level_T = α·Σ_{{i≥2}}(1−α)^(T−i)·θ_i +
    # (1−α)^(T−1)·θ_1, so train OLS drift + level + held-out forecast
    # are all plain aggregates; h = min(H, max(n−3, 0)) mirrors the
    # Spark guard.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS day,
                      CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    hh AS (SELECT LEAST({THETA_H}, GREATEST(COUNT(*) - 3, 0)) AS h,
                  COUNT(*) AS n
           FROM d),
    idx AS (SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS i FROM d),
    tr AS (SELECT i, y FROM idx CROSS JOIN hh WHERE i <= n - h),
    st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t,
                  (CAST(COUNT(*) AS DOUBLE) + 1) / 2 AS tbar,
                  SUM(y) / CAST(COUNT(*) AS DOUBLE) AS ybar
           FROM tr),
    sl AS (SELECT CASE WHEN SUM((i - st.tbar) * (i - st.tbar)) = 0
                       THEN 0.0
                       ELSE SUM((i - st.tbar) * (y - st.ybar))
                            / SUM((i - st.tbar) * (i - st.tbar)) END AS slope
           FROM tr CROSS JOIN st),
    lv AS (SELECT SUM(CASE WHEN q.i = 1
                           THEN POWER(1 - {SES_ALPHA}, st.t - 1) * q.th
                           ELSE {SES_ALPHA}
                                * POWER(1 - {SES_ALPHA}, st.t - q.i)
                                * q.th END) AS level
           FROM (SELECT i,
                        2 * y - (st.ybar + sl.slope * (i - st.tbar)) AS th
                 FROM tr CROSS JOIN st CROSS JOIN sl) q
           CROSS JOIN st)
    SELECT CAST(x.day AS BIGINT) AS day,
           FLOOR(x.y * 100 + 0.5) / 100 AS actual,
           FLOOR((0.5 * (lv.level
                         + st.ybar
                         + sl.slope * (x.i - st.tbar))) * 100 + 0.5) / 100
             AS forecast,
           FLOOR(CASE WHEN x.y = 0 THEN 0.0
                      ELSE ABS(0.5 * (lv.level
                                      + st.ybar
                                      + sl.slope * (x.i - st.tbar)) - x.y)
                           / ABS(x.y) END * 10000 + 0.5) / 10000 AS ape
    FROM idx x CROSS JOIN hh CROSS JOIN st CROSS JOIN sl CROSS JOIN lv
    WHERE x.i > hh.n - hh.h
    """,
)
def ev_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method forecast of daily event volume: train on all but
    the last {h} days, forecast the held-out week as SES(α={a}) of the
    theta=2 line plus half the fitted linear drift — the deceptively
    simple combination that won M3. Emits per-held-out-day actual vs
    forecast with the absolute percentage error, so the op IS its own
    backtest (compare ev_snaive_backtest for the seasonal-naive bar).

    Scale: the rollup is one partial-agg shuffle; the SES recursion
    runs on the collected |days| series (calendar-bounded, the DTW/
    control-chart precedent)."""
    days, ys = theta_series(spark, sf_dir)
    n = len(ys)
    h = min(THETA_H, max(n - 3, 0))
    train, test = ys[: n - h], ys[n - h :]
    t_n = len(train)
    # linear drift (OLS slope over 1..t_n)
    tbar = (t_n + 1) / 2
    ybar = sum(train) / t_n
    sxy = sum((i + 1 - tbar) * (y - ybar) for i, y in enumerate(train))
    sxx = sum((i + 1 - tbar) ** 2 for i in range(t_n))
    slope = sxy / sxx if sxx else 0.0
    # SES on the theta=2 line: 2*y - trend
    level = None
    for i, y in enumerate(train):
        theta_y = 2 * y - (ybar + slope * (i + 1 - tbar))
        level = theta_y if level is None else SES_ALPHA * theta_y + (
            1 - SES_ALPHA
        ) * level
    import math

    # cross-engine floor rounding (common.rnd's rule) so the row values
    # hash-match the closed-form oracle bit-for-bit
    r2 = lambda x: math.floor(x * 100 + 0.5) / 100  # noqa: E731
    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
    rows = []
    for j, actual in enumerate(test, start=1):
        fc = 0.5 * (level + (ybar + slope * (t_n + j - tbar)))
        ape = abs(fc - actual) / abs(actual) if actual else 0.0
        rows.append((days[t_n + j - 1], r2(actual), r2(fc), r4(ape)))
    return spark.createDataFrame(
        rows, "day long, actual double, forecast double, ape double"
    )


ev_theta_forecast.__doc__ = ev_theta_forecast.__doc__.format(
    h=THETA_H, a=SES_ALPHA
)
