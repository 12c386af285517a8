"""Wave 232: harmonic seasonality fitting and HLL error calibration.

ev_harmonic_regression fits the weekly cycle as signal, not
diagnosis: project daily volume onto the first two weekly harmonics
(DFT projections a_k = 2/n sum y cos, b_k = 2/n sum y sin),
reporting amplitude, PHASE (where in the week the peak sits) and
the R^2 of the two-harmonic reconstruction. ev_periodogram says "a
weekly cycle exists"; this hands the pipeline the actual curve to
subtract or forecast with. sketch_hll_error_curve builds a real
HyperLogLog from the repo's 60-bit md5 hash at four register sizes
(2^4..2^10), estimates distinct users with the full alpha_m +
linear-counting small-range correction, and scores each estimate
against the exact count and the theoretical 1.04/sqrt(m) error —
the calibration table that justifies choosing a register budget for
a 100 TB stream (dd_minhash_error_curve does this for Jaccard; this
is the cardinality twin).

Exactness: harmonic projections are shared closed-form sums on the
day frame; HLL buckets, rho values and register maxima are pure
integer bit arithmetic off the shared md5-60 hash, with the
estimator's float algebra on identical operands.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
HLL_BS = (4, 6, 8, 10)  # register bits: m = 16 .. 1024


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


@query(
    "ev_harmonic_regression",
    # Real oracle: day counts are integers, the cos/sin projections
    # and reconstruction SSE are the same closed forms over the
    # calendar-bounded frame (shared libm trig on identical
    # arguments), rounded on the grid.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t, CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(y) AS mu FROM d),
    proj AS (SELECT n.n, n.mu,
                    2 / n.n * SUM(y * COS(2 * PI() * t / 7)) AS a1,
                    2 / n.n * SUM(y * SIN(2 * PI() * t / 7)) AS b1,
                    2 / n.n * SUM(y * COS(4 * PI() * t / 7)) AS a2,
                    2 / n.n * SUM(y * SIN(4 * PI() * t / 7)) AS b2
             FROM d, n GROUP BY n.n, n.mu),
    res AS (SELECT p.n, p.mu, p.a1, p.b1, p.a2, p.b2,
                   SUM((d.y - p.mu
                        - p.a1 * COS(2 * PI() * d.t / 7)
                        - p.b1 * SIN(2 * PI() * d.t / 7)
                        - p.a2 * COS(4 * PI() * d.t / 7)
                        - p.b2 * SIN(4 * PI() * d.t / 7))
                       * (d.y - p.mu
                        - p.a1 * COS(2 * PI() * d.t / 7)
                        - p.b1 * SIN(2 * PI() * d.t / 7)
                        - p.a2 * COS(4 * PI() * d.t / 7)
                        - p.b2 * SIN(4 * PI() * d.t / 7))) AS sse,
                   SUM((d.y - p.mu) * (d.y - p.mu)) AS sst
            FROM d, proj p
            GROUP BY p.n, p.mu, p.a1, p.b1, p.a2, p.b2)
    SELECT CAST(n AS BIGINT) AS n_days,
           FLOOR(mu * 1e4 + 0.5) / 1e4 AS mean_level,
           FLOOR(SQRT(a1 * a1 + b1 * b1) * 1e4 + 0.5) / 1e4 AS amp_1,
           FLOOR(ATAN2(b1, a1) * 1e4 + 0.5) / 1e4 AS phase_1,
           FLOOR(SQRT(a2 * a2 + b2 * b2) * 1e4 + 0.5) / 1e4 AS amp_2,
           FLOOR(ATAN2(b2, a2) * 1e4 + 0.5) / 1e4 AS phase_2,
           FLOOR(CASE WHEN sst <= 0 THEN 0.0
                      ELSE 1 - sse / sst END * 1e4 + 0.5) / 1e4 AS r2
    FROM res
    """,
)
def ev_harmonic_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-harmonic weekly fit of daily volume by DFT projection:
    a_k = 2/n sum y cos(2 pi k t / 7), b_k likewise with sin, then
    amplitude/phase per harmonic and the R^2 of the reconstruction.
    The PHASE pins where in the week the peak falls (a forecaster's
    subtraction curve, not just a periodogram's detection), and
    amp_2 vs amp_1 reads the cycle's shape: a pure sinusoid vs a
    weekday/weekend square-ish wave.

    Scale: ONE day-grain count and two closed-form aggregation
    passes over the calendar-bounded frame — no FFT machinery, no
    iteration."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .localCheckpoint()
    )
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n"), F.avg("y").alias("mu"))
    tpi = 2 * math.pi / 7
    proj = d.crossJoin(F.broadcast(n)).agg(
        F.first("n").alias("n"), F.first("mu").alias("mu"),
        (2 / F.first("n") * F.sum(F.col("y") * F.cos(tpi * F.col("t")))).alias("a1"),
        (2 / F.first("n") * F.sum(F.col("y") * F.sin(tpi * F.col("t")))).alias("b1"),
        (2 / F.first("n") * F.sum(F.col("y") * F.cos(2 * tpi * F.col("t")))).alias("a2"),
        (2 / F.first("n") * F.sum(F.col("y") * F.sin(2 * tpi * F.col("t")))).alias("b2"),
    )
    fit = (
        F.col("mu")
        + F.col("a1") * F.cos(tpi * F.col("t"))
        + F.col("b1") * F.sin(tpi * F.col("t"))
        + F.col("a2") * F.cos(2 * tpi * F.col("t"))
        + F.col("b2") * F.sin(2 * tpi * F.col("t"))
    )
    res = d.crossJoin(F.broadcast(proj)).agg(
        F.first("n").alias("n"), F.first("mu").alias("mu"),
        F.first("a1").alias("a1"), F.first("b1").alias("b1"),
        F.first("a2").alias("a2"), F.first("b2").alias("b2"),
        F.sum((F.col("y") - fit) * (F.col("y") - fit)).alias("sse"),
        F.sum(
            (F.col("y") - F.col("mu")) * (F.col("y") - F.col("mu"))
        ).alias("sst"),
    )
    return res.select(
        F.col("n").cast("bigint").alias("n_days"),
        rnd(F.col("mu"), 4).alias("mean_level"),
        rnd(
            F.sqrt(F.col("a1") * F.col("a1") + F.col("b1") * F.col("b1")), 4
        ).alias("amp_1"),
        rnd(F.atan2(F.col("b1"), F.col("a1")), 4).alias("phase_1"),
        rnd(
            F.sqrt(F.col("a2") * F.col("a2") + F.col("b2") * F.col("b2")), 4
        ).alias("amp_2"),
        rnd(F.atan2(F.col("b2"), F.col("a2")), 4).alias("phase_2"),
        rnd(
            F.when(F.col("sst") <= 0, F.lit(0.0)).otherwise(
                1 - F.col("sse") / F.col("sst")
            ),
            4,
        ).alias("r2"),
    )


def _hll_oracle() -> str:
    per_b = []
    for b in HLL_BS:
        m = 1 << b
        per_b.append(f"""
    reg{b} AS (SELECT h % {m} AS bucket,
                      MAX(CASE WHEN (h // {m}) = 0 THEN {60 - b} + 1
                          ELSE {60 - b} - (LENGTH(bin(h // {m})) - 1)
                          END) AS rho
               FROM hh GROUP BY 1),
    full{b} AS (SELECT g.bucket, COALESCE(reg{b}.rho, 0) AS rho
                FROM (SELECT unnest(generate_series(0, {m - 1}))
                        AS bucket) g
                LEFT JOIN reg{b} ON reg{b}.bucket = g.bucket),
    est{b} AS (SELECT CAST({_alpha(m)!r} AS DOUBLE) * {m} * {m}
                      / SUM(POWER(2.0, -rho)) AS e_raw,
                      CAST(SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END)
                           AS DOUBLE) AS v
               FROM full{b}),
    out{b} AS (SELECT CAST({b} AS BIGINT) AS register_bits,
                      CAST({m} AS BIGINT) AS m,
                      CASE WHEN e_raw <= CAST(2.5 AS DOUBLE) * {m} AND v > 0
                           THEN {m} * LN({m} / v) ELSE e_raw END AS est
               FROM est{b})""")
    unions = "\nUNION ALL\n".join(
        f"SELECT register_bits, m, est FROM out{b}" for b in HLL_BS
    )
    return f"""
    WITH hh AS (SELECT CAST('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15)
                       AS BIGINT) AS h
                FROM (SELECT DISTINCT user_id AS u FROM events)),
    ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact FROM hh),
    {",".join(per_b)}
    SELECT u.register_bits, u.m,
           FLOOR(u.est * 10 + 0.5) / 10 AS estimate,
           ex.exact AS exact_distinct,
           FLOOR(ABS(u.est - ex.exact) / ex.exact * 1e4 + 0.5) / 1e4
             AS rel_error,
           FLOOR(1.04 / SQRT(u.m) * 1e4 + 0.5) / 1e4 AS theory_rse
    FROM ({unions}) u, ex
    """


@query("sketch_hll_error_curve", oracle=_hll_oracle())
def sketch_hll_error_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real HyperLogLog at four register budgets (m = 16..1024) over
    distinct users: 60-bit md5 hash, bucket = h mod m, register =
    max leading-zero rank of the remaining bits, estimate =
    alpha_m m^2 / sum 2^-M_j with the linear-counting small-range
    correction. Each row scores the estimate against the EXACT
    count and the theoretical 1.04/sqrt(m) relative standard error —
    the calibration that turns "approx_count_distinct is probably
    fine" into a measured register-budget decision
    (dd_minhash_error_curve's cardinality twin; the sketch itself
    is mergeable O(m) state per key at stream scale).

    Scale: one distinct-user pass (map-side combinable), then
    register folds on m-bounded frames; everything after the
    distinct is model-sized."""
    hh = (
        cat(spark, sf_dir)["events"]
        .select(F.col("user_id").alias("u"))
        .distinct()
        .select(
            F.conv(F.substring(F.md5(F.col("u").cast("string")), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h")
        )
        .localCheckpoint()  # feeds all four register sizes + exact
    )
    exact = hh.count()
    out = []
    for b in HLL_BS:
        m = 1 << b
        reg = (
            hh.select(
                (F.col("h") % m).alias("bucket"),
                # h div m: INTEGER division — float division would
                # lose low bits above 2^53
                F.when(F.expr(f"h div {m}") == 0, F.lit(60 - b + 1))
                .otherwise(
                    (60 - b)
                    - (F.length(F.bin(F.expr(f"h div {m}"))) - 1)
                )
                .alias("rho"),
            )
            .groupBy("bucket")
            .agg(F.max("rho").alias("rho"))
        )
        spine = spark.range(0, m).select(F.col("id").alias("bucket"))
        full = spine.join(reg, "bucket", "left").select(
            F.coalesce(F.col("rho"), F.lit(0)).alias("rho")
        )
        r = full.agg(
            F.sum(F.pow(2.0, -F.col("rho"))).alias("s"),
            F.sum(F.when(F.col("rho") == 0, 1).otherwise(0))
            .cast("double")
            .alias("v"),
        ).collect()[0]
        e_raw = _alpha(m) * m * m / r["s"]
        est = (
            m * math.log(m / r["v"])
            if (e_raw <= 2.5 * m and r["v"] > 0)
            else e_raw
        )
        g = lambda x, s_: math.floor(x * s_ + 0.5) / s_  # noqa: E731
        out.append(
            (
                b, m, g(est, 10), exact,
                g(abs(est - exact) / exact, 1e4),
                g(1.04 / math.sqrt(m), 1e4),
            )
        )
    return spark.createDataFrame(
        out,
        "register_bits long, m long, estimate double, "
        "exact_distinct long, rel_error double, theory_rse double",
    )
