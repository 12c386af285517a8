"""Wave 242: variance changepoints and Bloom-filter calibration.

stat_cusum_squares is the Inclan-Tiao CUSUM-of-SQUARES test: the
mean-shift family (ev_pettitt_test, ev_cusum_detect, ev_bocpd) is
blind to a series whose LEVEL holds while its VOLATILITY jumps; the
centered statistic D_k = C_k/C_n - k/n over cumulative squared
deviations peaks exactly where the variance regime changes, with the
asymptotic 1.358 sqrt(2/n) band as the detection line. The risk
question ("when did this metric get wild?") as one window pass.
sketch_bloom_fpr_curve builds real Bloom filters from the md5-60
hash family at four bits-per-key budgets, measures the FALSE
POSITIVE rate against a disjoint probe population, and prints it
beside the textbook (1 - e^(-kn/m))^k — the calibration table that
turns "add a Bloom filter" into a sized decision
(sketch_hll_error_curve's membership twin).

Exactness: squared deviations accumulate from exact day sums; Bloom
bit positions are integer arithmetic off the shared md5-60 hash and
false positives are exact integer counts; only the final ratios and
the theory column are floats, on the grid.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
BLOOM_BPK = (4, 8, 12, 16)  # bits per key
BLOOM_K = 3  # hash functions


@query(
    "stat_cusum_squares",
    # Real oracle: day counts are integers, squared deviations and
    # cumulative sums are identical closed forms, the argmax takes
    # the rounded |D| with earliest-day tiebreak, and the 1.358
    # asymptotic band is a shared literal.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t, CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    m AS (SELECT AVG(y) AS mu, CAST(COUNT(*) AS DOUBLE) AS n FROM d),
    sq AS (SELECT d.t, (d.y - m.mu) * (d.y - m.mu) AS s2,
                  ROW_NUMBER() OVER (ORDER BY d.t) AS k, m.n
           FROM d, m),
    cum AS (SELECT t, k, n,
                   SUM(s2) OVER (ORDER BY k) AS ck,
                   SUM(s2) OVER () AS cn
            FROM sq),
    dd AS (SELECT t, k, n, ck / cn - k / n AS dk FROM cum),
    mx AS (SELECT t, k, n, dk FROM dd
           ORDER BY FLOOR(ABS(dk) * 1e6 + 0.5) DESC, t LIMIT 1)
    SELECT CAST(mx.n AS BIGINT) AS n_days,
           strftime(DATE '{EPOCH}' + CAST(mx.t AS INT), '%Y-%m-%d')
             AS change_day,
           FLOOR(ABS(mx.dk) * 1e4 + 0.5) / 1e4 AS max_abs_d,
           FLOOR(1.358 * SQRT(2.0 / mx.n) * 1e4 + 0.5) / 1e4
             AS critical_band,
           CAST(CASE WHEN ABS(mx.dk) > 1.358 * SQRT(2.0 / mx.n)
                THEN 1 ELSE 0 END AS BIGINT) AS variance_break
    FROM mx
    """,
)
def stat_cusum_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclan-Tiao CUSUM-of-squares on daily volume: with C_k the
    cumulative squared deviation through day k, D_k = C_k/C_n - k/n
    drifts from zero exactly when the VARIANCE regime changes even if
    the mean never moves — the blind spot of every mean-shift
    detector in the registry. max|D| against the asymptotic
    1.358 sqrt(2/n) band flags the break and change_day localizes
    it. "When did this metric get noisy?" as one cumulative window.

    Scale: ONE day-grain count; the statistic is two windows over
    the calendar-bounded frame and one rounded argmax."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .localCheckpoint()
    )
    m = d.agg(F.avg("y").alias("mu"), F.count(F.lit(1)).cast("double").alias("n"))
    sq = d.crossJoin(F.broadcast(m)).select(
        "t",
        ((F.col("y") - F.col("mu")) * (F.col("y") - F.col("mu"))).alias("s2"),
        F.row_number().over(W.orderBy("t")).alias("k"),
        "n",
    )
    cum = sq.select(
        "t", "k", "n",
        F.sum("s2").over(W.orderBy("k").rowsBetween(W.unboundedPreceding, 0)).alias("ck"),
        F.sum("s2").over(W.partitionBy()).alias("cn"),
    )
    dd = cum.select(
        "t", "k", "n", (F.col("ck") / F.col("cn") - F.col("k") / F.col("n")).alias("dk")
    )
    mx = dd.orderBy(
        F.floor(F.abs(F.col("dk")) * 1e6 + 0.5).desc(), "t"
    ).limit(1)
    band = 1.358 * F.sqrt(2.0 / F.col("n"))
    return mx.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.date_format(
            F.date_add(F.lit(EPOCH).cast("date"), F.col("t").cast("int")),
            "yyyy-MM-dd",
        ).alias("change_day"),
        rnd(F.abs(F.col("dk")), 4).alias("max_abs_d"),
        rnd(band, 4).alias("critical_band"),
        F.when(F.abs(F.col("dk")) > band, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("variance_break"),
    )


def _bloom_oracle() -> str:
    per_b = []
    for bpk in BLOOM_BPK:
        # Kirsch-Mitzenmacher double hashing: bit_i = (h1 + i*h2)
        # mod m with INDEPENDENT md5 halves — a single-value affine
        # family degenerates into arithmetic progressions and leaks
        # far above the textbook FPR (measured before this fix)
        mem_hashes = "\n UNION ALL ".join(
            f"SELECT DISTINCT (mem.h + {i} * (mem.h2 % m{bpk}.m))"
            f" % m{bpk}.m AS bit FROM mem, m{bpk}"
            for i in range(BLOOM_K)
        )
        probe_hashes = "\n UNION ALL ".join(
            f"SELECT pr.h, (pr.h + {i} * (pr.h2 % m{bpk}.m))"
            f" % m{bpk}.m AS bit FROM probe pr, m{bpk}"
            for i in range(BLOOM_K)
        )
        per_b.append(f"""
    m{bpk} AS (SELECT CAST({bpk} AS BIGINT)
                 * (SELECT COUNT(*) FROM mem) AS m),
    bits{bpk} AS (SELECT DISTINCT bit FROM ({mem_hashes})),
    pp{bpk} AS (SELECT DISTINCT h, bit FROM ({probe_hashes})),
    agg{bpk} AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS need,
                        CAST(SUM(CASE WHEN bit IN
                             (SELECT bit FROM bits{bpk})
                             THEN 1 ELSE 0 END) AS BIGINT) AS nb
                 FROM pp{bpk} GROUP BY h),
    fp{bpk} AS (SELECT CAST(COUNT(*) AS BIGINT) AS probes,
                       CAST(SUM(CASE WHEN nb = need THEN 1 ELSE 0 END)
                            AS BIGINT) AS fps
                FROM agg{bpk}),
    out{bpk} AS (SELECT CAST({bpk} AS BIGINT) AS bits_per_key,
                        m{bpk}.m AS m_bits, fp{bpk}.probes, fp{bpk}.fps
                 FROM m{bpk}, fp{bpk})""")
    unions = "\nUNION ALL\n".join(
        f"SELECT bits_per_key, m_bits, probes, fps FROM out{bpk}"
        for bpk in BLOOM_BPK
    )
    return f"""
    WITH mem AS (SELECT CAST('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15)
                       AS BIGINT) AS h,
                        CAST('0x' || substr(md5(CAST(u AS VARCHAR)), 16, 15)
                       AS BIGINT) AS h2
                 FROM (SELECT DISTINCT user_id AS u FROM events)),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM mem),
    probe AS (SELECT CAST('0x' || substr(md5('probe:' ||
                     CAST(i AS VARCHAR)), 1, 15) AS BIGINT) AS h,
                     CAST('0x' || substr(md5('probe:' ||
                     CAST(i AS VARCHAR)), 16, 15) AS BIGINT) AS h2
              FROM (SELECT unnest(generate_series(1, 20000)) AS i)),
    {",".join(per_b)}
    SELECT u.bits_per_key, u.m_bits,
           FLOOR(CAST(u.fps AS DOUBLE) / u.probes * 1e6 + 0.5) / 1e6
             AS measured_fpr,
           FLOOR(POWER(1 - EXP(-CAST({BLOOM_K} AS DOUBLE) * nn.n
                 / u.m_bits), {BLOOM_K}) * 1e6 + 0.5) / 1e6
             AS theory_fpr
    FROM ({unions}) u, nn
    """


@query("sketch_bloom_fpr_curve", oracle=_bloom_oracle())
def sketch_bloom_fpr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter calibration: build filters over the distinct
    user-id population at {bpks} bits/key ({k} md5-family hashes),
    probe with 20k DISJOINT synthetic keys, and report the measured
    false-positive rate beside the textbook
    (1 - e^(-kn/m))^k. The table that converts "we should Bloom-gate
    that join" into an actual m/n budget with evidence — and the
    cross-engine-exact membership twin of sketch_hll_error_curve
    (sketch_bloom_contamination uses a filter; this SIZES one).

    Scale: membership bits are one distinct pass + k integer hashes
    (map-side); probes broadcast against the bit set. The filter
    itself is O(m) mergeable state at stream scale."""
    mem = (
        cat(spark, sf_dir)["events"]
        .select(F.col("user_id").alias("u"))
        .distinct()
        .select(
            F.conv(F.substring(F.md5(F.col("u").cast("string")), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h"),
            F.conv(F.substring(F.md5(F.col("u").cast("string")), 16, 15), 16, 10)
            .cast("bigint")
            .alias("h2"),
        )
        .localCheckpoint()
    )
    n = mem.count()
    probe = (
        mem.sparkSession.range(1, 20001)
        .select(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("probe:"), F.col("id").cast("string"))),
                    1, 15,
                ),
                16, 10,
            )
            .cast("bigint")
            .alias("h"),
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("probe:"), F.col("id").cast("string"))),
                    16, 15,
                ),
                16, 10,
            )
            .cast("bigint")
            .alias("h2"),
        )
        .localCheckpoint()
    )
    out = []
    g6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    for bpk in BLOOM_BPK:
        m = bpk * n
        bits = None
        for i in range(BLOOM_K):
            b = mem.select(
                ((F.col("h") + i * (F.col("h2") % m)) % m).alias("bit")
            )
            bits = b if bits is None else bits.unionByName(b)
        bitset = bits.distinct().localCheckpoint()
        ph = None
        for i in range(BLOOM_K):
            b = probe.select(
                "h", ((F.col("h") + i * (F.col("h2") % m)) % m).alias("bit")
            )
            ph = b if ph is None else ph.unionByName(b)
        hits = (
            ph.join(bitset.withColumnRenamed("bit", "bit"), "bit", "left_semi")
            .groupBy("h")
            .agg(F.countDistinct("bit").alias("nb"))
        )
        # a probe is a false positive iff ALL its k distinct bit
        # positions are set; probes whose k hashes collide to fewer
        # distinct positions need exactly that many hits
        pk = ph.groupBy("h").agg(F.countDistinct("bit").alias("need"))
        fp = (
            pk.join(hits, "h", "left")
            .select(
                (F.coalesce(F.col("nb"), F.lit(0)) == F.col("need"))
                .cast("int")
                .alias("isfp")
            )
            .agg(F.sum("isfp").alias("fps"), F.count(F.lit(1)).alias("probes"))
            .collect()[0]
        )
        theory = (1 - math.exp(-BLOOM_K * n / m)) ** BLOOM_K
        out.append(
            (
                bpk, m, g6(fp["fps"] / fp["probes"]), g6(theory),
            )
        )
    return mem.sparkSession.createDataFrame(
        out,
        "bits_per_key long, m_bits long, measured_fpr double, "
        "theory_fpr double",
    )


sketch_bloom_fpr_curve.__doc__ = sketch_bloom_fpr_curve.__doc__.format(
    bpks=BLOOM_BPK, k=BLOOM_K
)
