"""Wave 32: tolerance-bounded as-of joins, probability calibration
bins, and per-day uptime SLA from merged activity intervals.

The as-of tolerance is what production enrichment always carries (a
signup from three years ago should not claim a purchase); calibration
bins are the reliability diagram every deployed scorer is audited
with; uptime SLA turns raw events into the day-level coverage number
an on-call team is paged on. All three stay shuffle-lean: the as-of is
the union+window pattern, calibration is one 10-key rollup, and the
SLA merge splits intervals at day boundaries map-side so the island
merge runs PARTITIONED by day — never a global timeline sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

ASOF_TOL_US = 30 * 86400000000  # 30-day tolerance
DAY_US = 86400000000
SLA_PAD_US = 300_000_000  # each event marks 5 minutes of activity
CAL_POS_LABEL_LT = 5


@query(
    "j_asof_tolerance",
    oracle=f"""
    WITH j AS (
      SELECT p.event_id AS purchase_id, p.user_id,
             epoch_us(p.ts) AS purchase_us, epoch_us(s.ts) AS signup_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        ON p.user_id = s.user_id AND p.ts >= s.ts)
    SELECT purchase_id, user_id, purchase_us,
           CASE WHEN signup_us IS NOT NULL
                     AND purchase_us - signup_us <= {ASOF_TOL_US}
                THEN signup_us END AS signup_us,
           CAST(CASE WHEN signup_us IS NOT NULL
                          AND purchase_us - signup_us <= {ASOF_TOL_US}
                     THEN 1 ELSE 0 END AS BIGINT) AS matched
    FROM j
    """,
)
def j_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a MAX-GAP TOLERANCE (latest signup at-or-before
    each purchase, but only within 30 days — pandas merge_asof's
    `tolerance`, the guard production enrichment always carries so a
    years-stale dimension row can't claim a fresh fact). Same
    union+window single-shuffle plan as ev_asof_join; the tolerance is
    a map-side null-out of too-old matches, NOT a join-condition change
    — so the plan stays an equi-shuffle regardless of the bound.

    Scale: one shuffle on user_id, linear scan; no inequality join."""
    from mister_spark.operators.events import _ev

    ev = _ev(spark, sf_dir)
    both = ev.filter(F.col("event_type").isin("purchase", "signup")).select(
        "event_id",
        "user_id",
        "tus",
        F.when(F.col("event_type") == "signup", F.col("tus")).alias("sig_us"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("tus", "is_p")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    lastsig = both.withColumn("raw_sig", F.last("sig_us", ignorenulls=True).over(w))
    in_tol = F.col("raw_sig").isNotNull() & (
        F.col("tus") - F.col("raw_sig") <= ASOF_TOL_US
    )
    return lastsig.filter(F.col("is_p") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("tus").alias("purchase_us"),
        F.when(in_tol, F.col("raw_sig")).alias("signup_us"),
        F.when(in_tol, 1).otherwise(0).cast("bigint").alias("matched"),
    )


@query(
    "ml_calibration_bins",
    oracle=f"""
    WITH s AS (SELECT 1.0 / (1.0 + exp(-CAST(embedding[1] AS DOUBLE))) AS prob,
                      CASE WHEN label < {CAL_POS_LABEL_LT} THEN 1 ELSE 0 END
                        AS pos
               FROM embeddings),
    b AS (SELECT LEAST(CAST(FLOOR(prob * 10) AS BIGINT), 9) AS bin,
                 CAST(FLOOR(prob * 1000000 + 0.5) AS BIGINT) AS p6, pos
          FROM s),
    g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                 FLOOR(CAST(SUM(p6) AS DOUBLE) / COUNT(*) / 1000000
                       * 10000 + 0.5) / 10000 AS mean_pred,
                 FLOOR(CAST(SUM(pos) AS DOUBLE) / COUNT(*) * 10000 + 0.5)
                   / 10000 AS pos_rate
          FROM b GROUP BY 1)
    SELECT bin, n, mean_pred, pos_rate,
           FLOOR(ABS(mean_pred - pos_rate) * 10000 + 0.5) / 10000 AS gap
    FROM g
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for a probabilistic scorer (sigmoid of
    embedding dim 0 vs label < {CAL_POS_LABEL_LT}): per predicted-
    probability decile bin, the mean predicted probability vs the
    empirical positive rate and their gap — the per-bin terms of
    expected calibration error, the audit every deployed filter score
    gets. Probabilities are snapped to a 1e-6 integer grid BEFORE the
    per-bin mean, so the bin sums are exact int64 and engine summation
    order can't move the rounded outputs.

    Scale: one narrow map (sigmoid + bin), one 10-key partial-agg
    rollup — the shuffle moves ≤10 rows per map partition."""
    emb = cat(spark, sf_dir)["embeddings"]
    prob = 1.0 / (1.0 + F.exp(-F.element_at("embedding", 1).cast("double")))
    s = emb.select(
        prob.alias("prob"),
        F.when(F.col("label") < CAL_POS_LABEL_LT, 1).otherwise(0).alias("pos"),
    )
    b = s.select(
        F.least(F.floor(F.col("prob") * 10).cast("bigint"), F.lit(9)).alias("bin"),
        F.floor(F.col("prob") * 1000000 + F.lit(0.5)).cast("bigint").alias("p6"),
        "pos",
    )
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        rnd(F.sum("p6").cast("double") / F.count(F.lit(1)) / 1000000, 4).alias(
            "mean_pred"
        ),
        rnd(F.sum("pos").cast("double") / F.count(F.lit(1)), 4).alias("pos_rate"),
    )
    return g.select(
        "bin",
        "n",
        "mean_pred",
        "pos_rate",
        rnd(F.abs(F.col("mean_pred") - F.col("pos_rate")), 4).alias("gap"),
    )


@query(
    "ev_uptime_sla",
    oracle=f"""
    WITH s AS (SELECT epoch_us(ts) AS st, epoch_us(ts) + {SLA_PAD_US} AS en
               FROM events),
    pc AS (SELECT unnest(generate_series(st // {DAY_US}, (en - 1) // {DAY_US}))
                    AS day,
                  st, en
           FROM s),
    cl AS (SELECT day, GREATEST(st, day * {DAY_US}) AS st,
                  LEAST(en, (day + 1) * {DAY_US}) AS en
           FROM pc),
    m AS (SELECT day, st, en,
                 MAX(en) OVER (PARTITION BY day ORDER BY st, en
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS pmax
          FROM cl),
    fl AS (SELECT day, st, en,
                  CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END
                    AS isnew
           FROM m),
    isl AS (SELECT day, st, en,
                   SUM(isnew) OVER (PARTITION BY day ORDER BY st, en
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS island
            FROM fl),
    iv AS (SELECT day, island, MIN(st) AS istart, MAX(en) AS iend
           FROM isl GROUP BY 1, 2)
    SELECT CAST(day AS BIGINT) AS day,
           CAST(SUM(iend - istart) AS BIGINT) AS covered_us,
           FLOOR(CAST(SUM(iend - istart) AS DOUBLE) / {DAY_US} * 10000 + 0.5)
             / 10000 AS uptime
    FROM iv GROUP BY 1
    """,
)
def ev_uptime_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day service uptime: each event marks 5 minutes of observed
    activity, overlapping marks merge (interval union), and the merged
    coverage over each 24 h window is the day's SLA number — the
    'were we up' metric an on-call rotation is paged on.

    Scale: the classic global interval merge is a single timeline sort
    — instead every interval is SPLIT AT DAY BOUNDARIES map-side
    (≤2 pieces each, since the pad is ≪ 1 day), and the island merge
    runs in windows PARTITIONED by day: one shuffle on day, all days
    merge in parallel, identical union to the global sort."""
    ev = cat(spark, sf_dir)["events"]
    s = ev.select(
        F.expr("unix_micros(ts)").alias("st"),
        (F.expr("unix_micros(ts)") + SLA_PAD_US).alias("en"),
    )
    pc = s.select(
        F.explode(
            F.sequence(
                F.expr(f"st div {DAY_US}"), F.expr(f"(en - 1) div {DAY_US}")
            )
        ).alias("day"),
        "st",
        "en",
    )
    cl = pc.select(
        "day",
        F.greatest(F.col("st"), F.col("day") * DAY_US).alias("st"),
        F.least(F.col("en"), (F.col("day") + 1) * DAY_US).alias("en"),
    )
    wprev = (
        W.partitionBy("day").orderBy("st", "en").rowsBetween(W.unboundedPreceding, -1)
    )
    wrun = (
        W.partitionBy("day").orderBy("st", "en").rowsBetween(W.unboundedPreceding, 0)
    )
    fl = cl.withColumn("pmax", F.max("en").over(wprev)).withColumn(
        "isnew",
        F.when(F.col("pmax").isNull() | (F.col("st") > F.col("pmax")), 1).otherwise(0),
    )
    isl = fl.withColumn("island", F.sum("isnew").over(wrun))
    iv = isl.groupBy("day", "island").agg(
        F.min("st").alias("istart"), F.max("en").alias("iend")
    )
    cov = F.sum(F.col("iend") - F.col("istart"))
    return iv.groupBy("day").agg(
        cov.cast("bigint").alias("covered_us"),
        ratio(cov.cast("double") / DAY_US).alias("uptime"),
    ).select(F.col("day").cast("bigint").alias("day"), "covered_us", "uptime")
