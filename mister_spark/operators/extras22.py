"""Wave 22: per-source corpus governance, adoption curves, rate tests,
burstiness, and multiplicative price-band joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

BAND_PCT = 5  # ±5% price band
PROBE_MOD = 200


@query(
    "tx_source_quality",
    oracle=f"""
    WITH d AS (
      SELECT source, n_chars,
             CAST(len({DUCK_TOKENS}) AS BIGINT) AS n_toks,
             CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits
      FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           FLOOR(AVG(n_chars) * 100 + 0.5) / 100 AS avg_chars,
           FLOOR(AVG(n_toks) * 100 + 0.5) / 100 AS avg_tokens,
           FLOOR(AVG(CAST(n_digits AS DOUBLE) / n_chars) * 10000 + 0.5) / 10000
             AS digit_ratio
    FROM d GROUP BY 1
    """,
)
def tx_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health profile: document count, average
    length, token count, and digit density per crawl source — the
    scorecard that decides which sources get quota cuts
    (ds_quota_sample) or outright drops. All JVM expressions.

    Scale: one narrow map over documents + a |sources|-key aggregate;
    the per-doc metrics never shuffle."""
    docs = cat(spark, sf_dir)["documents"]
    d = docs.select(
        "source",
        "n_chars",
        F.size(tokens()).cast("long").alias("n_toks"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]"), F.lit(0)))
        .cast("long")
        .alias("n_digits"),
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        rnd(F.avg("n_chars"), 2).alias("avg_chars"),
        rnd(F.avg("n_toks"), 2).alias("avg_tokens"),
        ratio(F.avg(F.col("n_digits").cast("double") / F.col("n_chars"))).alias(
            "digit_ratio"
        ),
    )


@query(
    "ev_adoption_curve",
    oracle="""
    WITH fd AS (
      SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS first_day
      FROM events GROUP BY 1),
    daily AS (
      SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM fd GROUP BY 1)
    SELECT CAST(day AS BIGINT) AS day, n_new,
           CAST(SUM(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_users
    FROM daily
    """,
)
def ev_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User adoption curve: new users per day (first-ever event) and
    the cumulative user base — computed from per-user first days, so
    'running distinct count' never materializes a growing distinct
    state; it's a min-aggregate plus a prefix sum over ≤ #days rows.

    Scale: one user_id shuffle for the min, one tiny day rollup; the
    cumulative window runs on the calendar-sized frame."""
    ev = cat(spark, sf_dir)["events"]
    fd = ev.groupBy("user_id").agg(
        F.expr("min(unix_micros(ts) div 86400000000)").alias("first_day")
    )
    daily = fd.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        F.col("day").cast("long").alias("day"),
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("cum_users"),
    )


@query(
    "ev_rate_test",
    oracle="""
    WITH b AS (SELECT MIN(epoch_us(ts) // 86400000000) AS d0 FROM events),
    halves AS (
      SELECT event_type,
             CASE WHEN epoch_us(ts) // 86400000000 - b.d0 < 15
                  THEN 1 ELSE 2 END AS half
      FROM events, b),
    c AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM halves GROUP BY 1)
    SELECT event_type, c1, c2,
           FLOOR((CAST(c1 AS DOUBLE) - c2) / SQRT(CAST(c1 + c2 AS DOUBLE))
                 * 10000 + 0.5) / 10000 AS rate_z
    FROM c
    """,
)
def ev_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson rate comparison between the first and second 15-day
    halves of the corpus per event type: the conditional-binomial
    z ≈ (c₁−c₂)/√(c₁+c₂) that answers 'did this event's rate actually
    change' — the release-health check behind every deploy dashboard.

    Scale: one scalar (corpus start) broadcast, one 2×|types| count
    aggregate; integer counts until the final z."""
    ev = cat(spark, sf_dir)["events"]
    b = ev.agg(F.expr("min(unix_micros(ts) div 86400000000)").alias("d0"))
    halves = ev.join(F.broadcast(b)).select(
        "event_type",
        F.when(
            F.expr("unix_micros(ts) div 86400000000") - F.col("d0") < 15, 1
        )
        .otherwise(2)
        .alias("half"),
    )
    c = halves.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("half") == 2, 1).otherwise(0)).cast("long").alias("c2"),
    )
    z = (F.col("c1").cast("double") - F.col("c2")) / F.sqrt(
        (F.col("c1") + F.col("c2")).cast("double")
    )
    return c.select("event_type", "c1", "c2", rnd(z, 4).alias("rate_z"))


@query(
    "ev_burstiness",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             AVG(n) AS mu, SUM(CAST(n AS DOUBLE) * n) AS s2, SUM(n) AS s
      FROM daily GROUP BY 1)
    SELECT event_type, n_days,
           FLOOR(((s2 - s * s / n_days) / n_days) / mu * 10000 + 0.5) / 10000
             AS fano,
           FLOOR((SQRT((s2 - s * s / n_days) / n_days) - mu)
                 / (SQRT((s2 - s * s / n_days) / n_days) + mu)
                 * 10000 + 0.5) / 10000 AS burstiness
    FROM m
    """,
)
def ev_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness diagnostics of daily volumes per type: the Fano
    factor (variance/mean — 1 for a Poisson process, >1 overdispersed)
    and the Goh–Barabási burstiness index (σ−μ)/(σ+μ) ∈ (−1, 1). The
    one-row-per-type answer to 'is this traffic clumpy or steady',
    which decides whether rate alerts need seasonal baselines
    (ev_anomaly_seasonal) or a global threshold suffices.

    Scale: daily rollup shuffle + a |types|-row moment pass."""
    ev = cat(spark, sf_dir)["events"]
    daily = (
        ev.repartition("event_type")
        .groupBy("event_type", F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.avg("n").alias("mu"),
        F.sum(F.col("n").cast("double") * F.col("n")).alias("s2"),
        F.sum("n").alias("s"),
    )
    var = (F.col("s2") - F.col("s") * F.col("s") / F.col("n_days")) / F.col("n_days")
    sd = F.sqrt(var)
    return m.select(
        "event_type",
        "n_days",
        rnd(var / F.col("mu"), 4).alias("fano"),
        rnd((sd - F.col("mu")) / (sd + F.col("mu")), 4).alias("burstiness"),
    )


@query(
    "j_pct_band_join",
    oracle=f"""
    WITH probes AS (
      SELECT p_partkey AS probe_key, p_retailprice AS probe_price
      FROM part WHERE p_partkey % {PROBE_MOD} = 0)
    SELECT pr.probe_key, p.p_partkey AS match_key,
           FLOOR(p.p_retailprice * 100 + 0.5) / 100 AS match_price
    FROM probes pr JOIN part p
      ON p.p_partkey <> pr.probe_key
     AND p.p_retailprice >= pr.probe_price * {1 - BAND_PCT / 100}
     AND p.p_retailprice <= pr.probe_price * {1 + BAND_PCT / 100}
    """,
)
def j_pct_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative band join: parts priced within ±5% of each probe
    part — comparable-product matching. The oracle states the
    inequality join; the Spark plan grids prices into cells of width
    (5% of the corpus max price) so every ±5% band spans ≤ 3 cells:
    probes explode onto cell−1..cell+1, candidates equi-join on the
    cell, and the exact band predicate filters. Cell ids are integer
    arithmetic on cents — no float boundary to disagree on.

    Scale: same grid decomposition as the temporal joins
    (j_interval_overlap), applied to a value domain; fan-out fixed at
    3, shuffle keyed on the cell."""
    part = cat(spark, sf_dir)["part"]
    mx = part.agg(F.max("p_retailprice").alias("mx"))
    # integer-cent grid: width = ceil(5% of max price, in cents)
    part_c = part.join(F.broadcast(mx)).select(
        "p_partkey",
        "p_retailprice",
        (F.col("p_retailprice") * 100).cast("long").alias("cents"),
        F.ceil(F.col("mx") * 100 * BAND_PCT / 100).cast("long").alias("w"),
    )
    probes = part_c.filter(F.col("p_partkey") % PROBE_MOD == 0).select(
        F.col("p_partkey").alias("probe_key"),
        F.col("p_retailprice").alias("probe_price"),
        F.col("cents").alias("p_cents"),
        "w",
    )
    cands = part_c.select(
        F.col("p_partkey").alias("match_key"),
        F.col("p_retailprice").alias("match_price_raw"),
        (F.col("cents") / F.col("w")).cast("long").alias("cell"),
    )
    p_cells = probes.withColumn(
        "cell",
        F.explode(
            F.array(
                (F.col("p_cents") / F.col("w")).cast("long") - 1,
                (F.col("p_cents") / F.col("w")).cast("long"),
                (F.col("p_cents") / F.col("w")).cast("long") + 1,
            )
        ),
    )
    j = p_cells.join(cands, "cell").filter(
        (F.col("match_key") != F.col("probe_key"))
        & (F.col("match_price_raw") >= F.col("probe_price") * (1 - BAND_PCT / 100))
        & (F.col("match_price_raw") <= F.col("probe_price") * (1 + BAND_PCT / 100))
    )
    return j.select(
        "probe_key",
        "match_key",
        rnd(F.col("match_price_raw"), 2).alias("match_price"),
    )
