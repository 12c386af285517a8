"""Wave 147: first-session quality vs retention, and coding
efficiency.

ev_first_session_retention buckets users by their FIRST session's
event count and measures subsequent active days per bucket — the
activation curve behind 'aha moment' product decisions, computed
from the exact sessionize rule; tx_coding_efficiency compares the
corpus token distribution's entropy against fixed-length coding and
the actual character cost — the information-theoretic headroom that
says how much a tokenizer / compressor can still win.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

SESSION_GAP_US = 30 * 60 * 1_000_000


@query(
    "ev_first_session_retention",
    oracle=f"""
    WITH t AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id, ts
               FROM events),
    flagged AS (
      SELECT user_id, tus, event_id, ts,
             CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id
                                            ORDER BY tus, event_id)
                       > {SESSION_GAP_US}
                  OR LAG(tus) OVER (PARTITION BY user_id
                                    ORDER BY tus, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM t),
    sess AS (
      SELECT user_id, tus, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged),
    first_s AS (SELECT user_id,
                       CAST(COUNT(*) AS BIGINT) AS first_len,
                       MAX(tus) AS first_end
                FROM sess WHERE sess_id = 1 GROUP BY 1),
    later AS (SELECT s.user_id,
                     COUNT(DISTINCT CAST(date_trunc('day', s.ts) AS DATE))
                       AS later_days
              FROM sess s JOIN first_s f ON s.user_id = f.user_id
              WHERE s.tus > f.first_end
              GROUP BY 1),
    j AS (SELECT f.user_id,
                 CASE WHEN f.first_len = 1 THEN '1'
                      WHEN f.first_len <= 3 THEN '2-3'
                      ELSE '4+' END AS bucket,
                 COALESCE(l.later_days, 0) AS later_days
          FROM first_s f LEFT JOIN later l ON f.user_id = l.user_id)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS users,
           FLOOR(AVG(CAST(later_days AS DOUBLE)) * 10000 + 0.5) / 10000
             AS avg_later_active_days,
           FLOOR(AVG(CASE WHEN later_days > 0 THEN 1.0 ELSE 0 END)
                 * 10000 + 0.5) / 10000 AS any_return_rate
    FROM j GROUP BY 1
    """,
)
def ev_first_session_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activation curve: users bucketed by FIRST-session event count
    (1, 2–3, 4+) against their subsequent engagement (later active
    days, any-return rate). A rising curve is the quantitative case
    for onboarding investment; a flat one says the first session
    doesn't matter here — either way it's measured, not narrated.

    Scale: one sessionize exchange produces first-session stats and
    the later-activity rollup; the bucket report is 3 rows."""
    ev = cat(spark, sf_dir)["events"]
    t = ev.select(
        "user_id", F.unix_micros("ts").alias("tus"), "event_id", "ts"
    )
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    flagged = t.withColumn(
        "new_sess",
        F.when(
            (F.col("tus") - F.lag("tus").over(w) > SESSION_GAP_US)
            | F.lag("tus").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)),
    ).localCheckpoint()
    first_s = (
        sess.filter(F.col("sess_id") == 1)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("first_len"),
            F.max("tus").alias("first_end"),
        )
    )
    later = (
        sess.join(first_s, "user_id")
        .filter(F.col("tus") > F.col("first_end"))
        .groupBy("user_id")
        .agg(
            F.countDistinct(
                F.date_trunc("day", "ts").cast("date")
            ).alias("later_days")
        )
    )
    j = first_s.join(later, "user_id", "left").select(
        F.when(F.col("first_len") == 1, "1")
        .when(F.col("first_len") <= 3, "2-3")
        .otherwise("4+")
        .alias("bucket"),
        F.coalesce("later_days", F.lit(0)).alias("later_days"),
    )
    return j.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("users"),
        ratio(F.avg(F.col("later_days").cast("double"))).alias(
            "avg_later_active_days"
        ),
        ratio(
            F.avg(F.when(F.col("later_days") > 0, 1.0).otherwise(0.0))
        ).alias("any_return_rate"),
    )


@query(
    "tx_coding_efficiency",
    oracle=f"""
    WITH t AS (SELECT unnest({DUCK_TOKENS}) AS tok,
                      doc_id
               FROM documents),
    c AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(LENGTH(MIN(tok)) AS DOUBLE) AS chars
          FROM t GROUP BY 1),
    s AS (SELECT SUM(n) AS total,
                 CAST(COUNT(*) AS DOUBLE) AS vocab,
                 SUM(n * chars) AS total_chars
          FROM c),
    h AS (SELECT -SUM(c.n / s.total * LN(c.n / s.total)) / LN(2)
                   AS entropy_bits
          FROM c, s)
    SELECT CAST(s.vocab AS BIGINT) AS vocab,
           FLOOR(h.entropy_bits * 10000 + 0.5) / 10000
             AS entropy_bits_per_token,
           FLOOR(LN(s.vocab) / LN(2) * 10000 + 0.5) / 10000
             AS fixed_bits_per_token,
           FLOOR(s.total_chars / s.total * 8 * 10000 + 0.5) / 10000
             AS utf8_bits_per_token,
           FLOOR(h.entropy_bits / (s.total_chars / s.total * 8)
                 * 10000 + 0.5) / 10000 AS compression_floor
    FROM s, h
    """,
)
def tx_coding_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coding efficiency of the corpus: token-distribution entropy
    (the Shannon floor in bits/token) vs fixed-length vocab coding
    (log₂|V|) vs the actual UTF-8 character cost — the compression
    floor says what fraction of the raw bytes ANY entropy coder can
    reach, and the entropy-vs-fixed gap is what frequency-aware
    tokenization is worth. Pure information theory over one rollup.

    Scale: the token census is one shuffle to |vocab| rows; the
    summary is tiny-frame arithmetic."""
    t = cat(spark, sf_dir)["documents"].select(
        F.explode(tokens()).alias("tok")
    )
    c = t.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.length(F.min("tok")).cast("double").alias("chars"),
    )
    s = c.agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
        F.sum(F.col("n") * F.col("chars")).alias("total_chars"),
    )
    h = c.crossJoin(F.broadcast(s)).agg(
        (
            -F.sum(
                F.col("n")
                / F.col("total")
                * F.log(F.col("n") / F.col("total"))
            )
            / float(__import__("math").log(2))
        ).alias("entropy_bits"),
        F.first("vocab").alias("vocab"),
        F.first("total").alias("total"),
        F.first("total_chars").alias("total_chars"),
    )
    import math

    return h.select(
        F.col("vocab").cast("bigint").alias("vocab"),
        ratio(F.col("entropy_bits")).alias("entropy_bits_per_token"),
        ratio(F.log("vocab") / math.log(2)).alias(
            "fixed_bits_per_token"
        ),
        ratio(F.col("total_chars") / F.col("total") * 8).alias(
            "utf8_bits_per_token"
        ),
        ratio(
            F.col("entropy_bits")
            / (F.col("total_chars") / F.col("total") * 8)
        ).alias("compression_floor"),
    )
