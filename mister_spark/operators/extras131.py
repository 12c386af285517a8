"""Wave 131: weight-of-evidence scoring, velocity rules, and source
similarity.

ml_woe_iv computes per-decile Weight of Evidence and the total
Information Value for predicting segment membership from balance —
the credit-scoring vocabulary (IV < 0.02: useless; > 0.3: strong)
that makes feature screening a shared language; ev_velocity_rule
simulates 'N events within M minutes' fraud velocity rules with
per-user time-range windows and reports trip rates per threshold;
tx_source_similarity ranks source pairs by bigram Jensen–Shannon
divergence — the merge-these-sources / these-differ evidence for
corpus governance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, bigrams, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

WOE_BINS = 10
VEL_WINDOW_MIN = 30
VEL_THRESHOLDS = (3, 5, 8)
SRC_TOP = 10


@query(
    "ml_woe_iv",
    oracle=f"""
    WITH d AS (SELECT c_acctbal AS x,
                      CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
                        AS y
               FROM customer),
    rng AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM d),
    b AS (SELECT LEAST(CAST(FLOOR((x - rng.lo) / ((rng.hi - rng.lo)
                                  / {WOE_BINS} + 1e-9)) AS BIGINT),
                       {WOE_BINS} - 1) AS bin, y
          FROM d, rng),
    g AS (SELECT bin, CAST(SUM(y) AS DOUBLE) + 0.5 AS pos,
                 CAST(SUM(1 - y) AS DOUBLE) + 0.5 AS neg
          FROM b GROUP BY 1),
    t AS (SELECT SUM(pos) AS tp, SUM(neg) AS tn FROM g),
    w AS (SELECT g.bin, g.pos, g.neg,
                 LN((g.pos / t.tp) / (g.neg / t.tn)) AS woe,
                 (g.pos / t.tp - g.neg / t.tn)
                   * LN((g.pos / t.tp) / (g.neg / t.tn)) AS iv_term
          FROM g, t)
    SELECT bin,
           CAST(pos - 0.5 AS BIGINT) AS positives,
           CAST(neg - 0.5 AS BIGINT) AS negatives,
           FLOOR(woe * 10000 + 0.5) / 10000 AS woe,
           FLOOR((SELECT SUM(iv_term) FROM w) * 10000 + 0.5) / 10000
             AS total_iv
    FROM w
    """,
)
def ml_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of Evidence + Information Value: balance deciles scored
    against BUILDING-segment membership — WOE(b) = ln(P(b|pos)/
    P(b|neg)) (Laplace-smoothed) per bin and the total IV. The
    credit-risk screening scale (IV < 0.02 useless, 0.1–0.3 medium,
    > 0.3 strong) turns 'is this feature predictive' into a number
    with industry-calibrated thresholds; segment is balance-
    independent here, so a near-zero IV is the asserted read.

    Scale: binning is map-side against a broadcast range; WOE/IV are
    {b}-row arithmetic."""
    d = cat(spark, sf_dir)["customer"].select(
        F.col("c_acctbal").alias("x"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias(
            "y"
        ),
    )
    rng = d.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    b = d.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.floor(
                (F.col("x") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / WOE_BINS + 1e-9)
            ).cast("bigint"),
            F.lit(WOE_BINS - 1),
        ).alias("bin"),
        "y",
    )
    g = b.groupBy("bin").agg(
        (F.sum("y").cast("double") + 0.5).alias("pos"),
        (F.sum(1 - F.col("y")).cast("double") + 0.5).alias("neg"),
    )
    t = g.agg(F.sum("pos").alias("tp"), F.sum("neg").alias("tn"))
    w = g.crossJoin(F.broadcast(t)).withColumn(
        "woe",
        F.log(
            (F.col("pos") / F.col("tp")) / (F.col("neg") / F.col("tn"))
        ),
    ).withColumn(
        "iv_term",
        (F.col("pos") / F.col("tp") - F.col("neg") / F.col("tn"))
        * F.col("woe"),
    ).localCheckpoint()
    iv = w.agg(F.sum("iv_term").alias("iv"))
    return w.crossJoin(F.broadcast(iv)).select(
        "bin",
        (F.col("pos") - 0.5).cast("bigint").alias("positives"),
        (F.col("neg") - 0.5).cast("bigint").alias("negatives"),
        ratio(F.col("woe")).alias("woe"),
        ratio(F.col("iv")).alias("total_iv"),
    )


ml_woe_iv.__doc__ = ml_woe_iv.__doc__.format(b=WOE_BINS)


@query(
    "ev_velocity_rule",
    oracle=f"""
    WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
    c AS (SELECT user_id, event_id,
                 COUNT(*) OVER (PARTITION BY user_id ORDER BY tus
                                RANGE BETWEEN {VEL_WINDOW_MIN * 60_000_000}
                                PRECEDING AND CURRENT ROW) AS cnt
          FROM t)
    SELECT v.th AS threshold,
           CAST(SUM(CASE WHEN c.cnt >= v.th THEN 1 ELSE 0 END) AS BIGINT)
             AS events_flagged,
           CAST(COUNT(DISTINCT CASE WHEN c.cnt >= v.th
                                    THEN c.user_id END) AS BIGINT)
             AS users_flagged
    FROM c, (VALUES {", ".join(f"({t})" for t in VEL_THRESHOLDS)}) v(th)
    GROUP BY 1
    """,
)
def ev_velocity_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity-rule simulation: for each threshold N, how many
    events (and distinct users) trip 'N or more events within
    {m} minutes' — the fraud/abuse rule family, priced on real
    traffic BEFORE it pages anyone. The trailing count uses a
    time-RANGE window per user, the exact semantics a streaming rule
    engine applies.

    Scale: ONE shuffle on user_id; the range window is per-user
    local; the threshold sweep is a 3-row broadcast."""
    ev = cat(spark, sf_dir)["events"]
    t = ev.select(
        "user_id", "event_id", F.unix_micros("ts").alias("tus")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-VEL_WINDOW_MIN * 60_000_000, 0)
    )
    c = t.withColumn("cnt", F.count(F.lit(1)).over(w))
    ths = spark.createDataFrame([(x,) for x in VEL_THRESHOLDS], "th int")
    return (
        c.crossJoin(F.broadcast(ths))
        .groupBy("th")
        .agg(
            F.sum((F.col("cnt") >= F.col("th")).cast("long"))
            .cast("bigint")
            .alias("events_flagged"),
            F.countDistinct(
                F.when(F.col("cnt") >= F.col("th"), F.col("user_id"))
            )
            .cast("bigint")
            .alias("users_flagged"),
        )
        .select(
            F.col("th").cast("bigint").alias("threshold"),
            "events_flagged",
            "users_flagged",
        )
    )


ev_velocity_rule.__doc__ = ev_velocity_rule.__doc__.format(
    m=VEL_WINDOW_MIN
)


@query(
    "tx_source_similarity",
    oracle=f"""
    WITH t AS (SELECT source, {DUCK_TOKENS} AS toks FROM documents),
    bg AS (SELECT source, toks[i] || ' ' || toks[i+1] AS g
           FROM t, generate_series(1, 4096) s(i)
           WHERE i <= len(toks) - 1),
    cnt AS (SELECT source, g, CAST(COUNT(*) AS DOUBLE) AS c
            FROM bg GROUP BY 1, 2),
    tot AS (SELECT source, SUM(c) AS n FROM cnt GROUP BY 1),
    p AS (SELECT cnt.source, cnt.g, cnt.c / tot.n AS p
          FROM cnt JOIN tot ON cnt.source = tot.source),
    pair AS (SELECT a.source AS sa, b.source AS sb,
                    a.p AS pa, b.p AS pb
             FROM p a JOIN p b
               ON a.g = b.g AND a.source < b.source),
    shared AS (SELECT sa, sb,
                  SUM(0.5 * pa * LN(pa / ((pa + pb) / 2)))
                  + SUM(0.5 * pb * LN(pb / ((pa + pb) / 2))) AS js_shared,
                  SUM(pa) AS mass_a, SUM(pb) AS mass_b
               FROM pair GROUP BY 1, 2),
    js AS (SELECT sa, sb,
                  js_shared
                  + 0.5 * LN(2) * ((1 - mass_a) + (1 - mass_b)) AS jsd
           FROM shared)
    SELECT sa AS source_a, sb AS source_b,
           FLOOR(jsd * 10000 + 0.5) / 10000 AS jsd
    FROM js
    ORDER BY FLOOR(jsd * 10000 + 0.5) / 10000, sa, sb
    LIMIT {SRC_TOP}
    """,
)
def tx_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source textual similarity: bigram-distribution Jensen–Shannon
    divergence for every source pair, the {k} CLOSEST pairs reported
    — near-zero JSD pairs are candidates for merging (or evidence of
    one feed mirrored under two names); large-JSD sources genuinely
    diversify the mixture.

    Scale: per-source bigram distributions are one rollup; the pair
    join goes through the shared bigram key (an inverted-index join,
    |sources|² only in the tiny output); JSD reduces per pair.
    Bigrams unique to one side enter through the closed-form residual
    mass (0.5·ln2·(1−shared mass)), so the JSD is exact without a full
    outer join."""
    bg = bigrams(tokens())
    cnt = (
        cat(spark, sf_dir)["documents"]
        .select("source", F.explode(bg).alias("g"))
        .groupBy("source", "g")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    tot = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    p = cnt.join(tot, "source").select(
        "source", "g", (F.col("c") / F.col("n")).alias("p")
    ).localCheckpoint()
    a = p.select(F.col("source").alias("sa"), "g", F.col("p").alias("pa"))
    b = p.select(F.col("source").alias("sb"), "g", F.col("p").alias("pb"))
    pair = a.join(b, "g").filter(F.col("sa") < F.col("sb"))
    m = (F.col("pa") + F.col("pb")) / 2
    t1 = 0.5 * F.col("pa") * F.log(F.col("pa") / m)
    t2 = 0.5 * F.col("pb") * F.log(F.col("pb") / m)
    import math

    shared = pair.groupBy("sa", "sb").agg(
        (F.sum(t1) + F.sum(t2)).alias("js_shared"),
        F.sum("pa").alias("mass_a"),
        F.sum("pb").alias("mass_b"),
    )
    # bigrams present in only one source contribute 0.5*p*ln2 each —
    # summed, that's 0.5*ln2*(residual mass of each side)
    js = shared.select(
        "sa",
        "sb",
        (
            F.col("js_shared")
            + 0.5
            * math.log(2.0)
            * ((1 - F.col("mass_a")) + (1 - F.col("mass_b")))
        ).alias("jsd_raw"),
    )
    return (
        js.select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            ratio(F.col("jsd_raw")).alias("jsd"),
        )
        .orderBy("jsd", "source_a", "source_b")
        .limit(SRC_TOP)
    )


tx_source_similarity.__doc__ = tx_source_similarity.__doc__.format(k=SRC_TOP)
