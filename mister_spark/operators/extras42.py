"""Wave 42: retrieval quality, categorical mix drift, term
burstiness, and classical seasonal decomposition.

ml_ndcg scores the batch retrieval (sim_topk_join) with the ranking
metric search teams actually report; ev_mix_drift is the categorical
PSI twin of ml_psi_drift (did the event-type MIX shift between window
halves); tx_term_burstiness finds keyword-stuffed terms (high
occurrences-per-containing-doc); ev_seasonal_decompose splits the
daily series into trend + day-of-week seasonal + residual — the
decomposition behind every 'is Monday always like this' question.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

DAY_US = 86_400_000_000
NDCG_K = 5  # scores sim_topk_join's existing top-5 lists
DISC_GRID = 100_000_000  # 1/log2(rn+1) discounts on a 1e-8 integer grid
MIX_GRID = 100_000_000
BURST_MIN_DF = 5
TREND_HALF = 3  # 7-day centered moving average
DETR_GRID = 10_000  # detrended values snapped to a 1e-4 grid


def _disc_sql(col: str) -> str:
    return (
        f"CAST(FLOOR(1.0 / (ln({col} + 1.0) / ln(2.0)) * {DISC_GRID} + 0.5)"
        " AS BIGINT)"
    )


@query(
    "ml_ndcg",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv,
                      label AS qlab
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label AS clab
          FROM embeddings WHERE vec_id >= 8),
    top AS (SELECT q_id, qlab, clab, rn
            FROM (SELECT q.q_id, q.qlab, c.clab,
                         ROW_NUMBER() OVER (
                           PARTITION BY q.q_id
                           ORDER BY FLOOR((list_cosine_similarity(c.v, q.qv))
                                          * 10000 + 0.5) / 10000 DESC,
                                    c.vec_id) AS rn
                  FROM q, c)
            WHERE rn <= {NDCG_K}),
    r AS (SELECT q_id,
                 CAST(SUM(CASE WHEN qlab = clab THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_rel,
                 CAST(SUM(CASE WHEN qlab = clab
                          THEN {_disc_sql('rn')} ELSE 0 END) AS BIGINT)
                   AS dcg_g
          FROM top GROUP BY 1),
    i AS (SELECT t.q_id,
                 CAST(SUM(CASE WHEN t.rn <= r.n_rel
                          THEN {_disc_sql('t.rn')} ELSE 0 END) AS BIGINT)
                   AS idcg_g
          FROM top t JOIN r ON t.q_id = r.q_id GROUP BY 1)
    SELECT r.q_id, r.n_rel,
           CASE WHEN r.n_rel = 0 THEN 0.0
                ELSE FLOOR(CAST(r.dcg_g AS DOUBLE) / i.idcg_g * 10000 + 0.5)
                     / 10000 END AS ndcg
    FROM r JOIN i ON r.q_id = i.q_id
    """,
)
def ml_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{NDCG_K} of the batch retrieval: score sim_topk_join's
    top-{NDCG_K} lists with binary relevance (neighbor label == query
    label) — DCG discounts 1/log₂(rank+1), ideal DCG from the same
    discount table with all relevant results first, NDCG := 0 for
    queries with no relevant hit. Discount terms snap to a 1e-8
    integer grid, so both sums are exact int64 and the one float is
    the final division. This is the eval row a retrieval change ships
    with (ml_auc/ml_pr_auc score CLASSIFIERS; this scores RANKINGS).

    Scale: reuses sim_topk_join's two-phase top-k plan (broadcast
    queries, narrow prune, window over the ≤|Q|·k·partitions survivor
    set); everything after is per-query arithmetic on {NDCG_K}-row
    groups."""
    from mister_spark.operators.similarity import sim_topk_join

    emb = cat(spark, sf_dir)["embeddings"]
    labels = emb.select("vec_id", "label")
    top = (
        sim_topk_join(spark, sf_dir)
        .join(
            F.broadcast(labels.select(F.col("vec_id").alias("q_id"),
                                      F.col("label").alias("qlab"))),
            "q_id",
        )
        .join(F.broadcast(labels.withColumnRenamed("label", "clab")), "vec_id")
    )
    disc = F.floor(
        1.0 / (F.log(F.col("rn") + 1.0) / math.log(2.0)) * DISC_GRID + F.lit(0.5)
    ).cast("bigint")
    rel = (F.col("qlab") == F.col("clab")).cast("int")
    r = top.groupBy("q_id").agg(
        F.sum(rel).cast("bigint").alias("n_rel"),
        F.sum(F.when(rel == 1, disc).otherwise(0)).cast("bigint").alias("dcg_g"),
    )
    i = (
        top.join(F.broadcast(r.select("q_id", "n_rel")), "q_id")
        .groupBy("q_id")
        .agg(
            F.sum(F.when(F.col("rn") <= F.col("n_rel"), disc).otherwise(0))
            .cast("bigint")
            .alias("idcg_g")
        )
    )
    return r.join(i, "q_id").select(
        "q_id",
        "n_rel",
        F.when(F.col("n_rel") == 0, F.lit(0.0))
        .otherwise(ratio(F.col("dcg_g").cast("double") / F.col("idcg_g")))
        .alias("ndcg"),
    )


@query(
    "ev_mix_drift",
    oracle=f"""
    WITH b AS (SELECT MIN(epoch_us(ts) // {DAY_US}) AS mnd,
                      MAX(epoch_us(ts) // {DAY_US}) AS mxd FROM events),
    e AS (SELECT event_type,
                 CASE WHEN epoch_us(ts) // {DAY_US}
                           < (b.mnd + b.mxd + 1) // 2
                      THEN 0 ELSE 1 END AS half
          FROM events, b),
    g AS (SELECT event_type,
                 CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
                 CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2
          FROM e GROUP BY 1),
    t AS (SELECT SUM(n1) AS t1, SUM(n2) AS t2, COUNT(*) AS k FROM g)
    SELECT g.event_type, g.n1, g.n2,
           FLOOR(CAST(g.n1 + 1 AS DOUBLE) / (t.t1 + t.k) * 10000 + 0.5)
             / 10000 AS share_1,
           FLOOR(CAST(g.n2 + 1 AS DOUBLE) / (t.t2 + t.k) * 10000 + 0.5)
             / 10000 AS share_2,
           FLOOR(CAST(CAST(FLOOR((CAST(g.n1 + 1 AS DOUBLE) / (t.t1 + t.k)
                        - CAST(g.n2 + 1 AS DOUBLE) / (t.t2 + t.k))
                       * ln((CAST(g.n1 + 1 AS DOUBLE) / (t.t1 + t.k))
                            / (CAST(g.n2 + 1 AS DOUBLE) / (t.t2 + t.k)))
                       * {MIX_GRID} + 0.5) AS BIGINT) AS DOUBLE)
                 / {MIX_GRID} * 10000 + 0.5) / 10000 AS psi_term
    FROM g, t
    """,
)
def ev_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical mix drift: PSI contribution per event type between
    the first and second half of the window — the 'did the TYPE MIX
    shift' alarm that complements ml_psi_drift's continuous version
    (an error-share doubling shows up here before any volume metric
    moves). Laplace-smoothed shares, each (p−q)·ln(p/q) term snapped
    to a 1e-8 grid — sum the psi_term column for the headline PSI.

    Scale: day bounds are a 1-row broadcast, the half flag is
    map-side, ONE partial-agg shuffle on event_type; the normalizer is
    a 1-row broadcast."""
    ev = cat(spark, sf_dir)["events"]
    b = ev.agg(
        F.min(F.expr(f"unix_micros(ts) div {DAY_US}")).alias("mnd"),
        F.max(F.expr(f"unix_micros(ts) div {DAY_US}")).alias("mxd"),
    )
    e = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.when(
            F.expr(f"unix_micros(ts) div {DAY_US}")
            < F.floor((F.col("mnd") + F.col("mxd") + 1) / 2),
            0,
        )
        .otherwise(1)
        .alias("half"),
    )
    g = e.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("bigint").alias("n2"),
    )
    t = g.agg(
        F.sum("n1").alias("t1"), F.sum("n2").alias("t2"), F.count(F.lit(1)).alias("k")
    )
    p = (F.col("n1") + 1).cast("double") / (F.col("t1") + F.col("k"))
    q = (F.col("n2") + 1).cast("double") / (F.col("t2") + F.col("k"))
    term = (
        F.floor((p - q) * F.log(p / q) * MIX_GRID + F.lit(0.5))
        .cast("bigint")
        .cast("double")
        / MIX_GRID
    )
    return g.crossJoin(F.broadcast(t)).select(
        "event_type",
        "n1",
        "n2",
        ratio(p).alias("share_1"),
        ratio(q).alias("share_2"),
        ratio(term).alias("psi_term"),
    )


@query(
    "tx_term_burstiness",
    oracle=f"""
    WITH dt AS (SELECT doc_id, unnest({DUCK_TOKENS}) AS tok
                FROM documents),
    g AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
          FROM dt GROUP BY 1, 2),
    s AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS tf_total,
                 CAST(COUNT(*) AS BIGINT) AS df
          FROM g GROUP BY 1)
    SELECT tok, tf_total, df,
           FLOOR(CAST(tf_total AS DOUBLE) / df * 10000 + 0.5) / 10000
             AS burstiness
    FROM s WHERE df >= {BURST_MIN_DF}
    ORDER BY burstiness DESC, tok
    LIMIT 20
    """,
)
def tx_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church–Gale): mean occurrences per CONTAINING
    document, tf_total/df, for terms with df ≥ {BURST_MIN_DF} — a
    term that appears 40 times in 5 docs (burstiness 8) is
    keyword-stuffing or boilerplate; content words hover near 1-2.
    The top-20 shortlist feeds tx_repetition-style quality gates with
    specific offending TERMS rather than a per-doc score.

    Scale: the (doc, token) tf collapse and the token rollup are the
    standard two partial-agg shuffles on narrow keys; top-k is a
    TakeOrdered on the rounded measure with a token tiebreak."""
    docs = cat(spark, sf_dir)["documents"]
    dt = docs.select("doc_id", F.explode(tokens()).alias("tok"))
    g = dt.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    s = g.groupBy("tok").agg(
        F.sum("tf").cast("bigint").alias("tf_total"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
    )
    return (
        s.filter(F.col("df") >= BURST_MIN_DF)
        .select(
            "tok",
            "tf_total",
            "df",
            ratio(F.col("tf_total").cast("double") / F.col("df")).alias(
                "burstiness"
            ),
        )
        .orderBy(F.desc("burstiness"), "tok")
        .limit(20)
    )


@query(
    "ev_seasonal_decompose",
    oracle=f"""
    WITH d AS (SELECT epoch_us(ts) // {DAY_US} AS day,
                      CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS vc
               FROM events GROUP BY 1),
    tr AS (SELECT day, vc,
                  AVG(CAST(vc AS DOUBLE)) OVER
                    (ORDER BY day RANGE BETWEEN {TREND_HALF} PRECEDING
                     AND {TREND_HALF} FOLLOWING) AS trend
           FROM d),
    de AS (SELECT (day + 3) % 7 + 1 AS dow,
                  CAST(FLOOR((vc - trend) * {DETR_GRID} / 100.0 + 0.5)
                       AS BIGINT) AS detr_g
           FROM tr)
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           FLOOR(CAST(SUM(detr_g) AS DOUBLE) / {DETR_GRID} / COUNT(*)
                 * 100 + 0.5) / 100 AS seasonal,
           FLOOR(CAST(SUM(ABS(detr_g)) AS DOUBLE) / {DETR_GRID} / COUNT(*)
                 * 100 + 0.5) / 100 AS mean_abs_detrended
    FROM de GROUP BY 1
    """,
)
def ev_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of daily revenue: a 7-day
    centered moving-average trend, then the day-of-week SEASONAL
    factors as the mean detrended value per ISO weekday — 'Mondays
    run $X above trend' — plus the mean |detrended| as the noise
    yardstick the factor should be read against. Detrended values
    snap to a 1e-4 dollar grid before the per-dow mean, so engine
    summation order can't move the factors. ISO dow comes from pure
    epoch-day arithmetic ((day+3)%7+1), no calendar functions.

    Scale: one daily partial-agg rollup; the centered MA rides the
    #days grid frame (calendar-bounded; month-partition + carry at
    multi-year spans); the dow rollup is a 7-key aggregate."""
    ev = cat(spark, sf_dir)["events"]
    d = (
        ev.select(F.expr(f"unix_micros(ts) div {DAY_US}").alias("day"), "value")
        .groupBy("day")
        .agg(F.floor(F.sum("value") * 100 + F.lit(0.5)).cast("long").alias("vc"))
    )
    w = W.orderBy("day").rangeBetween(-TREND_HALF, TREND_HALF)
    tr = d.select(
        "day", "vc", F.avg(F.col("vc").cast("double")).over(w).alias("trend")
    )
    de = tr.select(
        ((F.col("day") + 3) % 7 + 1).alias("dow"),
        F.floor((F.col("vc") - F.col("trend")) * DETR_GRID / 100.0 + F.lit(0.5))
        .cast("bigint")
        .alias("detr_g"),
    )
    return de.groupBy(F.col("dow").cast("bigint").alias("dow")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        money(F.sum("detr_g").cast("double") / DETR_GRID / F.count(F.lit(1))).alias(
            "seasonal"
        ),
        money(
            F.sum(F.abs(F.col("detr_g"))).cast("double")
            / DETR_GRID
            / F.count(F.lit(1))
        ).alias("mean_abs_detrended"),
    )
