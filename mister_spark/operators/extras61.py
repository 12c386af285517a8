"""Wave 61: MR chaining, regression forensics, sequential testing, and
multiclass ranking eval.

mr_job_chain proves the mister-parity class API composes (job 2
consumes job 1's output — the way real mister pipelines chained);
stat_regression_diagnostics adds the leverage / Cook's-distance
point-level forensics behind stat_regression's fit; ml_sprt_sequential
is Wald's sequential probability ratio test — the always-valid
monitoring that lets an experiment stop early without p-hacking;
ml_macro_auc extends exact AUC to one-vs-rest macro over the 10 label
classes with quantized score bins (the bounded-state form of the rank
statistic).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

SPRT_P0 = 0.18
SPRT_P1 = 0.22
SPRT_A = math.log(19.0)  # accept H1 boundary (alpha ~ 0.05)
SPRT_B = math.log(1.0 / 19.0)  # accept H0 boundary
AUC_CLASSES = 10
AUC_Q = 10000  # score quantization grid (bounds per-class rank state)


@query(
    "mr_job_chain",
    oracle="""
    WITH t AS (SELECT unnest(list_filter(string_split(text, ' '),
                                         t -> t <> '')) AS term
               FROM documents),
    wc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY 1)
    SELECT CAST(len(term) AS BIGINT) AS term_len,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(n) AS BIGINT) AS total,
           CAST(MAX(n) AS BIGINT) AS max_count
    FROM wc GROUP BY 1
    """,
)
def mr_job_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained mister-style jobs through the class API: job 1 is the
    classic wordcount (imperative Arrow map + declarative keyed
    reduce + map-side combiner), job 2 consumes job 1's OUTPUT frame
    and rolls counts up by term length — the chaining pattern mister
    users ran as sequential scripts, here composing as two lazy
    DataFrame stages Catalyst plans together.

    Scale: the combiner shrinks job 1's shuffle to keys-per-batch;
    job 2's shuffle is |vocab| rows into |term_lengths| groups."""
    import pandas as pd

    from mister_spark.mr import MrJob

    class WordCount(MrJob):
        map_schema = "term string"
        reduce_keys = ("term",)

        def map(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = [
                t
                for text in batch["text"]
                for t in (text or "").split(" ")
                if t
            ]
            return pd.DataFrame({"term": toks})

        def reduce_exprs(self):
            return [F.count(F.lit(1)).cast("bigint").alias("n")]

    class LengthRollup(MrJob):
        reduce_keys = ("term_len",)

        def map(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch

        def reduce_exprs(self):
            return [
                F.count(F.lit(1)).cast("bigint").alias("n_terms"),
                F.sum("n").cast("bigint").alias("total"),
                F.max("n").cast("bigint").alias("max_count"),
            ]

    docs = cat(spark, sf_dir)["documents"].select("text")
    counts = WordCount().run(spark, docs)
    staged = counts.withColumn(
        "term_len", F.length("term").cast("bigint")
    ).select("term_len", "n")
    return LengthRollup().run(spark, staged)


@query(
    "stat_regression_diagnostics",
    oracle="""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', o_orderdate) AS DATE))
                        AS t,
                      SUM(o_totalprice) AS y
               FROM orders GROUP BY 1),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(t) AS sx, SUM(y) AS sy,
                 SUM(CAST(t AS DOUBLE) * t) AS sxx, SUM(t * y) AS sxy
          FROM d),
    f AS (SELECT n, sx / n AS xbar, sxx - sx * sx / n AS sxx_c,
                 (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
                 (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                   AS a
          FROM s),
    r AS (SELECT d.t, d.y,
                 d.y - (f.a + f.b * d.t) AS e,
                 1.0 / f.n + (d.t - f.xbar) * (d.t - f.xbar) / f.sxx_c AS h,
                 f.n
          FROM d CROSS JOIN f),
    v AS (SELECT SUM(e * e) / (MAX(n) - 2) AS s2 FROM r)
    SELECT CAST(r.t AS BIGINT) AS t,
           FLOOR(r.e * 100 + 0.5) / 100 AS residual,
           FLOOR(r.h * 10000 + 0.5) / 10000 AS leverage,
           FLOOR(r.e * r.e * r.h / (2 * v.s2 * (1 - r.h) * (1 - r.h))
                 * 10000 + 0.5) / 10000 AS cooks_d
    FROM r CROSS JOIN v
    """,
)
def stat_regression_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-level OLS forensics for the daily-revenue trend: per day,
    the residual, leverage h = 1/n + (x−x̄)²/Sxx (endpoints pull the
    line hardest), and Cook's distance e²h/(2s²(1−h)²) — which days,
    if dropped, would move the fit. stat_regression gives the line;
    this says whether you should trust it.

    Scale: one day rollup, one sufficient-statistics broadcast, one
    residual-variance broadcast — all model-sized after the first
    shuffle."""
    orders = cat(spark, sf_dir)["orders"]
    d = orders.groupBy(
        F.datediff(F.date_trunc("day", "o_orderdate"), F.lit("1970-01-01"))
        .alias("t")
    ).agg(F.sum("o_totalprice").alias("y")).localCheckpoint()
    t, y = F.col("t").cast("double"), F.col("y")
    s = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(t).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(t * t).alias("sxx"),
        F.sum(t * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    f = s.select(
        n.alias("n"),
        (sx / n).alias("xbar"),
        (sxx - sx * sx / n).alias("sxx_c"),
        b.alias("b"),
        ((sy - b * sx) / n).alias("a"),
    )
    r = d.join(F.broadcast(f)).select(
        F.col("t"),
        (y - (F.col("a") + F.col("b") * t)).alias("e"),
        (
            1.0 / F.col("n")
            + (t - F.col("xbar")) * (t - F.col("xbar")) / F.col("sxx_c")
        ).alias("h"),
        F.col("n"),
    ).localCheckpoint()
    v = r.agg(
        (F.sum(F.col("e") * F.col("e")) / (F.max("n") - 2)).alias("s2")
    )
    e, h, s2 = F.col("e"), F.col("h"), F.col("s2")
    return r.join(F.broadcast(v)).select(
        F.col("t").cast("bigint").alias("t"),
        money(e).alias("residual"),
        ratio(h).alias("leverage"),
        ratio(e * e * h / (2 * s2 * (1 - h) * (1 - h))).alias("cooks_d"),
    )


@query(
    "ml_sprt_sequential",
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS t,
                      CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS k
               FROM events GROUP BY 1),
    c AS (SELECT t, n, k,
                 SUM(n) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cn,
                 SUM(k) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS ck
          FROM d),
    l AS (SELECT t, cn, ck,
                 ck * ln({SPRT_P1} / {SPRT_P0})
                 + (cn - ck) * ln((1 - {SPRT_P1}) / (1 - {SPRT_P0})) AS llr
          FROM c)
    SELECT CAST(t AS BIGINT) AS t, CAST(cn AS BIGINT) AS n_cum,
           CAST(ck AS BIGINT) AS k_cum,
           FLOOR(llr * 10000 + 0.5) / 10000 AS llr,
           CASE WHEN llr >= {SPRT_A!r} THEN 'accept_h1'
                WHEN llr <= {SPRT_B!r} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM l
    """,
)
def ml_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SPRT monitored daily: is the purchase rate p₁={p1} (H1)
    or p₀={p0} (H0)? The cumulative log-likelihood ratio
    k·ln(p₁/p₀) + (n−k)·ln((1−p₁)/(1−p₀)) is checked each day against
    the ±ln 19 boundaries (α≈β≈0.05) — the sequential design that
    keeps error rates valid under continuous monitoring, unlike
    repeatedly peeking at a fixed-horizon test.

    Scale: one day rollup; the cumulative windows run on the
    calendar-bounded day grid."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias("t")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("bigint")
        .alias("k"),
    )
    wc = W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    c = d.select(
        "t",
        F.sum("n").over(wc).alias("cn"),
        F.sum("k").over(wc).alias("ck"),
    )
    llr = F.col("ck") * math.log(SPRT_P1 / SPRT_P0) + (
        F.col("cn") - F.col("ck")
    ) * math.log((1 - SPRT_P1) / (1 - SPRT_P0))
    return c.select(
        F.col("t").cast("bigint").alias("t"),
        F.col("cn").cast("bigint").alias("n_cum"),
        F.col("ck").cast("bigint").alias("k_cum"),
        ratio(llr).alias("llr"),
        F.when(llr >= SPRT_A, "accept_h1")
        .when(llr <= SPRT_B, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )


ml_sprt_sequential.__doc__ = ml_sprt_sequential.__doc__.format(
    p0=SPRT_P0, p1=SPRT_P1
)


@query(
    "ml_macro_auc",
    oracle=f"""
    WITH cls AS (SELECT unnest(generate_series(0, {AUC_CLASSES - 1})) AS c),
    s AS (SELECT cls.c,
                 FLOOR(CAST(e.embedding[cls.c + 1] AS DOUBLE) * {AUC_Q})
                   / {AUC_Q} AS score,
                 CASE WHEN e.label = cls.c THEN 1 ELSE 0 END AS pos
          FROM embeddings e CROSS JOIN cls),
    g AS (SELECT c, score, SUM(pos) AS np, COUNT(*) AS cnt
          FROM s GROUP BY 1, 2),
    x AS (SELECT c, np, cnt,
                 SUM(cnt) OVER (PARTITION BY c ORDER BY score
                                ROWS UNBOUNDED PRECEDING) - cnt AS below
          FROM g),
    r AS (SELECT c, SUM(np * (below + (cnt + 1) / 2.0)) AS ra FROM x
          GROUP BY 1),
    t AS (SELECT c, CAST(SUM(pos) AS DOUBLE) AS p,
                 CAST(SUM(1 - pos) AS DOUBLE) AS n
          FROM s GROUP BY 1),
    a AS (SELECT r.c, (r.ra - t.p * (t.p + 1) / 2) / (t.p * t.n) AS auc,
                 CAST(t.p AS BIGINT) AS n_pos
          FROM r JOIN t ON r.c = t.c)
    SELECT CAST(c AS BIGINT) AS class,
           n_pos,
           FLOOR(auc * 10000 + 0.5) / 10000 AS auc,
           FLOOR((SELECT AVG(a2.auc) FROM a a2) * 10000 + 0.5) / 10000
             AS macro_auc
    FROM a
    """,
)
def ml_macro_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest exact AUC per class (score = the class's own
    embedding dimension, a logit stand-in) plus the macro average —
    the multiclass ranking eval. Scores quantize to a 1e-4 grid BEFORE
    the rank statistic, so per-class rank state is ≤ {q} distinct
    values however big the data (ml_auc's two-phase trick, made
    bounded instead of merely distributed).

    Scale: one class-expansion map ({k}-row broadcast), a
    (class, score) partial-agg rollup, per-class prefix sums over
    bounded frames, |classes| result rows."""
    emb = cat(spark, sf_dir)["embeddings"]
    cls = spark.range(AUC_CLASSES).select(F.col("id").alias("c"))
    s = emb.join(F.broadcast(cls)).select(
        "c",
        (
            F.floor(
                F.element_at("embedding", (F.col("c") + 1).cast("int"))
                .cast("double")
                * AUC_Q
            )
            / AUC_Q
        ).alias("score"),
        (F.col("label") == F.col("c")).cast("int").alias("pos"),
    )
    g = s.groupBy("c", "score").agg(
        F.sum("pos").alias("np"), F.count(F.lit(1)).alias("cnt")
    )
    wcum = W.partitionBy("c").orderBy("score").rowsBetween(
        W.unboundedPreceding, 0
    )
    x = g.select(
        "c",
        "np",
        "cnt",
        (F.sum("cnt").over(wcum) - F.col("cnt")).alias("below"),
    )
    r = x.groupBy("c").agg(
        F.sum(F.col("np") * (F.col("below") + (F.col("cnt") + 1) / 2.0)).alias(
            "ra"
        )
    )
    tt = s.groupBy("c").agg(
        F.sum("pos").cast("double").alias("p"),
        F.sum(1 - F.col("pos")).cast("double").alias("n"),
    )
    a = r.join(tt, "c").select(
        "c",
        ((F.col("ra") - F.col("p") * (F.col("p") + 1) / 2) / (F.col("p") * F.col("n"))).alias("auc"),
        F.col("p").cast("bigint").alias("n_pos"),
    ).localCheckpoint()
    m = a.agg(F.avg("auc").alias("ma"))
    return a.join(F.broadcast(m)).select(
        F.col("c").cast("bigint").alias("class"),
        "n_pos",
        ratio(F.col("auc")).alias("auc"),
        ratio(F.col("ma")).alias("macro_auc"),
    )


ml_macro_auc.__doc__ = ml_macro_auc.__doc__.format(q=AUC_Q, k=AUC_CLASSES)
