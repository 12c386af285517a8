"""Wave 54: ML feature governance — leakage-safe target encoding, the
hashing trick with a collision audit, inter-annotator agreement, and a
heteroscedasticity test.

ml_target_encoding is the out-of-fold construction that makes
category→target-mean features safe to train on (in-fold encoding is the
most common silent leakage bug in tabular ML); ml_hashing_trick audits
the fixed-width feature hashing every large-scale linear model uses
(collisions are the price of boundless vocab in bounded memory);
ml_cohens_kappa is the labeling-QA agreement statistic every annotation
pipeline reports; stat_breusch_pagan tests the residual-variance
assumption the OLS ops (stat_regression, ev_rolling_slope) lean on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.hashing import FP_MOD, FP_MUL
from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

TE_FOLDS = 5
TE_SMOOTH = 10.0  # pseudo-count toward the global prior
HT_BUCKETS = 64
KAPPA_FLIP_MOD = 10  # vec_id-hash ≡ 0 (mod 10) → annotator B disagrees
KAPPA_CLASSES = 10
BP_FLAG_ALPHA = 0.05


@query(
    "ml_target_encoding",
    oracle=f"""
    WITH o AS (SELECT o_orderpriority AS cat, o_orderkey % {TE_FOLDS} AS fold,
                      CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y
               FROM orders),
    g AS (SELECT SUM(y) AS gs, CAST(COUNT(*) AS DOUBLE) AS gn FROM o),
    cf AS (SELECT cat, fold, SUM(y) AS s, CAST(COUNT(*) AS DOUBLE) AS n
           FROM o GROUP BY 1, 2),
    c AS (SELECT cat, SUM(s) AS cs, SUM(n) AS cn FROM cf GROUP BY 1)
    SELECT cf.cat, CAST(cf.fold AS BIGINT) AS fold,
           CAST(c.cn - cf.n AS BIGINT) AS n_oof,
           FLOOR(((c.cs - cf.s) + {TE_SMOOTH} * (g.gs / g.gn))
                 / ((c.cn - cf.n) + {TE_SMOOTH}) * 10000 + 0.5) / 10000
             AS enc
    FROM cf JOIN c ON cf.cat = c.cat CROSS JOIN g
    """,
)
def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding of order priority against the
    'order finished' target: each (category, fold) cell is encoded
    from the OTHER {f}−1 folds' statistics — (Σy − Σy_fold + m·prior)
    / (n − n_fold + m), smoothing m={m} toward the global rate — so no
    row's own target leaks into its feature.

    Scale: one groupBy to |categories|·|folds| cells, a rollup to
    |categories|, and a 1-row global prior broadcast — the encoding
    table is model-sized and broadcast-joins back onto the data at
    train time. The subtract-own-fold trick means ONE pass regardless
    of fold count (the naive per-fold filter would scan {f}×)."""
    orders = cat(spark, sf_dir)["orders"]
    o = orders.select(
        F.col("o_orderpriority").alias("cat"),
        (F.col("o_orderkey") % TE_FOLDS).alias("fold"),
        (F.col("o_orderstatus") == "F").cast("double").alias("y"),
    )
    g = o.agg(
        F.sum("y").alias("gs"), F.count(F.lit(1)).cast("double").alias("gn")
    )
    cf = o.groupBy("cat", "fold").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).cast("double").alias("n")
    )
    c = cf.groupBy("cat").agg(F.sum("s").alias("cs"), F.sum("n").alias("cn"))
    return (
        cf.join(F.broadcast(c), "cat")
        .join(F.broadcast(g))
        .select(
            "cat",
            F.col("fold").cast("bigint").alias("fold"),
            (F.col("cn") - F.col("n")).cast("bigint").alias("n_oof"),
            ratio(
                (
                    (F.col("cs") - F.col("s"))
                    + TE_SMOOTH * (F.col("gs") / F.col("gn"))
                )
                / ((F.col("cn") - F.col("n")) + TE_SMOOTH)
            ).alias("enc"),
        )
    )


ml_target_encoding.__doc__ = ml_target_encoding.__doc__.format(
    f=TE_FOLDS, m=TE_SMOOTH
)


@query(
    "ml_hashing_trick",
    oracle=f"""
    WITH t AS (SELECT {DUCK_TOKENS} AS toks FROM documents),
    tk AS (SELECT unnest(toks) AS term FROM t),
    tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tk GROUP BY 1),
    b AS (SELECT ((CAST(ascii(term) * 131 + len(term) AS BIGINT)
                   * {FP_MUL}) % {FP_MOD}) % {HT_BUCKETS} AS bucket,
                 term, c
          FROM tc)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(c) AS BIGINT) AS n_occurrences,
           FLOOR(CAST(MAX(c) AS DOUBLE) / SUM(c) * 10000 + 0.5) / 10000
             AS top_term_share
    FROM b GROUP BY 1
    """,
)
def ml_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing audit: every corpus term maps to one of
    {b} buckets via the portable integer hash, and the report shows per
    bucket how many distinct terms collided, their total occurrence
    mass, and how dominant the top term is (top_term_share ≈ 1 means
    the bucket is effectively clean; ≈ 1/n_terms means the collision
    genuinely mixes signals). This is the audit you run before
    committing a linear model to hashed features.

    Scale: term counting is the standard vocab-sized shuffle; the
    bucket rollup is {b} groups. No vocabulary table is ever
    materialized to the driver — that's the point of the trick."""
    docs = cat(spark, sf_dir)["documents"]
    tc = (
        docs.select(F.explode(tokens()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    bucket = (
        (F.ascii("term") * 131 + F.length("term")).cast("long") * FP_MUL
    ) % FP_MOD % HT_BUCKETS
    return (
        tc.withColumn("bucket", bucket)
        .groupBy(F.col("bucket").cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum("c").cast("bigint").alias("n_occurrences"),
            ratio(F.max("c").cast("double") / F.sum("c")).alias(
                "top_term_share"
            ),
        )
    )


ml_hashing_trick.__doc__ = ml_hashing_trick.__doc__.format(b=HT_BUCKETS)


@query(
    "ml_cohens_kappa",
    oracle=f"""
    WITH a AS (SELECT vec_id, label AS la,
                      CASE WHEN (vec_id * {FP_MUL}) % {KAPPA_FLIP_MOD} = 0
                           THEN (label + 1) % {KAPPA_CLASSES}
                           ELSE label END AS lb
               FROM embeddings),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(CASE WHEN la = lb THEN 1.0 ELSE 0.0 END) AS agree
          FROM a),
    ma AS (SELECT la AS c, CAST(COUNT(*) AS DOUBLE) AS ca FROM a GROUP BY 1),
    mb AS (SELECT lb AS c, CAST(COUNT(*) AS DOUBLE) AS cb FROM a GROUP BY 1),
    pe AS (SELECT SUM(ma.ca * mb.cb) AS pexp
           FROM ma JOIN mb ON ma.c = mb.c)
    SELECT CAST(n.n AS BIGINT) AS n_items,
           FLOOR(n.agree / n.n * 10000 + 0.5) / 10000 AS po,
           FLOOR(pe.pexp / (n.n * n.n) * 10000 + 0.5) / 10000 AS pe,
           FLOOR((n.agree / n.n - pe.pexp / (n.n * n.n))
                 / (1.0 - pe.pexp / (n.n * n.n)) * 10000 + 0.5) / 10000
             AS kappa
    FROM n CROSS JOIN pe
    """,
)
def ml_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two annotators of the embedding labels:
    annotator A is the stored label, annotator B deterministically
    disagrees on ~1/{fm} of items (hash-selected, shifted one class) —
    κ = (p_o − p_e)/(1 − p_e) with chance agreement p_e from the
    marginal label distributions.

    Scale: one pass for the agreement count, two |classes|-sized
    marginal rollups joined model-side. The agreement contingency
    never materializes beyond |classes|² cells."""
    emb = cat(spark, sf_dir)["embeddings"]
    a = emb.select(
        F.col("label").alias("la"),
        F.when(
            (F.col("vec_id") * FP_MUL) % KAPPA_FLIP_MOD == 0,
            (F.col("label") + 1) % KAPPA_CLASSES,
        )
        .otherwise(F.col("label"))
        .alias("lb"),
    )
    n = a.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum((F.col("la") == F.col("lb")).cast("double")).alias("agree"),
    )
    ma = a.groupBy(F.col("la").alias("c")).agg(
        F.count(F.lit(1)).cast("double").alias("ca")
    )
    mb = a.groupBy(F.col("lb").alias("c")).agg(
        F.count(F.lit(1)).cast("double").alias("cb")
    )
    pe = ma.join(mb, "c").agg(F.sum(F.col("ca") * F.col("cb")).alias("pexp"))
    po = F.col("agree") / F.col("n")
    pec = F.col("pexp") / (F.col("n") * F.col("n"))
    return n.join(F.broadcast(pe)).select(
        F.col("n").cast("bigint").alias("n_items"),
        ratio(po).alias("po"),
        ratio(pec).alias("pe"),
        ratio((po - pec) / (1.0 - pec)).alias("kappa"),
    )


ml_cohens_kappa.__doc__ = ml_cohens_kappa.__doc__.format(fm=KAPPA_FLIP_MOD)


@query(
    "stat_breusch_pagan",
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', o_orderdate) AS DATE))
                      AS t,
                      SUM(o_totalprice) AS y
               FROM orders GROUP BY 1),
    s1 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(t) AS sx, SUM(y) AS sy,
                  SUM(CAST(t AS DOUBLE) * t) AS sxx,
                  SUM(t * y) AS sxy
           FROM d),
    fit AS (SELECT n, sx, sy,
                   (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
                   (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                     AS a
            FROM s1),
    r AS (SELECT d.t, (d.y - (fit.a + fit.b * d.t))
                      * (d.y - (fit.a + fit.b * d.t)) AS e2
          FROM d CROSS JOIN fit),
    s2 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(t) AS sx, SUM(e2) AS sy,
                  SUM(CAST(t AS DOUBLE) * t) AS sxx, SUM(t * e2) AS sxy,
                  SUM(e2 * e2) AS syy
           FROM r),
    lm AS (SELECT n,
                  n * ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                    / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS stat
           FROM s2)
    SELECT CAST(n AS BIGINT) AS n_days,
           FLOOR(stat * 10000 + 0.5) / 10000 AS lm_stat,
           FLOOR(2 * {normal_sf_sql("sqrt(stat)")} * 10000 + 0.5) / 10000
             AS p_value,
           CAST(CASE WHEN 2 * {normal_sf_sql("sqrt(stat)")}
                          < {BP_FLAG_ALPHA}
                THEN 1 ELSE 0 END AS BIGINT) AS het_flag
    FROM lm
    """,
)
def stat_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch–Pagan heteroscedasticity test on the daily-revenue OLS
    trend: regress squared residuals on time, LM = n·R², p from the
    χ²₁ tail (= 2·P(Z > √LM), the shared portable normal tail). Flags
    whether the constant-variance assumption behind the repo's OLS
    slope ops actually holds on this series.

    Scale: two sufficient-statistics passes over the day grid
    (calendar-bounded) with a 1-row fit broadcast between them —
    no per-row state, no data-sized window."""
    orders = cat(spark, sf_dir)["orders"]
    d = orders.groupBy(
        F.datediff(F.date_trunc("day", "o_orderdate"), F.lit("1970-01-01"))
        .alias("t")
    ).agg(F.sum("o_totalprice").alias("y"))
    t, y = F.col("t").cast("double"), F.col("y")
    s1 = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(t).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(t * t).alias("sxx"),
        F.sum(t * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    fit = s1.select(b.alias("b"), ((sy - b * sx) / n).alias("a"))
    e = y - (F.col("a") + F.col("b") * t)
    r = d.join(F.broadcast(fit)).select(F.col("t"), (e * e).alias("e2"))
    e2 = F.col("e2")
    s2 = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(t).alias("sx"),
        F.sum(e2).alias("sy"),
        F.sum(t * t).alias("sxx"),
        F.sum(t * e2).alias("sxy"),
        F.sum(e2 * e2).alias("syy"),
    )
    syy = F.col("syy")
    stat = n * ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    lm = s2.select(n.alias("nn"), stat.alias("stat"))
    p = 2 * normal_sf(F.sqrt(F.col("stat")))
    return lm.select(
        F.col("nn").cast("bigint").alias("n_days"),
        ratio(F.col("stat")).alias("lm_stat"),
        ratio(p).alias("p_value"),
        (p < BP_FLAG_ALPHA).cast("bigint").alias("het_flag"),
    )
