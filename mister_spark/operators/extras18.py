"""Wave 18: the experimentation suite closers (one-way ANOVA, power
analysis) plus corpus duplication profiling and classifier metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

# two-sided α=0.05 and power=0.80 normal quantiles (literals, both
# engines see the identical constants)
Z_ALPHA = 1.959964
Z_BETA = 0.841621


@query(
    "stat_anova_f",
    oracle="""
    WITH g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(value) AS s, SUM(value * value) AS s2
      FROM events GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt, SUM(s) AS st,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(s * s / n) AS sgm, SUM(s2) AS s2t
      FROM g)
    SELECT k, nt,
           FLOOR(((sgm - st * st / nt) / (k - 1))
                 / ((s2t - sgm) / (nt - k)) * 10000 + 0.5) / 10000 AS f_stat
    FROM tot
    """,
)
def stat_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic across the five event types' values:
    between-group over within-group mean squares, entirely from one
    pass of per-group (n, Σx, Σx²) — the >2-group complement to
    stat_welch_ttest. Algebraic identity form (Σgroup s²/n − grand)
    avoids a second centered scan.

    Scale: one partial-agg shuffle on 5 keys, then scalar algebra."""
    ev = cat(spark, sf_dir)["events"]
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("s").alias("st"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sgm"),
        F.sum("s2").alias("s2t"),
    )
    ss_between = F.col("sgm") - F.col("st") * F.col("st") / F.col("nt")
    ss_within = F.col("s2t") - F.col("sgm")
    f_stat = (ss_between / (F.col("k") - 1)) / (ss_within / (F.col("nt") - F.col("k")))
    return tot.select("k", "nt", rnd(f_stat, 4).alias("f_stat"))


@query(
    "stat_power_analysis",
    oracle=f"""
    WITH g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             AVG(value) AS m, SUM(value * value) AS s2, SUM(value) AS s
      FROM events WHERE event_type IN ('purchase', 'error') GROUP BY 1),
    w AS (
      SELECT MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
             MAX(CASE WHEN event_type = 'purchase' THEN m END) AS m1,
             MAX(CASE WHEN event_type = 'purchase' THEN s2 - s * s / n END) AS ss1,
             MAX(CASE WHEN event_type = 'error' THEN n END) AS n2,
             MAX(CASE WHEN event_type = 'error' THEN m END) AS m2,
             MAX(CASE WHEN event_type = 'error' THEN s2 - s * s / n END) AS ss2
      FROM g),
    d AS (
      SELECT n1, n2,
             (m1 - m2) / SQRT((ss1 + ss2) / (n1 + n2 - 2)) AS d
      FROM w)
    SELECT n1, n2,
           FLOOR(ABS(d) * 10000 + 0.5) / 10000 AS effect_d,
           CAST(CEIL(2.0 * (({Z_ALPHA} + {Z_BETA}) / d)
                     * (({Z_ALPHA} + {Z_BETA}) / d)) AS BIGINT)
             AS n_required_per_group
    FROM d
    """,
)
def stat_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-size requirement to re-detect the observed purchase-vs-
    error effect at α=0.05 / power=0.80: n per group =
    2·((z_α+z_β)/d)² from the measured Cohen's d — the 'how long must
    this A/B run' calculator, closed-form over one aggregate pass.

    Scale: identical shape to stat_cohens_d (one 2-key agg, scalar
    algebra)."""
    ev = cat(spark, sf_dir)["events"].filter(
        F.col("event_type").isin("purchase", "error")
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("m"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
        F.sum("value").alias("s"),
    )
    ss = F.col("s2") - F.col("s") * F.col("s") / F.col("n")
    w = g.agg(
        F.max(F.when(F.col("event_type") == "purchase", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("m"))).alias("m1"),
        F.max(F.when(F.col("event_type") == "purchase", ss)).alias("ss1"),
        F.max(F.when(F.col("event_type") == "error", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("event_type") == "error", F.col("m"))).alias("m2"),
        F.max(F.when(F.col("event_type") == "error", ss)).alias("ss2"),
    )
    d = (F.col("m1") - F.col("m2")) / F.sqrt(
        (F.col("ss1") + F.col("ss2")) / (F.col("n1") + F.col("n2") - 2)
    )
    zsum = F.lit(Z_ALPHA + Z_BETA)
    return w.select(
        "n1",
        "n2",
        rnd(F.abs(d), 4).alias("effect_d"),
        F.ceil(2.0 * (zsum / d) * (zsum / d)).cast("long").alias(
            "n_required_per_group"
        ),
    )


@query(
    "dd_shingle_profile",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(generate_series(1, len(toks) - 2),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
           FROM t),
    df AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS k FROM sh GROUP BY 1)
    SELECT CASE WHEN k >= 5 THEN 5 ELSE k END AS n_docs_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(k) AS BIGINT) AS posting_mass
    FROM df GROUP BY 1
    """,
)
def dd_shingle_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus duplication profile: for each shingle-frequency bucket
    (appears in 1, 2, 3, 4, 5+ docs), how many distinct shingles and
    how much posting mass — the diagnostic that sizes every downstream
    dedup decision (how much boilerplate is there? will the hot-shingle
    cap bite?). This is the histogram the HOT_SHINGLE_CAP constant in
    dedup.py is tuned against.

    Scale: shingle explode + one frequency agg + one 5-bucket rollup —
    strictly cheaper than any dedup pass it informs."""
    from mister_spark.operators.dedup import _doc_shingles

    ds = _doc_shingles(spark, sf_dir)
    sh = ds.select("doc_id", F.explode("sh").alias("s"))
    df = sh.groupBy("s").agg(F.count(F.lit(1)).alias("k"))
    bucket = F.when(F.col("k") >= 5, 5).otherwise(F.col("k"))
    return df.groupBy(bucket.alias("n_docs_bucket")).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("k").cast("long").alias("posting_mass"),
    )


@query(
    "ml_confusion_metrics",
    oracle=f"""
    WITH te AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
      FROM embeddings WHERE vec_id % 5 = 0),
    tr AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
      FROM embeddings WHERE vec_id % 5 <> 0),
    sc AS (
      SELECT te.vec_id, te.label AS true_label, tr.vec_id AS t_id,
             tr.label AS t_label,
             FLOOR(list_cosine_similarity(te.v, tr.v) * 10000 + 0.5) / 10000
               AS cos
      FROM te, tr),
    nn AS (
      SELECT vec_id, true_label, t_label,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, t_id) AS r
      FROM sc),
    votes AS (
      SELECT vec_id, true_label, t_label, CAST(COUNT(*) AS BIGINT) AS n_votes
      FROM nn WHERE r <= 5 GROUP BY 1, 2, 3),
    win AS (
      SELECT vec_id, true_label, t_label AS pred_label,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY n_votes DESC, t_label) AS r
      FROM votes),
    preds AS (SELECT * FROM win WHERE r = 1),
    cls AS (SELECT DISTINCT true_label AS c FROM preds),
    m AS (
      SELECT cls.c,
             (SELECT COUNT(*) FROM preds
              WHERE true_label = cls.c AND pred_label = cls.c) AS tp,
             (SELECT COUNT(*) FROM preds WHERE pred_label = cls.c) AS pp,
             (SELECT COUNT(*) FROM preds WHERE true_label = cls.c) AS ap
      FROM cls)
    SELECT CAST(c AS BIGINT) AS label,
           CAST(tp AS BIGINT) AS tp,
           CAST(ap AS BIGINT) AS n_true,
           CAST(pp AS BIGINT) AS n_pred,
           FLOOR(CASE WHEN pp = 0 THEN 0.0
                      ELSE CAST(tp AS DOUBLE) / pp END * 10000 + 0.5) / 10000
             AS precision,
           FLOOR(CASE WHEN ap = 0 THEN 0.0
                      ELSE CAST(tp AS DOUBLE) / ap END * 10000 + 0.5) / 10000
             AS recall
    FROM m
    """,
)
def ml_confusion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall of the 5-NN classifier — the metric
    table a model card reports, computed on top of ml_knn_classify's
    exact prediction set so classifier and evaluation can't drift.

    Scale: predictions are |holdout| rows; the metric rollup is two
    tiny aggregates joined on label."""
    from mister_spark.operators.extras14 import ml_knn_classify

    preds = ml_knn_classify(spark, sf_dir)
    by_true = preds.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum(
            F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
        ).alias("tp"),
    )
    by_pred = preds.groupBy(F.col("pred_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    m = by_true.join(by_pred, "label", "left").withColumn(
        "n_pred", F.coalesce(F.col("n_pred"), F.lit(0))
    )
    return m.select(
        "label",
        F.col("tp").cast("long").alias("tp"),
        F.col("n_true").cast("long").alias("n_true"),
        F.col("n_pred").cast("long").alias("n_pred"),
        rnd(
            F.when(F.col("n_pred") == 0, 0.0).otherwise(
                F.col("tp").cast("double") / F.col("n_pred")
            ),
            4,
        ).alias("precision"),
        rnd(
            F.when(F.col("n_true") == 0, 0.0).otherwise(
                F.col("tp").cast("double") / F.col("n_true")
            ),
            4,
        ).alias("recall"),
    )
