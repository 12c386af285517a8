"""Wave 23: dedup savings accounting, period detection, CV fold
manifests, Heaps-law vocabulary growth, and mutual information.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

CV_FOLDS = 5
PERIODS = (7, 14)  # candidate periods in days


@query(
    "dd_savings_report",
    oracle="""
    WITH g AS (
      SELECT text, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY text)
    SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_removed,
           CAST(SUM((n - 1) * chars) AS BIGINT) AS chars_saved,
           FLOOR(CAST(SUM(n) - COUNT(*) AS DOUBLE) / SUM(n) * 10000 + 0.5)
             / 10000 AS dup_rate
    FROM g
    """,
)
def dd_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup savings accounting: documents removed, characters
    saved, and the duplicate rate — the one-row business case for
    running the dedup stage at all, and the number storage forecasts
    are built on.

    Scale: groups on xxhash64(text) like dd_exact so the shuffle
    carries 8-byte keys (the oracle groups by text — equivalent modulo
    2^-64 collisions); the report is a scalar fold of the group
    frame."""
    docs = cat(spark, sf_dir)["documents"]
    g = docs.groupBy(F.xxhash64("text").alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.max("n_chars").alias("chars")
    )
    return g.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        (F.sum("n") - F.count(F.lit(1))).cast("long").alias("n_removed"),
        F.sum((F.col("n") - 1) * F.col("chars")).cast("long").alias("chars_saved"),
        ratio(
            (F.sum("n") - F.count(F.lit(1))).cast("double") / F.sum("n")
        ).alias("dup_rate"),
    )


@query(
    "ev_periodogram",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    c AS (SELECT AVG(n) AS mu FROM daily),
    p AS (SELECT unnest([{", ".join(str(p) for p in PERIODS)}]) AS period),
    terms AS (
      SELECT p.period,
             SUM((d.n - c.mu) * COS(2 * PI() * d.day / p.period)) AS sc,
             SUM((d.n - c.mu) * SIN(2 * PI() * d.day / p.period)) AS ss,
             CAST(COUNT(*) AS BIGINT) AS nd
      FROM daily d, c, p GROUP BY 1)
    SELECT CAST(period AS BIGINT) AS period, nd,
           FLOOR((sc * sc + ss * ss) / nd * 100 + 0.5) / 100 AS power
    FROM terms
    """,
)
def ev_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram power at candidate periods (7 and 14 days) over the
    mean-centered daily volume series — 'is there a weekly cycle' as
    two numbers instead of an FFT dependency. cos/sin enter symmetric
    sums whose 2-dp rounding absorbs libm's ≤1-ulp drift.

    Scale: one daily rollup; the trig sums run over ≤ #days rows per
    candidate period."""
    ev = cat(spark, sf_dir)["events"]
    daily = ev.groupBy(F.expr("unix_micros(ts) div 86400000000").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    ).localCheckpoint()
    mu = daily.agg(F.avg("n").alias("mu"))
    periods = spark.createDataFrame([(p,) for p in PERIODS], "period long")
    pi2 = 2 * 3.141592653589793
    terms = (
        daily.join(F.broadcast(mu))
        .join(F.broadcast(periods))
        .groupBy("period")
        .agg(
            F.sum(
                (F.col("n") - F.col("mu"))
                * F.cos(F.lit(pi2) * F.col("day") / F.col("period"))
            ).alias("sc"),
            F.sum(
                (F.col("n") - F.col("mu"))
                * F.sin(F.lit(pi2) * F.col("day") / F.col("period"))
            ).alias("ss"),
            F.count(F.lit(1)).alias("nd"),
        )
    )
    return terms.select(
        "period",
        "nd",
        rnd((F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")) / F.col("nd"), 2)
        .alias("power"),
    )


@query(
    "ml_cv_splits",
    oracle=f"""
    SELECT ((vec_id * 2654435761) % 4294967296) % {CV_FOLDS} AS fold,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos,
           FLOOR(AVG(CASE WHEN label % 2 = 1 THEN 1.0 ELSE 0.0 END)
                 * 10000 + 0.5) / 10000 AS pos_share
    FROM embeddings GROUP BY 1
    """,
)
def ml_cv_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation manifest over the embeddings table:
    deterministic integer-mix fold assignment with per-fold size and
    class balance — the audit row that catches a skewed fold BEFORE a
    cross-validation run burns compute on it. Same reproducibility
    contract as ds_shard_assign.

    Scale: one 5-key aggregate; fold membership recomputes anywhere
    from vec_id alone."""
    emb = cat(spark, sf_dir)["embeddings"]
    fold = ((F.col("vec_id") * 2654435761) % 4294967296) % CV_FOLDS
    pos = F.col("label") % 2 == 1
    return emb.groupBy(fold.alias("fold")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(pos, 1).otherwise(0)).cast("long").alias("n_pos"),
        ratio(F.avg(F.when(pos, 1.0).otherwise(0.0))).alias("pos_share"),
    )


@query(
    "tx_vocab_growth",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest({DUCK_TOKENS}) AS tk FROM documents),
    first_seen AS (
      SELECT tk, MIN(doc_id) AS first_doc FROM t GROUP BY 1),
    per_doc AS (
      SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM first_seen GROUP BY 1),
    toks AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks FROM t GROUP BY 1)
    SELECT toks.doc_id,
           CAST(COALESCE(per_doc.n_new, 0) AS BIGINT) AS n_new_types,
           CAST(SUM(COALESCE(per_doc.n_new, 0))
                  OVER (ORDER BY toks.doc_id ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_vocab,
           CAST(SUM(toks.n_toks)
                  OVER (ORDER BY toks.doc_id ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_tokens
    FROM toks LEFT JOIN per_doc ON toks.doc_id = per_doc.doc_id
    """,
)
def tx_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: reading the corpus in doc_id
    order, new word types contributed by each document plus the running
    vocabulary and token totals — the curve whose flattening says 'more
    of the same data' and whose slope anomalies flag corpus seams.
    Built like ev_adoption_curve: each type's FIRST document is a
    min-aggregate, so no growing distinct state exists anywhere.

    Scale: one token shuffle for first-seen, one for per-doc counts;
    the cumulative totals over the #docs frame run through the
    two-phase `bucketed_cumsum` (range buckets → parallel partitioned
    window → broadcast carry), so no task ever sorts the whole doc
    frame."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("doc_id", F.explode(tokens()).alias("tk")).localCheckpoint()
    first_seen = t.groupBy("tk").agg(F.min("doc_id").alias("first_doc"))
    per_doc = first_seen.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    toks = t.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    j = toks.join(per_doc, "doc_id", "left").withColumn(
        "n_new", F.coalesce(F.col("n_new"), F.lit(0))
    )
    c = bucketed_cumsum(
        j, "doc_id", {"cum_vocab": F.col("n_new"), "cum_tokens": F.col("n_toks")}
    )
    return c.select(
        "doc_id",
        F.col("n_new").cast("long").alias("n_new_types"),
        F.col("cum_vocab").cast("long").alias("cum_vocab"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )


@query(
    "stat_mi",
    oracle="""
    WITH o AS (
      SELECT event_type AS et,
             CAST(date_part('isodow', ts) AS BIGINT) AS dw,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    tot AS (SELECT SUM(n) AS nt FROM o),
    r AS (SELECT et, SUM(n) AS nr FROM o GROUP BY 1),
    c AS (SELECT dw, SUM(n) AS nc FROM o GROUP BY 1)
    SELECT FLOOR(SUM(CAST(o.n AS DOUBLE) / tot.nt
                     * LN(CAST(o.n AS DOUBLE) * tot.nt / (r.nr * c.nc)))
                 * 10000 + 0.5) / 10000 AS mutual_info,
           CAST(MAX(tot.nt) AS BIGINT) AS n
    FROM o JOIN r ON o.et = r.et JOIN c ON o.dw = c.dw, tot
    """,
)
def stat_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and ISO weekday — the
    information-theoretic effect size for the same contingency table
    stat_chi2 tests (χ² says 'dependent?', MI says 'how many nats do
    you learn'). Zero cells contribute zero by construction (they never
    appear in the grouped frame).

    Scale: identical shape to stat_chi2 — one contingency aggregate,
    checkpointed, margins and the sum on the ≤ |types|×7 frame."""
    ev = cat(spark, sf_dir)["events"]
    dw = (((F.dayofweek("ts") + 5) % 7) + 1).cast("long")
    o = (
        ev.groupBy(F.col("event_type").alias("et"), dw.alias("dw"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    tot = o.agg(F.sum("n").alias("nt"))
    r = o.groupBy("et").agg(F.sum("n").alias("nr"))
    c = o.groupBy("dw").agg(F.sum("n").alias("nc"))
    j = (
        o.join(F.broadcast(r), "et")
        .join(F.broadcast(c), "dw")
        .join(F.broadcast(tot))
    )
    contrib = (
        F.col("n").cast("double")
        / F.col("nt")
        * F.log(F.col("n").cast("double") * F.col("nt") / (F.col("nr") * F.col("nc")))
    )
    return j.agg(
        rnd(F.sum(contrib), 4).alias("mutual_info"),
        F.max("nt").cast("long").alias("n"),
    )
