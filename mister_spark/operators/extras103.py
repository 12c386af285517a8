"""Wave 103: survey raking, multi-rater agreement, and aspect-ratio
bucketing.

stat_raking_ipf is iterative proportional fitting — reweight rows so
BOTH the weekday and the priority margins match target shares
simultaneously (the survey/causal-adjustment workhorse that a single
groupBy reweight can't do); stat_fleiss_kappa generalizes Cohen's
kappa to three raters — chance-corrected agreement for panels;
mm_aspect_buckets routes (stub-decoded) image dims into the nearest
aspect-ratio training bucket with the padding waste each pays — the
SDXL-style bucketing plan that turns mixed aspect corpora into
efficient batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

IPF_ITERS = 5
ASPECTS = (0.5, 0.75, 1.0, 1.3333, 2.0)


@query(
    "stat_raking_ipf",
    # Real oracle: every row's weight is a function of its (dw, pr)
    # cell, so IPF iterates on the 35-cell contingency table inside a
    # recursive CTE — each step is the dw-margin scale then the
    # pr-margin scale via window sums of wt·count. The margins the
    # Spark loop computes as row sums are the same cell sums.
    oracle=f"""
    WITH RECURSIVE o AS (
      SELECT isodow(CAST(o_orderdate AS DATE)) AS dw,
             CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS pr
      FROM orders
    ),
    cells AS (SELECT dw, pr, CAST(COUNT(*) AS DOUBLE) AS c
              FROM o GROUP BY 1, 2),
    nn AS (SELECT SUM(c) AS n FROM cells),
    ipf AS (
      SELECT 0 AS it, dw, pr, c, CAST(1.0 AS DOUBLE) AS wt FROM cells
      UNION ALL
      SELECT it + 1, dw, pr, c,
             wt1 * (n / 5.0) / (SUM(wt1 * c) OVER (PARTITION BY it, pr))
      FROM (
        SELECT f.it, f.dw, f.pr, f.c, nn.n,
               f.wt * (nn.n / 7.0)
               / (SUM(f.wt * f.c) OVER (PARTITION BY f.it, f.dw)) AS wt1
        FROM ipf f CROSS JOIN nn
        WHERE f.it < {IPF_ITERS}) h
    ),
    fin AS (SELECT dw, pr, c, wt FROM ipf WHERE it = {IPF_ITERS}),
    spread AS (SELECT MAX(wt) / MIN(wt) AS ws FROM fin)
    SELECT CAST(f.dw AS BIGINT) AS dw,
           CAST(SUM(f.c) AS BIGINT) AS n_raw,
           FLOOR(SUM(f.wt * f.c) / MAX(nn.n) * 10000 + 0.5) / 10000
             AS weighted_share,
           FLOOR(1.0 / 7.0 * 10000 + 0.5) / 10000 AS target_share,
           FLOOR(MAX(sp.ws) * 10000 + 0.5) / 10000 AS weight_spread
    FROM fin f CROSS JOIN nn CROSS JOIN spread sp
    GROUP BY f.dw
    """,
)
def stat_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raking (iterative proportional fitting) of order weights to
    UNIFORM target margins over weekday (7) and priority (5)
    simultaneously: alternate scaling the weights so each margin
    matches its target; after {it} rounds both margins hold at once —
    the adjustment that post-stratification on either single variable
    cannot deliver. Emits the weekday margin before/after plus the
    weight spread (design effect driver).

    Scale: weights live ON the rows (a data-sized column, never
    collected); each half-iteration is one margin aggregate
    (7- or 5-row) broadcast back as a multiplicative factor — 2·{it}
    tiny aggregates total, the IPF structure exactly."""
    orders = cat(spark, sf_dir)["orders"].select(
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).alias("dw"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("pr"),
    )
    w = orders.withColumn("wt", F.lit(1.0)).localCheckpoint()
    n = w.count()
    for _ in range(IPF_ITERS):
        m1 = w.groupBy("dw").agg(F.sum("wt").alias("mw"))
        w = (
            w.join(F.broadcast(m1), "dw")
            .withColumn("wt", F.col("wt") * (n / 7.0) / F.col("mw"))
            .drop("mw")
        )
        m2 = w.groupBy("pr").agg(F.sum("wt").alias("mp"))
        w = (
            w.join(F.broadcast(m2), "pr")
            .withColumn("wt", F.col("wt") * (n / 5.0) / F.col("mp"))
            .drop("mp")
        ).localCheckpoint()
    out = (
        w.groupBy("dw")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_raw"),
            ratio(F.sum("wt") / n).alias("weighted_share"),
        )
        .withColumn("target_share", ratio(F.lit(1.0 / 7.0)))
    )
    spread = w.agg(
        ratio(F.max("wt") / F.min("wt")).alias("weight_spread")
    )
    return out.crossJoin(F.broadcast(spread)).select(
        F.col("dw").cast("bigint").alias("dw"),
        "n_raw",
        "weighted_share",
        "target_share",
        "weight_spread",
    )


stat_raking_ipf.__doc__ = stat_raking_ipf.__doc__.format(it=IPF_ITERS)


@query(
    "stat_fleiss_kappa",
    oracle="""
    WITH r AS (SELECT vec_id,
                      CAST(CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
                           + CASE WHEN embedding[2] >= 0 THEN 1 ELSE 0 END
                           + CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END
                           AS DOUBLE) AS pos
               FROM embeddings),
    item AS (SELECT vec_id, pos, 3 - pos AS neg,
                    (pos * (pos - 1) + (3 - pos) * (2 - pos)) / (3 * 2)
                      AS pi
             FROM r),
    agg AS (SELECT AVG(pi) AS pbar,
                   AVG(pos / 3) AS pj,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM item)
    SELECT n AS items,
           FLOOR(pbar * 10000 + 0.5) / 10000 AS p_observed,
           FLOOR((pj * pj + (1 - pj) * (1 - pj)) * 10000 + 0.5) / 10000
             AS p_expected,
           FLOOR((pbar - (pj * pj + (1 - pj) * (1 - pj)))
                 / (1 - (pj * pj + (1 - pj) * (1 - pj))) * 10000 + 0.5)
             / 10000 AS fleiss_kappa
    FROM agg
    """,
)
def stat_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa for three binary 'raters' (the signs of embedding
    dims 1–3 — independent by construction, so κ ≈ 0 is the expected
    AND asserted outcome): per-item agreement Pᵢ = Σ nᵢⱼ(nᵢⱼ−1)/(r(r−1)),
    chance agreement from the pooled category shares, κ = (P̄−Pe)/(1−Pe).
    The panel-agreement number Cohen's two-rater kappa can't produce.

    Scale: one narrow pass per row, one global aggregate — no shuffle
    beyond the final 1-row reduction."""
    emb = cat(spark, sf_dir)["embeddings"]
    pos = (
        (F.col("embedding")[0] >= 0).cast("int")
        + (F.col("embedding")[1] >= 0).cast("int")
        + (F.col("embedding")[2] >= 0).cast("int")
    ).cast("double")
    item = emb.select(
        pos.alias("pos"),
        ((pos * (pos - 1) + (3 - pos) * (2 - pos)) / 6.0).alias("pi"),
    )
    agg = item.agg(
        F.avg("pi").alias("pbar"),
        F.avg(F.col("pos") / 3).alias("pj"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    pe = F.col("pj") * F.col("pj") + (1 - F.col("pj")) * (1 - F.col("pj"))
    return agg.select(
        F.col("n").alias("items"),
        ratio(F.col("pbar")).alias("p_observed"),
        ratio(pe).alias("p_expected"),
        ratio((F.col("pbar") - pe) / (1 - pe)).alias("fleiss_kappa"),
    )


def _aspect_case_sql() -> str:
    terms = []
    for a in ASPECTS:
        terms.append(f"ABS(LN(ar / {a}))")
    # argmin over the fixed bucket list via LEAST + CASE chain
    least = f"LEAST({', '.join(terms)})"
    cases = " ".join(
        f"WHEN ABS(LN(ar / {a})) = {least} THEN {a}" for a in ASPECTS
    )
    return f"(CASE {cases} END)"


@query(
    "mm_aspect_buckets",
    oracle=f"""
    WITH d AS (SELECT octet_length(encode(text)) AS n FROM documents),
    dims AS (SELECT 16 + (n % 64) AS w, 16 + ((n // 64) % 64) AS h FROM d),
    a AS (SELECT w, h, CAST(w AS DOUBLE) / h AS ar FROM dims),
    b AS (SELECT ar, {_aspect_case_sql()} AS bucket FROM a)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(AVG(1 - LEAST(ar / bucket, bucket / ar)) * 10000 + 0.5)
             / 10000 AS avg_padding_waste,
           FLOOR(MAX(1 - LEAST(ar / bucket, bucket / ar)) * 10000 + 0.5)
             / 10000 AS max_padding_waste
    FROM b GROUP BY 1
    """,
)
def mm_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing plan over the (stub-decoded) image dims:
    route each image to the nearest of {k} canonical aspect buckets
    (nearest in log-ratio — symmetric for wide/tall), and report per
    bucket the population and the padding waste (1 − min(r/b, b/r))
    batching at that bucket pays. The SDXL-style preprocessing plan
    that keeps mixed-aspect corpora from wasting half their pixels as
    pad. Dims follow the multimodal stub decoder's deterministic
    arithmetic, so the plan (not the decode) is what's tested.

    Scale: pure narrow arithmetic + one |buckets|-row rollup."""
    docs = cat(spark, sf_dir)["documents"]
    n = F.octet_length(F.encode("text", "UTF-8"))
    w = (16 + (n % 64)).cast("double")
    h = (16 + ((n / 64).cast("long") % 64)).cast("double")
    ar = w / h
    dist = [F.abs(F.log(ar / F.lit(a))) for a in ASPECTS]
    least = F.least(*dist)
    bucket = None
    for a, dx in zip(ASPECTS, dist):
        cond = dx == least
        bucket = (
            F.when(cond, F.lit(a))
            if bucket is None
            else bucket.when(cond, F.lit(a))
        )
    b = docs.select(ar.alias("ar"), bucket.alias("bucket"))
    waste = 1 - F.least(
        F.col("ar") / F.col("bucket"), F.col("bucket") / F.col("ar")
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        ratio(F.avg(waste)).alias("avg_padding_waste"),
        ratio(F.max(waste)).alias("max_padding_waste"),
    )


mm_aspect_buckets.__doc__ = mm_aspect_buckets.__doc__.format(k=len(ASPECTS))
