"""Wave 140: family-wise error control and top-weighted rank
agreement.

stat_holm_correction applies the Holm step-down adjustment to the
all-pairs Welch p-values — FWER control (no false positives AT ALL,
with high probability), the stricter guarantee BH's FDR deliberately
relaxes, and the right default when any single false claim is
expensive; ml_rbo_topk computes Rank-Biased Overlap between the
length-ranker and token-ranker top lists — the top-weighted
agreement measure that Kendall's tau (which weights rank 1 and rank
1000 equally) cannot provide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.functions.text import DUCK_TOKENS
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

RBO_P = 0.9
RBO_K = 50


@query(
    "stat_holm_correction",
    oracle=f"""
    WITH g AS (SELECT o_orderpriority AS grp, CAST(COUNT(*) AS DOUBLE) AS n,
                      AVG(o_totalprice) AS m, VAR_SAMP(o_totalprice) AS v
               FROM orders GROUP BY 1),
    pr AS (SELECT a.grp AS ga, b.grp AS gb,
                  ABS(a.m - b.m) / SQRT(a.v / a.n + b.v / b.n) AS z
           FROM g a JOIN g b ON a.grp < b.grp),
    pv AS (SELECT ga, gb, 2 * {normal_sf_sql("z")} AS p FROM pr),
    rk AS (SELECT ga, gb, p,
                  ROW_NUMBER() OVER (ORDER BY p, ga, gb) AS i,
                  CAST((SELECT COUNT(*) FROM pv) AS DOUBLE) AS m
           FROM pv),
    holm AS (SELECT ga, gb, p, i,
                    LEAST(MAX((m - i + 1) * p)
                          OVER (ORDER BY i ROWS UNBOUNDED PRECEDING),
                          1.0) AS p_holm
             FROM rk)
    SELECT ga AS group_a, gb AS group_b,
           FLOOR(p * 10000 + 0.5) / 10000 AS p_raw,
           FLOOR(p_holm * 10000 + 0.5) / 10000 AS p_holm,
           CAST(CASE WHEN p_holm < 0.05 THEN 1 ELSE 0 END AS BIGINT)
             AS significant
    FROM holm
    """,
)
def stat_holm_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-down FWER correction over the all-pairs Welch
    comparisons of priority mean prices: adjusted
    p_(i) = max_{{j≤i}}((m−j+1)·p_(j)) capped at 1 — uniformly more
    powerful than Bonferroni, and controlling the probability of ANY
    false rejection (where BH merely bounds the false-discovery
    RATE). On independent priorities, zero pairs survive — asserted.

    Scale: 5 group moments → 10 pair rows; the step-down is a prefix
    max over those 10 rows."""
    g = (
        cat(spark, sf_dir)["orders"]
        .groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("o_totalprice").alias("m"),
            F.var_samp("o_totalprice").alias("v"),
        )
    )
    a = g.select(
        F.col("grp").alias("ga"),
        F.col("n").alias("na"),
        F.col("m").alias("ma"),
        F.col("v").alias("va"),
    )
    b = g.select(
        F.col("grp").alias("gb"),
        F.col("n").alias("nb"),
        F.col("m").alias("mb"),
        F.col("v").alias("vb"),
    )
    pr = a.crossJoin(b).filter(F.col("ga") < F.col("gb"))
    z = F.abs(F.col("ma") - F.col("mb")) / F.sqrt(
        F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    )
    pv = pr.select("ga", "gb", (2 * normal_sf(z)).alias("p")).localCheckpoint()
    m = pv.count()
    w = W.orderBy("p", "ga", "gb")
    rk = pv.withColumn("i", F.row_number().over(w))
    holm = rk.withColumn(
        "p_holm",
        F.least(
            F.max((F.lit(float(m)) - F.col("i") + 1) * F.col("p")).over(
                W.orderBy("i").rowsBetween(W.unboundedPreceding, 0)
            ),
            F.lit(1.0),
        ),
    )
    return holm.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        ratio(F.col("p")).alias("p_raw"),
        ratio(F.col("p_holm")).alias("p_holm"),
        (F.col("p_holm") < 0.05).cast("bigint").alias("significant"),
    )


@query(
    "ml_rbo_topk",
    # Real oracle: RBO's prefix overlaps are closed-form — for a doc in
    # both top-k lists, it is inside both depth-d prefixes iff
    # max(rank_a, rank_b) <= d, so overlap_d is one filtered count and
    # the weighted sum runs over d = 1..k. Ranks are ROW_NUMBER under
    # the same total orders global_rank uses.
    oracle=f"""
    WITH docs AS (SELECT doc_id, n_chars,
                         CAST(len({DUCK_TOKENS}) AS BIGINT) AS tok_n
                  FROM documents),
    ra AS (SELECT doc_id, r FROM (
             SELECT doc_id,
                    ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r
             FROM docs) t WHERE r <= {RBO_K}),
    rb AS (SELECT doc_id, r FROM (
             SELECT doc_id,
                    ROW_NUMBER() OVER (ORDER BY tok_n DESC, doc_id) AS r
             FROM docs) t WHERE r <= {RBO_K}),
    m AS (SELECT GREATEST(ra.r, rb.r) AS mx
          FROM ra JOIN rb USING (doc_id)),
    ds AS (SELECT unnest(generate_series(1, {RBO_K})) AS d),
    terms AS (SELECT d.d,
                     (1 - {RBO_P}) * POWER({RBO_P}, d.d - 1) AS w,
                     CAST((SELECT COUNT(*) FROM m WHERE m.mx <= d.d)
                          AS DOUBLE) / d.d AS frac
              FROM ds d)
    SELECT CAST({RBO_K} AS BIGINT) AS k,
           FLOOR(SUM(w * frac) / SUM(w) * 10000 + 0.5) / 10000 AS rbo,
           FLOOR((SELECT COUNT(*) FROM m WHERE m.mx <= 10) / 10.0
                 * 10000 + 0.5) / 10000 AS top10_overlap
    FROM terms
    """,
)
def ml_rbo_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-Biased Overlap (p = {p}) between the two document rankers
    ml_rrf_fusion fuses (by raw length vs by token count), on their
    top-{k} lists: RBO = (1−p)·Σ p^(d−1)·|A_d ∩ B_d|/d — agreement
    weighted toward the TOP of the lists, where users actually look.
    Kendall/Spearman treat rank 1 and rank 1000 alike; RBO is the
    metric that matches how rankings are consumed.

    Scale: both rankers are the two-phase global_rank; only the two
    top-{k} lists (model-sized) are collected for the prefix-overlap
    recursion."""
    from mister_spark.functions.ranks import global_rank
    from mister_spark.functions.text import tokens

    docs = cat(spark, sf_dir)["documents"].select(
        "doc_id", "n_chars", F.size(tokens()).cast("long").alias("tok_n")
    ).localCheckpoint()
    ra = (
        global_rank(
            docs.select("doc_id", "n_chars"),
            F.col("n_chars").desc(),
            "doc_id",
            rank_col="r",
        )
        .filter(F.col("r") <= RBO_K)
        .orderBy("r")
        .collect()
    )
    rb = (
        global_rank(
            docs.select("doc_id", "tok_n"),
            F.col("tok_n").desc(),
            "doc_id",
            rank_col="r",
        )
        .filter(F.col("r") <= RBO_K)
        .orderBy("r")
        .collect()
    )
    la = [r["doc_id"] for r in ra]
    lb = [r["doc_id"] for r in rb]
    sa: set = set()
    sb: set = set()
    rbo = 0.0
    weight_sum = 0.0
    for d in range(1, RBO_K + 1):
        sa.add(la[d - 1])
        sb.add(lb[d - 1])
        overlap = len(sa & sb) / d
        wgt = (1 - RBO_P) * (RBO_P ** (d - 1))
        rbo += wgt * overlap
        weight_sum += wgt
    # truncated-list normalization: divide by the captured weight
    import math

    rbo_norm = rbo / weight_sum
    top10_overlap = len(set(la[:10]) & set(lb[:10])) / 10
    # cross-engine floor rounding (common.rnd's rule) for oracle parity
    row = (
        RBO_K,
        math.floor(rbo_norm * 10000 + 0.5) / 10000,
        math.floor(top10_overlap * 10000 + 0.5) / 10000,
    )
    return spark.createDataFrame(
        [row], "k long, rbo double, top10_overlap double"
    )


ml_rbo_topk.__doc__ = ml_rbo_topk.__doc__.format(p=RBO_P, k=RBO_K)
