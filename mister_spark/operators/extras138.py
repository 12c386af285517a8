"""Wave 138: packing boundary waste and BIC Bayes factors.

ds_pack_boundary_waste quantifies what concat-and-chunk packing
costs: within each packed training sequence, the share of token
PAIRS that cross document boundaries — the attention contamination
that boundary-aware masking (or best-fit packing) exists to remove,
measured on the repo's own ds_pack layout; stat_bic_bayes_factor
turns the urgent-vs-other mean-difference comparison into an
approximate Bayes factor via the BIC identity — model evidence
language (substantial/strong/decisive) instead of a bare p-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.operators.pipeline2 import PACK_SHARDS, SEQ_LEN
from mister_spark.registry import query

MAX_SEQS = 64  # constant series bound for the oracle (fixture scales)


@query(
    "ds_pack_boundary_waste",
    oracle=f"""
    WITH t AS (SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
                      CAST(len({DUCK_TOKENS}) AS BIGINT) AS n
               FROM documents),
    c AS (SELECT doc_id, shard, n,
                 CAST(SUM(n) OVER (PARTITION BY shard ORDER BY doc_id)
                      AS BIGINT) AS cum
          FROM t WHERE n >= 1),
    seg AS (SELECT shard, cum - n AS s, cum AS e FROM c),
    x AS (SELECT seg.shard, v.j,
                 LEAST(seg.e, (v.j + 1) * {SEQ_LEN})
                   - GREATEST(seg.s, v.j * {SEQ_LEN}) AS cnt
          FROM seg, (SELECT UNNEST(generate_series(0, {MAX_SEQS})) AS j) v
          WHERE v.j >= FLOOR(seg.s / {SEQ_LEN}.0)
            AND v.j <= FLOOR((seg.e - 1) / {SEQ_LEN}.0)),
    per AS (SELECT shard, j,
                   CAST(SUM(cnt) AS DOUBLE) AS used,
                   SUM(CAST(cnt AS DOUBLE) * cnt) AS sq,
                   CAST(COUNT(*) AS BIGINT) AS docs
            FROM x GROUP BY 1, 2)
    SELECT CAST(COUNT(*) AS BIGINT) AS sequences,
           FLOOR(AVG(1 - sq / (used * used)) * 10000 + 0.5) / 10000
             AS avg_cross_doc_pair_share,
           FLOOR(SUM(CASE WHEN docs = 1 THEN 1.0 ELSE 0 END) / COUNT(*)
                 * 10000 + 0.5) / 10000 AS pure_seq_share,
           FLOOR(AVG(CAST(docs AS DOUBLE)) * 10000 + 0.5) / 10000
             AS avg_docs_per_seq
    FROM per
    """,
)
def ds_pack_boundary_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing boundary waste on the ds_pack layout: per packed
    {L}-token sequence, 1 − Σcᵢ²/(Σcᵢ)² is the share of token pairs
    that CROSS document boundaries (cᵢ = tokens contributed by doc
    i). With ~50-token docs in {L}-token sequences this share is
    enormous — the quantified argument for boundary attention masks
    or best-fit packing, priced on the actual layout rather than
    asserted.

    Scale: document offsets come from the ds_pack per-shard prefix
    sums; each doc explodes into its (tiny) sequence range; the
    purity rollup keys on (shard, seq)."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).cast("bigint").alias("shard"),
        F.size(tokens()).cast("bigint").alias("n"),
    ).filter(F.col("n") >= 1)
    w = W.partitionBy("shard").orderBy("doc_id")
    c = t.withColumn("cum", F.sum("n").over(w).cast("bigint"))
    seg = c.select(
        "shard", (F.col("cum") - F.col("n")).alias("s"), F.col("cum").alias("e")
    )
    x = seg.select(
        "shard",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / SEQ_LEN).cast("int"),
                F.floor((F.col("e") - 1) / SEQ_LEN).cast("int"),
            )
        ).alias("j"),
        "s",
        "e",
    ).select(
        "shard",
        "j",
        (
            F.least(F.col("e"), (F.col("j") + 1) * SEQ_LEN)
            - F.greatest(F.col("s"), F.col("j").cast("bigint") * SEQ_LEN)
        ).alias("cnt"),
    )
    per = x.groupBy("shard", "j").agg(
        F.sum("cnt").cast("double").alias("used"),
        F.sum(F.col("cnt").cast("double") * F.col("cnt")).alias("sq"),
        F.count(F.lit(1)).cast("bigint").alias("docs"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("sequences"),
        ratio(
            F.avg(1 - F.col("sq") / (F.col("used") * F.col("used")))
        ).alias("avg_cross_doc_pair_share"),
        ratio(
            F.sum(F.when(F.col("docs") == 1, 1.0).otherwise(0.0))
            / F.count(F.lit(1))
        ).alias("pure_seq_share"),
        ratio(F.avg(F.col("docs").cast("double"))).alias(
            "avg_docs_per_seq"
        ),
    )


ds_pack_boundary_waste.__doc__ = ds_pack_boundary_waste.__doc__.format(
    L=SEQ_LEN
)


@query(
    "stat_bic_bayes_factor",
    oracle="""
    WITH d AS (SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
               END AS g, o_totalprice AS y
               FROM orders),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(y) AS sy, SUM(y * y) AS syy,
                 SUM(g * y) AS sy1, CAST(SUM(g) AS DOUBLE) AS n1
          FROM d),
    f AS (SELECT n, n1, n - n1 AS n0,
                 syy - sy * sy / n AS sse0,
                 syy - sy1 * sy1 / n1
                     - (sy - sy1) * (sy - sy1) / (n - n1) AS sse1
          FROM m),
    b AS (SELECT n,
                 n * LN(sse0 / n) + 1 * LN(n) AS bic0,
                 n * LN(sse1 / n) + 2 * LN(n) AS bic1
          FROM f)
    SELECT FLOOR((bic0 - bic1) / 2 * 10000 + 0.5) / 10000 AS log_bf10,
           FLOOR(EXP(LEAST((bic0 - bic1) / 2, 20.0)) * 10000 + 0.5) / 10000
             AS bf10_capped,
           CAST(CASE WHEN (bic0 - bic1) / 2 > 1.15 THEN 1 ELSE 0 END
                AS BIGINT) AS substantial_evidence
    FROM b
    """,
)
def stat_bic_bayes_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIC-approximate Bayes factor for 'URGENT orders have a
    different mean price' vs the pooled-mean null:
    ln BF₁₀ ≈ (BIC₀−BIC₁)/2 from the two models' residual sums — the
    unit-information-prior approximation that turns a comparison into
    evidence language (BF > ~3, i.e. ln BF > 1.1: substantial). On
    priority-independent prices the null should WIN (BF₁₀ < 1) —
    Bayes factors can support the null, which p-values never can, and
    that asymmetry is the point of shipping this op.

    Scale: one moments pass; both models are closed-form."""
    d = cat(spark, sf_dir)["orders"].select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("g"),
        F.col("o_totalprice").alias("y"),
    )
    m = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("g") * F.col("y")).alias("sy1"),
        F.sum("g").cast("double").alias("n1"),
    )
    n = F.col("n")
    n1 = F.col("n1")
    n0 = n - n1
    sse0 = F.col("syy") - F.col("sy") * F.col("sy") / n
    sse1 = (
        F.col("syy")
        - F.col("sy1") * F.col("sy1") / n1
        - (F.col("sy") - F.col("sy1")) * (F.col("sy") - F.col("sy1")) / n0
    )
    bic0 = n * F.log(sse0 / n) + 1 * F.log(n)
    bic1 = n * F.log(sse1 / n) + 2 * F.log(n)
    log_bf = (bic0 - bic1) / 2
    return m.select(
        ratio(log_bf).alias("log_bf10"),
        ratio(F.exp(F.least(log_bf, F.lit(20.0)))).alias("bf10_capped"),
        (log_bf > 1.15).cast("bigint").alias("substantial_evidence"),
    )
