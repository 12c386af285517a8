"""Wave 30: contrastive hard-negative mining, temperature-scaled source
mixtures, and activity-concentration (whale) curves.

Three training-pipeline staples: the negatives a contrastive run
actually learns from (similar embedding, different label), the
p_i ∝ n_i^α sampling mixture that keeps low-resource sources alive
without drowning the run in the head source, and the top-x%-of-users
concentration curve that tells you how skewed the event stream's key
distribution is (= how badly a user-keyed shuffle needs salting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import global_rank
from mister_spark.functions.vectors import dot as _dot, norm as _norm
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

MIX_ALPHA = 0.7
MIX_BUDGET = 10000  # documents drawn per epoch under the mixture
CONC_PCTS = (0.01, 0.1, 0.5)
HARD_NEG_K = 5


@query(
    "sim_hard_negatives",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, label AS q_label,
                      CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id >= 8)
    SELECT q_id, vec_id, cosine, rn FROM (
      SELECT q.q_id, c.vec_id,
             FLOOR(list_cosine_similarity(c.v, q.qv) * 10000 + 0.5) / 10000
               AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY q.q_id
               ORDER BY FLOOR(list_cosine_similarity(c.v, q.qv) * 10000 + 0.5)
                        / 10000 DESC, c.vec_id) AS rn
      FROM q, c WHERE c.label <> q.q_label)
    WHERE rn <= {HARD_NEG_K}
    """,
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query vector,
    the top-{HARD_NEG_K} most-cosine-similar corpus vectors with a
    DIFFERENT label — the negatives that actually move the loss (random
    negatives are trivially separated). Same plan skeleton as
    sim_topk_join (broadcast queries, codegen scoring, two-phase
    top-k), plus the label-inequality predicate evaluated before any
    ranking.

    Scale: scoring is one narrow pass over the corpus; the per-query
    window only ever sees ≤ |Q|·k·#partitions pruned survivors (the
    mapInPandas local top-k), so nothing data-sized is sorted."""
    from mister_spark.operators.similarity import _local_topk_per_q

    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
    )
    c = emb.filter(F.col("vec_id") >= 8)
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("label") != F.col("q_label"))
        .withColumn("cosine", rnd(_dot("v", "qv") / (_norm("v") * _norm("qv")), 4))
        .select("q_id", "vec_id", "cosine")
    )
    pruned = scored.mapInPandas(
        _local_topk_per_q(HARD_NEG_K, "cosine", ascending=False),
        "q_id long, vec_id long, cosine double",
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        pruned.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= HARD_NEG_K)
        .select("q_id", "vec_id", "cosine", "rn")
    )


@query(
    "ds_temperature_mix",
    oracle=f"""
    WITH g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(FLOOR(POWER(CAST(COUNT(*) AS DOUBLE), {MIX_ALPHA})
                                 * 1000000 + 0.5) AS BIGINT) AS w
               FROM documents GROUP BY 1),
    t AS (SELECT SUM(CAST(n_docs AS DOUBLE)) AS tot,
                 CAST(SUM(w) AS BIGINT) AS wtot
          FROM g)
    SELECT g.source, g.n_docs,
           FLOOR(n_docs / t.tot * 10000 + 0.5) / 10000 AS raw_share,
           FLOOR(CAST(g.w AS DOUBLE) / t.wtot * 10000 + 0.5) / 10000
             AS temp_share,
           CAST(FLOOR({MIX_BUDGET} * CAST(g.w AS DOUBLE) / t.wtot) AS BIGINT)
             AS sampled_docs
    FROM g, t
    """,
)
def ds_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling mixture over sources: draw
    probability ∝ n^{MIX_ALPHA} (α < 1 flattens the head source and
    keeps low-resource sources alive — the multilingual-corpus
    standard), with the per-source document quota for a
    {MIX_BUDGET}-doc epoch. Complements ds_domain_mix (which reports
    the raw mixture) with the resampled one. The n^α weights are
    snapped to a 1e-6 integer grid BEFORE the normalizer sum — wtot as
    a float sum is engine-summation-order-dependent, and the epoch
    quota floor sits exactly on integer boundaries it can flip.

    Scale: one partial-agg rollup to #sources rows; the normalizer is a
    1-row broadcast. Everything after the rollup is map-side."""
    docs = cat(spark, sf_dir)["documents"]
    nd = F.col("n_docs").cast("double")
    g = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    ).withColumn(
        "w",
        F.floor(F.pow(nd, F.lit(MIX_ALPHA)) * 1000000 + F.lit(0.5)).cast("bigint"),
    )
    t = g.agg(
        F.sum(nd).alias("tot"),
        F.sum("w").cast("bigint").alias("wtot"),
    )
    wd = F.col("w").cast("double")
    return g.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        ratio(nd / F.col("tot")).alias("raw_share"),
        ratio(wd / F.col("wtot")).alias("temp_share"),
        F.floor(MIX_BUDGET * wd / F.col("wtot")).cast("bigint").alias("sampled_docs"),
    )


@query(
    "ev_activity_concentration",
    oracle=f"""
    WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
               FROM events GROUP BY 1),
    r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS rk FROM u),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu, SUM(c) AS tot FROM u),
    p AS (SELECT unnest([{", ".join(str(p) for p in CONC_PCTS)}]) AS pct)
    SELECT p.pct,
           CAST(CEIL(t.nu * p.pct) AS BIGINT) AS n_top_users,
           FLOOR(SUM(CASE WHEN r.rk <= CEIL(t.nu * p.pct) THEN r.c ELSE 0 END)
                 / CAST(t.tot AS DOUBLE) * 10000 + 0.5) / 10000
             AS events_share
    FROM r, t, p
    GROUP BY p.pct, t.nu, t.tot
    """,
)
def ev_activity_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whale curve: share of ALL events contributed by the top 1%,
    10%, and 50% most-active users — the skew diagnostic that says how
    concentrated the stream's key distribution is (and therefore how
    badly a user-keyed shuffle wants salting; j_skew_salted is the
    cure this key measures the need for).

    Scale: the user rollup is one partial-agg shuffle; ranking is the
    two-phase `global_rank` (no single-task sort); totals are a 1-row
    broadcast and the three thresholds fan out map-side before a
    3-key aggregate."""
    ev = cat(spark, sf_dir)["events"]
    # checkpointed: three branches read it (rank input, rank offsets,
    # the totals row) — without this the events rollup replays per branch
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint()
    r = global_rank(u, F.desc("c"), F.asc("user_id"), rank_col="rk")
    t = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("nu"), F.sum("c").alias("tot")
    )
    pcts = F.explode(F.array(*[F.lit(p) for p in CONC_PCTS])).alias("pct")
    fan = r.crossJoin(F.broadcast(t)).select("c", "rk", "nu", "tot", pcts)
    thresh = F.ceil(F.col("nu") * F.col("pct"))
    return (
        fan.groupBy("pct", "nu", "tot")
        .agg(
            F.sum(F.when(F.col("rk") <= thresh, F.col("c")).otherwise(0)).alias(
                "in_top"
            )
        )
        .select(
            "pct",
            F.ceil(F.col("nu") * F.col("pct")).cast("bigint").alias("n_top_users"),
            ratio(F.col("in_top") / F.col("tot").cast("double")).alias(
                "events_share"
            ),
        )
    )
