"""Wave 25: journey predictability and cross-source duplication flows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

from mister_spark.operators.dedup import DD_NGRAM_ORACLE, HOT_SHINGLE_CAP


@query(
    "ev_entropy_rate",
    oracle="""
    WITH s AS (
      SELECT event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS nxt
      FROM events),
    pairs AS (
      SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
    marg AS (SELECT cur, SUM(n) AS nc FROM pairs GROUP BY 1),
    tot AS (SELECT SUM(n) AS nt FROM pairs)
    SELECT FLOOR(-SUM(CAST(p.n AS DOUBLE) / tot.nt
                      * LN(CAST(p.n AS DOUBLE) / m.nc))
                 * 10000 + 0.5) / 10000 AS entropy_rate,
           FLOOR(SUM(CASE WHEN p.cur = p.nxt THEN CAST(p.n AS DOUBLE)
                          ELSE 0.0 END) / MAX(tot.nt)
                 * 10000 + 0.5) / 10000 AS self_loop_share
    FROM pairs p JOIN marg m ON p.cur = m.cur, tot
    """,
)
def ev_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user-journey Markov chain, H(next|current) =
    −Σ p(cur,next)·ln p(next|cur), weighted by the empirical pair
    distribution — the single number for 'how predictable is the next
    action' (0 = deterministic journeys, ln|types| = uniform chaos) —
    plus the self-loop share (repeated same-type events). The
    information-theoretic summary of the ev_markov transition matrix.

    Scale: ev_markov's lead() shuffle produces the pair counts; the
    entropy sum runs on the |types|² frame."""
    ev = cat(spark, sf_dir)["events"]
    w = W.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    s = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = s.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n")).localCheckpoint()
    marg = pairs.groupBy("cur").agg(F.sum("n").alias("nc"))
    tot = pairs.agg(F.sum("n").alias("nt"))
    j = pairs.join(F.broadcast(marg), "cur").join(F.broadcast(tot))
    ent = -F.sum(
        F.col("n").cast("double")
        / F.col("nt")
        * F.log(F.col("n").cast("double") / F.col("nc"))
    )
    self_share = F.sum(
        F.when(F.col("cur") == F.col("nxt"), F.col("n").cast("double")).otherwise(
            0.0
        )
    ) / F.max("nt")
    return j.agg(
        rnd(ent, 4).alias("entropy_rate"),
        rnd(self_share, 4).alias("self_loop_share"),
    )


@query(
    "dd_cross_source",
    oracle=f"""
    WITH jac AS ({DD_NGRAM_ORACLE}),
    src AS (SELECT doc_id, source FROM documents)
    SELECT LEAST(sa.source, sb.source) AS source_a,
           GREATEST(sa.source, sb.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM jac JOIN src sa ON jac.doc_a = sa.doc_id
             JOIN src sb ON jac.doc_b = sb.doc_id
    GROUP BY 1, 2
    """,
)
def dd_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication flows: near-dup pairs (≥0.5 3-gram
    Jaccard, dd_ngram_jaccard's exact pair set) rolled up by unordered
    source pair — the matrix that answers 'which crawl sources copy
    from each other' and prices per-source dedup priorities. Diagonal
    rows are within-source duplication.

    Scale: the pair set is the dedup output (already bounded by the
    capped inverted index); the source rollup adds two broadcast dim
    joins on the small source map."""
    from mister_spark.operators.dedup import dd_ngram_jaccard

    jac = dd_ngram_jaccard(spark, sf_dir)
    src = cat(spark, sf_dir)["documents"].select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    return (
        jac.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
