"""Wave 85: privacy-budgeted release, budgeted curation, cluster
quality, and recency-weighted features.

ds_dp_noisy_counts releases per-source document counts with
ε-differential-privacy Laplace noise (deterministic portable noise so
the oracle replays the mechanism — a real deployment draws fresh
randomness); ds_token_budget_trim is greedy quality-per-token corpus
selection under a hard token budget — the knapsack step of every
"best N tokens" training-set cut; ml_silhouette scores the labeled
embedding clusters with the simplified (centroid) silhouette — the
standard "are these clusters real" number at O(n·k) instead of
O(n²); ev_decayed_counts is exponentially time-decayed event counts,
the trending-now feature that a plain COUNT can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.hashing import FP_MOD, FP_MUL
from mister_spark.functions.ranks import bucketed_cumsum, global_rank
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

DP_EPS = 1.0
TRIM_SHARE = 0.5  # keep the best docs totalling <= this token share
EMB_DIM = 64  # embeddings table vector width (fixed by TESTDATA.md)
DECAY_HALFLIFE_DAYS = 14.0


@query(
    "ds_dp_noisy_counts",
    oracle=f"""
    WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS true_count,
                      CAST(SUBSTR(source, 4) AS BIGINT) AS sid
               FROM documents GROUP BY 1),
    u AS (SELECT source, true_count,
                 ((sid * {FP_MUL} + 29) % {FP_MOD} + 0.5) / {FP_MOD} AS u
          FROM c)
    SELECT source, true_count,
           CAST(FLOOR(true_count
                      - (1.0 / {DP_EPS})
                        * SIGN(u - 0.5) * LN(1 - 2 * ABS(u - 0.5))
                      + 0.5) AS BIGINT) AS noisy_count,
           {DP_EPS} AS epsilon
    FROM u
    """,
)
def ds_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP release of per-source document counts via the Laplace
    mechanism: count + Lap(Δ/ε) with sensitivity Δ=1, ε={e}. The noise
    here is DETERMINISTIC (portable hash of the source id → inverse
    Laplace CDF) so the DuckDB oracle replays the mechanism exactly —
    a production release must draw fresh randomness; everything else
    (sensitivity accounting, the quantile transform, the rounding to
    integers) is the real mechanism. Assumes the testdata 'src{{N}}'
    source naming for the portable seed.

    Scale: one partial-agg shuffle to |sources| rows; the mechanism is
    per-group arithmetic."""
    docs = cat(spark, sf_dir)["documents"]
    c = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    sid = F.substring("source", 4, 10).cast("bigint")
    u = ((sid * FP_MUL + 29) % FP_MOD + 0.5) / FP_MOD
    lap = (
        -(1.0 / DP_EPS)
        * F.signum(u - 0.5)
        * F.log(1 - 2 * F.abs(u - 0.5))
    )
    return c.select(
        "source",
        "true_count",
        F.floor(F.col("true_count") + lap + 0.5).cast("bigint").alias(
            "noisy_count"
        ),
        F.lit(DP_EPS).alias("epsilon"),
    )


ds_dp_noisy_counts.__doc__ = ds_dp_noisy_counts.__doc__.format(e=DP_EPS)


@query(
    "ds_token_budget_trim",
    oracle=f"""
    WITH t AS (SELECT doc_id, CAST(len({DUCK_TOKENS}) AS BIGINT) AS tok,
                      FLOOR(CAST(len(list_distinct({DUCK_TOKENS})) AS DOUBLE)
                            / len({DUCK_TOKENS}) * 10000 + 0.5) / 10000 AS score
               FROM documents WHERE len({DUCK_TOKENS}) > 0),
    b AS (SELECT CAST(FLOOR(SUM(tok) * {TRIM_SHARE}) AS BIGINT) AS budget,
                 CAST(COUNT(*) AS BIGINT) AS docs_total FROM t),
    r AS (SELECT doc_id, tok, score,
                 SUM(tok) OVER (ORDER BY score DESC, doc_id) AS cum
          FROM t)
    SELECT b.budget,
           b.docs_total,
           CAST(COUNT(*) AS BIGINT) AS docs_kept,
           CAST(SUM(r.tok) AS BIGINT) AS tokens_kept,
           FLOOR(CAST(COUNT(*) AS DOUBLE) / b.docs_total * 10000 + 0.5)
             / 10000 AS keep_share
    FROM r, b WHERE r.cum <= b.budget
    GROUP BY b.budget, b.docs_total
    """,
)
def ds_token_budget_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted corpus curation: rank documents by quality-per-token
    (distinct-token ratio, rounded BEFORE ranking so both engines
    order identically), then keep the best prefix whose cumulative
    token count fits a {s:.0%}-of-corpus budget — the greedy knapsack
    every 'train on the best N tokens' cut performs.

    Scale: ranking is `global_rank` (two-phase range-partitioned sort)
    and the running token total is `bucketed_cumsum` (two-phase prefix
    sum) — no single-task window anywhere; the budget is a broadcast
    1-row frame."""
    toks = tokens()
    t = (
        cat(spark, sf_dir)["documents"]
        .select(
            "doc_id",
            F.size(toks).cast("bigint").alias("tok"),
            rnd(
                F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 4
            ).alias("score"),
        )
        .filter(F.col("tok") > 0)
        .localCheckpoint()
    )
    b = t.agg(
        F.floor(F.sum("tok") * TRIM_SHARE).cast("bigint").alias("budget"),
        F.count(F.lit(1)).cast("bigint").alias("docs_total"),
    )
    r = global_rank(t, F.col("score").desc(), "doc_id", rank_col="rk")
    cum = bucketed_cumsum(r, "rk", {"cum": F.col("tok")})
    return (
        cum.join(F.broadcast(b))
        .filter(F.col("cum") <= F.col("budget"))
        .groupBy("budget", "docs_total")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs_kept"),
            F.sum("tok").cast("bigint").alias("tokens_kept"),
            ratio(
                F.count(F.lit(1)).cast("double") / F.first("docs_total")
            ).alias("keep_share"),
        )
        .select(
            "budget", "docs_total", "docs_kept", "tokens_kept", "keep_share"
        )
    )


ds_token_budget_trim.__doc__ = ds_token_budget_trim.__doc__.format(
    s=TRIM_SHARE
)


@query(
    "ml_silhouette",
    oracle=f"""
    WITH cent AS (
      SELECT label, i, AVG(embedding[i]::DOUBLE) AS c
      FROM embeddings, generate_series(1, {EMB_DIM}) AS s(i)
      GROUP BY 1, 2),
    d AS (
      SELECT e.vec_id, e.label AS plabel, cent.label AS clabel,
             SQRT(SUM((e.embedding[cent.i]::DOUBLE - cent.c)
                      * (e.embedding[cent.i]::DOUBLE - cent.c))) AS dist
      FROM embeddings e, cent
      GROUP BY 1, 2, 3),
    ab AS (
      SELECT vec_id, plabel,
             MIN(CASE WHEN clabel = plabel THEN dist END) AS a,
             MIN(CASE WHEN clabel <> plabel THEN dist END) AS b
      FROM d GROUP BY 1, 2)
    SELECT CAST(plabel AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(AVG((b - a) / GREATEST(a, b)) * 10000 + 0.5) / 10000
             AS silhouette
    FROM ab GROUP BY 1
    """,
)
def ml_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid) silhouette per label over the embeddings:
    a = distance to own-label centroid, b = distance to the nearest
    other centroid, s = (b−a)/max(a,b) averaged per label — the O(n·k)
    cluster-quality score (full silhouette is O(n²) and dies first at
    scale). Near-zero values are themselves the reading: these labels
    are not metrically separated.

    Scale: centroids are ONE partial-agg shuffle keyed (label, dim)
    producing a k×d model broadcast back; scoring is a map-side k-way
    compare. Assumes the fixed {d}-dim embedding width."""
    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    cent = (
        emb.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy(F.col("label").alias("clabel"))
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("cvec")
        )
    )
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("cvec"), lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    d = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        F.col("label").alias("plabel"),
        "clabel",
        F.sqrt(d2).alias("dist"),
    )
    ab = d.groupBy("vec_id", "plabel").agg(
        F.min(F.when(F.col("clabel") == F.col("plabel"), F.col("dist"))).alias(
            "a"
        ),
        F.min(F.when(F.col("clabel") != F.col("plabel"), F.col("dist"))).alias(
            "b"
        ),
    )
    s = (F.col("b") - F.col("a")) / F.greatest("a", "b")
    return ab.groupBy(F.col("plabel").cast("bigint").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        ratio(F.avg(s)).alias("silhouette"),
    )


ml_silhouette.__doc__ = ml_silhouette.__doc__.format(d=EMB_DIM)


@query(
    "ev_decayed_counts",
    oracle=f"""
    WITH mx AS (SELECT MAX(ts) AS anchor FROM events),
    w AS (SELECT event_type,
                 EXP(-LN(2) / {DECAY_HALFLIFE_DAYS}
                     * (date_diff('second', ts, anchor) / 86400.0)) AS wt
          FROM events, mx)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS raw_count,
           FLOOR(SUM(wt) * 10000 + 0.5) / 10000 AS decayed_count,
           FLOOR(SUM(wt) / COUNT(*) * 10000 + 0.5) / 10000 AS recency_index
    FROM w GROUP BY 1
    """,
)
def ev_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed event counts per type (half-life
    {h} days, anchored at the corpus max timestamp): the trending-now
    feature — a type with the same raw volume but fresher timestamps
    scores strictly higher. recency_index (= decayed/raw) isolates
    freshness from volume.

    Scale: the anchor is a 1-row broadcast; the decayed sum is one
    partial-agg shuffle — mergeable across shards and incremental
    under multiplicative aging (state · 2^(-Δt/h) + new), which is how
    the same feature runs in the streaming twin."""
    ev = cat(spark, sf_dir)["events"]
    mx = ev.agg(F.max("ts").alias("anchor"))
    age_days = (
        F.col("anchor").cast("long") - F.col("ts").cast("long")
    ) / 86400.0
    wt = F.exp(F.lit(-0.6931471805599453 / DECAY_HALFLIFE_DAYS) * age_days)
    return (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("raw_count"),
            ratio(F.sum(wt)).alias("decayed_count"),
            ratio(F.sum(wt) / F.count(F.lit(1))).alias("recency_index"),
        )
    )


ev_decayed_counts.__doc__ = ev_decayed_counts.__doc__.format(
    h=DECAY_HALFLIFE_DAYS
)
