"""Wave 166: Kneser-Ney smoothing and next-word suggestion.

tx_kneser_ney evaluates an interpolated Kneser-Ney bigram model on
a held-out split against the add-one baseline — KN's continuation
counts ("how many contexts has this word completed?") are the
insight that made n-gram LMs competitive, measured head-to-head on
held-out NLL; tx_next_word builds the autocomplete table: the top
continuations of the most frequent context words with their
conditional probabilities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

KN_D = 0.75
NW_CONTEXTS = 5
NW_PER = 3

_DUCK_BG = f"""
    tk AS (SELECT doc_id, {DUCK_TOKENS} AS ts FROM documents),
    bg AS (SELECT doc_id, UNNEST(ts[1:len(ts) - 1]) AS v,
                  UNNEST(ts[2:len(ts)]) AS w FROM tk)
"""


def _bigram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("doc_id", tokens().alias("ts"))
    n = F.size("ts")
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice("ts", 1, n - 1),
            F.slice("ts", 2, n - 1),
            lambda x, y: F.struct(x.alias("v"), y.alias("w")),
        ),
    ).otherwise(F.array().cast("array<struct<v:string,w:string>>"))
    return t.select(
        "doc_id", F.explode(pairs).alias("p")
    ).select("doc_id", F.col("p.v").alias("v"), F.col("p.w").alias("w"))


@query(
    "tx_kneser_ney",
    oracle=f"""
    WITH {_DUCK_BG},
    tr AS (SELECT v, w, CAST(COUNT(*) AS DOUBLE) AS c FROM bg
           WHERE doc_id % 4 <> 0 GROUP BY 1, 2),
    ctx AS (SELECT v, SUM(c) AS cv,
                   CAST(COUNT(*) AS DOUBLE) AS n1v
            FROM tr GROUP BY 1),
    cont AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS nw FROM tr
             GROUP BY 1),
    tt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t,
                  CAST(COUNT(DISTINCT v) AS DOUBLE) AS vocab
           FROM tr),
    ev AS (SELECT e.v, e.w, COALESCE(tr.c, 0) AS c,
                  ctx.cv, ctx.n1v, cont.nw, tt.t, tt.vocab
           FROM (SELECT v, w FROM bg WHERE doc_id % 4 = 0) e
           JOIN ctx ON e.v = ctx.v
           JOIN cont ON e.w = cont.w
           LEFT JOIN tr ON e.v = tr.v AND e.w = tr.w, tt),
    p AS (SELECT (GREATEST(c - {KN_D}, 0) / cv
                  + {KN_D} * n1v / cv * (nw / t)) AS pkn,
                 (c + 1) / (cv + vocab) AS pao
          FROM ev)
    SELECT CAST(COUNT(*) AS BIGINT) AS eval_pairs,
           FLOOR(AVG(-LN(pkn)) * 10000 + 0.5) / 10000 AS kn_nll,
           FLOOR(AVG(-LN(pao)) * 10000 + 0.5) / 10000 AS addone_nll,
           CASE WHEN AVG(-LN(pkn)) < AVG(-LN(pao)) THEN 1 ELSE 0 END
             AS kn_wins
    FROM p
    """,
)
def tx_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (absolute discount
    D={d}) vs add-one smoothing, scored by held-out NLL on the
    doc_id%4==0 quarter (train on the rest). KN's lower-order
    term is the CONTINUATION probability — contexts completed, not
    raw frequency — the advantage that grows with vocabulary
    size (with only 31 words here the two land close). Held-out pairs whose
    context or word never trained are excluded on both engines
    (inner joins), so the comparison is apples-to-apples.

    Scale: the LM is three count tables keyed by unigram/bigram —
    at corpus scale they broadcast to the eval join; nothing here
    is iterative."""
    bg = _bigram_pairs(spark, sf_dir)
    tr = (
        bg.filter(F.col("doc_id") % 4 != 0)
        .groupBy("v", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    ctx = tr.groupBy("v").agg(
        F.sum("c").alias("cv"),
        F.count(F.lit(1)).cast("double").alias("n1v"),
    )
    cont = tr.groupBy("w").agg(
        F.count(F.lit(1)).cast("double").alias("nw")
    )
    tt = tr.agg(
        F.count(F.lit(1)).cast("double").alias("t"),
        F.countDistinct("v").cast("double").alias("vocab"),
    )
    ev = (
        bg.filter(F.col("doc_id") % 4 == 0)
        .select("v", "w")
        .join(F.broadcast(ctx), "v")
        .join(F.broadcast(cont), "w")
        .join(F.broadcast(tr), ["v", "w"], "left")
        .crossJoin(F.broadcast(tt))
        .withColumn("c", F.coalesce("c", F.lit(0.0)))
    )
    pkn = (
        F.greatest(F.col("c") - KN_D, F.lit(0.0)) / F.col("cv")
        + KN_D
        * F.col("n1v")
        / F.col("cv")
        * (F.col("nw") / F.col("t"))
    )
    pao = (F.col("c") + 1) / (F.col("cv") + F.col("vocab"))
    p = ev.select(pkn.alias("pkn"), pao.alias("pao"))
    return p.agg(
        F.count(F.lit(1)).cast("bigint").alias("eval_pairs"),
        ratio(F.avg(-F.log("pkn"))).alias("kn_nll"),
        ratio(F.avg(-F.log("pao"))).alias("addone_nll"),
        F.when(
            F.avg(-F.log("pkn")) < F.avg(-F.log("pao")), 1
        )
        .otherwise(0)
        .alias("kn_wins"),
    )


tx_kneser_ney.__doc__ = tx_kneser_ney.__doc__.format(d=KN_D)


@query(
    "tx_next_word",
    oracle=f"""
    WITH {_DUCK_BG},
    c AS (SELECT v, w, CAST(COUNT(*) AS DOUBLE) AS c FROM bg
          GROUP BY 1, 2),
    cv AS (SELECT v, SUM(c) AS cv FROM c GROUP BY 1),
    top_ctx AS (SELECT v, cv FROM cv
                ORDER BY cv DESC, v LIMIT {NW_CONTEXTS}),
    r AS (SELECT c.v, c.w, c.c / t.cv AS p,
                 ROW_NUMBER() OVER (PARTITION BY c.v
                                    ORDER BY c.c DESC, c.w) AS rk
          FROM c JOIN top_ctx t ON c.v = t.v)
    SELECT v AS context, w AS suggestion,
           CAST(rk AS BIGINT) AS rank,
           FLOOR(p * 10000 + 0.5) / 10000 AS prob
    FROM r WHERE rk <= {NW_PER}
    """,
)
def tx_next_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete table: for the {nc} most frequent context
    words, the top {np} next-word continuations with conditional
    probabilities — the bigram argmax that IS a baseline
    autocomplete. Per-context ranks come from a window PARTITIONED
    BY context (bounded by vocabulary fan-out, never data-sized).

    Scale: bigram counts in one shuffle; the context top-{nc} is a
    TakeOrdered and the per-context rank partitions by v."""
    from pyspark.sql import Window as W

    bg = _bigram_pairs(spark, sf_dir)
    c = bg.groupBy("v", "w").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    cv = c.groupBy("v").agg(F.sum("c").alias("cv"))
    top_ctx = cv.orderBy(F.col("cv").desc(), "v").limit(NW_CONTEXTS)
    r = c.join(F.broadcast(top_ctx), "v").withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("v").orderBy(F.col("c").desc(), "w")
        ),
    )
    return r.filter(F.col("rk") <= NW_PER).select(
        F.col("v").alias("context"),
        F.col("w").alias("suggestion"),
        F.col("rk").cast("bigint").alias("rank"),
        ratio(F.col("c") / F.col("cv")).alias("prob"),
    )


tx_next_word.__doc__ = tx_next_word.__doc__.format(
    nc=NW_CONTEXTS, np=NW_PER
)
