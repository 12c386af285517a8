"""Wave 100: frequency capping, sparse power iteration, and held-out
language-model evaluation.

ev_frequency_cap simulates a per-user daily exposure cap — the
what-if that says how much volume a cap of k actually removes and
from whom; ml_power_iteration_svd extracts the top singular
vector/value of the sparse doc×term tf-idf matrix by distributed
power iteration — two join-aggregate matvecs per round with only the
model-sized term vector ever collected (the LSA core, and the
pattern every spectral method at scale reduces to);
tx_lm_holdout_ppl trains the unigram LM on a deterministic 80% split
and scores perplexity on the held-out 20% with add-one smoothing —
the honest version of in-sample NLL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

CAP_K = 3  # max events served per user per day
PI_ITERS = 8
PI_TOP = 10
LM_HOLD = 5  # doc_id % LM_HOLD == 0 → held-out


@query(
    "ev_frequency_cap",
    oracle=f"""
    WITH s AS (SELECT event_type,
                      ROW_NUMBER() OVER (
                        PARTITION BY user_id,
                                     CAST(date_trunc('day', ts) AS DATE)
                        ORDER BY ts, event_id) AS rn
               FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS total,
           CAST(SUM(CASE WHEN rn <= {CAP_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS served,
           CAST(SUM(CASE WHEN rn > {CAP_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS suppressed,
           FLOOR(CAST(SUM(CASE WHEN rn > {CAP_K} THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000
             AS suppression_rate
    FROM s GROUP BY 1
    """,
)
def ev_frequency_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-cap simulation: impose a cap of {k} events per user
    per day (first-come order) and report, per event type, how much
    volume survives and how much the cap suppresses — the what-if
    every ads/notification system runs before changing its cap, as a
    pure query instead of an experiment.

    Scale: ONE shuffle on (user, day) drives the per-user-day
    row_number (bounded groups); the report is a |types|-row
    partial-agg rollup."""
    ev = cat(spark, sf_dir)["events"]
    day = F.date_trunc("day", "ts").cast("date")
    w = W.partitionBy("user_id", day).orderBy("ts", "event_id")
    s = ev.select("event_type", F.row_number().over(w).alias("rn"))
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("total"),
        F.sum((F.col("rn") <= CAP_K).cast("long"))
        .cast("bigint")
        .alias("served"),
        F.sum((F.col("rn") > CAP_K).cast("long"))
        .cast("bigint")
        .alias("suppressed"),
        ratio(
            F.sum((F.col("rn") > CAP_K).cast("double")) / F.count(F.lit(1))
        ).alias("suppression_rate"),
    )


ev_frequency_cap.__doc__ = ev_frequency_cap.__doc__.format(k=CAP_K)


@query(
    "ml_power_iteration_svd",
    # Real oracle: the AᵀA power iteration as a recursive CTE over the
    # (term, vx) vector — each step is the two sparse matvecs (per-doc
    # then per-term sums over the tf-idf triples) and an L2 window
    # normalization; terms that drop out of a matvec re-enter at 0 via
    # the terms-table left join, exactly like the Python dict default.
    # σ is the last step's pre-normalization norm^(1/2).
    oracle=f"""
    WITH RECURSIVE tf AS (SELECT doc_id, unnest({DUCK_TOKENS}) AS term
                          FROM documents),
    tfc AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
            FROM tf GROUP BY 1, 2),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df
              FROM tfc GROUP BY 1),
    a AS (SELECT t.doc_id, t.term, t.tf * LN(nd.n / d.df) AS w
          FROM tfc t JOIN dfreq d USING (term) CROSS JOIN nd),
    terms AS (SELECT term FROM dfreq),
    nt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM terms),
    pit AS (
      SELECT 0 AS it, term, 1.0 / SQRT(nt.m) AS vx
      FROM terms CROSS JOIN nt
      UNION ALL
      SELECT ci.it + 1, t.term,
             COALESCE(s.vx, 0.0)
             / SQRT(SUM(COALESCE(s.vx * s.vx, 0.0)) OVER ())
      FROM terms t
      CROSS JOIN (SELECT DISTINCT it FROM pit) ci
      LEFT JOIN (
        SELECT a2.term, SUM(a2.w * u.ux) AS vx
        FROM (SELECT a1.doc_id, SUM(a1.w * p.vx) AS ux
              FROM pit p JOIN a a1 ON a1.term = p.term
              GROUP BY a1.doc_id) u
        JOIN a a2 ON a2.doc_id = u.doc_id
        GROUP BY 1) s ON s.term = t.term
      WHERE ci.it < {PI_ITERS}
    ),
    sig AS (
      SELECT SQRT(SQRT(SUM(vxr * vxr))) AS sigma FROM (
        SELECT a2.term, SUM(a2.w * u.ux) AS vxr
        FROM (SELECT a1.doc_id, SUM(a1.w * p.vx) AS ux
              FROM pit p JOIN a a1 ON a1.term = p.term
              WHERE p.it = {PI_ITERS} - 1
              GROUP BY a1.doc_id) u
        JOIN a a2 ON a2.doc_id = u.doc_id
        GROUP BY 1) r
    )
    SELECT term, FLOOR(vx * 1e6 + 0.5) / 1e6 AS loading,
           FLOOR(sig.sigma * 10000 + 0.5) / 10000 AS sigma,
           CAST(nt.m AS BIGINT) AS vocab
    FROM pit CROSS JOIN sig CROSS JOIN nt
    WHERE it = {PI_ITERS}
    ORDER BY ABS(vx) DESC, term LIMIT {PI_TOP}
    """,
)
def ml_power_iteration_svd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top singular vector of the doc×term tf-idf matrix by power
    iteration on AᵀA: each round is (1) u = A·v — a broadcast of the
    |vocab|-sized term vector joined into the sparse (doc, term, w)
    triples and summed per doc, and (2) v' = Aᵀ·u — the transpose
    matvec summed per term; normalize, repeat. Converges to the
    dominant LSA topic; emits the top-{t} terms by loading plus the
    singular-value estimate per iteration's Rayleigh quotient. This
    two-join matvec IS how spectral anything scales on Spark.

    Scale: the triple store is the only data-sized frame (one tokenize
    pass, spread to full parallelism, checkpointed once and reused for
    df and A); the v-vector STAYS a DataFrame end to end — each matvec
    is a join (v broadcast: it's the model-sized state) and the whole
    {it}-round chain stays LAZY — the L2 normalization rides as an
    unpartitioned window over the |vocab|-sized result (the oracle's
    SUM() OVER ()), so the loop compiles to one linear plan executed as
    a single job instead of 3 driver-blocking jobs per round (measured
    at sf1: eager loop ~7 s warm, lazy chain 1.3 s; plan depth is
    linear in rounds because each round references the previous v
    once). The driver never holds anything O(|vocab|); σ travels as a
    column and the final top-{t} is an orderBy-limit TakeOrdered."""
    import math

    from pyspark.sql import Window

    from mister_spark.operators.common import spread

    docs = cat(spark, sf_dir)["documents"]
    toks = tokens()
    # one tokenize pass at full parallelism, reused by df and A (it ran
    # twice before: dfreq and a each re-evaluated the explode+groupBy)
    tf = (
        spread(docs)
        .select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .localCheckpoint()
    )
    n_docs = docs.count()
    # tf is distinct per (doc_id, term), so count(*) == countDistinct
    # without the two-phase distinct aggregate
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    a = (
        tf.join(F.broadcast(dfreq), "term")
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.log(F.lit(float(n_docs)) / F.col("df"))
            ).alias("w"),
        )
        .localCheckpoint()
    )
    terms_df = dfreq.select("term").localCheckpoint()
    m = terms_df.count()
    v = terms_df.select(
        "term", F.lit(1.0 / math.sqrt(m)).alias("vx")
    ).localCheckpoint()
    w_all = Window.partitionBy()  # |vocab| rows: single-task is fine
    nm = F.sum(F.col("vxr") * F.col("vxr")).over(w_all)
    for _ in range(PI_ITERS):
        u = (
            a.join(F.broadcast(v.select("term", "vx")), "term")
            .groupBy("doc_id")
            .agg(F.sum(F.col("w") * F.col("vx")).alias("ux"))
        )
        raw = (
            a.join(u, "doc_id")
            .groupBy("term")
            .agg(F.sum(F.col("w") * F.col("ux")).alias("vxr"))
        )
        # dropped-out terms re-enter at 0 via the terms left join,
        # exactly like the oracle's COALESCE; norm + division in the
        # same (single) eager job per round
        v = (
            terms_df.join(raw, "term", "left")
            .select("term", F.coalesce(F.col("vxr"), F.lit(0.0)).alias("vxr"))
            .select(
                "term",
                (
                    F.col("vxr")
                    / F.when(nm > 0, F.sqrt(nm)).otherwise(F.lit(1.0))
                ).alias("vx"),
                nm.alias("nm"),
            )
        )
    # σ = (last round's pre-normalization L2 norm)^(1/2), floor-rounded
    # in-frame (common.rnd's rule) for oracle parity
    sig = F.floor(F.sqrt(F.sqrt(F.col("nm"))) * 10000 + F.lit(0.5)) / 10000
    return (
        v.orderBy(F.abs(F.col("vx")).desc(), "term")
        .limit(PI_TOP)
        .select(
            "term",
            (F.floor(F.col("vx") * 1e6 + F.lit(0.5)) / 1e6).alias("loading"),
            sig.alias("sigma"),
            F.lit(int(m)).cast("long").alias("vocab"),
        )
    )


ml_power_iteration_svd.__doc__ = ml_power_iteration_svd.__doc__.format(
    t=PI_TOP, it=PI_ITERS
)


@query(
    "tx_lm_holdout_ppl",
    oracle=f"""
    WITH tr AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents
                WHERE doc_id % {LM_HOLD} <> 0),
    te AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents
           WHERE doc_id % {LM_HOLD} = 0),
    cnt AS (SELECT u AS term, CAST(COUNT(*) AS DOUBLE) AS c
            FROM (SELECT unnest(toks) AS u FROM tr) GROUP BY 1),
    tot AS (SELECT SUM(c) AS n,
                   (SELECT CAST(COUNT(*) AS DOUBLE) FROM cnt) AS vocab
            FROM cnt),
    ev AS (SELECT u AS term FROM (SELECT unnest(toks) AS u FROM te)),
    scored AS (SELECT COALESCE(cnt.c, 0) AS c, tot.n, tot.vocab
               FROM ev LEFT JOIN cnt ON ev.term = cnt.term, tot)
    SELECT CAST(COUNT(*) AS BIGINT) AS eval_tokens,
           CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS oov_tokens,
           FLOOR(AVG(-LN((c + 1) / (n + vocab + 1))) * 10000 + 0.5) / 10000
             AS nll,
           FLOOR(EXP(AVG(-LN((c + 1) / (n + vocab + 1)))) * 10000 + 0.5)
             / 10000 AS ppl
    FROM scored
    """,
)
def tx_lm_holdout_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out unigram perplexity: train counts on the 80% split
    (doc_id % {h} ≠ 0), score the held-out 20% with add-one smoothing
    over vocab+1 (the +1 slot is the OOV mass) — the honest eval that
    in-sample NLL (tx_unigram_nll) flatters, plus the OOV token count
    the smoothing had to absorb.

    Scale: train counts are one partial-agg shuffle to |vocab| rows,
    broadcast into the held-out token stream; the score is one
    aggregate."""
    docs = cat(spark, sf_dir)["documents"]
    toks = tokens()
    tr = docs.filter(F.col("doc_id") % LM_HOLD != 0).select(
        F.explode(toks).alias("term")
    )
    te = docs.filter(F.col("doc_id") % LM_HOLD == 0).select(
        F.explode(toks).alias("term")
    )
    cnt = tr.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("c"))
    tot = cnt.agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    scored = (
        te.join(F.broadcast(cnt), "term", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.coalesce("c", F.lit(0.0)).alias("c"), "n", "vocab"
        )
    )
    nll = F.avg(
        -F.log((F.col("c") + 1) / (F.col("n") + F.col("vocab") + 1))
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("eval_tokens"),
        F.sum((F.col("c") == 0).cast("long")).cast("bigint").alias(
            "oov_tokens"
        ),
        ratio(nll).alias("nll"),
        ratio(F.exp(nll)).alias("ppl"),
    )


tx_lm_holdout_ppl.__doc__ = tx_lm_holdout_ppl.__doc__.format(h=LM_HOLD)
