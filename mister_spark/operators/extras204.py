"""Wave 204: the two missing canonical models — multinomial NB and Cox.

ml_multinomial_nb is the Laplace-smoothed multinomial Naive Bayes text
classifier, trained on 80% of the documents table to predict lang from
unigram counts and scored on the held-out 20% — the trained-model
counterpart of the tx_langid heuristic (which has no training step and
no held-out accuracy), and the discrete sibling of ml_gaussian_nb.
ml_cox_ph is Cox proportional-hazards regression on time-to-first-
purchase — THE survival regression: ev_survival draws the
Kaplan-Meier curve, stat_logrank_test compares two curves, Cox puts a
coefficient, a hazard ratio, and a p-value on the covariate (here:
whether the user was multi-event-engaged on day one), fitted by
Newton-Raphson on the partial likelihood with Breslow tie handling.

Exactness: NB likelihoods are ratios of integer counts (Laplace +1,
vocab size V), scores are LN sums ROUNDED to the 1e-6 grid before the
argmax (lang tie-break); Cox risk sets and death counts are exact
integers from prefix sums, the Newton recursion replays as a recursive
CTE, and the p-value reuses the shared A&S normal polynomial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

NB_TEST_MOD = 5  # doc_id % 5 == 0 -> held-out test fold (20%)
COX_ITERS = 6


@query(
    "ml_multinomial_nb",
    # Real oracle: the fold split is an integer mod, token/class
    # counts are integers, every likelihood is LN((c+1)/(tot+V)) of
    # identical integer ratios, and per-doc class scores are ROUNDED
    # to the 1e-6 grid before the (score DESC, lang) argmax — so the
    # predictions are grid-deterministic in both engines.
    oracle=f"""
    WITH docs AS (SELECT doc_id, lang, {DUCK_TOKENS} AS toks
                  FROM documents),
    train AS (SELECT * FROM docs WHERE doc_id % {NB_TEST_MOD} <> 0),
    test AS (SELECT * FROM docs WHERE doc_id % {NB_TEST_MOD} = 0),
    tw AS (SELECT lang, unnest(toks) AS w FROM train),
    cnt AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
            FROM tw GROUP BY 1, 2),
    tot AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS tl,
                   CAST(COUNT(DISTINCT w) AS BIGINT) AS _x
            FROM tw GROUP BY 1),
    voc AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM tw),
    pri AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS dl FROM train
            GROUP BY 1),
    ntr AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM train),
    tstw AS (SELECT doc_id, lang AS truth, unnest(toks) AS w FROM test),
    scored AS (
      SELECT ts.doc_id, ts.truth, pri.lang,
             LN(CAST(pri.dl AS DOUBLE) / ntr.nt)
               + SUM(LN(CAST(COALESCE(cnt.c, 0) + 1 AS DOUBLE)
                        / (tot.tl + voc.v))) AS score
      FROM tstw ts
      CROSS JOIN pri
      CROSS JOIN ntr
      CROSS JOIN voc
      JOIN tot ON tot.lang = pri.lang
      LEFT JOIN cnt ON cnt.lang = pri.lang AND cnt.w = ts.w
      GROUP BY 1, 2, 3, pri.dl, ntr.nt),
    pred AS (SELECT doc_id, truth, lang AS pred FROM (
        SELECT doc_id, truth, lang,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY FLOOR(score * 1e6 + 0.5) / 1e6 DESC, lang) AS rn
        FROM scored) q
      WHERE rn = 1),
    base AS (SELECT CAST(MAX(cl) AS DOUBLE) / SUM(cl) AS maj FROM (
        SELECT COUNT(*) AS cl FROM test GROUP BY lang) q)
    SELECT (SELECT nt FROM ntr) AS n_train,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM test) AS n_test,
           (SELECT v FROM voc) AS vocab,
           FLOOR((SELECT AVG(CASE WHEN pred = truth THEN 1.0 ELSE 0.0 END)
                  FROM pred) * 1e4 + 0.5) / 1e4 AS accuracy,
           FLOOR((SELECT maj FROM base) * 1e4 + 0.5) / 1e4
             AS majority_baseline
    """,
)
def ml_multinomial_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier: train on the 80%
    fold (doc_id % 5 != 0), Laplace-smoothed unigram likelihoods
    (c+1)/(tot_lang + V), log-prior from class frequencies, and
    argmax over grid-rounded log-posteriors on the held-out fold.
    Reported against the majority-class baseline — the number that
    says whether the model learned anything. tx_langid is the
    zero-training heuristic; this is the trained generative model a
    curation pipeline fits per corpus snapshot.

    Scale: training is ONE exploded-token groupBy (map-side
    combinable) to a (lang x vocab) count frame; scoring joins test
    tokens against it — a hash join keyed on the token, with the
    5-row prior/total frames broadcast. The per-doc argmax is a
    window over 5 rows per doc. No driver state, no UDFs."""
    docs = cat(spark, sf_dir)["documents"].select(
        "doc_id", "lang", tokens().alias("toks")
    )
    train = docs.filter(F.col("doc_id") % NB_TEST_MOD != 0)
    test = docs.filter(F.col("doc_id") % NB_TEST_MOD == 0)
    tw = train.select(
        "lang", F.explode("toks").alias("w")
    ).localCheckpoint()  # feeds counts, totals, vocab
    cnt = tw.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    tot = tw.groupBy("lang").agg(F.count(F.lit(1)).alias("tl"))
    voc = tw.agg(F.countDistinct("w").alias("v"))
    pri = train.groupBy("lang").agg(F.count(F.lit(1)).alias("dl"))
    ntr = train.agg(F.count(F.lit(1)).alias("nt"))
    tstw = test.select(
        "doc_id", F.col("lang").alias("truth"), F.explode("toks").alias("w")
    )
    langs = pri.join(F.broadcast(ntr)).select(
        F.col("lang").alias("cl"), "dl", "nt"
    )
    scored = (
        tstw.crossJoin(F.broadcast(langs))
        .join(
            cnt.select(F.col("lang").alias("cl"), "w", "c"),
            ["cl", "w"],
            "left",
        )
        .join(F.broadcast(tot.select(F.col("lang").alias("cl"), "tl")), "cl")
        .crossJoin(F.broadcast(voc))
        .groupBy("doc_id", "truth", "cl", "dl", "nt")
        .agg(
            F.sum(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                    / (F.col("tl") + F.col("v"))
                )
            ).alias("lsum")
        )
        .select(
            "doc_id",
            "truth",
            "cl",
            (
                F.log(F.col("dl").cast("double") / F.col("nt"))
                + F.col("lsum")
            ).alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(
        rnd(F.col("score"), 6).desc(), F.col("cl")
    )
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "truth", F.col("cl").alias("pred"))
    )
    acc = pred.agg(
        F.avg(
            F.when(F.col("pred") == F.col("truth"), 1.0).otherwise(0.0)
        ).alias("acc")
    )
    base = (
        test.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cl"))
        .agg(
            (
                F.max("cl").cast("double") / F.sum("cl")
            ).alias("maj")
        )
    )
    ntest = test.agg(F.count(F.lit(1)).alias("n_test"))
    return (
        ntr.crossJoin(F.broadcast(ntest))
        .crossJoin(F.broadcast(voc))
        .crossJoin(F.broadcast(acc))
        .crossJoin(F.broadcast(base))
        .select(
            F.col("nt").cast("bigint").alias("n_train"),
            F.col("n_test").cast("bigint").alias("n_test"),
            F.col("v").cast("bigint").alias("vocab"),
            rnd(F.col("acc"), 4).alias("accuracy"),
            rnd(F.col("maj"), 4).alias("majority_baseline"),
        )
    )


# Newton step shared algebra: per event-time row (dtot, d1, r0, r1)
# with eb = EXP(b): U += d1 - dtot*r1*eb/(r0+r1*eb);
#                   I += dtot*r0*r1*eb/(r0+r1*eb)^2  (Breslow ties)
def _cox_day_frame_sql() -> str:
    return """
    u AS (SELECT user_id,
                 MIN(epoch_us(ts) // 86400000000) AS d0,
                 MIN(CASE WHEN event_type = 'purchase'
                     THEN epoch_us(ts) // 86400000000 END) AS dp
          FROM events GROUP BY 1),
    hz AS (SELECT MAX(epoch_us(ts) // 86400000000) AS maxd FROM events),
    fstday AS (SELECT e.user_id,
                      CAST(COUNT(*) AS BIGINT) AS c0
               FROM events e JOIN u ON u.user_id = e.user_id
               WHERE epoch_us(e.ts) // 86400000000 = u.d0
               GROUP BY 1),
    lab AS (SELECT u.user_id,
                   CASE WHEN u.dp IS NOT NULL THEN u.dp - u.d0
                        ELSE hz.maxd - u.d0 END AS t,
                   CASE WHEN u.dp IS NOT NULL THEN 1 ELSE 0 END AS ev,
                   CASE WHEN f.c0 >= 2 THEN 1 ELSE 0 END AS x
            FROM u JOIN fstday f ON f.user_id = u.user_id, hz),
    g AS (SELECT t,
                 CAST(SUM(CASE WHEN x = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cnt0,
                 CAST(SUM(CASE WHEN x = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cnt1,
                 CAST(SUM(CASE WHEN x = 0 AND ev = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS dd0,
                 CAST(SUM(CASE WHEN x = 1 AND ev = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS dd1
          FROM lab GROUP BY 1),
    nn AS (SELECT SUM(cnt0) AS n0, SUM(cnt1) AS n1 FROM g),
    etf AS (SELECT t, dd0 + dd1 AS dtot, dd1,
                   nn.n0 - COALESCE(SUM(cnt0) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS r0,
                   nn.n1 - COALESCE(SUM(cnt1) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS r1
            FROM g, nn
            QUALIFY dtot > 0)"""


@query(
    "ml_cox_ph",
    # Real oracle: risk sets / death counts are exact integer prefix
    # sums over the duration frame; the Newton recursion replays as a
    # recursive CTE carrying beta with identical per-row algebra
    # (eb = EXP(b), the Breslow U and I sums); SE/z/p reuse the shared
    # A&S normal polynomial. Only EXP/sum ulps drift, inside the grid.
    oracle=f"""
    WITH RECURSIVE
    {_cox_day_frame_sql()},
    newton AS (
      SELECT 0 AS it, CAST(0.0 AS DOUBLE) AS b
      UNION ALL
      SELECT q.it + 1,
             CASE WHEN q.info > 0 THEN q.b + q.score / q.info
                  ELSE q.b END
      FROM (SELECT n.it, n.b,
                   SUM(e.dd1 - e.dtot * e.r1 * EXP(n.b)
                       / (e.r0 + e.r1 * EXP(n.b))) AS score,
                   SUM(e.dtot * e.r0 * e.r1 * EXP(n.b)
                       / ((e.r0 + e.r1 * EXP(n.b))
                          * (e.r0 + e.r1 * EXP(n.b)))) AS info
            FROM newton n, etf e
            WHERE n.it < {COX_ITERS}
            GROUP BY 1, 2) q
    ),
    bfin AS (SELECT b FROM newton WHERE it = {COX_ITERS}),
    ifin AS (SELECT SUM(e.dtot * e.r0 * e.r1 * EXP(b.b)
                        / ((e.r0 + e.r1 * EXP(b.b))
                           * (e.r0 + e.r1 * EXP(b.b)))) AS info
             FROM etf e, bfin b),
    st AS (SELECT b.b, i.info,
                  CASE WHEN i.info > 0 THEN b.b * SQRT(i.info)
                       ELSE 0.0 END AS z
           FROM bfin b, ifin i)
    SELECT (SELECT CAST(n0 + n1 AS BIGINT) FROM nn) AS n_users,
           (SELECT CAST(SUM(dtot) AS BIGINT) FROM etf) AS n_events,
           FLOOR(b * 1e6 + 0.5) / 1e6 AS beta,
           FLOOR(EXP(b) * 1e6 + 0.5) / 1e6 AS hazard_ratio,
           FLOOR(CASE WHEN info > 0 THEN 1.0 / SQRT(info) ELSE 0.0 END
                 * 1e6 + 0.5) / 1e6 AS se,
           FLOOR(z * 1e4 + 0.5) / 1e4 AS z,
           FLOOR(2.0 * {normal_sf_sql("ABS(z)")} * 1e6 + 0.5) / 1e6
             AS p_value
    FROM st
    """,
)
def ml_cox_ph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox proportional-hazards regression of time-to-first-purchase
    (days from a user's first event to their first purchase, censored
    at the corpus horizon if they never buy) on day-one engagement
    (>= 2 first-day events):
    Newton-Raphson on the partial likelihood with Breslow ties —
    beta, the hazard ratio exp(beta), its SE from the observed
    information, and the Wald p-value. The K-M curve (ev_survival)
    describes; the log-rank (stat_logrank_test) compares; Cox
    QUANTIFIES — one number for 'engaged users churn at X times the
    rate', adjusted for when they entered the risk set.

    Scale: one per-user collapse (shuffle on user_id), a day-grain
    group frame, integer prefix sums for the risk sets (calendar-
    bounded), then {it} Newton rounds of ONE tiny aggregation each
    over the event-time frame — statistics to the driver, never
    rows. The oracle replays the same recursion as a recursive
    CTE."""
    ev = cat(spark, sf_dir)["events"].select(
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        "user_id",
        "event_type",
    ).localCheckpoint()  # feeds the user collapse, horizon, first-day join
    u = (
        ev.groupBy("user_id")
        .agg(
            F.min("day").alias("d0"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("day"))
            ).alias("dp"),
        )
        .localCheckpoint()  # feeds first-day join + labels
    )
    fstday = (
        ev.join(u.select("user_id", "d0"), "user_id")
        .filter(F.col("day") == F.col("d0"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c0"))
    )
    horizon = ev.agg(F.max("day").alias("maxd"))
    lab = (
        u.join(fstday, "user_id")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("dp").isNotNull(), F.col("dp") - F.col("d0")
            )
            .otherwise(F.col("maxd") - F.col("d0"))
            .alias("t"),
            F.when(F.col("dp").isNotNull(), 1).otherwise(0).alias("ev"),
            F.when(F.col("c0") >= 2, 1).otherwise(0).alias("x"),
        )
    )
    g = lab.groupBy("t").agg(
        F.sum(F.when(F.col("x") == 0, 1).otherwise(0)).alias("cnt0"),
        F.sum(F.when(F.col("x") == 1, 1).otherwise(0)).alias("cnt1"),
        F.sum(
            F.when((F.col("x") == 0) & (F.col("ev") == 1), 1).otherwise(0)
        ).alias("dd0"),
        F.sum(
            F.when((F.col("x") == 1) & (F.col("ev") == 1), 1).otherwise(0)
        ).alias("dd1"),
    )
    nn = g.agg(F.sum("cnt0").alias("n0"), F.sum("cnt1").alias("n1"))
    cum = bucketed_cumsum(
        g, "t", {"p0": F.col("cnt0"), "p1": F.col("cnt1")}
    )
    etf = (
        cum.crossJoin(F.broadcast(nn))
        .select(
            "t",
            (F.col("dd0") + F.col("dd1")).alias("dtot"),
            "dd1",
            # inclusive prefix minus own bucket = strictly-before sum
            (F.col("n0") - (F.col("p0") - F.col("cnt0"))).alias("r0"),
            (F.col("n1") - (F.col("p1") - F.col("cnt1"))).alias("r1"),
        )
        .filter(F.col("dtot") > 0)
        .localCheckpoint()  # feeds every Newton round + final stats
    )
    b = 0.0
    info = 0.0
    for _ in range(COX_ITERS):
        eb = F.exp(F.lit(b))
        s0 = F.col("r0") + F.col("r1") * eb
        s = etf.agg(
            F.sum(
                F.col("dd1") - F.col("dtot") * F.col("r1") * eb / s0
            ).alias("score"),
            F.sum(
                F.col("dtot")
                * F.col("r0")
                * F.col("r1")
                * eb
                / (s0 * s0)
            ).alias("info"),
        ).collect()[0]
        if s["info"] and s["info"] > 0:
            b = b + s["score"] / s["info"]
    eb = F.exp(F.lit(b))
    s0 = F.col("r0") + F.col("r1") * eb
    fin = etf.agg(
        F.sum("dtot").alias("n_events"),
        F.sum(
            F.col("dtot") * F.col("r0") * F.col("r1") * eb / (s0 * s0)
        ).alias("info"),
    ).crossJoin(F.broadcast(nn))
    infoc = F.col("info")
    z = F.when(infoc > 0, F.lit(b) * F.sqrt(infoc)).otherwise(0.0)
    return fin.select(
        (F.col("n0") + F.col("n1")).cast("bigint").alias("n_users"),
        F.col("n_events").cast("bigint").alias("n_events"),
        rnd(F.lit(b), 6).alias("beta"),
        rnd(F.exp(F.lit(b)), 6).alias("hazard_ratio"),
        rnd(
            F.when(infoc > 0, 1.0 / F.sqrt(infoc)).otherwise(0.0), 6
        ).alias("se"),
        rnd(z, 4).alias("z"),
        rnd(2.0 * normal_sf(F.abs(z)), 6).alias("p_value"),
    )


ml_cox_ph.__doc__ = ml_cox_ph.__doc__.format(it=COX_ITERS)
