"""Wave 130: sequential pattern mining, combined p-values, and
degenerate-document detection.

ev_sequential_patterns mines ORDERED type patterns a→b within
sessions (some a strictly before some b) with support and lift —
order is what separates 'view then purchase' from mere
co-occurrence; stat_fisher_combined pools the per-weekday
type×status independence tests with Fisher's −2Σln p (exact even-df
chi-square tails shared across engines) — one verdict from seven
underpowered strata; tx_degenerate_docs counts the pathological
documents (single-type, ultra-low entropy) that slip every
statistical filter yet poison tokenizers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

SESSION_GAP_US = 30 * 60 * 1_000_000
DEGEN_ENTROPY = 0.5  # nats


@query(
    "ev_sequential_patterns",
    oracle=f"""
    WITH t AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id
               FROM events),
    flagged AS (
      SELECT user_id, event_type, tus, event_id,
             CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id
                                            ORDER BY tus, event_id)
                       > {SESSION_GAP_US}
                  OR LAG(tus) OVER (PARTITION BY user_id
                                    ORDER BY tus, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM t),
    sess AS (
      SELECT user_id, event_type, tus,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged),
    su AS (SELECT user_id, sess_id, event_type,
                  MIN(tus) AS first_t, MAX(tus) AS last_t
           FROM sess GROUP BY 1, 2, 3),
    ns AS (SELECT CAST(COUNT(DISTINCT user_id || '-' || sess_id) AS DOUBLE)
             AS n
           FROM su),
    pres AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS c
             FROM su GROUP BY 1),
    pat AS (SELECT a.event_type AS ta, b.event_type AS tb,
                   CAST(COUNT(*) AS DOUBLE) AS sup
            FROM su a JOIN su b
              ON a.user_id = b.user_id AND a.sess_id = b.sess_id
             AND a.event_type <> b.event_type
             AND a.first_t < b.last_t
            GROUP BY 1, 2)
    SELECT pat.ta AS antecedent, pat.tb AS consequent,
           CAST(pat.sup AS BIGINT) AS support_sessions,
           FLOOR(pat.sup * ns.n / (pa.c * pb.c) * 10000 + 0.5) / 10000
             AS lift
    FROM pat
    JOIN pres pa ON pat.ta = pa.event_type
    JOIN pres pb ON pat.tb = pb.event_type, ns
    """,
)
def ev_sequential_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining (length-2): within each session,
    a→b holds when SOME a-event strictly precedes some b-event
    (min(a) < max(b)); support in sessions plus lift against
    independent presence. Direction asymmetry (view→purchase ≫
    purchase→view) is what co-occurrence mining cannot express.

    Scale: per-(session, type) first/last times collapse each
    session to ≤|types| rows in the sessionize exchange; the ordered
    join is per-session local on that summary — never the raw event
    pairs; the |types|² pattern table aggregates map-side."""
    ev = cat(spark, sf_dir)["events"]
    t = ev.select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    flagged = t.withColumn(
        "new_sess",
        F.when(
            (F.col("tus") - F.lag("tus").over(w) > SESSION_GAP_US)
            | F.lag("tus").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    su = sess.groupBy("user_id", "sess_id", "event_type").agg(
        F.min("tus").alias("first_t"), F.max("tus").alias("last_t")
    ).localCheckpoint()
    ns = su.select("user_id", "sess_id").distinct().count()
    pres = su.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    a = su.select(
        "user_id", "sess_id", F.col("event_type").alias("ta"), "first_t"
    )
    b = su.select(
        "user_id", "sess_id", F.col("event_type").alias("tb"), "last_t"
    )
    pat = (
        a.join(b, ["user_id", "sess_id"])
        .filter(
            (F.col("ta") != F.col("tb"))
            & (F.col("first_t") < F.col("last_t"))
        )
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("double").alias("sup"))
    )
    return (
        pat.join(
            F.broadcast(
                pres.select(F.col("event_type").alias("ta"),
                            F.col("c").alias("ca"))
            ),
            "ta",
        )
        .join(
            F.broadcast(
                pres.select(F.col("event_type").alias("tb"),
                            F.col("c").alias("cb"))
            ),
            "tb",
        )
        .select(
            F.col("ta").alias("antecedent"),
            F.col("tb").alias("consequent"),
            F.col("sup").cast("bigint").alias("support_sessions"),
            ratio(
                F.col("sup") * F.lit(float(ns)) / (F.col("ca") * F.col("cb"))
            ).alias("lift"),
        )
    )


@query(
    "stat_fisher_combined",
    oracle="""
    WITH d AS (SELECT CAST(isodow(ts) AS BIGINT) AS stratum, event_type,
                      CASE WHEN value >= 50 THEN 1 ELSE 0 END AS hi
               FROM events),
    o AS (SELECT stratum, event_type, hi, CAST(COUNT(*) AS DOUBLE) AS obs
          FROM d GROUP BY 1, 2, 3),
    tot AS (SELECT stratum, SUM(obs) AS n FROM o GROUP BY 1),
    rt AS (SELECT stratum, event_type, SUM(obs) AS r FROM o GROUP BY 1, 2),
    ct AS (SELECT stratum, hi, SUM(obs) AS c FROM o GROUP BY 1, 2),
    chi AS (SELECT o.stratum,
                   SUM((o.obs - rt.r * ct.c / tot.n)
                       * (o.obs - rt.r * ct.c / tot.n)
                       / (rt.r * ct.c / tot.n)) AS x2
            FROM o JOIN rt ON o.stratum = rt.stratum
                          AND o.event_type = rt.event_type
                   JOIN ct ON o.stratum = ct.stratum AND o.hi = ct.hi
                   JOIN tot ON o.stratum = tot.stratum
            GROUP BY 1),
    -- df = (5-1)(2-1) = 4 → SF(x) = exp(-x/2)(1 + x/2)  for df=4
    p AS (SELECT stratum, x2,
                 EXP(-x2 / 2) * (1 + x2 / 2) AS pv
          FROM chi),
    fish AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k,
                    -2 * SUM(LN(pv)) AS stat
             FROM p)
    -- combined df = 2k = 14 → SF = exp(-x/2) * sum_{{j=0}}^{{6}} (x/2)^j/j!
    SELECT CAST(k AS BIGINT) AS strata,
           FLOOR(stat * 10000 + 0.5) / 10000 AS fisher_stat,
           FLOOR(EXP(-stat / 2)
                 * (1 + (stat/2) + (stat/2)*(stat/2)/2
                    + POW(stat/2, 3)/6 + POW(stat/2, 4)/24
                    + POW(stat/2, 5)/120 + POW(stat/2, 6)/720)
                 * 10000 + 0.5) / 10000 AS p_combined
    FROM fish
    """,
)
def stat_fisher_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's combined-probability test: per weekday, a χ² test of
    event-type × high-value independence (df=4, EXACT even-df
    survival function — a closed form both engines share); then
    −2Σln(p) ~ χ²(2k) pooled across the seven strata, again with the
    exact even-df tail. Seven weak tests become one calibrated
    verdict — the meta-analytic sibling of stat_meta_analysis for
    p-values instead of effects.

    Scale: one rollup to 7×5×2 cells; every step after is tiny-frame
    closed-form arithmetic."""
    ev = cat(spark, sf_dir)["events"]
    iso = ((F.dayofweek("ts") + 5) % 7) + 1
    d = ev.select(
        iso.cast("bigint").alias("stratum"),
        "event_type",
        F.when(F.col("value") >= 50, 1).otherwise(0).alias("hi"),
    )
    o = d.groupBy("stratum", "event_type", "hi").agg(
        F.count(F.lit(1)).cast("double").alias("obs")
    ).localCheckpoint()
    tot = o.groupBy("stratum").agg(F.sum("obs").alias("n"))
    rt = o.groupBy("stratum", "event_type").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("stratum", "hi").agg(F.sum("obs").alias("c"))
    e = F.col("r") * F.col("c") / F.col("n")
    chi = (
        o.join(rt, ["stratum", "event_type"])
        .join(ct, ["stratum", "hi"])
        .join(tot, "stratum")
        .groupBy("stratum")
        .agg(
            F.sum(
                (F.col("obs") - e) * (F.col("obs") - e) / e
            ).alias("x2")
        )
    )
    pv = F.exp(-F.col("x2") / 2) * (1 + F.col("x2") / 2)
    fish = chi.select(pv.alias("pv")).agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        (-2 * F.sum(F.log("pv"))).alias("stat"),
    )
    h = F.col("stat") / 2
    sf = F.exp(-h) * (
        1
        + h
        + h * h / 2
        + F.pow(h, 3) / 6
        + F.pow(h, 4) / 24
        + F.pow(h, 5) / 120
        + F.pow(h, 6) / 720
    )
    return fish.select(
        F.col("k").cast("bigint").alias("strata"),
        ratio(F.col("stat")).alias("fisher_stat"),
        ratio(sf).alias("p_combined"),
    )


@query(
    "tx_degenerate_docs",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
    f AS (SELECT doc_id, len(toks) AS n,
                 len(list_distinct(toks)) AS dis
          FROM t),
    ent AS (SELECT t.doc_id,
                   -SUM(c.c / f.n * LN(c.c / f.n)) AS h
            FROM t
            JOIN f ON t.doc_id = f.doc_id,
            LATERAL (SELECT u AS tok, CAST(COUNT(*) AS DOUBLE) AS c
                     FROM unnest(t.toks) AS x(u) GROUP BY 1) c
            WHERE f.n > 0
            GROUP BY t.doc_id)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM f WHERE n = 0) AS empty_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM f
            WHERE n > 0 AND dis = 1) AS single_type_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ent
            WHERE h < {DEGEN_ENTROPY}) AS low_entropy_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM f) AS total_docs
    """,
)
def tx_degenerate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-document census: empty docs, single-token-type docs
    ('aaaa aaaa…'), and token-entropy < {e}-nat docs — the pathologies
    that pass length filters and score fine on distinct-ratio-free
    metrics while teaching a model nothing. Zero counts PROVE the
    corpus clean; nonzero counts are a delete list.

    Scale: per-doc entropy explodes tokens once and reduces per doc
    (partitioned on doc_id); the census is four counts."""
    toks = tokens()
    t = cat(spark, sf_dir)["documents"].select(
        "doc_id", toks.alias("toks")
    ).localCheckpoint()
    f = t.select(
        "doc_id",
        F.size("toks").alias("n"),
        F.size(F.array_distinct("toks")).alias("dis"),
    ).localCheckpoint()
    cnt = (
        t.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    ent = (
        cnt.join(f.filter(F.col("n") > 0), "doc_id")
        .groupBy("doc_id")
        .agg(
            (-F.sum(
                F.col("c") / F.col("n") * F.log(F.col("c") / F.col("n"))
            )).alias("h")
        )
    )
    empty = f.filter(F.col("n") == 0).count()
    single = f.filter((F.col("n") > 0) & (F.col("dis") == 1)).count()
    lowent = ent.filter(F.col("h") < DEGEN_ENTROPY).count()
    total = f.count()
    return spark.createDataFrame(
        [(int(empty), int(single), int(lowent), int(total))],
        "empty_docs long, single_type_docs long, low_entropy_docs long, "
        "total_docs long",
    )


tx_degenerate_docs.__doc__ = tx_degenerate_docs.__doc__.format(
    e=DEGEN_ENTROPY
)
