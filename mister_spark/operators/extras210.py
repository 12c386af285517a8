"""Wave 210: LLM-watermark screening and transition-symmetry testing.

tx_watermark_detect is the Kirchenbauer-style green-list watermark
detector over the documents table: a watermarking LLM biases each
next token toward a pseudorandom "green" half of the vocabulary keyed
by the previous token, so watermarked text shows a green-bigram share
far above 1/2 and a per-doc z-score in the tens — the statistical
screen a training-data pipeline runs to keep watermarked synthetic
text OUT of the corpus (tx_canary_detect sweeps exact strings; this
detects a distributional signature with no string list at all).
stat_bowker_symmetry is Bowker's test — McNemar generalized to the
k x k event-type transition matrix: is A->B traffic balanced by
B->A? ev_markov ESTIMATES the matrix; Bowker says whether its
asymmetry is real, pair by pair, with the aggregate chi-square.

Exactness: green membership is a pure md5-hex-prefix comparison
(string compare, identical both engines), all counts are integers,
and the chi-square/W-H tail arithmetic divides identical operands
inside the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.functions.text import DUCK_TOKENS, bigrams, tokens
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

WM_MIN_PAIRS = 25  # score docs with at least this many bigrams
WM_Z_FLAG = 4.0  # per-doc detection threshold (1-in-31k false rate)

# a bigram is "green" when its md5 hex starts 0-7 (gamma = 1/2)
_WM_GREEN_SQL = "substr(md5(bg), 1, 1) < '8'"


@query(
    "tx_watermark_detect",
    # Real oracle: green membership is a hex-prefix string compare on
    # md5 of the identical bigram text, so per-doc green/total counts
    # are exact integers; z = (2g - n)/sqrt(n) divides identical
    # integers, and the flag compares the ROUNDED z in both engines.
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
    bg AS (SELECT doc_id, unnest(list_transform(
                    range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1])) AS bg
           FROM t),
    perdoc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(CASE WHEN {_WM_GREEN_SQL}
                               THEN 1 ELSE 0 END) AS BIGINT) AS g
               FROM bg GROUP BY 1),
    scored AS (SELECT doc_id, n, g,
                      (2.0 * g - n) / SQRT(CAST(n AS DOUBLE)) AS z
               FROM perdoc WHERE n >= {WM_MIN_PAIRS}),
    agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN FLOOR(z * 1e4 + 0.5) / 1e4
                            >= {WM_Z_FLAG} THEN 1 ELSE 0 END) AS BIGINT)
                     AS flagged,
                   SUM(g) AS gg, SUM(n) AS nn, MAX(z) AS mz
            FROM scored)
    SELECT n_docs AS n_docs_scored,
           flagged AS flagged_docs,
           FLOOR(CAST(gg AS DOUBLE) / nn * 1e4 + 0.5) / 1e4
             AS corpus_green_share,
           FLOOR((2.0 * gg - nn) / SQRT(CAST(nn AS DOUBLE))
                 * 1e4 + 0.5) / 1e4 AS corpus_z,
           FLOOR(mz * 1e4 + 0.5) / 1e4 AS max_doc_z
    FROM agg
    """,
)
def tx_watermark_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Green-list watermark screen: hash every token bigram, call it
    green when the md5 hex prefix falls in the lower half (the
    detector's reconstruction of a gamma=1/2 green list keyed by the
    previous token), and z-test each document's green share against
    the natural-text null of 1/2. Human text sits at z ~ N(0,1);
    text generated under the watermark runs green on purpose and
    blows past z = {z} within a paragraph. flagged_docs is the count
    a curation pipeline would quarantine; the corpus z says whether
    watermarked material is leaking in at all.

    Scale: ONE tokenize+bigram pass per document (higher-order array
    expressions + md5, all JVM codegen), one per-doc count, one 1-row
    aggregate. Map-side combinable end to end."""
    bg = cat(spark, sf_dir)["documents"].select(
        "doc_id", F.explode(bigrams(tokens())).alias("bg")
    )
    green = F.substring(F.md5(F.col("bg")), 1, 1) < "8"
    perdoc = bg.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(green, 1).otherwise(0)).alias("g"),
    )
    z = (2.0 * F.col("g") - F.col("n")) / F.sqrt(F.col("n").cast("double"))
    scored = perdoc.filter(F.col("n") >= WM_MIN_PAIRS).select(
        "n", "g", z.alias("z")
    )
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(rnd(F.col("z"), 4) >= WM_Z_FLAG, 1).otherwise(0)).alias(
            "flagged"
        ),
        F.sum("g").alias("gg"),
        F.sum("n").alias("nn"),
        F.max("z").alias("mz"),
    )
    return agg.select(
        F.col("n_docs").cast("bigint").alias("n_docs_scored"),
        F.col("flagged").cast("bigint").alias("flagged_docs"),
        rnd(F.col("gg").cast("double") / F.col("nn"), 4).alias(
            "corpus_green_share"
        ),
        rnd(
            (2.0 * F.col("gg") - F.col("nn"))
            / F.sqrt(F.col("nn").cast("double")),
            4,
        ).alias("corpus_z"),
        rnd(F.col("mz"), 4).alias("max_doc_z"),
    )


tx_watermark_detect.__doc__ = tx_watermark_detect.__doc__.format(z=WM_Z_FLAG)


@query(
    "stat_bowker_symmetry",
    # Real oracle: transitions order by the exact (user, ts, event_id)
    # total order, cell counts are integers, each pair term divides
    # identical integers, and the Wilson-Hilferty tail (data-dependent
    # df) evaluates the same closed form — float only at the end,
    # inside the grid.
    oracle=f"""
    WITH s AS (SELECT user_id, event_type,
                      LEAD(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS nxt
               FROM events),
    c AS (SELECT event_type AS a, nxt AS b, CAST(COUNT(*) AS BIGINT) AS n
          FROM s WHERE nxt IS NOT NULL AND nxt <> event_type
          GROUP BY 1, 2),
    p AS (SELECT x.a, x.b, x.n AS nab, COALESCE(y.n, 0) AS nba
          FROM c x LEFT JOIN c y ON y.a = x.b AND y.b = x.a
          WHERE x.a < x.b),
    q AS (SELECT CAST(COUNT(*) AS BIGINT) AS df,
                 SUM(CAST((nab - nba) * (nab - nba) AS DOUBLE)
                     / (nab + nba)) AS chi2,
                 CAST(SUM(nab + nba) AS BIGINT) AS n_trans
          FROM p WHERE nab + nba > 0),
    worst AS (SELECT a, b FROM p
              ORDER BY CAST((nab - nba) * (nab - nba) AS DOUBLE)
                       / (nab + nba) DESC, a, b LIMIT 1),
    w AS (SELECT q.*,
                 (POWER(chi2 / df, 1.0 / 3) - (1 - 2.0 / (9 * df)))
                 / SQRT(2.0 / (9 * df)) AS z
          FROM q)
    SELECT n_trans AS n_offdiag_transitions,
           df AS n_pairs,
           FLOOR(chi2 * 1e4 + 0.5) / 1e4 AS bowker_chi2,
           FLOOR({normal_sf_sql("GREATEST(z, -8.0)")} * 1e6 + 0.5) / 1e6
             AS p_value,
           (SELECT a FROM worst) AS worst_from,
           (SELECT b FROM worst) AS worst_to
    FROM w
    """,
)
def stat_bowker_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowker's symmetry test on the user event-type transition
    matrix: for every unordered type pair, (n_ab - n_ba)^2/(n_ab +
    n_ba), summed into a chi-square with one df per active pair
    (McNemar is the k=2 case). Rejecting means the journey has a
    DIRECTION — click->purchase flows genuinely exceed
    purchase->click rather than both being halves of symmetric
    churn — which is the licence to read ev_markov's matrix as a
    funnel instead of noise. worst_from/worst_to names the most
    asymmetric flow.

    Scale: ONE partitioned LEAD window per user (the sessionize
    shape), a k x k cell count (k = event types, data-bounded), and
    closed-form arithmetic on the <= k(k-1)/2 pair frame."""
    s = cat(spark, sf_dir)["events"].select(
        "user_id",
        "event_type",
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    )
    c = (
        s.filter(
            F.col("nxt").isNotNull() & (F.col("nxt") != F.col("event_type"))
        )
        .groupBy(F.col("event_type").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()  # k x k cells; feeds both pair aliases
    )
    y = c.select(
        F.col("a").alias("b"), F.col("b").alias("a"), F.col("n").alias("nba")
    )
    p = (
        c.filter(F.col("a") < F.col("b"))
        .join(F.broadcast(y), ["a", "b"], "left")
        .select(
            "a",
            "b",
            F.col("n").alias("nab"),
            F.coalesce(F.col("nba"), F.lit(0)).alias("nba"),
        )
        .localCheckpoint()  # feeds the aggregate + the worst-pair cut
    )
    term = (
        ((F.col("nab") - F.col("nba")) * (F.col("nab") - F.col("nba")))
        .cast("double")
        / (F.col("nab") + F.col("nba"))
    )
    q = p.filter(F.col("nab") + F.col("nba") > 0).agg(
        F.count(F.lit(1)).alias("df"),
        F.sum(term).alias("chi2"),
        F.sum(F.col("nab") + F.col("nba")).alias("n_trans"),
    )
    worst = (
        p.orderBy(term.desc(), "a", "b")
        .limit(1)
        .select(F.col("a").alias("worst_from"), F.col("b").alias("worst_to"))
    )
    dfc = F.col("df").cast("double")
    z = (
        F.pow(F.col("chi2") / dfc, 1.0 / 3) - (1 - 2.0 / (9 * dfc))
    ) / F.sqrt(2.0 / (9 * dfc))
    return q.crossJoin(F.broadcast(worst)).select(
        F.col("n_trans").cast("bigint").alias("n_offdiag_transitions"),
        F.col("df").cast("bigint").alias("n_pairs"),
        rnd(F.col("chi2"), 4).alias("bowker_chi2"),
        rnd(normal_sf(F.greatest(z, F.lit(-8.0))), 6).alias("p_value"),
        "worst_from",
        "worst_to",
    )
