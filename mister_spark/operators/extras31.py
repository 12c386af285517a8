"""Wave 31: exact ROC-AUC, revenue drawdown, and tf-idf-weighted
near-duplicate detection.

ml_auc is the rank-statistic AUC (the Mann-Whitney U normalized), made
scale-safe with the same two-phase prefix sum stat_mannwhitney uses;
ev_drawdown is the peak-to-trough health metric over cumulative daily
revenue; dd_tfidf_cosine rounds out the dedup family with the
lexical-WEIGHTED similarity (rare-term blocked, integer-weight exact)
that catches near-dups MinHash's unweighted Jaccard underrates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query

AUC_POS_LABEL_LT = 5  # positive class: label in [0, 5)
DAY_US = 86400000000
RARE_DF_CAP = 10  # blocking terms: document frequency ≤ cap
TFIDF_TAU = 0.6  # cosine threshold for reported near-dup pairs


@query(
    "ml_auc",
    oracle=f"""
    WITH s AS (SELECT CAST(embedding[1] AS DOUBLE) AS score,
                      CASE WHEN label < {AUC_POS_LABEL_LT} THEN 1 ELSE 0 END
                        AS pos
               FROM embeddings),
    g AS (SELECT score, SUM(pos) AS np, COUNT(*) AS cnt FROM s GROUP BY 1),
    c AS (SELECT np, cnt,
                 SUM(cnt) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) - cnt
                   AS below
          FROM g),
    r AS (SELECT SUM(np * (below + (cnt + 1) / 2.0)) AS ra FROM c),
    t AS (SELECT CAST(SUM(pos) AS DOUBLE) AS p,
                 CAST(SUM(1 - pos) AS DOUBLE) AS n FROM s)
    SELECT CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
           FLOOR((ra - p * (p + 1) / 2) / (p * n) * 10000 + 0.5) / 10000
             AS auc
    FROM r, t
    """,
)
def ml_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of a scalar score (embedding dim 0) against a
    binary class (label < {AUC_POS_LABEL_LT}) via the rank statistic:
    AUC = (rank-sum of positives − P(P+1)/2) / (P·N) with midrank tie
    handling — the evaluation staple for every trained filter in the
    pipeline, bit-identical across engines because ranks are dyadic
    rationals of integer counts (see stat_mannwhitney).

    Scale: the score table collapses to |distinct scores| in one
    partial-agg shuffle; the rank prefix sum is the two-phase
    `bucketed_cumsum` — no single-task window anywhere."""
    emb = cat(spark, sf_dir)["embeddings"]
    s = emb.select(
        F.element_at("embedding", 1).cast("double").alias("score"),
        F.when(F.col("label") < AUC_POS_LABEL_LT, 1).otherwise(0).alias("pos"),
    )
    g = s.groupBy("score").agg(
        F.sum("pos").alias("np"), F.count(F.lit(1)).alias("cnt")
    )
    c = bucketed_cumsum(g, "score", {"cum": F.col("cnt")}).select(
        "np", "cnt", (F.col("cum") - F.col("cnt")).alias("below")
    )
    r = c.agg(
        F.sum(F.col("np") * (F.col("below") + (F.col("cnt") + 1) / 2.0)).alias("ra")
    )
    t = s.agg(
        F.sum("pos").cast("double").alias("p"),
        F.sum(1 - F.col("pos")).cast("double").alias("n"),
    )
    p, n, ra = F.col("p"), F.col("n"), F.col("ra")
    return r.crossJoin(F.broadcast(t)).select(
        p.cast("bigint").alias("n_pos"),
        n.cast("bigint").alias("n_neg"),
        ratio((ra - p * (p + 1) / 2) / (p * n)).alias("auc"),
    )


@query(
    "ev_drawdown",
    oracle=f"""
    WITH dc AS (SELECT event_type, epoch_us(ts) // {DAY_US} AS day,
                       CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS vc
                FROM events GROUP BY 1, 2),
    cu AS (SELECT event_type, day,
                  SUM(vc) OVER (PARTITION BY event_type ORDER BY day
                                ROWS UNBOUNDED PRECEDING) AS cum
           FROM dc),
    cr AS (SELECT event_type, day, cum,
                  MAX(cum) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS peak
           FROM cu),
    d AS (SELECT event_type, day, peak - cum AS dd FROM cr),
    m AS (SELECT event_type, MAX(dd) AS md FROM d GROUP BY 1)
    SELECT d.event_type,
           FLOOR(CAST(m.md AS DOUBLE) / 100 * 100 + 0.5) / 100
             AS max_drawdown,
           CAST(MIN(d.day) AS BIGINT) AS trough_day
    FROM d JOIN m ON d.event_type = m.event_type AND d.dd = m.md
    GROUP BY 1, 2
    """,
)
def ev_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of cumulative daily revenue per event type —
    the peak-to-trough loss metric (finance's risk staple, equally the
    'how far below its best is this metric' monitor) — plus the first
    day the maximum gap is hit. Integer-cents cumulative sums make the
    running peak and the gap exact.

    Scale: the daily rollup is one partial-agg shuffle; running sum,
    running peak, and the argmax join-back all run on #days-per-type
    frames partitioned by event_type (the event-sized table never
    enters a window). The drawdown frame is checkpointed — the max and
    the join-back both read it."""
    ev = cat(spark, sf_dir)["events"]
    dc = (
        ev.select(
            "event_type",
            F.expr(f"unix_micros(ts) div {DAY_US}").alias("day"),
            "value",
        )
        .groupBy("event_type", "day")
        .agg(F.floor(F.sum("value") * 100 + F.lit(0.5)).cast("long").alias("vc"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cu = dc.select("event_type", "day", F.sum("vc").over(w).alias("cum"))
    cr = cu.select(
        "event_type", "day", "cum", F.max("cum").over(w).alias("peak")
    )
    d = cr.select(
        "event_type", "day", (F.col("peak") - F.col("cum")).alias("dd")
    ).localCheckpoint()
    m = d.groupBy("event_type").agg(F.max("dd").alias("md"))
    return (
        d.join(F.broadcast(m), "event_type")
        .filter(F.col("dd") == F.col("md"))
        .groupBy("event_type", money(F.col("md").cast("double") / 100).alias("max_drawdown"))
        .agg(F.min("day").cast("bigint").alias("trough_day"))
    )


@query(
    "dd_tfidf_cosine",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents
               WHERE len({DUCK_TOKENS}) >= 3),
    sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
                    generate_series(1, len(toks) - 2),
                    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])))
                  AS term
           FROM t),
    df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM sh GROUP BY term),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM t),
    wgt AS (SELECT sh.doc_id, sh.term,
                   CAST(FLOOR(ln(nd.n / df.df) * 10000 + 0.5) AS BIGINT) AS w
            FROM sh JOIN df USING (term) CROSS JOIN nd),
    nrm AS (SELECT doc_id, SUM(w * w) AS n2 FROM wgt GROUP BY 1),
    rare AS (SELECT term FROM df WHERE df <= {RARE_DF_CAP}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM wgt a JOIN wgt b ON a.term = b.term AND a.doc_id < b.doc_id
             JOIN rare r ON a.term = r.term
             WHERE a.w > 0 AND b.w > 0),
    dot AS (SELECT c.doc_a, c.doc_b, SUM(wa.w * wb.w) AS dp
            FROM cand c
            JOIN wgt wa ON wa.doc_id = c.doc_a
            JOIN wgt wb ON wb.doc_id = c.doc_b AND wb.term = wa.term
            GROUP BY 1, 2)
    SELECT dot.doc_a, dot.doc_b,
           FLOOR(dp / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE)))
                 * 10000 + 0.5) / 10000 AS cosine
    FROM dot JOIN nrm na ON dot.doc_a = na.doc_id
             JOIN nrm nb ON dot.doc_b = nb.doc_id
    WHERE FLOOR(dp / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE)))
                * 10000 + 0.5) / 10000 >= {TFIDF_TAU}
    """,
)
def dd_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by idf-WEIGHTED shingle cosine ≥
    {TFIDF_TAU} — the lexical similarity that weights rare informative
    shingles up (unweighted Jaccard treats a boilerplate 3-gram and a
    distinctive one equally). Shingles are distinct per doc, so tf = 1
    and the per-doc length factor cancels in the cosine — the weight
    reduces to idf = ln(N/df), stored on a 1e-4 grid as an INTEGER so
    dot products and norms are exact int64 sums (engine summation
    order can't move the rounded cosine). Candidates come from
    RARE-SHINGLE BLOCKING (pairs sharing a shingle with df ≤
    {RARE_DF_CAP} — record-linkage's standard trick: fan-out per
    blocking shingle is ≤ df², so no boilerplate shingle can go
    quadratic); near-dups virtually always share a rare shingle, and
    pairs that only share boilerplate are exactly the ones weighted
    toward 0 anyway.

    Scale: shingles are hashed to 64-bit sids up front so every
    shuffle carries longs, not 3-gram strings; df rides ONE window
    over the hashed postings (not groupBy + join-back = two shuffles),
    which also makes the rare filter a column predicate instead of a
    join; the verify stage is candidate-pair-local — per-doc (sid, w)
    maps built in one doc-keyed shuffle, then the dot product is a
    JVM higher-order fold over array_intersect of the key sets, so no
    per-(pair, term) rows ever shuffle. sf1: 49.0 s -> ~15 s cold
    (the old per-term verify join alone was 39.7 s; the map fold does
    the same exact int64 sums in ~1 s — see PERF.md r11)."""
    from mister_spark.functions.text import hashed_shingles

    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("doc_id", tokens().alias("toks")).filter(F.size("toks") >= 3)
    # hashed_shingles: token-hash-chained 3-gram ids, let-bound so the
    # tokenize+trigram subtree evaluates once per doc, with no 40-char
    # string alloc + string hash per shingle (see the helper's
    # docstring); explode drops the <3-token docs' empty arrays, so the
    # size gate is only needed on the doc-count branch
    sh = docs.select(
        "doc_id", F.explode(hashed_shingles(tokens())).alias("sid")
    )
    nd = t.agg(F.count(F.lit(1)).cast("double").alias("n"))
    wgt = (
        sh.withColumn(
            "df", F.count(F.lit(1)).over(W.partitionBy("sid")).cast("double")
        )
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "sid",
            "df",
            F.floor(F.log(F.col("n") / F.col("df")) * 10000 + F.lit(0.5))
            .cast("bigint")
            .alias("w"),
        )
        .localCheckpoint()
    )
    rw = wgt.filter((F.col("df") <= RARE_DF_CAP) & (F.col("w") > 0)).select(
        "doc_id", "sid"
    )
    cand = (
        rw.select(F.col("doc_id").alias("doc_a"), "sid")
        .join(rw.select(F.col("doc_id").alias("doc_b"), "sid"), "sid")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    amap = wgt.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("sid", "w"))).alias("m"),
        F.sort_array(F.collect_list("sid")).alias("ks"),
        F.sum(F.col("w") * F.col("w")).alias("n2"),
    )
    cos = ratio(
        F.col("dp")
        / (
            F.sqrt(F.col("n2_a").cast("double"))
            * F.sqrt(F.col("n2_b").cast("double"))
        )
    )
    return (
        cand.join(
            amap.select(
                F.col("doc_id").alias("doc_a"),
                F.col("m").alias("ma"),
                F.col("ks").alias("ka"),
                F.col("n2").alias("n2_a"),
            ),
            "doc_a",
        )
        .join(
            amap.select(
                F.col("doc_id").alias("doc_b"),
                F.col("m").alias("mb"),
                F.col("ks").alias("kb"),
                F.col("n2").alias("n2_b"),
            ),
            "doc_b",
        )
        .withColumn(
            "dp",
            F.expr(
                "aggregate(transform(array_intersect(ka, kb),"
                " k -> ma[k] * mb[k]), 0L, (a, x) -> a + x)"
            ),
        )
        .select("doc_a", "doc_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= TFIDF_TAU)
    )
