"""Wave 11: containment dedup, purchase streaks, per-source quota
sampling, bigram-LM scoring, CUSUM change-point detection, higher
moments, and rolling medians.

Float discipline as everywhere: ln/exp/sqrt appear only behind rnd(),
argmax rows are selected on rounded measures with explicit tiebreaks,
and counts stay integer end-to-end (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

CONTAIN_T = 0.8
QUOTA_K = 10
DAY_US = 86_400_000_000

# shared with dedup.py: shingle fan-out cap (same constant so the
# containment and Jaccard candidate sets stay comparable)
from mister_spark.operators.dedup import HOT_SHINGLE_CAP  # noqa: E402


@query(
    "dd_containment",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(generate_series(1, len(toks) - 2),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
           FROM t),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    cold AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= {HOT_SHINGLE_CAP}),
    shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN cold USING (s)),
    inter AS (SELECT a.doc_id AS src_doc, b.doc_id AS dst_doc, COUNT(*) AS i
              FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id <> b.doc_id
              GROUP BY 1, 2)
    SELECT src_doc, dst_doc,
           FLOOR((CAST(i AS DOUBLE) / sa.n) * 10000 + 0.5) / 10000 AS containment
    FROM inter JOIN sizes sa ON src_doc = sa.doc_id
    WHERE FLOOR((CAST(i AS DOUBLE) / sa.n) * 10000 + 0.5) / 10000 >= {CONTAIN_T}
    """,
)
def dd_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional shingle containment |sh(A)∩sh(B)| / |sh(A)| ≥ 0.8:
    the near-dup signal Jaccard misses when a short document is wholly
    embedded in a much longer one (quote farms, boilerplate wrappers) —
    the union in Jaccard's denominator drowns the overlap. Ordered
    pairs, so A-inside-B and B-inside-A report separately.

    Scale: the old shape aggregated a per-(pair, shingle) row for
    EVERY ordered pair sharing any cold shingle — a Σ df² shuffle.
    Now candidates come from a SRC-SIDE PREFIX FILTER (the
    dd_ngram_jaccard pigeonhole, adapted to the asymmetric threshold:
    containment ≥ t forces ≥ ⌈t·n_src⌉ shared cold shingles, so a
    qualifying pair must share one of src's coldn − ⌈t·n⌉ + 1 rarest
    shingles under the global (df, sid) order — only that prefix is
    indexed on the src side, the dst side keeps full cold postings),
    and the exact intersection is an array_intersect over per-doc
    sorted sid arrays — candidate-pair-local, no per-(pair, shingle)
    rows ever shuffle. Shingles hash to 64-bit sids up front so every
    join carries longs. sf1 A/B in one session: 40.8→20.2 s warm,
    48.2→28.8 s cold, identical 5120 output rows (PERF.md r11)."""
    from mister_spark.functions.text import sized_hashed_shingles, tokens

    docs = cat(spark, sf_dir)["documents"]
    # sized_hashed_shingles: tokenize+trigram evaluated once per doc
    # with n inside the struct (the former size()/explode() split
    # re-ran the subtree per node) and token-hash-chained 3-gram ids —
    # see the helper's docstring and dd_ngram_jaccard
    ex = docs.select(
        "doc_id", sized_hashed_shingles(tokens()).alias("st")
    ).select("doc_id", F.col("st.n").alias("n"), F.explode("st.sh").alias("sid"))
    shc = (
        ex.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("sid")))
        .filter(F.col("df") <= HOT_SHINGLE_CAP)
        .localCheckpoint()
    )
    wp = W.partitionBy("doc_id")
    # rounding slack: containment is rounded to 1e-4 BEFORE the >= t
    # filter, so survivors only need true containment >= t - 0.5e-4;
    # the -1e-9 keeps ceil() from IEEE-rounding the bound up
    o_min = F.greatest(
        F.ceil(F.col("n") * (CONTAIN_T - 0.5e-4) - F.lit(1e-9)), F.lit(1)
    )
    pref = (
        shc.withColumn("r", F.row_number().over(wp.orderBy("df", "sid")))
        .withColumn("coldn", F.count(F.lit(1)).over(wp))
        .filter(F.col("r") <= F.col("coldn") - o_min + 1)
        .select(F.col("doc_id").alias("src_doc"), "sid")
    )
    cand = (
        pref.join(shc.select(F.col("doc_id").alias("dst_doc"), "sid"), "sid")
        .filter(F.col("src_doc") != F.col("dst_doc"))
        .select("src_doc", "dst_doc")
        .distinct()
    )
    arrs = shc.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("sid")).alias("sids"),
        F.first("n").alias("n"),
    )
    cont = rnd(F.col("i").cast("double") / F.col("na"), 4)
    return (
        cand.join(
            arrs.select(
                F.col("doc_id").alias("src_doc"),
                F.col("sids").alias("sa"),
                F.col("n").alias("na"),
            ),
            "src_doc",
        )
        .join(
            arrs.select(
                F.col("doc_id").alias("dst_doc"), F.col("sids").alias("sb")
            ),
            "dst_doc",
        )
        .withColumn("i", F.size(F.array_intersect("sa", "sb")))
        .select("src_doc", "dst_doc", cont.alias("containment"))
        .filter(F.col("containment") >= CONTAIN_T)
    )


@query(
    "w_streak",
    oracle="""
    WITH pd AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      FROM events WHERE event_type = 'purchase'),
    isl AS (
      SELECT user_id, day,
             day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM pd),
    st AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS streak
      FROM isl GROUP BY user_id, grp),
    mx AS (
      SELECT user_id, MAX(streak) AS best_streak FROM st GROUP BY 1)
    SELECT user_id, best_streak FROM mx
    ORDER BY best_streak DESC, user_id LIMIT 20
    """,
)
def w_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive purchase days per user, top-20
    (gaps-and-islands: day − row_number is constant within a
    consecutive run). Engagement-streak analytics, and the canonical
    islands idiom over an integer day grid.

    Scale: ONE shuffle on user_id drives the distinct (subset-clustering
    rule), the window, and both groupBys — the same partitioning reused
    four times; the top-20 is a per-partition TakeOrdered merge, no
    global sort."""
    ev = cat(spark, sf_dir)["events"]
    pd_ = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .repartition("user_id")
        .distinct()
    )
    w = W.partitionBy("user_id").orderBy("day")
    isl = pd_.withColumn("grp", F.col("day") - F.row_number().over(w))
    st = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("streak"))
    mx = st.groupBy("user_id").agg(F.max("streak").cast("long").alias("best_streak"))
    return mx.orderBy(F.col("best_streak").desc(), "user_id").limit(20)


@query(
    "ds_quota_sample",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY (doc_id * 1103515245 + 12345) % 2147483648, doc_id)
               AS rk
      FROM documents)
    SELECT doc_id, source FROM r WHERE rk <= {QUOTA_K}
    """,
)
def ds_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota cap: keep at most K=10 documents per source,
    chosen by a deterministic LCG shuffle of doc_id (integer arithmetic
    only — exact cross-engine row set). This is the anti-domination gate
    in corpus assembly: no single crawl source exceeds its quota no
    matter how many documents it contributed.

    Scale: one shuffle on source. A pathologically hot source makes one
    reducer sort its whole partition just to keep 10 rows; the 100 TB
    refinement is a pre-pass keeping the K smallest LCG keys per input
    partition (bounded heap via Spark's TakeOrdered per group) before
    the window — same rows, bounded memory."""
    docs = cat(spark, sf_dir)["documents"]
    u = (F.col("doc_id") * 1103515245 + 12345) % 2147483648
    w = W.partitionBy("source").orderBy(u, "doc_id")
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= QUOTA_K)
        .select("doc_id", "source")
    )


@query(
    "tx_bigram_nll",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(generate_series(1, len(toks) - 1),
                         i -> toks[i])) AS w1,
                  unnest(list_transform(generate_series(1, len(toks) - 1),
                         i -> toks[i+1])) AS w2
           FROM t),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c2 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(COUNT(*) AS DOUBLE) AS c FROM bg GROUP BY 1)
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           FLOOR(AVG(-LN(c12.c2 / c1.c)) * 10000 + 0.5) / 10000 AS nll
    FROM bg JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
            JOIN c1 ON bg.w1 = c1.w1
    GROUP BY 1
    """,
)
def tx_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM mean NLL per document: −avg ln(c(w1,w2)/c(w1)) with the
    conditional MLE trained on the whole corpus. One order sharper than
    tx_unigram_nll as a fluency proxy — scrambled or templated text
    scores high even when its unigram mix looks normal.

    Scale: bigrams come from a lead() window over token positions (one
    doc_id shuffle), the two count models are partial-agg shuffles on
    Zipf-shaped keys, and scoring re-joins by bigram — AQE broadcasts
    the models only when they fit. No Python anywhere."""
    docs = cat(spark, sf_dir)["documents"]
    tok = docs.select("doc_id", F.posexplode(tokens()).alias("i", "w1"))
    w = W.partitionBy("doc_id").orderBy("i")
    # checkpoint: the bigram stream feeds the two count models AND the
    # scoring join — the cut keeps tokenize+lead single-pass (5 plan
    # replays otherwise; at scale this is the persisted bigram table)
    bg = (
        tok.withColumn("w2", F.lead("w1").over(w))
        .filter(F.col("w2").isNotNull())
        .localCheckpoint()
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("double").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("double").alias("c"))
    return (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            rnd(F.avg(-F.log(F.col("c2") / F.col("c"))), 4).alias("nll"),
        )
    )


@query(
    "ev_change_points",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day, AVG(value) AS xb
      FROM events GROUP BY 1, 2),
    m AS (SELECT event_type, AVG(xb) AS mu FROM daily GROUP BY 1),
    cus AS (
      SELECT d.event_type, d.day,
             SUM(d.xb - m.mu) OVER (PARTITION BY d.event_type ORDER BY d.day
                                    ROWS UNBOUNDED PRECEDING) AS s
      FROM daily d JOIN m ON d.event_type = m.event_type),
    rk AS (
      SELECT event_type, day,
             FLOOR(ABS(s) * 10000 + 0.5) / 10000 AS mag,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY FLOOR(ABS(s) * 10000 + 0.5) / 10000 DESC,
                                         day) AS r
      FROM cus)
    SELECT event_type, CAST(day AS BIGINT) AS cp_day, mag
    FROM rk WHERE r = 1
    """,
)
def ev_change_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift detection per event type: cumulative sum of
    (daily mean − grand mean of daily means); the day where |S| peaks is
    the most likely single change point (classic offline CUSUM argmax).
    The magnitude is rounded BEFORE the argmax so both engines pick the
    same day when two days tie at 4 dp (earliest day wins).

    Scale: ONE exchange and ONE scan total — the explicit event_type
    partitioning satisfies the (type, day) rollup by the
    subset-clustering rule, and the grand mean is an unbounded window
    avg over the same partitioning instead of a groupBy+join (which
    would duplicate the scan subtree into a second exchange). All three
    windows run over ≤ #days rows per type."""
    ev = cat(spark, sf_dir)["events"]
    daily = ev.repartition("event_type").groupBy(
        "event_type", F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).agg(F.avg("value").alias("xb"))
    w_all = W.partitionBy("event_type").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    w_run = (
        W.partitionBy("event_type").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    )
    cus = daily.withColumn("mu", F.avg("xb").over(w_all)).withColumn(
        "s", F.sum(F.col("xb") - F.col("mu")).over(w_run)
    )
    mag = rnd(F.abs(F.col("s")), 4)
    w_rk = W.partitionBy("event_type").orderBy(mag.desc(), "day")
    return (
        cus.withColumn("mag", mag)
        .withColumn("r", F.row_number().over(w_rk))
        .filter(F.col("r") == 1)
        .select("event_type", F.col("day").cast("long").alias("cp_day"), "mag")
    )


@query(
    "stat_skew_kurtosis",
    oracle="""
    WITH a AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             AVG(value) AS a1, AVG(value * value) AS a2,
             AVG(value * value * value) AS a3,
             AVG(value * value * value * value) AS a4
      FROM events GROUP BY 1)
    SELECT event_type, n,
           FLOOR((a3 - 3 * a1 * a2 + 2 * a1 * a1 * a1)
                 / ((a2 - a1 * a1) * SQRT(a2 - a1 * a1)) * 10000 + 0.5) / 10000
             AS skewness,
           FLOOR(((a4 - 4 * a1 * a3 + 6 * a1 * a1 * a2 - 3 * a1 * a1 * a1 * a1)
                  / ((a2 - a1 * a1) * (a2 - a1 * a1)) - 3) * 10000 + 0.5) / 10000
             AS kurtosis
    FROM a
    """,
)
def stat_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness m3/σ³ and excess kurtosis m4/σ⁴−3 per event
    type, built from raw moments E[x..x⁴] rather than the engines'
    skewness()/kurtosis() builtins — Spark's are population-form,
    DuckDB's sample-form with bias correction, so the builtins can never
    hash-match. σ³ is var·sqrt(var): sqrt is IEEE correctly-rounded,
    pow() is not.

    Scale: a single partial-agg shuffle carrying four sums — the
    textbook one-pass moment computation."""
    ev = cat(spark, sf_dir)["events"]
    v = F.col("value")
    a = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(v).alias("a1"),
        F.avg(v * v).alias("a2"),
        F.avg(v * v * v).alias("a3"),
        F.avg(v * v * v * v).alias("a4"),
    )
    a1, a2, a3, a4 = F.col("a1"), F.col("a2"), F.col("a3"), F.col("a4")
    var = a2 - a1 * a1
    m3 = a3 - 3 * a1 * a2 + 2 * a1 * a1 * a1
    m4 = a4 - 4 * a1 * a3 + 6 * a1 * a1 * a2 - 3 * a1 * a1 * a1 * a1
    return a.select(
        "event_type",
        "n",
        rnd(m3 / (var * F.sqrt(var)), 4).alias("skewness"),
        rnd(m4 / (var * var) - 3, 4).alias("kurtosis"),
    )


@query(
    "ev_rolling_median",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             SUM(value) AS total
      FROM events GROUP BY 1, 2)
    SELECT event_type, CAST(day AS BIGINT) AS day,
           FLOOR(quantile_cont(total, 0.5) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                 * 10000 + 0.5) / 10000 AS med7
    FROM daily
    """,
)
def ev_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-observation rolling median of daily totals per event type — the
    robust trend line that one viral day can't drag the way a rolling
    mean can. Exact interpolated median over the trailing frame in both
    engines (Spark percentile() ≡ DuckDB quantile_cont as window
    aggregates).

    Scale: ONE exchange total (pre-partition on event_type; the
    (type, day) rollup accepts it by the subset-clustering rule and the
    rolling window reuses it); the window runs on ≤ #days rows per
    type. A value-domain at 100 TB would swap in percentile_approx over
    the same frame."""
    ev = cat(spark, sf_dir)["events"]
    daily = ev.repartition("event_type").groupBy(
        "event_type", F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).agg(F.sum("value").alias("total"))
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "event_type",
        F.col("day").cast("long").alias("day"),
        rnd(F.expr("percentile(total, 0.5)").over(w), 4).alias("med7"),
    )
