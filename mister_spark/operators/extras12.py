"""Wave 12: interval-overlap joins, audience overlap, bot detection,
IQR outlier fences, TF-IDF keyphrases, deterministic shard assignment,
hour-of-day seasonality, and a mergeable quantile-sketch rollup.

The interval join is the scale centerpiece: Spark has no native
interval-overlap operator, and the naive formulation is an inequality
cross join. The bucketed-grid decomposition here turns it into an
equi-join on (user, hour-cell) — the standard trick for temporal
overlap at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

HOUR_US = 3_600_000_000
ERR_PAD_US = 2 * 60 * 1_000_000  # ±2 min around each error event
N_SHARDS = 8

_SESS_AGG_SQL = """
    SELECT user_id, sess_id, MIN(tus) AS s, MAX(tus) AS e
    FROM (
      SELECT user_id, tus,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
      FROM (SELECT user_id, epoch_us(ts) AS tus,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                             OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                             > 1800000000
                          OR LAG(epoch_us(ts))
                             OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                             IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM events))
    GROUP BY 1, 2
"""


@query(
    "j_interval_overlap",
    oracle=f"""
    WITH sess AS ({_SESS_AGG_SQL}),
    err AS (
      SELECT user_id, epoch_us(ts) - {ERR_PAD_US} AS ws,
             epoch_us(ts) + {ERR_PAD_US} AS we
      FROM events WHERE event_type = 'error')
    SELECT s.user_id, s.sess_id,
           CAST(COUNT(DISTINCT e.ws) AS BIGINT) AS n_err_windows
    FROM sess s JOIN err e
      ON s.user_id = e.user_id AND s.s <= e.we AND e.ws <= s.e
    GROUP BY 1, 2
    """,
)
def j_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: sessions × (error event ± 2 min) windows
    for the same user — 'which sessions were touched by an error?'.
    The oracle states it as the inequality join; the Spark plan never
    does: both interval sets explode onto the 1-hour grid cells they
    span, join as a plain equi-join on (user_id, cell), and the exact
    overlap predicate filters the candidates. DISTINCT on the window
    start dedupes multi-cell matches.

    Scale: candidate fan-out is bounded by interval length / cell width
    (error windows touch ≤ 2 cells; sessions span few cells by the
    30-min-gap construction). Everything shuffles on (user, cell) —
    no cross join, no range sort."""
    from mister_spark.operators.events import GAP_US, _ev

    ev = _ev(spark, sf_dir).select("user_id", "tus", "event_type")
    w = W.partitionBy("user_id").orderBy("tus")
    lagged = F.lag("tus").over(w)
    sess = (
        ev.withColumn(
            "new_sess",
            F.when(lagged.isNull() | (F.col("tus") - lagged > GAP_US), 1).otherwise(0),
        )
        .withColumn(
            "sess_id", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0))
        )
        .groupBy("user_id", "sess_id")
        .agg(F.min("tus").alias("s"), F.max("tus").alias("e"))
    )
    s_cells = sess.withColumn(
        "cell",
        F.explode(
            F.sequence(F.expr("s div 3600000000"), F.expr("e div 3600000000"))
        ),
    )
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        (F.col("tus") - ERR_PAD_US).alias("ws"),
        (F.col("tus") + ERR_PAD_US).alias("we"),
    )
    e_cells = err.withColumn(
        "cell",
        F.explode(
            F.sequence(F.expr("ws div 3600000000"), F.expr("we div 3600000000"))
        ),
    )
    j = s_cells.join(e_cells, ["user_id", "cell"]).filter(
        (F.col("s") <= F.col("we")) & (F.col("ws") <= F.col("e"))
    )
    return j.groupBy("user_id", "sess_id").agg(
        F.countDistinct("ws").cast("long").alias("n_err_windows")
    )


@query(
    "ev_user_overlap",
    oracle="""
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (SELECT event_type, COUNT(*) AS n FROM tu GROUP BY 1),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM tu a JOIN tu b ON a.user_id = b.user_id
                AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, n_common,
           FLOOR(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)
                 * 10000 + 0.5) / 10000 AS jaccard
    FROM inter JOIN sizes sa ON type_a = sa.event_type
               JOIN sizes sb ON type_b = sb.event_type
    """,
)
def ev_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: for every event-type pair, the count and
    Jaccard of shared users — the segment-overlap primitive behind
    'do purchasers also view?'. Same inverted-index self-join shape as
    the shingle dedups, keyed on user.

    Scale: the user-keyed self-join fans out per-user by (#types with
    that user)² ≤ 25 — bounded by the type-alphabet, not the corpus.
    Sizes join is |types| rows, broadcast. The deduped (type, user)
    frame is checkpointed: three plan branches read it, and the cut
    keeps the events scan + distinct single-pass (7 → 3 exchanges)."""
    ev = cat(spark, sf_dir)["events"]
    tu = ev.select("event_type", "user_id").distinct().localCheckpoint()
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    jac = rnd(
        F.col("n_common").cast("double")
        / (F.col("na") + F.col("nb") - F.col("n_common")),
        4,
    )
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select("type_a", "type_b", "n_common", jac.alias("jaccard"))
    )


@query(
    "ev_bot_detect",
    oracle="""
    WITH hourly AS (
      SELECT user_id, epoch_us(ts) // 3600000000 AS hb,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    per_user AS (
      SELECT user_id,
             CAST(SUM(n) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS n_active_hours,
             CAST(MAX(n) AS BIGINT) AS max_hourly,
             FLOOR(CAST(SUM(n) AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000
               AS mean_hourly
      FROM hourly GROUP BY 1)
    SELECT user_id, n_events, n_active_hours, max_hourly, mean_hourly,
           FLOOR(max_hourly * mean_hourly * 10000 + 0.5) / 10000 AS bot_score
    FROM per_user
    ORDER BY FLOOR(max_hourly * mean_hourly * 10000 + 0.5) / 10000 DESC, user_id
    LIMIT 20
    """,
)
def ev_bot_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot-likelihood shortlist: per user, hourly activity intensity
    (burst = max events in any hour, sustained = mean events per active
    hour); the score max·mean ranks users who are BOTH bursty and
    persistent — the automation signature. Top-20, rounded-score
    tiebreak on user_id.

    Scale: one (user, hour) rollup then a user rollup — the second
    groupBy accepts the first's partitioning by the subset rule after
    the explicit user repartition; top-20 is TakeOrdered, no global
    sort."""
    ev = cat(spark, sf_dir)["events"]
    hourly = (
        ev.select("user_id", F.expr("unix_micros(ts) div 3600000000").alias("hb"))
        .repartition("user_id")
        .groupBy("user_id", "hb")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_user = hourly.groupBy("user_id").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_active_hours"),
        F.max("n").cast("long").alias("max_hourly"),
        rnd(F.sum("n").cast("double") / F.count(F.lit(1)), 4).alias("mean_hourly"),
    )
    score = rnd(F.col("max_hourly") * F.col("mean_hourly"), 4)
    return (
        per_user.withColumn("bot_score", score)
        .orderBy(F.col("bot_score").desc(), "user_id")
        .limit(20)
    )


@query(
    "stat_outlier_iqr",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY 1)
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(ANY_VALUE(q.q1) * 10000 + 0.5) / 10000 AS q1,
           FLOOR(ANY_VALUE(q.q3) * 10000 + 0.5) / 10000 AS q3,
           CAST(SUM(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
           CAST(SUM(CASE WHEN e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_above
    FROM events e JOIN q ON e.event_type = q.event_type
    GROUP BY 1
    """,
)
def stat_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts per event type: quartiles, and how
    many points fall below Q1−1.5·IQR / above Q3+1.5·IQR. The
    distribution-shape complement to ev_anomaly_mad (MAD flags single
    points; fences characterize tails). Exact interpolated quartiles in
    both engines; the fences stay unrounded because they're compared
    against raw data both sides identically.

    Scale: one percentile aggregate + one broadcast-stats recount —
    same two-pass shape as ev_zscore; percentile_approx at 100 TB."""
    ev = cat(spark, sf_dir)["events"].select("event_type", "value")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            ratio(F.first("q1")).alias("q1"),
            ratio(F.first("q3")).alias("q3"),
            F.sum(
                F.when(F.col("value") < F.col("q1") - 1.5 * iqr, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_below"),
            F.sum(
                F.when(F.col("value") > F.col("q3") + 1.5 * iqr, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_above"),
        )
    )


@query(
    "tx_keyphrase",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest({DUCK_TOKENS}) AS tk FROM documents),
    tf AS (SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS f
           FROM t GROUP BY 1, 2),
    df AS (SELECT tk, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS d FROM t GROUP BY 1),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM t),
    sc AS (
      SELECT tf.doc_id, tf.tk,
             FLOOR(tf.f * LN((nd.n + 1.0) / (df.d + 1.0)) * 10000 + 0.5) / 10000
               AS score
      FROM tf JOIN df ON tf.tk = df.tk, nd),
    rk AS (
      SELECT doc_id, tk, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, tk) AS r
      FROM sc)
    SELECT doc_id, tk AS keyphrase, score FROM rk WHERE r <= 3
    """,
)
def tx_keyphrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keyphrases per document (smoothed idf
    ln((N+1)/(df+1)), score rounded BEFORE the per-doc top-3 so both
    engines cut ties identically on the token text). The cheap
    extractive summary / topic tag a corpus browser shows per doc.

    Scale: tf is a (doc, token) partial agg; df a token-level agg; the
    scoring join is token-keyed with AQE free to broadcast the Zipf-
    small df table; the top-3 window runs per doc after a doc-keyed
    shuffle. No Python. The exploded posting stream is checkpointed —
    tf, df, and the corpus-N scalar all read it, and without the cut
    each branch would re-tokenize the corpus (at scale: persist the
    postings table once, like tx_inverted_index materializes)."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("doc_id", F.explode(tokens()).alias("tk")).localCheckpoint()
    tf = t.groupBy("doc_id", "tk").agg(F.count(F.lit(1)).alias("f"))
    df = t.groupBy("tk").agg(F.countDistinct("doc_id").alias("d"))
    nd = t.agg(F.countDistinct("doc_id").alias("n"))
    sc = (
        tf.join(df, "tk")
        .join(F.broadcast(nd))
        .select(
            "doc_id",
            "tk",
            rnd(
                F.col("f") * F.log((F.col("n") + 1.0) / (F.col("d") + 1.0)), 4
            ).alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "tk")
    return (
        sc.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 3)
        .select("doc_id", F.col("tk").alias("keyphrase"), "score")
    )


@query(
    "ds_shard_assign",
    oracle=f"""
    SELECT ((doc_id * 2654435761) % 4294967296) % {N_SHARDS} AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM documents GROUP BY 1
    """,
)
def ds_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable shard assignment manifest: docs hashed to 8 shards by a
    Knuth multiplicative mix of doc_id (integer-only, so shard
    membership is reproducible across engines, runs, and languages —
    what a training job needs to resume mid-corpus). Emits the per-
    shard manifest row: counts, byte proxy, id range.

    Scale: one partial-agg shuffle on 8 keys; the write path would
    repartitionByRange(shard) and emit one directory per shard."""
    docs = cat(spark, sf_dir)["documents"]
    shard = ((F.col("doc_id") * 2654435761) % 4294967296) % N_SHARDS
    return (
        docs.select(shard.alias("shard"), "doc_id", "n_chars")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "ev_seasonality",
    oracle="""
    WITH h AS (
      SELECT event_type, date_part('hour', ts) AS hod,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    tot AS (SELECT event_type, SUM(n) AS t FROM h GROUP BY 1),
    s AS (
      SELECT h.event_type, h.hod, h.n,
             FLOOR(CAST(h.n AS DOUBLE) / tot.t * 10000 + 0.5) / 10000 AS share
      FROM h JOIN tot ON h.event_type = tot.event_type),
    rk AS (
      SELECT event_type, hod, n, share,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY share DESC, hod) AS r
      FROM s)
    SELECT event_type, CAST(hod AS BIGINT) AS hod, n, share,
           CASE WHEN r = 1 THEN 1 ELSE 0 END AS is_peak
    FROM rk
    """,
)
def ev_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile per event type: share of the type's
    events in each UTC hour plus a peak-hour flag (rounded-share argmax,
    earliest hour on ties) — the diurnal fingerprint that separates
    human types from automated ones.

    Scale: ONE exchange — pre-partition on event_type; the (type, hod)
    rollup accepts it by the subset rule, and the total, share, and
    argmax all come from windows over the same partitioning (≤ 24 rows
    per type)."""
    ev = cat(spark, sf_dir)["events"]
    h = (
        ev.select("event_type", F.hour("ts").alias("hod"))
        .repartition("event_type")
        .groupBy("event_type", "hod")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_all = W.partitionBy("event_type").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    share = rnd(F.col("n").cast("double") / F.sum("n").over(w_all), 4)
    s = h.withColumn("share", share)
    w_rk = W.partitionBy("event_type").orderBy(F.col("share").desc(), "hod")
    return s.withColumn("r", F.row_number().over(w_rk)).select(
        "event_type",
        F.col("hod").cast("long").alias("hod"),
        "n",
        "share",
        F.when(F.col("r") == 1, 1).otherwise(0).alias("is_peak"),
    )


def _quantile_rollup_oracle() -> str:
    from mister_spark.functions.qsketch import (
        qs_oracle_pick,
        qs_oracle_rank,
        qs_oracle_sample,
    )

    src = (
        "(SELECT event_type, value, CAST(user_id AS VARCHAR) || ':' || "
        "CAST(epoch_us(ts) AS VARCHAR) AS qid FROM events)"
    )
    return f"""
    WITH {qs_oracle_sample(src, "event_type", "qid")},
    {qs_oracle_rank("event_type", "value")}
    SELECT event_type,
           {qs_oracle_pick(0.5, "value")} AS p50,
           {qs_oracle_pick(0.95, "value")} AS p95,
           {qs_oracle_pick(0.99, "value")} AS p99,
           MAX(_qn) AS n
    FROM qs_r GROUP BY event_type
    """


@query("sketch_quantile_rollup", oracle=_quantile_rollup_oracle())
def sketch_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketches: whole-type p50/p95/p99 from the
    PORTABLE md5-60 hash-threshold sample (functions/qsketch.py) — the
    rollup-reuse pattern for quantiles, where exact percentiles cannot
    be merged but hash-threshold samples can: the union of two
    samples re-thresholded IS the sample of the union (the KMV
    property), so day-level samples roll up to any date range exactly
    like the HLL registers do. Round-10 conversion from the
    engine-local t-digest (partition-order-sensitive internals, rows-
    only forever) to this sketch: the whole estimator — hash, keep
    threshold, type-1 sample quantile — replays bit-for-bit in the
    DuckDB oracle. pytest gates |approx − exact| against the sample's
    rank-error bound.

    Scale: this is THE way to serve percentile dashboards at 100 TB —
    day-level samples persisted once, any date-range rollup merges
    samples instead of rescanning values; the only sort is a window
    over the ~1k-row-per-group sample."""
    from mister_spark.functions.qsketch import qs_quantiles, qs_sample

    ev = cat(spark, sf_dir)["events"].select(
        "event_type",
        "value",
        F.concat(
            F.col("user_id").cast("string"),
            F.lit(":"),
            F.unix_micros("ts").cast("string"),
        ).alias("qid"),
    )
    sample = qs_sample(ev, ["event_type"], F.col("qid"))
    return qs_quantiles(
        sample,
        ["event_type"],
        "value",
        {"p50": 0.5, "p95": 0.95, "p99": 0.99},
        extras={"n": F.max("_qn")},
    )
