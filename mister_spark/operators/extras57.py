"""Wave 57: experimentation depth + streaming-lakehouse glue — CUPED
variance reduction, inverse-propensity off-policy estimation, a
streaming→snapshot-table CDC upsert, and hapax lexical statistics.

ev_cuped is the variance-reduction trick every mature experiment
platform runs (pre-period covariate adjustment shrinks the CI without
touching the estimate's validity); ml_ipw_estimate corrects the naive
mean under a biased logging policy (the off-policy evaluation primitive
behind bandit/RLHF data reuse); stream_snapshot_upsert closes the loop
between Structured Streaming and the transactional snapshot table
(foreachBatch CDC merge — the production ingest pattern); tx_hapax_rate
is the classic lexical-richness signal (hapax share predicts OCR junk
and synthetic text).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.hashing import FP_MUL
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

IPW_P_LOW = 30  # percent exposure for low-activity users
IPW_P_HIGH = 70
IPW_ACT_SPLIT = 70  # n_events threshold between the two propensities


@query(
    "ev_cuped",
    oracle="""
    WITH e AS (SELECT user_id, event_type, value,
                      date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS dn
               FROM events),
    b AS (SELECT (MIN(dn) + MAX(dn) + 1) // 2 AS mid FROM e),
    u AS (SELECT e.user_id, CAST(e.user_id % 2 AS DOUBLE) AS treat,
                 CAST(SUM(CASE WHEN e.dn < b.mid THEN 1 ELSE 0 END)
                      AS DOUBLE) AS x,
                 SUM(CASE WHEN e.dn >= b.mid AND e.event_type = 'purchase'
                     THEN e.value ELSE 0 END) AS y
          FROM e CROSS JOIN b GROUP BY 1, 2),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy,
                 SUM(treat) AS nt, SUM(treat * x) AS stx,
                 SUM(treat * y) AS sty
          FROM u),
    c AS (SELECT n, nt, sx, sy,
                 (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
                 (syy - sy * sy / n) / n AS var_y,
                 (sxx - sx * sx / n) / n AS var_x,
                 (sxy - sx * sy / n) / n AS cov_xy,
                 sty / nt - (sy - sty) / (n - nt) AS lift_raw,
                 (sty / nt
                  - (sxy - sx * sy / n) / (sxx - sx * sx / n)
                    * (stx / nt - sx / n))
                 - ((sy - sty) / (n - nt)
                    - (sxy - sx * sy / n) / (sxx - sx * sx / n)
                      * ((sx - stx) / (n - nt) - sx / n)) AS lift_cuped
          FROM s)
    SELECT CAST(n AS BIGINT) AS n_users,
           FLOOR(theta * 10000 + 0.5) / 10000 AS theta,
           FLOOR((1.0 - (var_y - 2 * theta * cov_xy
                         + theta * theta * var_x) / var_y)
                 * 10000 + 0.5) / 10000 AS var_reduction,
           FLOOR(lift_raw * 10000 + 0.5) / 10000 AS lift_raw,
           FLOOR(lift_cuped * 10000 + 0.5) / 10000 AS lift_cuped
    FROM c
    """,
)
def ev_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction: the observation window splits at its
    calendar midpoint into pre-period (covariate X = event count) and
    experiment period (outcome Y = purchase value); θ = cov(X,Y)/var(X),
    Y_adj = Y − θ(X − X̄). Reports θ, the variance reduction
    1 − var(Y_adj)/var(Y) — var(Y−θX) expands to closed form, so no
    second data pass — and the treated-minus-control lift before/after
    adjustment (CUPED shifts both arms by the same X̄, so the estimate
    moves only through each arm's pre-period imbalance).

    Scale: one user-grain rollup, one sufficient-statistics row;
    identical single-pass shape to stat_regression."""
    ev = cat(spark, sf_dir)["events"]
    e = ev.select(
        "user_id",
        "event_type",
        "value",
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias("dn"),
    )
    b = e.agg(
        ((F.min("dn") + F.max("dn") + 1) / 2).cast("long").alias("mid")
    )
    u = (
        e.join(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum((F.col("dn") < F.col("mid")).cast("int"))
            .cast("double")
            .alias("x"),
            F.sum(
                F.when(
                    (F.col("dn") >= F.col("mid"))
                    & (F.col("event_type") == "purchase"),
                    F.col("value"),
                ).otherwise(0.0)
            ).alias("y"),
        )
        .select((F.col("user_id") % 2).cast("double").alias("treat"), "x", "y")
    )
    x, y, t = F.col("x"), F.col("y"), F.col("treat")
    s = u.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
        F.sum(t).alias("nt"),
        F.sum(t * x).alias("stx"),
        F.sum(t * y).alias("sty"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    nt, stx, sty = F.col("nt"), F.col("stx"), F.col("sty")
    theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    var_y = (syy - sy * sy / n) / n
    var_x = (sxx - sx * sx / n) / n
    cov_xy = (sxy - sx * sy / n) / n
    lift_raw = sty / nt - (sy - sty) / (n - nt)
    lift_cuped = (sty / nt - theta * (stx / nt - sx / n)) - (
        (sy - sty) / (n - nt) - theta * ((sx - stx) / (n - nt) - sx / n)
    )
    return s.select(
        n.cast("bigint").alias("n_users"),
        ratio(theta).alias("theta"),
        ratio(
            1.0 - (var_y - 2 * theta * cov_xy + theta * theta * var_x) / var_y
        ).alias("var_reduction"),
        ratio(lift_raw).alias("lift_raw"),
        ratio(lift_cuped).alias("lift_cuped"),
    )


@query(
    "ml_ipw_estimate",
    oracle=f"""
    WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
                      SUM(CASE WHEN event_type = 'purchase'
                          THEN value ELSE 0 END) AS y
               FROM events GROUP BY 1),
    p AS (SELECT user_id, y,
                 CASE WHEN n_ev < {IPW_ACT_SPLIT}
                      THEN {IPW_P_LOW} ELSE {IPW_P_HIGH} END AS pc,
                 CASE WHEN (user_id * {FP_MUL}) % 100 <
                           (CASE WHEN n_ev < {IPW_ACT_SPLIT}
                            THEN {IPW_P_LOW} ELSE {IPW_P_HIGH} END)
                      THEN 1 ELSE 0 END AS a
          FROM u),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(a) AS BIGINT) AS n_logged,
                 SUM(CASE WHEN a = 1 THEN y END) / NULLIF(SUM(a), 0)
                   AS naive,
                 SUM(a * y / (pc / 100.0)) / SUM(a / (pc / 100.0)) AS ipw,
                 AVG(y) AS true_mean
          FROM p)
    SELECT n_users, n_logged,
           FLOOR(naive * 10000 + 0.5) / 10000 AS naive,
           FLOOR(ipw * 10000 + 0.5) / 10000 AS ipw,
           FLOOR(true_mean * 10000 + 0.5) / 10000 AS true_mean
    FROM s
    """,
)
def ml_ipw_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-normalized inverse-propensity estimate of mean purchase
    value under a biased logging policy: high-activity users were
    logged with p={ph}%, low-activity with p={pl}% (hash-drawn,
    deterministic), so the naive logged-only mean over-represents
    heavy users; weighting each logged row by 1/p recovers the
    all-users mean. true_mean ships alongside so the bias correction
    is auditable (in production it wouldn't exist — that's the point
    of IPW).

    Scale: one user rollup + one sufficient-statistics row; the
    propensity is a pure column expression, exactly like the bootstrap
    weights."""
    ev = cat(spark, sf_dir)["events"]
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0.0)
        ).alias("y"),
    )
    pc = F.when(F.col("n_ev") < IPW_ACT_SPLIT, IPW_P_LOW).otherwise(IPW_P_HIGH)
    a = ((F.col("user_id") * FP_MUL) % 100 < pc).cast("int")
    p = u.select("user_id", "y", pc.alias("pc"), a.alias("a"))
    af, yf = F.col("a"), F.col("y")
    w = af / (F.col("pc") / 100.0)
    s = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(af).cast("bigint").alias("n_logged"),
        (
            F.sum(F.when(af == 1, yf)) / F.nullif(F.sum(af), F.lit(0))
        ).alias("naive"),
        (F.sum(w * yf) / F.sum(w)).alias("ipw"),
        F.avg(yf).alias("true_mean"),
    )
    return s.select(
        "n_users",
        "n_logged",
        ratio(F.col("naive")).alias("naive"),
        ratio(F.col("ipw")).alias("ipw"),
        ratio(F.col("true_mean")).alias("true_mean"),
    )


ml_ipw_estimate.__doc__ = ml_ipw_estimate.__doc__.format(
    ph=IPW_P_HIGH, pl=IPW_P_LOW
)


def run_stream_snapshot_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch CDC into the transactional snapshot table: each
    micro-batch reduces to one latest-event row per user, conflict-
    resolves against the table's current state (max event ts, event_id
    tiebreak; event counts accumulate additively), and MERGEs — so the
    final table equals the batch latest-per-user answer REGARDLESS of
    how the stream was batched. Returns the final table content.

    Scale: the read-modify-merge touches only the incoming batch's key
    range (SnapshotTable.merge prunes disjoint data dirs by key
    stats); state lives in the table, not executor memory."""
    from mister_spark.sources.snapshots import SnapshotTable
    from mister_spark.sources.staged import REPO_TMP
    from mister_spark.streaming.jobs import _read_events_stream

    path = os.path.join(
        REPO_TMP, f"snap_upsert_{uuid.uuid4().hex[:8]}"
    )
    table = SnapshotTable(spark, path, stats_cols=["user_id"])

    def resolve(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.max(F.struct("ts", "event_id", "event_type")).alias("m"),
            F.sum("n").cast("bigint").alias("n"),
        ).select(
            "user_id",
            F.col("m.ts").alias("ts"),
            F.col("m.event_id").alias("event_id"),
            F.col("m.event_type").alias("event_type"),
            "n",
        )

    def handle(batch: DataFrame, batch_id: int) -> None:
        inc = resolve(
            batch.select(
                "user_id", "ts", "event_id", "event_type", F.lit(1).alias("n")
            )
        )
        if table.current_version() is not None:
            inc = resolve(table.read().unionByName(inc))
        table.merge(inc, "user_id")

    ev = _read_events_stream(spark, sf_dir)
    ckpt = os.path.join(REPO_TMP, "ckpt", os.path.basename(path))
    q = (
        ev.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return table.read().select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.col("n").alias("n_events"),
    ).orderBy("user_id")


@query(
    "stream_snapshot_upsert",
    # Real oracle: conflict resolution is max(ts, event_id) with
    # additive counts, so the final table equals the batch
    # latest-per-user rollup regardless of batching (the pytest parity
    # this op already pins).
    oracle="""
    WITH r AS (SELECT user_id, ts, event_type,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC,
                                                  event_id DESC) AS rn,
                      COUNT(*) OVER (PARTITION BY user_id) AS n
               FROM events)
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           event_type AS last_type,
           CAST(n AS BIGINT) AS n_events
    FROM r WHERE rn = 1
    """,
)
def stream_snapshot_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_snapshot_upsert(spark, sf_dir)


@query(
    "tx_hapax_rate",
    oracle=f"""
    WITH t AS (SELECT source, {DUCK_TOKENS} AS toks FROM documents),
    tk AS (SELECT source, unnest(toks) AS term FROM t),
    sc AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
           FROM tk GROUP BY 1, 2)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           FLOOR(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) * 10000 + 0.5) / 10000 AS hapax_type_share,
           FLOOR(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / SUM(c) * 10000 + 0.5) / 10000 AS hapax_token_share
    FROM sc GROUP BY source
    """,
)
def tx_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena profile per source: share of types (and of token
    mass) that occur exactly once within the source — the
    lexical-richness signal that separates natural prose (hapax-heavy)
    from templated/OCR'd/synthetic text (hapax-poor or hapax-saturated
    respectively); complements tx_zipf's slope and tx_vocab_growth's
    Heaps curve.

    Scale: one (source, term) count shuffle — vocab-sized — then a
    |sources| rollup."""
    docs = cat(spark, sf_dir)["documents"]
    sc = (
        docs.select("source", F.explode(tokens()).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    c = F.col("c")
    return sc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(c).cast("bigint").alias("n_tokens"),
        F.sum((c == 1).cast("int")).cast("bigint").alias("n_hapax"),
        ratio(
            F.sum((c == 1).cast("int")).cast("double") / F.count(F.lit(1))
        ).alias("hapax_type_share"),
        ratio(F.sum((c == 1).cast("int")).cast("double") / F.sum(c)).alias(
            "hapax_token_share"
        ),
    )
