"""Wave 65: ensembling, econometrics, temporal splits, and streaming
observability.

ml_ensemble_vote shows the variance-reduction arithmetic of majority
voting over weak scorers (and measures it against each member);
ev_price_elasticity is the log-log demand regression straight off the
order book; ds_temporal_split builds the time-based train/eval split
AND quantifies its user-leakage (the thing temporal splits silently
have and random splits don't); stream_progress_report surfaces the
StreamingQueryProgress metrics (rows/batches/watermark advance) that
production streaming runbooks monitor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

VOTE_DIMS = (1, 2, 3)  # embedding dims used as three weak scorers


@query(
    "ml_ensemble_vote",
    oracle=f"""
    WITH s AS (SELECT CASE WHEN label < 5 THEN 1 ELSE 0 END AS y,
                      {", ".join(
                          f"CASE WHEN CAST(embedding[{d}] AS DOUBLE) > 0"
                          f" THEN 1 ELSE 0 END AS c{i}"
                          for i, d in enumerate(VOTE_DIMS)
                      )}
               FROM embeddings),
    v AS (SELECT y, c0, c1, c2,
                 CASE WHEN c0 + c1 + c2 >= 2 THEN 1 ELSE 0 END AS vote
          FROM s)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           {", ".join(
               f"FLOOR(AVG(CASE WHEN c{i} = y THEN 1.0 ELSE 0.0 END)"
               f" * 10000 + 0.5) / 10000 AS acc_c{i}"
               for i in range(len(VOTE_DIMS))
           )},
           FLOOR(AVG(CASE WHEN vote = y THEN 1.0 ELSE 0.0 END)
                 * 10000 + 0.5) / 10000 AS acc_vote
    FROM v
    """,
)
def ml_ensemble_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-vote ensemble of three weak sign classifiers
    (embedding dims {dims} > 0 vs label < 5): per-member accuracy next
    to the 2-of-3 vote's accuracy — the ensembling arithmetic
    (independent errors cancel; correlated ones don't) measured, not
    assumed.

    Scale: one pass to a handful of accuracy aggregates."""
    emb = cat(spark, sf_dir)["embeddings"]
    y = (F.col("label") < 5).cast("int").alias("y")
    cs = [
        (F.element_at("embedding", d).cast("double") > 0)
        .cast("int")
        .alias(f"c{i}")
        for i, d in enumerate(VOTE_DIMS)
    ]
    s = emb.select(y, *cs)
    vote = (
        (F.col("c0") + F.col("c1") + F.col("c2") >= 2).cast("int").alias("vote")
    )
    v = s.withColumn("vote", vote)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for i in range(len(VOTE_DIMS)):
        aggs.append(
            ratio(
                F.avg((F.col(f"c{i}") == F.col("y")).cast("double"))
            ).alias(f"acc_c{i}")
        )
    aggs.append(
        ratio(F.avg((F.col("vote") == F.col("y")).cast("double"))).alias(
            "acc_vote"
        )
    )
    return v.agg(*aggs)


ml_ensemble_vote.__doc__ = ml_ensemble_vote.__doc__.format(dims=VOTE_DIMS)


@query(
    "ev_price_elasticity",
    oracle="""
    WITH l AS (SELECT ln(CAST(l_quantity AS DOUBLE)) AS q,
                      ln(l_extendedprice / l_quantity) AS p
               FROM lineitem WHERE l_quantity > 0 AND l_extendedprice > 0),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(p) AS sx, SUM(q) AS sy,
                 SUM(p * p) AS sxx, SUM(p * q) AS sxy, SUM(q * q) AS syy
          FROM l)
    SELECT CAST(n AS BIGINT) AS n_lines,
           FLOOR((n * sxy - sx * sy) / (n * sxx - sx * sx) * 10000 + 0.5)
             / 10000 AS elasticity,
           FLOOR((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                 * 10000 + 0.5) / 10000 AS r2
    FROM s
    """,
)
def ev_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity of demand from the order book: OLS of
    ln(quantity) on ln(unit price) across line items — the slope IS
    the elasticity (% quantity change per % price change), with r² as
    the fit quality. The classic log-log demand read.

    Scale: one narrow log map + one sufficient-statistics row."""
    li = cat(spark, sf_dir)["lineitem"].filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    l = li.select(
        F.log(F.col("l_quantity").cast("double")).alias("q"),
        F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("p"),
    )
    p, q = F.col("p"), F.col("q")
    s = l.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(p).alias("sx"),
        F.sum(q).alias("sy"),
        F.sum(p * p).alias("sxx"),
        F.sum(p * q).alias("sxy"),
        F.sum(q * q).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    num = n * sxy - sx * sy
    return s.select(
        n.cast("bigint").alias("n_lines"),
        ratio(num / (n * sxx - sx * sx)).alias("elasticity"),
        ratio(num * num / ((n * sxx - sx * sx) * (n * syy - sy * sy))).alias(
            "r2"
        ),
    )


@query(
    "ds_temporal_split",
    oracle="""
    WITH e AS (SELECT user_id, event_id,
                      date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS dn
               FROM events),
    b AS (SELECT (MIN(dn) + MAX(dn) + 1) // 2 AS mid FROM e),
    s AS (SELECT e.user_id, e.event_id,
                 CASE WHEN e.dn < b.mid THEN 'train' ELSE 'eval' END AS split
          FROM e CROSS JOIN b),
    c AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM s GROUP BY 1),
    o AS (SELECT CAST(COUNT(*) AS BIGINT) AS overlap_users FROM (
            SELECT user_id FROM s GROUP BY user_id
            HAVING COUNT(DISTINCT split) = 2))
    SELECT c.split, c.n_events, c.n_users, o.overlap_users,
           FLOOR(CAST(o.overlap_users AS DOUBLE) / c.n_users * 10000 + 0.5)
             / 10000 AS leak_share
    FROM c CROSS JOIN o
    """,
)
def ds_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/eval split at the calendar midpoint with the
    leakage report: events before the cut train, after it evaluate —
    and overlap_users counts users present on BOTH sides (temporal
    splits always leak entities across time; this op puts the number
    on the table so the modeler chooses eyes-open between temporal
    and user-level splits, ds_user_split being the latter).

    Scale: one pass for the split labels, one distinct-user rollup per
    side, one both-sides rollup — all partition by user_id."""
    ev = cat(spark, sf_dir)["events"]
    e = ev.select(
        "user_id",
        "event_id",
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias("dn"),
    )
    b = e.agg(((F.min("dn") + F.max("dn") + 1) / 2).cast("long").alias("mid"))
    s = e.join(F.broadcast(b)).select(
        "user_id",
        "event_id",
        F.when(F.col("dn") < F.col("mid"), "train")
        .otherwise("eval")
        .alias("split"),
    ).localCheckpoint()
    c = s.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
    o = (
        s.groupBy("user_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") == 2)
        .agg(F.count(F.lit(1)).cast("bigint").alias("overlap_users"))
    )
    return c.join(F.broadcast(o)).select(
        "split",
        "n_events",
        "n_users",
        "overlap_users",
        ratio(
            F.col("overlap_users").cast("double") / F.col("n_users")
        ).alias("leak_share"),
    )


@query("stream_progress_report")  # runtime observability → rows-only;
# pytest checks the accounting against the input table.
def stream_progress_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming observability: run the tumbling aggregation with
    availableNow and report per-micro-batch StreamingQueryProgress —
    input rows, processed-rows/sec, state rows, and watermark
    advancement. These are THE numbers a streaming runbook alarms on
    (lag = inputRows piling up; state growth = eviction not keeping
    up); surfacing them as a queryable frame makes the health check a
    query like everything else.

    Scale: progress records are O(batches) driver metadata."""
    import json
    import os
    import uuid

    from mister_spark.sources.staged import REPO_TMP
    from mister_spark.streaming.jobs import _read_events_stream

    ev = _read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = ev.groupBy(
        F.window("ts", "1 hour").alias("win"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    name = f"progress_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(REPO_TMP, "ckpt", name)
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = []
    for i, p in enumerate(q.recentProgress):
        d = p if isinstance(p, dict) else json.loads(p.json)
        op = (d.get("stateOperators") or [{}])[0]
        rows.append(
            (
                i,
                int(d.get("numInputRows") or 0),
                int(d.get("batchId", i)),
                int(op.get("numRowsTotal") or 0),
                str(d.get("eventTime", {}).get("watermark", "")),
            )
        )
    return spark.createDataFrame(
        rows,
        "batch int, input_rows long, batch_id long, state_rows long, "
        "watermark string",
    ).orderBy("batch")
