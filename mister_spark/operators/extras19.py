"""Wave 19: streaming anomaly gating, watermark-lateness diagnostics,
modality routing, and epoch-varied deterministic shuffle manifests.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

LATENESS_HORIZON_US = 60 * 60 * 1_000_000  # 1-hour watermark delay
EPOCH_MULTIPLIERS = {0: 1103515245, 1: 1588635695, 2: 2654435761}


@query(
    "stream_anomaly",
    # Real oracle: the stream side is a stateless broadcast-model
    # filter, so the bounded replay equals the batch filter exactly
    # (pytest parity); quantile_cont matches Spark percentile's
    # interpolation, and rz rounds on the shared floor grid BEFORE
    # the 3.5 gate, exactly like the Spark expression.
    oracle="""
    WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                 FROM events GROUP BY 1),
    dev AS (SELECT e.event_type, ABS(e.value - m.med) AS dv
            FROM events e JOIN med m USING (event_type)),
    model AS (SELECT d.event_type, ANY_VALUE(m.med) AS med,
                     quantile_cont(d.dv, 0.5) AS mad
              FROM dev d JOIN med m USING (event_type) GROUP BY 1),
    scored AS (SELECT e.event_id, e.event_type, e.value, m.mad,
                      FLOOR(0.6745 * ABS(e.value - m.med) / m.mad
                            * 10000 + 0.5) / 10000 AS rz
               FROM events e JOIN model m USING (event_type))
    SELECT event_id, event_type, value, rz
    FROM scored WHERE mad > 0 AND rz > 3.5
    """,
)
def stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming anomaly gate: batch-train the per-type MAD thresholds
    (ev_anomaly_mad's robust statistics), broadcast them into the event
    stream, and emit only rows whose modified z-score exceeds 3.5 — the
    train-batch / score-stream split every production detector uses.
    Bounded availableNow replay equals the batch filter exactly
    (verified in tests).

    Scale: the stream side is stateless (no watermark state at all —
    the model join is a broadcast), so throughput is scan-bound; model
    refresh is a foreachBatch swap."""
    from mister_spark.operators.extras10 import ev_anomaly_mad  # noqa: F401
    from mister_spark.streaming.jobs import _read_events_stream, _run_to_memory

    ev_stat = cat(spark, sf_dir)["events"].select("event_type", "value")
    med = ev_stat.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev_stat.join(F.broadcast(med), "event_type").withColumn(
        "dv", F.abs(F.col("value") - F.col("med"))
    )
    model = dev.groupBy("event_type").agg(
        F.first("med").alias("med"), F.expr("percentile(dv, 0.5)").alias("mad")
    )

    stream = _read_events_stream(spark, sf_dir)
    scored = stream.join(F.broadcast(model), "event_type").withColumn(
        "rz",
        rnd(
            F.lit(0.6745)
            * F.abs(F.col("value") - F.col("med"))
            / F.col("mad"),
            4,
        ),
    )
    flagged = scored.filter((F.col("mad") > 0) & (F.col("rz") > 3.5)).select(
        "event_id", "event_type", "value", "rz"
    )
    return _run_to_memory(flagged, "append")


@query(
    "ev_lateness_report",
    oracle=f"""
    WITH arr AS (
      SELECT user_id, event_type, epoch_us(ts) AS tus,
             MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                     ROWS UNBOUNDED PRECEDING) AS hwm
      FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN hwm - tus > {LATENESS_HORIZON_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           FLOOR(AVG(CASE WHEN hwm - tus > {LATENESS_HORIZON_US}
                          THEN 1.0 ELSE 0.0 END) * 10000 + 0.5) / 10000
             AS late_share,
           CAST(MAX(hwm - tus) AS BIGINT) AS max_lateness_us
    FROM arr GROUP BY 1
    """,
)
def ev_lateness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing diagnostic: replaying each user's stream in
    arrival order (event_id), how many events arrive more than 1 hour
    behind that user's event-time high-water mark — exactly the rows a
    1-hour watermark would drop. The batch report that justifies (or
    indicts) the streaming jobs' watermark choice, per event type.

    Scale: one user_id shuffle; the running max is a partitioned
    window in arrival order. The global variant would be a one-task
    sort — per-user is both the semantically right granularity
    (watermarks track per-source skew) and the parallel one."""
    ev = cat(spark, sf_dir)["events"].select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("tus")
    )
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    arr = ev.withColumn("hwm", F.max("tus").over(w))
    late = F.col("hwm") - F.col("tus") > LATENESS_HORIZON_US
    return arr.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("n_late"),
        ratio(F.avg(F.when(late, 1.0).otherwise(0.0))).alias("late_share"),
        F.max(F.col("hwm") - F.col("tus")).cast("long").alias("max_lateness_us"),
    )


@query(
    "mm_modality_router",
    # Real oracle: the stub wraps payloads by doc_id % 3 (6-byte PNG /
    # 4-byte RIFF prefix / bare text), so modality and byte volume are
    # pure arithmetic over the ASCII byte lengths.
    oracle="""
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image'
                           WHEN 1 THEN 'audio'
                           ELSE 'text' END AS modality,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(octet_length(encode(text))
                    + CASE doc_id % 3 WHEN 0 THEN 6
                                      WHEN 1 THEN 4 ELSE 0 END)
                AS BIGINT) AS total_bytes
    FROM documents GROUP BY 1
    """,
)
def mm_modality_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality routing: payloads are dispatched by their magic-byte
    prefix (PNG / RIFF-WAV / UTF-8 text — synthesized here by the stub,
    since the corpus is text-only) and each modality reports its batch
    count + byte volume. This is the fan-out head of a multimodal
    pipeline: one pass tags rows, downstream stages filter on the tag
    and decode only their modality.

    Scale: tagging is a JVM prefix compare on the binary column (no
    Python); the per-modality rollup is a 3-key aggregate. The decode
    stages it feeds would be modality-filtered mapInPandas passes."""
    docs = cat(spark, sf_dir)["documents"]
    # stub: deterministically wrap each payload in a fake container by
    # doc_id so all three branches exist
    payload = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit(b"\x89PNG\r\n"), F.encode("text", "UTF-8")),
    ).when(
        F.col("doc_id") % 3 == 1,
        F.concat(F.lit(b"RIFF"), F.encode("text", "UTF-8")),
    ).otherwise(F.encode("text", "UTF-8"))
    tagged = docs.select(
        "doc_id", payload.alias("payload")
    ).withColumn(
        "modality",
        F.when(F.substring("payload", 1, 4) == F.lit(b"\x89PNG"), "image")
        .when(F.substring("payload", 1, 4) == F.lit(b"RIFF"), "audio")
        .otherwise("text"),
    )
    return tagged.groupBy("modality").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.octet_length("payload")).cast("long").alias("total_bytes"),
    )


@query(
    "ds_epoch_plan",
    oracle=f"""
    WITH e AS (SELECT unnest([0, 1, 2]) AS epoch),
    keyed AS (
      SELECT e.epoch, d.doc_id,
             (d.doc_id * CASE e.epoch
                WHEN 0 THEN {EPOCH_MULTIPLIERS[0]}
                WHEN 1 THEN {EPOCH_MULTIPLIERS[1]}
                ELSE {EPOCH_MULTIPLIERS[2]} END + 12345) % 2147483648 AS k
      FROM documents d, e),
    ordered AS (
      SELECT epoch, doc_id, k,
             ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS pos
      FROM keyed)
    SELECT CAST(epoch AS BIGINT) AS epoch,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id * pos) % 1000000007 AS BIGINT) AS order_checksum,
           CAST(MIN(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT) AS first_doc
    FROM ordered GROUP BY 1
    """,
)
def ds_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch shuffle plans: each training epoch orders the corpus by a
    different LCG multiplier, giving independent-looking but fully
    reproducible permutations (resume epoch 2 at position k on any
    cluster). The manifest row per epoch carries an order checksum
    Σ doc·pos mod p — positional, so ANY transposition changes it and
    two engines agreeing on it agree on the entire permutation.

    Scale: positions come from functions/ranks.global_rank — the
    two-phase range-partitioned sort — NOT a per-epoch window (which
    would pull each epoch's whole corpus through one task). The
    epoch-major global rank minus the epoch's base offset is exactly
    the within-epoch position."""
    from mister_spark.functions.ranks import global_rank

    docs = cat(spark, sf_dir)["documents"].select("doc_id")
    n = docs.agg(F.count(F.lit(1)).alias("n_total"))
    epochs = spark.createDataFrame(
        [(e, m) for e, m in EPOCH_MULTIPLIERS.items()], "epoch long, mult long"
    )
    keyed = docs.join(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        ((F.col("doc_id") * F.col("mult") + 12345) % 2147483648).alias("k"),
    )
    ordered = (
        global_rank(keyed, "epoch", "k", "doc_id")
        .join(F.broadcast(n))
        .withColumn("pos", F.col("rk") - F.col("epoch") * F.col("n_total"))
    )
    return ordered.groupBy("epoch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.col("doc_id") * F.col("pos")) % 1000000007)
        .cast("long")
        .alias("order_checksum"),
        F.min(F.when(F.col("pos") == 1, F.col("doc_id"))).cast("long").alias(
            "first_doc"
        ),
    )
