"""Wave 16: DAU/WAU engagement, trimmed means, Markov stationary
distribution, canonical near-dup representative, and audio frame
windows.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.operators.dedup import DD_NGRAM_ORACLE
from mister_spark.registry import query

DAY_US = 86_400_000_000
TRIM = 0.1
MARKOV_ITERS = 30


@query(
    "ev_active_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
    dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
    wau AS (
      SELECT t.day, CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau
      FROM (SELECT DISTINCT day FROM ud) t
      JOIN ud ON ud.day BETWEEN t.day - 6 AND t.day
      GROUP BY 1)
    SELECT CAST(d.day AS BIGINT) AS day, d.dau, w.wau,
           FLOOR(CAST(d.dau AS DOUBLE) / w.wau * 10000 + 0.5) / 10000
             AS stickiness
    FROM dau d JOIN wau w ON d.day = w.day
    """,
)
def ev_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU, trailing-7-day WAU, and DAU/WAU stickiness per day — the
    product-health triple. The WAU distinct is computed by fanning each
    (user, day) activity row onto the 7 target days it supports, then
    one distinct count per day — a bounded ×7 explode instead of a
    per-day range scan.

    Scale: user-day dedup shuffles once; the ×7 fan-out then shuffles on
    day. Both key sets shrink monotonically (users→user-days→days). An
    HLL sketch (sketch_hll_rollup) replaces the exact distinct at
    100 TB. The user-day frame is checkpointed — three branches (DAU,
    fan-out, day spine) read it."""
    ev = cat(spark, sf_dir)["events"]
    ud = (
        ev.select("user_id", F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .distinct()
        .localCheckpoint()
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    fan = ud.select(
        "user_id", F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("tday")
    )
    days = ud.select("day").distinct()
    wau = (
        fan.join(days.withColumnRenamed("day", "tday"), "tday")
        .groupBy("tday")
        .agg(F.countDistinct("user_id").alias("wau"))
        .withColumnRenamed("tday", "day")
    )
    return (
        dau.join(wau, "day")
        .select(
            F.col("day").cast("long").alias("day"),
            "dau",
            "wau",
            ratio(F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


@query(
    "stat_trimmed_mean",
    oracle=f"""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, {TRIM}) AS lo,
             quantile_cont(value, {1 - TRIM}) AS hi
      FROM events GROUP BY 1)
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN e.value >= q.lo AND e.value <= q.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           FLOOR(AVG(CASE WHEN e.value >= q.lo AND e.value <= q.hi
                          THEN e.value END) * 10000 + 0.5) / 10000
             AS trimmed_mean,
           FLOOR(AVG(e.value) * 10000 + 0.5) / 10000 AS raw_mean
    FROM events e JOIN q ON e.event_type = q.event_type
    GROUP BY 1
    """,
)
def stat_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean per event type next to the raw mean — the
    robust central tendency that survives the value column's tail
    without MAD's full rank machinery. Percentile bounds join back
    broadcast; the conditional average ignores trimmed rows.

    Scale: the ev_zscore/stat_outlier_iqr two-pass shape — one
    percentile agg, one broadcast recount; percentile_approx at
    100 TB."""
    ev = cat(spark, sf_dir)["events"].select("event_type", "value")
    q = ev.groupBy("event_type").agg(
        F.expr(f"percentile(value, {TRIM})").alias("lo"),
        F.expr(f"percentile(value, {1 - TRIM})").alias("hi"),
    )
    kept = (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi"))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
            ratio(F.avg(F.when(kept, F.col("value")))).alias("trimmed_mean"),
            ratio(F.avg("value")).alias("raw_mean"),
        )
    )


@query(
    "ev_markov_stationary",
    # Real oracle: the power iteration is a recursive CTE — the
    # transition matrix (ev_markov's oracle SQL, row-normalized and
    # ROUNDED to 4dp exactly like the frame the Spark loop consumes)
    # is applied {MARKOV_ITERS} times with a GROUP BY in the recursive
    # term. States with no inbound transitions drop after step 1 in
    # both engines (the aggregate keys on to_type).
    oracle=f"""
    WITH RECURSIVE s AS (SELECT user_id, event_type,
                                lead(event_type) OVER (PARTITION BY user_id
                                                       ORDER BY ts, event_id)
                                  AS next_type
                         FROM events),
    tc AS (SELECT event_type AS from_type, next_type AS to_type,
                  CAST(COUNT(*) AS DOUBLE) AS n
           FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT from_type, to_type,
                 FLOOR(n / SUM(n) OVER (PARTITION BY from_type) * 10000
                       + 0.5) / 10000 AS p
          FROM tc),
    states AS (SELECT DISTINCT from_type AS state FROM t),
    ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM states),
    pw AS (
      SELECT 0 AS it, state, 1.0 / ns.n AS prob FROM states CROSS JOIN ns
      UNION ALL
      SELECT pw.it + 1, t.to_type, SUM(t.p * pw.prob)
      FROM pw JOIN t ON t.from_type = pw.state
      WHERE pw.it < {MARKOV_ITERS}
      GROUP BY pw.it, t.to_type
    )
    SELECT state, FLOOR(prob * 10000 + 0.5) / 10000 AS pi
    FROM pw WHERE it = {MARKOV_ITERS}
    """,
)
def ev_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-journey Markov chain: where
    does a long random session end up spending its time? Power
    iteration over the |types|² transition matrix from ev_markov —
    30 iterations of π' = πP as a join + keyed sum, model state in
    lineage only.

    Scale: the transition matrix is |types|² rows regardless of corpus
    size (the one data-sized pass is ev_markov's lead() shuffle); each
    iteration is a broadcast-sized join. The same loop as PageRank with
    row-normalized weights and no damping."""
    from mister_spark.operators.extras4 import ev_markov

    t = ev_markov(spark, sf_dir).select("from_type", "to_type", "p").localCheckpoint()
    pi = (
        t.select(F.col("from_type").alias("state"))
        .distinct()
        .withColumn("prob", F.lit(1.0))
    )
    n_states = pi.count()
    pi = pi.withColumn("prob", F.col("prob") / n_states)
    for _ in range(MARKOV_ITERS):
        pi = (
            t.join(pi, t.from_type == pi.state)
            .groupBy(F.col("to_type").alias("state"))
            .agg(F.sum(F.col("p") * F.col("prob")).alias("prob"))
            .localCheckpoint()
        )
    return pi.select("state", rnd(F.col("prob"), 4).alias("pi"))


@query(
    "dd_canonical",
    # Real oracle: dd_clusters' transitive-closure SQL plus the
    # per-cluster (n_chars DESC, doc_id) keeper argmax — integers
    # end-to-end.
    oracle=f"""
    WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ({DD_NGRAM_ORACLE})),
    sym AS (SELECT DISTINCT a, b FROM (
              SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs)),
    reach AS (
      SELECT a AS node, a AS lab FROM sym
      UNION
      SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
    ),
    cl AS (SELECT node AS doc_id, MIN(lab) AS cluster_id
           FROM reach GROUP BY node),
    m AS (SELECT cl.doc_id, cl.cluster_id, d.n_chars,
                 ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
                                    ORDER BY d.n_chars DESC, cl.doc_id)
                   AS r
          FROM cl JOIN documents d USING (doc_id)),
    keep AS (SELECT cluster_id, doc_id AS keep_id FROM m WHERE r = 1)
    SELECT m.doc_id, m.cluster_id, k.keep_id,
           CAST(CASE WHEN m.doc_id = k.keep_id THEN 1 ELSE 0 END AS INT)
             AS is_canonical
    FROM m JOIN keep k USING (cluster_id)
    """,
)
def dd_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection: after near-dup clustering
    (dd_clusters), keep ONE doc per cluster — the longest text, doc_id
    as tiebreak — and map every member to its keeper. This is the final
    step of a dedup pipeline: the output manifest says for each doc
    whether it survives and who replaces it if not.

    Scale: one join of the cluster map against doc lengths, one
    per-cluster argmax window over near-dup-group-sized partitions
    (tiny by construction)."""
    from mister_spark.operators.extras2 import dd_clusters

    clusters = dd_clusters(spark, sf_dir)
    docs = cat(spark, sf_dir)["documents"].select("doc_id", "n_chars")
    m = clusters.join(docs, "doc_id")
    w = W.partitionBy("cluster_id").orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = m.withColumn("r", F.row_number().over(w))
    keepers = ranked.filter(F.col("r") == 1).select(
        "cluster_id", F.col("doc_id").alias("keep_id")
    )
    return (
        ranked.join(keepers, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "keep_id",
            (F.col("doc_id") == F.col("keep_id")).cast("int").alias("is_canonical"),
        )
    )


AUDIO_FRAME = 256  # bytes per stub "frame"


@query(
    "mm_audio_windows",
    # Real oracle: the stub PCM framing is byte arithmetic on the
    # pure-ASCII corpus — ascii(substr) IS the payload byte, frames
    # group positions by (pos-1)//256, energy is an exact integer sum
    # mod 10000.
    oracle=f"""
    WITH ch AS (SELECT doc_id, g.i AS pos,
                       ascii(substr(text, CAST(g.i AS INT), 1)) AS b
                FROM documents,
                     LATERAL (SELECT unnest(generate_series(1, len(text)))
                              AS i) g)
    SELECT doc_id,
           CAST((pos - 1) // {AUDIO_FRAME} AS INT) AS frame_idx,
           CAST(((pos - 1) // {AUDIO_FRAME}) * {AUDIO_FRAME} AS INT)
             AS offset,
           CAST(COUNT(*) AS INT) AS n_bytes,
           CAST(SUM(b) % 10000 AS INT) AS energy
    FROM ch GROUP BY doc_id, 2, 3
    """,
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio frame windowing: each binary payload (stub PCM — real
    codecs absent here) is cut into fixed 256-byte frames and each
    frame reports offset + a deterministic energy proxy (byte-sum mod
    10000 — stands in for RMS). The VAD/feature-window front-end with
    real Arrow plumbing: batched mapInPandas, stable schema, frame
    count proportional to payload length.

    Scale: frames never leave their partition; the downstream
    aggregation (frames → utterance features) would reuse the same
    pass. No byte shuffling."""
    import pandas as pd

    docs = cat(spark, sf_dir)["documents"].select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, len(b), AUDIO_FRAME):
                    chunk = b[i : i + AUDIO_FRAME]
                    out.append(
                        (int(doc_id), i // AUDIO_FRAME, i, len(chunk),
                         sum(chunk) % 10000)
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "offset", "n_bytes", "energy"]
            )

    return docs.mapInPandas(
        frames, "doc_id long, frame_idx int, offset int, n_bytes int, energy int"
    )
