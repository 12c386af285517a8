"""Wave 28: linear interpolation of sparse daily series, int8 embedding
quantization, weighted medians, and WebDataset-style shard manifests.

Four shapes a 100 TB training-data platform runs constantly: gap repair
for monitoring series (interpolate, don't zero-fill), storage-layout
compression for embedding stores (symmetric int8, the standard serving
format), robust weighted center statistics, and byte-budgeted shard
assignment for sequential-read training input. The interpolation and
manifest keys both reuse the scale-safe primitives from
functions/ranks (partitioned IGNORE-NULLS windows, bucketed_cumsum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query

SHARD_CAP_BYTES = 16384
DAY_US = 86400000000


@query(
    "ev_linear_interp",
    oracle=f"""
    WITH dc AS (SELECT epoch_us(ts) // {DAY_US} AS day, event_type,
                       FLOOR(SUM(value) * 100 + 0.5) AS vc
                FROM events GROUP BY 1, 2),
    sp AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM dc),
    ty AS (SELECT DISTINCT event_type FROM dc),
    g AS (SELECT ty.event_type, unnest(generate_series(sp.lo, sp.hi)) AS day
          FROM ty, sp),
    f AS (SELECT g.event_type, g.day, dc.vc
          FROM g LEFT JOIN dc ON dc.day = g.day AND dc.event_type = g.event_type),
    w AS (SELECT event_type, day, vc,
                 last_value(vc IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                 last_value(CASE WHEN vc IS NOT NULL THEN day END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
                 first_value(vc IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                 first_value(CASE WHEN vc IS NOT NULL THEN day END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
          FROM f)
    SELECT event_type, CAST(day AS BIGINT) AS day,
           CAST(CASE WHEN vc IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS observed,
           FLOOR((CASE WHEN vc IS NOT NULL THEN vc
                       ELSE pv + (nv - pv) * CAST(day - pd AS DOUBLE)
                            / (nd - pd) END) / 100 * 10000 + 0.5) / 10000
             AS value
    FROM w
    WHERE vc IS NOT NULL OR (pv IS NOT NULL AND nv IS NOT NULL)
    """,
)
def ev_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue per event type over a dense day grid with interior
    gaps LINEARLY INTERPOLATED between the nearest observed days (the
    gap-repair monitoring wants where zero-fill would fake an outage,
    ev_gap_fill's complement). Leading/trailing days with no bracketing
    observation are dropped; `observed` flags real vs interpolated rows.
    Daily totals are integer cents before the (identical-formula)
    interpolation division, so observed rows hash exactly.

    Scale: daily rollup is one partial-agg shuffle; the IGNORE-NULLS
    neighbor windows are PARTITIONED by event_type over the dense
    #days-per-type frame (grid-sized, not event-sized — the heavy frame
    never enters a window)."""
    ev = cat(spark, sf_dir)["events"]
    dc = (
        ev.select(
            F.expr(f"unix_micros(ts) div {DAY_US}").alias("day"),
            "event_type",
            "value",
        )
        .groupBy("day", "event_type")
        .agg(F.floor(F.sum("value") * 100 + F.lit(0.5)).alias("vc"))
        .localCheckpoint()  # three consumers: span, types, grid join
    )
    sp = dc.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    ty = dc.select("event_type").distinct()
    g = ty.crossJoin(F.broadcast(sp)).select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("day")
    )
    f = g.join(dc, ["day", "event_type"], "left")
    wb = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wa = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(0, W.unboundedFollowing)
    )
    obs_day = F.when(F.col("vc").isNotNull(), F.col("day"))
    w = f.select(
        "event_type",
        "day",
        "vc",
        F.last("vc", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(wb).alias("pd"),
        F.first("vc", ignorenulls=True).over(wa).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(wa).alias("nd"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("day") - F.col("pd")).cast("double") / (F.col("nd") - F.col("pd"))
    )
    return w.filter(
        F.col("vc").isNotNull()
        | (F.col("pv").isNotNull() & F.col("nv").isNotNull())
    ).select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        F.when(F.col("vc").isNotNull(), 1).otherwise(0).cast("bigint").alias("observed"),
        ratio(
            F.when(F.col("vc").isNotNull(), F.col("vc")).otherwise(interp) / 100
        ).alias("value"),
    )


@query(
    "emb_quantize_int8",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT vec_id, v, len(v) AS n_dims,
                 GREATEST(list_max(list_transform(v, x -> abs(x))), 1e-12) / 127
                   AS sc
          FROM e)
    SELECT vec_id, CAST(n_dims AS BIGINT) AS n_dims,
           FLOOR(sc * 1000000 + 0.5) / 1000000 AS scale,
           FLOOR(list_max(list_transform(
                   v, x -> abs(x - floor(x / sc + 0.5) * sc)))
                 * 1000000 + 0.5) / 1000000 AS max_err
    FROM s
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit of the embedding store: per
    vector, scale = max|x|/127 (so codes = floor(x/scale + 0.5) span
    [-127, 127] — the standard serving compression, 4× smaller than
    float32) and the max absolute reconstruction error, which is ≤
    scale/2 by construction (pytest pins the bound). Every reported
    number is order-independent (max, not sum), so the contract hashes
    exactly across engines; floor(x+0.5) rounding is spelled out in
    both so neither engine's round() tie rule is in play.

    Scale: one narrow map over the vectors — no shuffle, no UDF; the
    lambda pipeline stays in JVM codegen. A writer would emit the int8
    codes + scale as columns; this audit key reports the layout's error
    profile."""
    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    sc = F.greatest(
        F.array_max(F.transform("v", lambda x: F.abs(x))), F.lit(1e-12)
    ) / 127
    s = emb.select("vec_id", "v", F.size("v").alias("n_dims"), sc.alias("sc"))
    errs = F.transform(
        "v",
        lambda x: F.abs(
            x - F.floor(x / F.col("sc") + 0.5) * F.col("sc")
        ),
    )
    return s.select(
        "vec_id",
        F.col("n_dims").cast("bigint").alias("n_dims"),
        rnd(F.col("sc"), 6).alias("scale"),
        rnd(F.array_max(errs), 6).alias("max_err"),
    )


@query(
    "stat_weighted_median",
    oracle="""
    WITH w AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS wt
               FROM orders GROUP BY 1),
    j AS (SELECT n.n_name AS nation, c.c_acctbal AS v, w.wt, c.c_custkey AS ck
          FROM customer c
          JOIN w ON c.c_custkey = w.o_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey),
    c2 AS (SELECT nation, v, wt,
                  SUM(wt) OVER (PARTITION BY nation ORDER BY v, ck
                                ROWS UNBOUNDED PRECEDING) AS cumw,
                  SUM(wt) OVER (PARTITION BY nation) AS totw
           FROM j)
    SELECT nation, CAST(MIN(totw) AS BIGINT) AS total_weight,
           FLOOR(MIN(CASE WHEN 2 * cumw >= totw THEN v END) * 100 + 0.5) / 100
             AS wmedian
    FROM c2 GROUP BY 1
    """,
)
def stat_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation weighted median customer balance, weighted by order
    count — the robust center that answers 'what balance does the
    median ORDER see', not the median customer. Definition: first value
    (ascending, custkey tiebreak) whose cumulative weight reaches half
    the total — exact integer weight arithmetic, no interpolation.

    Scale: order counts are one partial-agg shuffle; the cumulative
    weight runs in windows PARTITIONED by nation (parallel across the
    25 groups; within-group frames are customers-per-nation sized — at
    extreme per-group cardinality the same bucketed_cumsum two-phase
    applies per group)."""
    orders = cat(spark, sf_dir)["orders"]
    cust = cat(spark, sf_dir)["customer"]
    nation = cat(spark, sf_dir)["nation"]
    w = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("wt"))
    j = (
        cust.join(w, cust["c_custkey"] == w["o_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_acctbal").alias("v"),
            "wt",
            F.col("c_custkey").alias("ck"),
        )
    )
    wcum = (
        W.partitionBy("nation").orderBy("v", "ck").rowsBetween(W.unboundedPreceding, 0)
    )
    wtot = W.partitionBy("nation")
    c2 = j.select(
        "nation",
        "v",
        F.sum("wt").over(wcum).alias("cumw"),
        F.sum("wt").over(wtot).alias("totw"),
    )
    return c2.groupBy("nation").agg(
        F.min("totw").cast("bigint").alias("total_weight"),
        money(F.min(F.when(2 * F.col("cumw") >= F.col("totw"), F.col("v")))).alias(
            "wmedian"
        ),
    )


@query(
    "mm_shard_manifest",
    oracle=f"""
    WITH d AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS nbytes
               FROM documents),
    c AS (SELECT doc_id, nbytes,
                 SUM(nbytes) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                   AS cum
          FROM d)
    SELECT doc_id, nbytes,
           CAST(cum - nbytes AS BIGINT) AS byte_offset,
           CAST((cum - nbytes) // {SHARD_CAP_BYTES} AS BIGINT) AS shard
    FROM c
    """,
)
def mm_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard manifest: payloads (document bytes stand
    in for the opaque multimodal blobs) are laid out in doc_id order
    and assigned shard = start_byte // {SHARD_CAP_BYTES} — the
    byte-budgeted sequential-read layout a training loader streams.
    The contract is offset-based (a payload straddling a cap boundary
    belongs to the shard its first byte lands in), which makes the
    assignment a pure prefix sum — no greedy state.

    Scale: the running byte total is the two-phase `bucketed_cumsum`
    (range buckets → parallel partitioned window → broadcast carry) —
    the corpus-sized frame never passes through a global sorted
    window."""
    docs = cat(spark, sf_dir)["documents"]
    d = docs.select("doc_id", F.octet_length("text").cast("long").alias("nbytes"))
    c = bucketed_cumsum(d, "doc_id", {"cum": F.col("nbytes")})
    start = F.col("cum") - F.col("nbytes")
    return c.select(
        "doc_id",
        "nbytes",
        start.cast("bigint").alias("byte_offset"),
        F.expr(f"(cum - nbytes) div {SHARD_CAP_BYTES}").cast("bigint").alias("shard"),
    )
