"""Wave 15: JSON/ORC ingest queries, daily peak detection, lagged
cross-correlation, Cohen's d effect size, funnel time-to-convert, and
deterministic minority oversampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query

XCORR_LAGS = (-2, -1, 0, 1, 2)


@query(
    "io_json_query",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(AVG(o_totalprice) * 10000 + 0.5) / 10000 AS avg_price
    FROM orders GROUP BY 1
    """,
)
def io_json_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over a JSONL staging of orders: explicit schema
    (no sampling-based inference — at 100 TB schema inference is a full
    extra scan), ISO timestamp parsing. Oracle on the typed parquet
    original proves the JSON round-trip lossless.

    Scale: JSONL splits by line like CSV but parses ~2-4× slower —
    same 'land once, convert to parquet' advice; this query keeps the
    ingest path itself correct."""
    from mister_spark.sources.staged import stage_json_orders

    path = stage_json_orders(spark, sf_dir)
    o = spark.read.json(
        path,
        schema=(
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
        ),
    )
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), ratio(F.avg("o_totalprice")).alias("avg_price")
    )


@query(
    "io_orc_query",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
             AS revenue
    FROM lineitem GROUP BY 1
    """,
)
def io_orc_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-to-columnar interchange: lineitem staged as ORC and
    queried back. ORC keeps parquet's pruning/pushdown class of
    behavior (stripe stats, column projection) — parity here pins the
    second columnar format end-to-end, not just its writer surface.

    Scale: identical plan shape to the parquet query; format choice is
    a storage-layer decision, not a query rewrite."""
    from mister_spark.sources.staged import stage_orc_lineitem

    path = stage_orc_lineitem(spark, sf_dir)
    li = spark.read.orc(path)
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        ),
    )


@query(
    "ev_peak_detection",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    lagged AS (
      SELECT event_type, day, n,
             LAG(n) OVER (PARTITION BY event_type ORDER BY day) AS prev,
             LEAD(n) OVER (PARTITION BY event_type ORDER BY day) AS next
      FROM daily)
    SELECT event_type, CAST(day AS BIGINT) AS day, n
    FROM lagged
    WHERE prev IS NOT NULL AND next IS NOT NULL AND n > prev AND n > next
    """,
)
def ev_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum days per event type: strictly above both calendar
    neighbors (series endpoints excluded — a boundary day has only one
    neighbor and 'peak' is undefined there). The spike-list that feeds
    incident review and campaign attribution.

    Scale: ONE exchange — repartition(type), rollup via subset rule,
    lag and lead share the same window sort."""
    ev = cat(spark, sf_dir)["events"]
    daily = (
        ev.repartition("event_type")
        .groupBy("event_type", F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("event_type").orderBy("day")
    lagged = daily.withColumn("prev", F.lag("n").over(w)).withColumn(
        "next", F.lead("n").over(w)
    )
    return (
        lagged.filter(
            F.col("prev").isNotNull()
            & F.col("next").isNotNull()
            & (F.col("n") > F.col("prev"))
            & (F.col("n") > F.col("next"))
        )
        .select("event_type", F.col("day").cast("long").alias("day"), "n")
    )


@query(
    "ev_cross_correlation",
    oracle="""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY 1),
    lags AS (SELECT unnest([-2, -1, 0, 1, 2]) AS lag),
    pairs AS (
      SELECT l.lag, a.x, b.y
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily b ON b.day = a.day + l.lag),
    s AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sx2, SUM(y * y) AS sy2
      FROM pairs GROUP BY 1)
    SELECT CAST(lag AS BIGINT) AS lag, n,
           FLOOR((n * sxy - sx * sy)
                 / (SQRT(CAST(n * sx2 - sx * sx AS DOUBLE))
                    * SQRT(CAST(n * sy2 - sy * sy AS DOUBLE)))
                 * 10000 + 0.5) / 10000 AS xcorr
    FROM s
    """,
)
def ev_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between daily purchase and error
    volumes (lags −2..+2): does error load lead or trail buying?
    Counts are integers so every Pearson sum is exact; one rounded
    division per lag at the end.

    Scale: one day-rollup of the fact stream; the lag alignment is a
    self-join of the tiny daily frame (≤ #days rows) replicated per
    lag — broadcast-sized no matter the corpus."""
    ev = cat(spark, sf_dir)["events"]
    daily = ev.groupBy(F.expr("unix_micros(ts) div 86400000000").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    lags = spark.createDataFrame([(l,) for l in XCORR_LAGS], "lag long")
    a = daily.select("day", "x")
    b = daily.select(F.col("day").alias("bday"), "y")
    pairs = (
        a.join(F.broadcast(lags))
        .join(b, F.col("bday") == F.col("day") + F.col("lag"))
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
        F.sum(F.col("y") * F.col("y")).alias("sy2"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = n * F.col("sxy") - sx * sy
    den = F.sqrt((n * F.col("sx2") - sx * sx).cast("double")) * F.sqrt(
        (n * F.col("sy2") - sy * sy).cast("double")
    )
    return s.select("lag", "n", rnd(num / den, 4).alias("xcorr"))


@query(
    "stat_cohens_d",
    oracle="""
    WITH g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             AVG(value) AS m, SUM(value * value) AS s2, SUM(value) AS s
      FROM events WHERE event_type IN ('purchase', 'error') GROUP BY 1),
    w AS (
      SELECT MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
             MAX(CASE WHEN event_type = 'purchase' THEN m END) AS m1,
             MAX(CASE WHEN event_type = 'purchase' THEN s2 - s * s / n END) AS ss1,
             MAX(CASE WHEN event_type = 'error' THEN n END) AS n2,
             MAX(CASE WHEN event_type = 'error' THEN m END) AS m2,
             MAX(CASE WHEN event_type = 'error' THEN s2 - s * s / n END) AS ss2
      FROM g)
    SELECT n1, n2,
           FLOOR((m1 - m2) / SQRT((ss1 + ss2) / (n1 + n2 - 2))
                 * 10000 + 0.5) / 10000 AS cohens_d
    FROM w
    """,
)
def stat_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d effect size between purchase and error values: mean
    difference over the pooled standard deviation, from one-pass raw
    sums (sum-of-squares centered algebraically, no second scan). The
    magnitude companion to stat_welch_ttest's significance.

    Scale: single partial-agg shuffle on a 2-key filter; the pivot to
    one row is a scalar fold."""
    ev = cat(spark, sf_dir)["events"].filter(
        F.col("event_type").isin("purchase", "error")
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("m"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
        F.sum("value").alias("s"),
    )
    ss = F.col("s2") - F.col("s") * F.col("s") / F.col("n")
    w = g.agg(
        F.max(F.when(F.col("event_type") == "purchase", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("m"))).alias("m1"),
        F.max(F.when(F.col("event_type") == "purchase", ss)).alias("ss1"),
        F.max(F.when(F.col("event_type") == "error", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("event_type") == "error", F.col("m"))).alias("m2"),
        F.max(F.when(F.col("event_type") == "error", ss)).alias("ss2"),
    )
    d = (F.col("m1") - F.col("m2")) / F.sqrt(
        (F.col("ss1") + F.col("ss2")) / (F.col("n1") + F.col("n2") - 2)
    )
    return w.select("n1", "n2", rnd(d, 4).alias("cohens_d"))


@query(
    "ev_funnel_ttc",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(epoch_us(ts)) AS s_us
      FROM events WHERE event_type = 'signup' GROUP BY 1),
    p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.s_us
      GROUP BY 1),
    lat AS (
      SELECT p.user_id, (p.p_us - s.s_us) / 1000000.0 AS ttc_s
      FROM p JOIN s ON p.user_id = s.user_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           FLOOR(quantile_cont(ttc_s, 0.5) * 100 + 0.5) / 100 AS median_s,
           FLOOR(quantile_cont(ttc_s, 0.9) * 100 + 0.5) / 100 AS p90_s
    FROM lat
    """,
)
def ev_funnel_ttc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel time-to-convert: for users whose first purchase follows
    their first signup, the median and p90 signup→purchase latency —
    the metric ev_funnel's step counts don't expose. Latencies are
    exact integer microseconds until the final percentile.

    Scale: two user-keyed min-aggregates over the same partitioning and
    one user-keyed join; the percentile runs over the converted-user
    frame (percentile_approx at 100 TB)."""
    from mister_spark.operators.events import _ev

    ev = _ev(spark, sf_dir).repartition("user_id")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("tus").alias("s_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("tus") >= F.col("s_us"))
        .groupBy("user_id")
        .agg(F.min("tus").alias("p_us"), F.first("s_us").alias("s_us"))
    )
    lat = p.select(((F.col("p_us") - F.col("s_us")) / 1_000_000.0).alias("ttc_s"))
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        money(F.expr("percentile(ttc_s, 0.5)")).alias("median_s"),
        money(F.expr("percentile(ttc_s, 0.9)")).alias("p90_s"),
    )


@query(
    "ds_oversample",
    oracle="""
    WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1),
    mx AS (SELECT MAX(n) AS mx FROM c),
    f AS (SELECT c.lang, CAST(CEIL(CAST(mx.mx AS DOUBLE) / c.n) AS BIGINT) AS reps
          FROM c, mx)
    SELECT d.doc_id, d.lang,
           unnest(generate_series(1, f.reps)) AS copy_idx
    FROM documents d JOIN f ON d.lang = f.lang
    """,
)
def ds_oversample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minority-class oversampling manifest: each language replicated
    ceil(max_count / count) times toward parity — deterministic
    replication (every doc of a lang gets the same integer factor), the
    reproducible alternative to random resampling for class-balance
    training runs.

    Scale: the per-lang factor table is |langs| rows, broadcast; the
    explode multiplies rows by the factor — output-proportional work
    with no shuffle of the document payload (manifest carries ids)."""
    docs = cat(spark, sf_dir)["documents"]
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    mx = c.agg(F.max("n").alias("mx"))
    f = c.join(F.broadcast(mx)).select(
        "lang",
        F.ceil(F.col("mx").cast("double") / F.col("n")).cast("long").alias("reps"),
    )
    return (
        docs.select("doc_id", "lang")
        .join(F.broadcast(f), "lang")
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.col("reps"))).alias("copy_idx"),
        )
    )
