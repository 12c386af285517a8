"""Wave 5: native session windows, mergeable sketches (HLL rollup,
count-min), blocked edit-distance fuzzy matching, and robust statistics
(median absolute deviation).

The sketch pair is the 100 TB distinct-count / heavy-hitter story:
HLL states and CMS cells merge associatively, so both are computed as
partial-aggregable groupBys whose state can be stored per partition
(day) and rolled up without touching the raw stream again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money
from mister_spark.registry import query

GAP = "30 minutes"
GAP_US = 30 * 60 * 1_000_000


@query(
    "ev_session_window",
    oracle=f"""
    WITH t AS (SELECT user_id, epoch_us(ts) AS tus, value FROM events),
    flagged AS (
      SELECT user_id, tus, value,
             CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id ORDER BY tus)
                       > {GAP_US} OR
                  LAG(tus) OVER (PARTITION BY user_id ORDER BY tus) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM t),
    sess AS (
      SELECT user_id, tus, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id,
           MIN(tus) AS start_us,
           MAX(tus) + {GAP_US} AS end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           FLOOR(SUM(value) * 100 + 0.5) / 100 AS total
    FROM sess GROUP BY user_id, sid
    """,
)
def ev_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE session_window operator — the
    same dynamic-gap windows ev_sessionize builds by hand with
    lag+cumsum, but expressed as a first-class groupBy key (and the
    exact operator the streaming engine uses for session state, so the
    batch and streaming definitions are one API). Verified boundary
    semantics: an event exactly GAP after the previous one MERGES
    (strict `>` break), window start = first event, end = last + GAP.

    Scale: one shuffle on (user_id); session merge happens inside the
    aggregation operator (UpdatingSessionsIterator), never as a
    window-function sort pass, and partial merges are map-side."""
    ev = cat(spark, sf_dir)["events"]
    sw = F.session_window("ts", GAP)
    return (
        ev.groupBy("user_id", sw)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            money(F.sum("value")).alias("total"),
        )
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("start_us"),
            F.unix_micros("session_window.end").alias("end_us"),
            "n_events",
            "total",
        )
    )


def _hll_rollup_oracle() -> str:
    from mister_spark.functions.hll import (
        HLL_R,
        hll_oracle_estimate,
        hll_oracle_registers,
    )

    # daily register tables merged per type: register-max is
    # associative, so MAX over (day, bucket) partials == MAX over the
    # whole stream — the oracle replays the merged level directly and
    # counts the days separately, exactly what the Spark rollup yields.
    reg = hll_oracle_registers(
        "events",
        "date_trunc('day', ts) AS day, event_type",
        "user_id",
        key_names="day, event_type",
    )
    est = hll_oracle_estimate()
    return f"""
    WITH daily AS ({reg}),
    merged AS (SELECT event_type, bucket, MAX(rho) AS rho
               FROM daily GROUP BY 1, 2),
    days AS (SELECT event_type,
                    CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
             FROM daily GROUP BY 1),
    agg AS (SELECT event_type,
                   SUM(CAST(POWER(2, {HLL_R} - rho) AS BIGINT)) AS sp,
                   CAST(COUNT(*) AS BIGINT) AS np
            FROM merged GROUP BY 1)
    SELECT agg.event_type, days.n_days,
           CAST(FLOOR({est}) AS BIGINT) AS approx_users
    FROM agg JOIN days ON days.event_type = agg.event_type
    """


@query("sketch_hll_rollup", oracle=_hll_rollup_oracle())
def sketch_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup: an HLL register table of
    user_id per (day, event_type) partition, then a register-max merge
    across days per type — the pattern that makes "distinct users last
    N days" a sketch-merge instead of a raw-stream rescan. The daily
    register table is what a 100 TB deployment persists; every coarser
    rollup (weekly, monthly, all-time) derives from it by max-merge,
    exactly like ev_rollup_reuse does for sums.

    Built on the PORTABLE md5-60 HLL (functions/hll.py) instead of the
    engine-local Datasketches `hll_sketch_agg`, which upgrades this key
    from rows-only to a full SQL oracle: the daily registers, the
    cross-day max-merge, the integer-grid harmonic sum and the
    linear-counting branch all replay exactly in DuckDB. Pytest keeps
    (a) union-of-partials == one-shot estimate (merge consistency —
    register-max is order/partition invariant) and (b) ≤5% relative
    error vs exact distinct.

    Scale: both levels are partial-aggregable grouped passes; sketch
    state is O(m)=4096 registers per group regardless of cardinality,
    so the shuffle carries kilobytes where ev_sliding_distinct's exact
    explode carries the dedup table."""
    from mister_spark.functions.hll import (
        hll_estimate,
        hll_register_term,
        hll_registers,
    )

    ev = cat(spark, sf_dir)["events"].withColumn(
        "day", F.date_trunc("day", "ts")
    )
    daily = hll_registers(ev, ["day", "event_type"], "user_id")
    daily = daily.localCheckpoint()  # feeds the merge AND the day count
    merged = daily.groupBy("event_type", "bucket").agg(
        F.max("rho").alias("rho")
    )
    days = daily.groupBy("event_type").agg(
        F.countDistinct("day").cast("bigint").alias("n_days")
    )
    agg = merged.groupBy("event_type").agg(
        F.sum(hll_register_term()).alias("sp"),
        F.count(F.lit(1)).alias("np"),
    )
    return agg.join(days, "event_type").select(
        "event_type",
        "n_days",
        F.floor(hll_estimate(F.col("sp"), F.col("np")))
        .cast("bigint")
        .alias("approx_users"),
    )


# Count-min sketch geometry: d independent hash rows × w buckets.
# Hashes are plain modular arithmetic ((u*a + b) % P) % w so the SAME
# sketch is computable in any engine — the oracle is exact, not "close".
CMS_W = 512
CMS_P = 1_000_000_007
CMS_ROWS = [(0, 37, 17), (1, 101, 89), (2, 193, 151), (3, 271, 229)]
_CMS_VALUES = ",".join(f"({i},{a},{b})" for i, a, b in CMS_ROWS)


@query(
    "sketch_cms_topk",
    oracle=f"""
    WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_n
               FROM events GROUP BY 1),
    h AS (SELECT user_id, i, ((user_id * a + b) % {CMS_P}) % {CMS_W} AS bucket
          FROM events, (VALUES {_CMS_VALUES}) AS p(i, a, b)),
    sk AS (SELECT i, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM h GROUP BY 1, 2),
    probe AS (SELECT user_id, i,
                     ((user_id * a + b) % {CMS_P}) % {CMS_W} AS bucket
              FROM u, (VALUES {_CMS_VALUES}) AS p(i, a, b)),
    est AS (SELECT probe.user_id, MIN(sk.cnt) AS est_n
            FROM probe JOIN sk USING (i, bucket) GROUP BY 1)
    SELECT u.user_id, est.est_n, u.true_n
    FROM u JOIN est USING (user_id)
    ORDER BY est.est_n DESC, u.user_id LIMIT 20
    """,
)
def sketch_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters: a d=4 × w=512 CMS of per-user
    event counts, probed for the top-20 users by estimated count, with
    the exact count alongside (est ≥ true always — CMS errs only
    upward). Hash rows are engine-portable modular arithmetic, so the
    DuckDB oracle computes the IDENTICAL sketch and the gate is exact.

    Scale: the sketch is a 2048-cell table built by one partial-agg
    groupBy — constant size however many users exist, and cells merge
    by addition, so per-partition sketches roll up like the HLL table.
    The probe side broadcasts the sketch (KBs) — zero extra shuffle.
    The exact `u` aggregate here exists only to report true_n for the
    gate; a production probe carries candidate keys alone."""
    ev = cat(spark, sf_dir)["events"]
    rows = F.array(
        *[F.struct(F.lit(i).alias("i"), F.lit(a).alias("a"), F.lit(b).alias("b")) for i, a, b in CMS_ROWS]
    )

    def bucket(u, a, b):
        return ((u * a + b) % CMS_P) % CMS_W

    hashed = ev.select("user_id", F.explode(rows).alias("r")).select(
        "user_id",
        F.col("r.i").alias("i"),
        bucket(F.col("user_id"), F.col("r.a"), F.col("r.b")).alias("bucket"),
    )
    sk = hashed.groupBy("i", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    u = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("true_n"))
    probe = u.select("user_id", "true_n", F.explode(rows).alias("r")).select(
        "user_id",
        "true_n",
        F.col("r.i").alias("i"),
        bucket(F.col("user_id"), F.col("r.a"), F.col("r.b")).alias("bucket"),
    )
    est = (
        probe.join(F.broadcast(sk), ["i", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("est_n"), F.first("true_n").alias("true_n"))
    )
    return est.orderBy(F.desc("est_n"), "user_id").limit(20).select(
        "user_id", "est_n", "true_n"
    )


@query(
    "dd_fuzzy_levenshtein",
    oracle="""
    SELECT a.p_brand AS brand,
           a.p_partkey AS partkey_a, b.p_partkey AS partkey_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
     AND abs(len(a.p_name) - len(b.p_name)) <= 3
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def dd_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) record matching: part-name pairs within
    the same brand at Levenshtein distance ≤ 3 — the entity-resolution
    primitive for near-identical catalog/name data, where token-level
    dedup (dd_ngram_jaccard) is too coarse.

    Scale: NEVER a global cross join — pairs are generated inside a
    blocking key (brand), and a length-band predicate (|len(a)-len(b)|
    ≤ 3, implied by the distance bound) prunes candidates BEFORE the
    O(len²) edit-distance evaluates. At 100 TB the blocking key is the
    shuffle key, per-block pair counts bound the quadratic term, and a
    q-gram prefilter (dd_ngram_jaccard's explode-join) is the
    documented pre-candidate stage when blocks grow."""
    part = cat(spark, sf_dir)["part"].select("p_brand", "p_partkey", "p_name")
    a = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("partkey_a"),
        F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("partkey_b"),
        F.col("p_name").alias("name_b"),
    )
    return (
        a.join(b, "brand")
        .filter(
            (F.col("partkey_a") < F.col("partkey_b"))
            & (F.abs(F.length("name_a") - F.length("name_b")) <= 3)
            & (F.levenshtein("name_a", "name_b") <= 3)
        )
        .select(
            "brand",
            "partkey_a",
            "partkey_b",
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("bigint").alias("dist"),
        )
    )


@query(
    "stat_mad",
    oracle="""
    WITH m AS (SELECT o_orderpriority AS priority,
                      median(o_totalprice) AS med_raw,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM orders GROUP BY 1),
    d AS (SELECT m.priority, abs(o.o_totalprice - m.med_raw) AS dev
          FROM orders o JOIN m ON o.o_orderpriority = m.priority),
    md AS (SELECT priority, median(dev) AS mad_raw FROM d GROUP BY 1)
    SELECT m.priority,
           FLOOR(m.med_raw * 100 + 0.5) / 100 AS med,
           FLOOR(md.mad_raw * 100 + 0.5) / 100 AS mad,
           m.n
    FROM m JOIN md ON m.priority = md.priority
    """,
)
def stat_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion: per-priority median and median absolute
    deviation of order totals — the outlier-resistant (median, MAD)
    pair that replaces (mean, stddev) on skewed money data. Both
    engines use the continuous (interpolated) median, so the oracle is
    exact.

    Scale: two grouped exact medians = two sort-based aggregations on
    the SAME key (AQE reuses the partitioning); the 5-row median table
    broadcasts back onto the fact scan. When exact per-group sort is
    too hot, approx_percentile(0.5) drops in with the identical plan
    shape (mergeable t-digest, no sort) — the swap stat_approx_
    percentiles already demonstrates."""
    orders = cat(spark, sf_dir)["orders"]
    m = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.median("o_totalprice").alias("med_raw"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    d = orders.join(
        F.broadcast(m), orders.o_orderpriority == m.priority
    ).select("priority", F.abs(F.col("o_totalprice") - F.col("med_raw")).alias("dev"))
    md = d.groupBy("priority").agg(F.median("dev").alias("mad_raw"))
    return (
        m.join(md, "priority")
        .select(
            "priority",
            money(F.col("med_raw")).alias("med"),
            money(F.col("mad_raw")).alias("mad"),
            "n",
        )
    )
