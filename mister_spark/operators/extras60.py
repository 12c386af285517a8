"""Wave 60: operational analytics + storage forensics — circular
time-of-day statistics, Little's law, moving-window lexical diversity,
and parquet footer auditing.

stat_circular_hour treats hour-of-day as the circle it is (arithmetic
means of 23:00 and 01:00 say noon; the circular mean says midnight);
ev_littles_law cross-checks three independently-measured session
quantities against L = λW — the queueing identity every capacity plan
leans on; tx_mattr is the moving-average type-token ratio (lexical
diversity robust to document length, unlike raw TTR) via the
last-occurrence-gap trick that makes it one linear window instead of a
w-fold blowup; io_parquet_footer_audit reads the actual parquet footers
(row groups, encodings, compression, stats coverage) — the ground truth
behind every scan-pruning claim.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

MATTR_W = 25  # novelty window (tokens)
TWO_PI = 2.0 * math.pi


@query(
    "stat_circular_hour",
    oracle=f"""
    WITH h AS (SELECT event_type,
                      (CAST(hour(ts) AS DOUBLE) + minute(ts) / 60.0)
                        * {TWO_PI!r} / 24.0 AS a
               FROM events),
    s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 AVG(cos(a)) AS c, AVG(sin(a)) AS s
          FROM h GROUP BY 1)
    SELECT event_type, n,
           FLOOR((CASE WHEN atan2(s, c) < 0
                  THEN atan2(s, c) + {TWO_PI!r} ELSE atan2(s, c) END)
                 * 24.0 / {TWO_PI!r} * 10000 + 0.5) / 10000 AS mean_hour,
           FLOOR(sqrt(c * c + s * s) * 10000 + 0.5) / 10000 AS resultant,
           FLOOR(sqrt(-2.0 * ln(GREATEST(sqrt(c * c + s * s), 1e-12)))
                 * 10000 + 0.5) / 10000 AS circ_std
    FROM s
    """,
)
def stat_circular_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular statistics of event time-of-day per event type: map
    hour+minute to an angle, average the unit vectors — mean_hour is
    the circular mean (correct across the midnight wrap), resultant
    length R ∈ [0,1] measures concentration (1 = all at the same
    minute, 0 = uniform over the day), circ_std = √(−2 ln R) is the
    circular standard deviation. The right way to answer "when does
    this event happen".

    Scale: one narrow trig map + one |event_types| rollup."""
    ev = cat(spark, sf_dir)["events"]
    a = (
        (F.hour("ts").cast("double") + F.minute("ts") / 60.0)
        * TWO_PI
        / 24.0
    )
    s = ev.select("event_type", F.cos(a).alias("ca"), F.sin(a).alias("sa")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("ca").alias("c"),
        F.avg("sa").alias("s"),
    )
    c, sn = F.col("c"), F.col("s")
    ang = F.atan2(sn, c)
    ang = F.when(ang < 0, ang + TWO_PI).otherwise(ang)
    r = F.sqrt(c * c + sn * sn)
    return s.select(
        "event_type",
        "n",
        ratio(ang * 24.0 / TWO_PI).alias("mean_hour"),
        ratio(r).alias("resultant"),
        ratio(F.sqrt(-2.0 * F.log(F.greatest(r, F.lit(1e-12))))).alias(
            "circ_std"
        ),
    )


@query(
    "ev_littles_law",
    oracle="""
    WITH s AS (SELECT user_id,
                      MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS t0,
                      MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS t1
               FROM events GROUP BY 1),
    span AS (SELECT MIN(t0) AS lo, MAX(t1) AS hi FROM s),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_sessions,
                 AVG(s.t1 - s.t0) AS w_sec,
                 MAX(sp.hi - sp.lo) AS span_sec,
                 SUM(s.t1 - s.t0) / MAX(sp.hi - sp.lo) AS l_avg
          FROM s CROSS JOIN span sp)
    SELECT CAST(n_sessions AS BIGINT) AS n_sessions,
           FLOOR(n_sessions / span_sec * 3600 * 10000 + 0.5) / 10000
             AS lambda_per_hour,
           FLOOR(w_sec / 3600 * 10000 + 0.5) / 10000 AS w_hours,
           FLOOR(l_avg * 10000 + 0.5) / 10000 AS l_avg,
           FLOOR((n_sessions / span_sec) * w_sec * 10000 + 0.5) / 10000
             AS l_littles,
           FLOOR(l_avg / ((n_sessions / span_sec) * w_sec) * 10000 + 0.5)
             / 10000 AS identity_ratio
    FROM m
    """,
)
def ev_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law audit over user activity spans: treat each user's
    [first, last] event as one 'session in system'; λ = sessions per
    hour over the observation span, W = mean session duration, and
    L_avg = Σ durations / span (time-averaged concurrency, computed
    WITHOUT a sweep line because ∫(count in system) = Σ durations).
    identity_ratio = L_avg / (λW) must be exactly 1 up to rounding —
    the op is the cross-check that three independently derived
    capacity numbers agree.

    Scale: one user rollup + one global row; the integral identity is
    what lets this skip the event-sorted sweep entirely."""
    ev = cat(spark, sf_dir)["events"]
    s = ev.groupBy("user_id").agg(
        F.min(F.unix_timestamp("ts")).alias("t0"),
        F.max(F.unix_timestamp("ts")).alias("t1"),
    )
    m = s.agg(
        F.count(F.lit(1)).cast("double").alias("n_sessions"),
        F.avg(F.col("t1") - F.col("t0")).alias("w_sec"),
        (F.max("t1") - F.min("t0")).cast("double").alias("span_sec"),
        F.sum(F.col("t1") - F.col("t0")).alias("tot_sec"),
    )
    n, wsec = F.col("n_sessions"), F.col("w_sec")
    span, tot = F.col("span_sec"), F.col("tot_sec")
    lam = n / span
    l_avg = tot / span
    return m.select(
        n.cast("bigint").alias("n_sessions"),
        ratio(lam * 3600).alias("lambda_per_hour"),
        ratio(wsec / 3600).alias("w_hours"),
        ratio(l_avg).alias("l_avg"),
        ratio(lam * wsec).alias("l_littles"),
        ratio(l_avg / (lam * wsec)).alias("identity_ratio"),
    )


@query(
    "tx_mattr",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {DUCK_TOKENS} AS toks FROM documents),
    p AS (SELECT doc_id, source, u.i AS pos, toks[u.i] AS term
          FROM t, unnest(generate_series(1, len(toks))) AS u(i)),
    g AS (SELECT doc_id, source, pos,
                 pos - LAG(pos) OVER (PARTITION BY doc_id, term
                                      ORDER BY pos) AS gap
          FROM p),
    d AS (SELECT doc_id, source,
                 CAST(COUNT(*) AS DOUBLE) AS n_tok,
                 SUM(CASE WHEN gap IS NULL OR gap > {MATTR_W}
                     THEN 1.0 ELSE 0.0 END) AS novel
          FROM g GROUP BY 1, 2)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           FLOOR(AVG(novel / n_tok) * 10000 + 0.5) / 10000 AS mattr,
           FLOOR(MIN(novel / n_tok) * 10000 + 0.5) / 10000 AS mattr_min
    FROM d GROUP BY source
    """,
)
def tx_mattr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-window type-token ratio (MATTR, w={w}): a token is
    'novel' if its previous occurrence in the document is more than
    {w} positions back (or absent) — the per-position novelty rate
    equals windowed lexical diversity without materializing w-sized
    windows. Robust to document length where raw TTR is not; low MATTR
    flags loops and boilerplate that corpus-level stats miss.

    Scale: the last-occurrence gap is ONE window partitioned by
    (doc, term) — frames are per-term occurrence lists, tiny — then
    doc and source rollups. No w-fold row blowup."""
    docs = cat(spark, sf_dir)["documents"]
    p = docs.select(
        "doc_id", "source", F.posexplode(tokens()).alias("pos0", "term")
    ).select("doc_id", "source", (F.col("pos0") + 1).alias("pos"), "term")
    wg = W.partitionBy("doc_id", "term").orderBy("pos")
    g = p.withColumn("gap", F.col("pos") - F.lag("pos").over(wg))
    d = g.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("double").alias("n_tok"),
        F.sum(
            F.when(
                F.col("gap").isNull() | (F.col("gap") > MATTR_W), 1.0
            ).otherwise(0.0)
        ).alias("novel"),
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        ratio(F.avg(F.col("novel") / F.col("n_tok"))).alias("mattr"),
        ratio(F.min(F.col("novel") / F.col("n_tok"))).alias("mattr_min"),
    )


tx_mattr.__doc__ = tx_mattr.__doc__.format(w=MATTR_W)


@query("io_parquet_footer_audit")  # pyarrow metadata inspection →
# rows-only; pytest pins the accounting against the actual files.
def io_parquet_footer_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet footer forensics for the lineitem table: per column,
    the row-group count, encodings, compression codec, compressed/raw
    byte totals, and min/max-statistics coverage — read straight from
    the file footers with pyarrow (the same metadata Spark's scan uses
    for predicate pushdown and row-group skipping). This is how you
    VERIFY a layout claim (dictionary encoding applied? stats present
    for the prune column?) instead of trusting the writer.

    Scale: footer reads are O(file count) metadata, never data; on a
    cluster this runs as a parallelized file-listing job (here the
    driver loop over one table's files is the same accounting)."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "lineitem.parquet")
    files = (
        [os.path.join(path, f) for f in sorted(os.listdir(path))
         if f.endswith(".parquet")]
        if os.path.isdir(path)
        else [path]
    )
    acc: dict[str, dict] = {}
    n_groups = 0
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        n_groups += md.num_row_groups
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                a = acc.setdefault(
                    name,
                    {
                        "enc": set(),
                        "codec": set(),
                        "comp": 0,
                        "raw": 0,
                        "stats": 0,
                        "chunks": 0,
                    },
                )
                a["enc"].update(col.encodings)
                a["codec"].add(col.compression)
                a["comp"] += col.total_compressed_size
                a["raw"] += col.total_uncompressed_size
                a["stats"] += int(col.statistics is not None)
                a["chunks"] += 1
    rows = [
        (
            name,
            n_groups,
            ",".join(sorted(a["codec"])),
            ",".join(sorted(a["enc"])),
            int(a["comp"]),
            int(a["raw"]),
            math.floor(a["comp"] / max(a["raw"], 1) * 10000 + 0.5) / 10000,
            math.floor(a["stats"] / max(a["chunks"], 1) * 10000 + 0.5) / 10000,
        )
        for name, a in sorted(acc.items())
    ]
    return spark.createDataFrame(
        rows,
        "column string, row_groups int, codec string, encodings string, "
        "compressed_bytes long, raw_bytes long, compression_ratio double, "
        "stats_coverage double",
    ).orderBy("column")
