"""Wave 118: optimal cutpoint scanning, group-sequential monitoring,
and CSV-function surface.

stat_maxstat_cutpoint scans EVERY candidate threshold of account
balance for the split maximizing the two-sample t statistic — from
cumulative moments, so the whole scan costs one prefix pass — and
reports the max-|t| cutpoint WITH the selection-inflation caveat
quantified (max over candidates vs the single-test critical value);
stat_group_sequential applies O'Brien–Fleming-style boundaries to an
A/A metric monitored at four interim looks — the discipline that
keeps peeking from manufacturing winners; sql_from_csv_roundtrip
pins the from_csv/to_csv expression surface with a lossless
round-trip proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

GS_LOOKS = 4
GS_ZALPHA = 1.959964  # two-sided 5% fixed-horizon critical value
MIN_SIDE = 30  # cutpoint scan: min observations on each side


@query(
    "stat_maxstat_cutpoint",
    oracle=f"""
    WITH d AS (SELECT c_acctbal AS x,
                      CASE WHEN c_mktsegment = 'BUILDING' THEN 1.0
                           ELSE 0.0 END AS y
               FROM customer),
    t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(y) AS sy,
                 SUM(y * y) AS syy
          FROM d),
    g AS (SELECT x, CAST(COUNT(*) AS DOUBLE) AS c, SUM(y) AS s,
                 SUM(y * y) AS ss
          FROM d GROUP BY 1),
    e AS (SELECT x, SUM(c) OVER w AS cn, SUM(s) OVER w AS cs,
                 SUM(ss) OVER w AS css
          FROM g WINDOW w AS (ORDER BY x)),
    cand AS (
      SELECT e.x, e.cn AS nl, t.n - e.cn AS nr,
             e.cs / e.cn AS ml, (t.sy - e.cs) / (t.n - e.cn) AS mr,
             (e.css - e.cs * e.cs / e.cn) AS ssl,
             ((t.syy - e.css) - (t.sy - e.cs) * (t.sy - e.cs)
              / (t.n - e.cn)) AS ssr
      FROM e, t
      WHERE e.cn >= {MIN_SIDE} AND t.n - e.cn >= {MIN_SIDE}),
    scored AS (
      SELECT x, nl, nr,
             ABS(ml - mr)
             / SQRT((ssl + ssr) / (nl + nr - 2) * (1 / nl + 1 / nr))
               AS tstat
      FROM cand),
    best AS (SELECT x, nl, nr, tstat,
                    ROW_NUMBER() OVER (ORDER BY tstat DESC, x) AS rk
             FROM scored)
    SELECT FLOOR(x * 100 + 0.5) / 100 AS cutpoint,
           CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
           FLOOR(tstat * 10000 + 0.5) / 10000 AS max_t,
           CAST((SELECT COUNT(*) FROM scored) AS BIGINT) AS candidates
    FROM best WHERE rk = 1
    """,
)
def stat_maxstat_cutpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximally-selected t statistic: scan every account-balance
    threshold (≥{m} customers per side) for the split that best
    separates BUILDING-segment membership, using cumulative moments
    so the entire scan is ONE prefix pass — no per-candidate jobs.
    Reports the winning cutpoint, its |t|, and the candidate count:
    max-over-candidates inflates the statistic, so max_t must clear a
    Bonferroni-ish bar (≈ the fixed bar plus √(2·ln candidates)), not
    1.96 — the caveat is shipped with the number.

    Scale: the distinct-value frame collapses in one shuffle;
    cumulative (count, sum, sumsq) come from `bucketed_cumsum`
    (two-phase); the argmax is a TakeOrdered-style reduction."""
    d = cat(spark, sf_dir)["customer"].select(
        F.col("c_acctbal").alias("x"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1.0)
        .otherwise(0.0)
        .alias("y"),
    )
    t = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    g = d.groupBy("x").agg(
        F.count(F.lit(1)).cast("double").alias("c"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("ss"),
    )
    e = bucketed_cumsum(
        g, "x", {"cn": F.col("c"), "cs": F.col("s"), "css": F.col("ss")}
    )
    cand = (
        e.crossJoin(F.broadcast(t))
        .filter(
            (F.col("cn") >= MIN_SIDE) & (F.col("n") - F.col("cn") >= MIN_SIDE)
        )
        .select(
            "x",
            F.col("cn").alias("nl"),
            (F.col("n") - F.col("cn")).alias("nr"),
            (F.col("cs") / F.col("cn")).alias("ml"),
            ((F.col("sy") - F.col("cs")) / (F.col("n") - F.col("cn"))).alias(
                "mr"
            ),
            (F.col("css") - F.col("cs") * F.col("cs") / F.col("cn")).alias(
                "ssl"
            ),
            (
                (F.col("syy") - F.col("css"))
                - (F.col("sy") - F.col("cs"))
                * (F.col("sy") - F.col("cs"))
                / (F.col("n") - F.col("cn"))
            ).alias("ssr"),
        )
    )
    tstat = F.abs(F.col("ml") - F.col("mr")) / F.sqrt(
        (F.col("ssl") + F.col("ssr"))
        / (F.col("nl") + F.col("nr") - 2)
        * (1 / F.col("nl") + 1 / F.col("nr"))
    )
    scored = cand.select("x", "nl", "nr", tstat.alias("tstat")).localCheckpoint()
    n_cand = scored.count()
    best = scored.orderBy(F.col("tstat").desc(), "x").limit(1)
    return best.select(
        money(F.col("x")).alias("cutpoint"),
        F.col("nl").cast("bigint").alias("n_left"),
        F.col("nr").cast("bigint").alias("n_right"),
        ratio(F.col("tstat")).alias("max_t"),
        F.lit(n_cand).cast("bigint").alias("candidates"),
    )


stat_maxstat_cutpoint.__doc__ = stat_maxstat_cutpoint.__doc__.format(
    m=MIN_SIDE
)


@query(
    "stat_group_sequential",
    oracle=f"""
    WITH mm AS (SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
                FROM events),
    b AS (SELECT user_id % 2 AS g, value,
                 LEAST(CAST(FLOOR((epoch_us(ts) - mm.mn)
                                  / ((mm.mx - mm.mn + 1) / {GS_LOOKS}.0))
                            AS BIGINT) + 1, {GS_LOOKS}) AS look
          FROM events, mm),
    l AS (SELECT look,
                 SUM(CASE WHEN g = 0 THEN value END) AS sa,
                 SUM(CASE WHEN g = 0 THEN value * value END) AS ssa,
                 CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                   AS na,
                 SUM(CASE WHEN g = 1 THEN value END) AS sb,
                 SUM(CASE WHEN g = 1 THEN value * value END) AS ssb,
                 CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   AS nb
          FROM b GROUP BY 1),
    c AS (SELECT look,
                 SUM(sa) OVER w AS sa, SUM(ssa) OVER w AS ssa,
                 SUM(na) OVER w AS na,
                 SUM(sb) OVER w AS sb, SUM(ssb) OVER w AS ssb,
                 SUM(nb) OVER w AS nb
          FROM l WINDOW w AS (ORDER BY look)),
    z AS (SELECT look, na, nb,
                 (sa / na - sb / nb)
                 / SQRT((ssa / na - (sa / na) * (sa / na)) / na
                        + (ssb / nb - (sb / nb) * (sb / nb)) / nb) AS zstat
          FROM c)
    SELECT CAST(look AS BIGINT) AS look,
           CAST(na + nb AS BIGINT) AS n_cum,
           FLOOR(zstat * 10000 + 0.5) / 10000 AS z,
           FLOOR({GS_ZALPHA} * SQRT({GS_LOOKS}.0 / look) * 10000 + 0.5)
             / 10000 AS obf_boundary,
           CAST(CASE WHEN ABS(zstat) > {GS_ZALPHA} * SQRT({GS_LOOKS}.0 / look)
                THEN 1 ELSE 0 END AS BIGINT) AS crossed
    FROM z
    """,
)
def stat_group_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential A/A monitor with O'Brien–Fleming-style
    boundaries: the event stream is cut into {k} equal interim looks
    (time order), the cumulative mean-difference z between user-parity
    arms is computed at each look, and compared against the
    conservative early boundary z_α·√(K/k) — huge early, ≈ fixed-
    horizon at the final look. On an A/A no boundary should fire
    (asserted); in production this is what makes peeking safe.

    Scale: per-look moments are one shuffle on the look bucket; the
    cumulative rollup is a {k}-row window; the NTILE over the stream
    is the driver's time-order quartiling (bounded by construction —
    at 100 TB looks come from event-time ranges instead)."""
    from pyspark.sql import Window as W

    ev = cat(spark, sf_dir)["events"]
    mm = ev.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    )
    look = F.least(
        (
            (F.unix_micros("ts") - F.col("mn"))
            / ((F.col("mx") - F.col("mn") + 1) / float(GS_LOOKS))
        ).cast("bigint")
        + 1,
        F.lit(GS_LOOKS),
    )
    b = ev.crossJoin(F.broadcast(mm)).select(
        (F.col("user_id") % 2).alias("g"),
        "value",
        look.alias("look"),
    )
    l = b.groupBy("look").agg(
        F.sum(F.when(F.col("g") == 0, F.col("value"))).alias("sa"),
        F.sum(
            F.when(F.col("g") == 0, F.col("value") * F.col("value"))
        ).alias("ssa"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
        .cast("double")
        .alias("na"),
        F.sum(F.when(F.col("g") == 1, F.col("value"))).alias("sb"),
        F.sum(
            F.when(F.col("g") == 1, F.col("value") * F.col("value"))
        ).alias("ssb"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("double")
        .alias("nb"),
    )
    w = W.orderBy("look").rowsBetween(W.unboundedPreceding, 0)
    c = l.select(
        "look",
        F.sum("sa").over(w).alias("sa"),
        F.sum("ssa").over(w).alias("ssa"),
        F.sum("na").over(w).alias("na"),
        F.sum("sb").over(w).alias("sb"),
        F.sum("ssb").over(w).alias("ssb"),
        F.sum("nb").over(w).alias("nb"),
    )
    ma = F.col("sa") / F.col("na")
    mb = F.col("sb") / F.col("nb")
    z = (ma - mb) / F.sqrt(
        (F.col("ssa") / F.col("na") - ma * ma) / F.col("na")
        + (F.col("ssb") / F.col("nb") - mb * mb) / F.col("nb")
    )
    bound = GS_ZALPHA * F.sqrt(F.lit(float(GS_LOOKS)) / F.col("look"))
    return c.select(
        F.col("look").cast("bigint").alias("look"),
        (F.col("na") + F.col("nb")).cast("bigint").alias("n_cum"),
        ratio(z).alias("z"),
        ratio(bound).alias("obf_boundary"),
        (F.abs(z) > bound).cast("bigint").alias("crossed"),
    )


stat_group_sequential.__doc__ = stat_group_sequential.__doc__.format(
    k=GS_LOOKS
)


@query(
    "sql_from_csv_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS total
    FROM orders GROUP BY 1
    """,
)
def sql_from_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV expression surface: serialize each order row to a CSV line
    with to_csv, parse it back with from_csv(schema), and aggregate
    the PARSED columns — the oracle aggregates the originals, so the
    match proves the round-trip lossless (quoting, type re-inference
    and all). The pattern for ingesting embedded-CSV payload columns
    without a custom parser.

    Scale: to_csv/from_csv are JVM expressions in the row pipeline —
    no UDF, no extra pass; the rollup is one shuffle."""
    orders = cat(spark, sf_dir)["orders"]
    csv = orders.select(
        F.to_csv(
            F.struct(
                "o_orderkey", "o_orderpriority", "o_totalprice"
            )
        ).alias("line")
    )
    parsed = csv.select(
        F.from_csv(
            "line",
            "o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE",
        ).alias("r")
    ).select("r.*")
    return parsed.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        money(F.sum("o_totalprice")).alias("total"),
    )
