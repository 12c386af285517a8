"""Wave 78: nonparametric trend testing, Markov attribution, and safe
casting.

stat_mann_kendall is the distribution-free trend test (with Sen's
slope as the effect size) hydrology and monitoring run instead of
OLS-on-time; ev_markov_attribution computes channel credit by REMOVAL
EFFECT on an absorbing conversion chain — the data-driven attribution
that last-touch and Shapley-on-coalitions both approximate from
different angles; sql_try_cast pins the try_cast/try_divide safe-math
surface (dirty input yields NULLs and an accounting, not a dead job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

ATTR_CONV = "purchase"
ATTR_ITERS = 40  # geometric-series absorption solve (driver)


@query(
    "stat_mann_kendall",
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS t,
                      CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    p AS (SELECT a.t AS t1, b.t AS t2,
                 CASE WHEN b.y > a.y THEN 1
                      WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn,
                 (b.y - a.y) / (b.t - a.t) AS slope
          FROM d a JOIN d b ON b.t > a.t),
    s AS (SELECT CAST(SUM(sgn) AS DOUBLE) AS s,
                 CAST(COUNT(*) AS DOUBLE) AS n_pairs
          FROM p),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM d),
    sen AS (SELECT slope, ROW_NUMBER() OVER (ORDER BY slope, t1, t2) AS rn,
                   COUNT(*) OVER () AS m
            FROM p),
    med AS (SELECT AVG(slope) AS sen_slope FROM sen
            WHERE rn IN ((m + 1) // 2, (m + 2) // 2)),
    z AS (SELECT s.s, n.n,
                 CASE WHEN s.s > 0
                      THEN (s.s - 1) / sqrt(n.n * (n.n - 1) * (2 * n.n + 5)
                                            / 18.0)
                      WHEN s.s < 0
                      THEN (s.s + 1) / sqrt(n.n * (n.n - 1) * (2 * n.n + 5)
                                            / 18.0)
                      ELSE 0 END AS zstat
          FROM s CROSS JOIN n)
    SELECT CAST(z.n AS BIGINT) AS n_days,
           CAST(z.s AS BIGINT) AS s_stat,
           FLOOR(z.zstat * 10000 + 0.5) / 10000 AS z,
           FLOOR(2 * {normal_sf_sql("ABS(z.zstat)")} * 10000 + 0.5) / 10000
             AS p_value,
           FLOOR(med.sen_slope * 10000 + 0.5) / 10000 AS sen_slope
    FROM z CROSS JOIN med
    """,
)
def stat_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test + Sen's slope on daily event volume:
    S = Σ sign(y_j − y_i) over all day pairs, the variance-normalized
    z (continuity-corrected), and the median pairwise slope as the
    robust effect size — the monitoring-grade trend read that needs no
    normality or linearity assumption.

    Scale: the pair join is O(days²) on the CALENDAR-bounded grid
    (30 days → 435 pairs; even a decade is ~6.6M pairs — trivial);
    the row data never self-joins."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias("t")
    ).agg(F.count(F.lit(1)).cast("double").alias("y")).localCheckpoint()
    a = d.select(F.col("t").alias("t1"), F.col("y").alias("y1"))
    b = d.select(F.col("t").alias("t2"), F.col("y").alias("y2"))
    p = a.join(b, F.col("t2") > F.col("t1")).select(
        "t1",
        "t2",
        F.signum(F.col("y2") - F.col("y1")).alias("sgn"),
        ((F.col("y2") - F.col("y1")) / (F.col("t2") - F.col("t1"))).alias(
            "slope"
        ),
    ).localCheckpoint()
    s = p.agg(F.sum("sgn").alias("s"))
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n"))
    from pyspark.sql import Window as W

    sen = p.select(
        "slope",
        F.row_number().over(W.orderBy("slope", "t1", "t2")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("m"),
    )
    med = sen.filter(
        (F.col("rn") == F.floor((F.col("m") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("m") + 2) / 2))
    ).agg(F.avg("slope").alias("sen_slope"))
    sv = F.col("s")
    nn = F.col("n")
    var = nn * (nn - 1) * (2 * nn + 5) / 18.0
    zstat = (
        F.when(sv > 0, (sv - 1) / F.sqrt(var))
        .when(sv < 0, (sv + 1) / F.sqrt(var))
        .otherwise(0.0)
    )
    return (
        s.join(F.broadcast(n))
        .join(F.broadcast(med))
        .select(
            nn.cast("bigint").alias("n_days"),
            sv.cast("bigint").alias("s_stat"),
            ratio(zstat).alias("z"),
            ratio(2 * normal_sf(F.abs(zstat))).alias("p_value"),
            ratio(F.col("sen_slope")).alias("sen_slope"),
        )
    )


@query(
    "ev_markov_attribution",
    # Real oracle: every removal scenario (plus the baseline) iterates
    # in ONE recursive CTE — working rows are (scenario, state, mass),
    # the transition matrix is row-normalized once (the absorbing and
    # removed rows simply have no outgoing rows), and the absorbed
    # probability is the sum of conversion-state mass across all
    # iterations including step 0, exactly the Python accumulation.
    oracle=f"""
    WITH RECURSIVE seq AS (
      SELECT user_id, event_type AS s,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events),
    trn AS (SELECT s, nxt, CAST(COUNT(*) AS DOUBLE) AS c
            FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
    sts AS (SELECT DISTINCT s FROM (
              SELECT s FROM trn UNION ALL SELECT nxt FROM trn) u),
    firsts AS (SELECT s, CAST(COUNT(*) AS DOUBLE) AS c
               FROM seq WHERE rn = 1 GROUP BY 1),
    ftot AS (SELECT SUM(c) AS t FROM firsts),
    startd AS (SELECT st.s, COALESCE(f.c, 0.0) / ft.t AS x
               FROM sts st LEFT JOIN firsts f USING (s) CROSS JOIN ftot ft),
    rsum AS (SELECT s, SUM(c) AS tot FROM trn GROUP BY 1),
    pm AS (SELECT t.s, t.nxt, t.c / r.tot AS p
           FROM trn t JOIN rsum r USING (s)
           WHERE t.s <> '{ATTR_CONV}'),
    scen AS (SELECT s AS rem FROM sts WHERE s <> '{ATTR_CONV}'
             UNION ALL SELECT '__base__'),
    mk AS (
      SELECT 0 AS it, sc.rem, sd.s,
             CASE WHEN sd.s = sc.rem THEN 0.0 ELSE sd.x END AS x
      FROM startd sd CROSS JOIN scen sc
      UNION ALL
      SELECT m.it + 1, m.rem, p.nxt, SUM(m.x * p.p)
      FROM mk m JOIN pm p ON p.s = m.s AND p.s <> m.rem
      WHERE m.it < {ATTR_ITERS}
      GROUP BY m.it, m.rem, p.nxt
    ),
    ab AS (SELECT rem,
                  COALESCE(SUM(CASE WHEN s = '{ATTR_CONV}' THEN x END), 0.0)
                    AS absorbed
           FROM mk GROUP BY rem),
    eff AS (SELECT a.rem AS channel,
                   GREATEST(b.absorbed - a.absorbed, 0.0) AS e,
                   b.absorbed AS base
            FROM ab a CROSS JOIN (SELECT absorbed FROM ab
                                  WHERE rem = '__base__') b
            WHERE a.rem <> '__base__'),
    tt AS (SELECT CASE WHEN SUM(e) = 0 THEN 1.0 ELSE SUM(e) END AS tot
           FROM eff)
    SELECT channel,
           FLOOR(e * 10000 + 0.5) / 10000 AS removal_effect,
           FLOOR(e / tt.tot * 10000 + 0.5) / 10000 AS credit_share,
           FLOOR(base * 10000 + 0.5) / 10000 AS base_conversion
    FROM eff CROSS JOIN tt
    """,
)
def ev_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution: estimate the event-type
    transition chain with '{c}' absorbing (plus a START state feeding
    each user's first event), compute the baseline absorption
    probability from START, then REMOVE each channel (its row redirects
    to a null sink) and measure the drop — credit ∝ removal effect.
    The data-driven attribution model that answers 'what if this
    channel vanished', which heuristic rules cannot.

    Scale: transition counts are one (state, next) shuffle; each
    removal solve is an O(k³) driver computation on the ≤6×6 matrix
    (ml_absorbing_markov's fundamental-matrix machinery)."""
    import math

    import numpy as np

    from pyspark.sql import Window as W

    ev = cat(spark, sf_dir)["events"]
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "ts", "event_id", F.col("event_type").alias("s")
    ).withColumn("rn", F.row_number().over(wu))
    first = seq.filter(F.col("rn") == 1).groupBy("s").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    ).collect()
    tr = (
        seq.withColumn("nxt", F.lead("s").over(wu))
        .filter(F.col("nxt").isNotNull())
        .groupBy("s", "nxt")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .collect()
    )
    states = sorted({r["s"] for r in tr} | {r["nxt"] for r in tr})
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    C = np.zeros((k, k))
    for r in tr:
        C[idx[r["s"]], idx[r["nxt"]]] = r["c"]
    start = np.zeros(k)
    for r in first:
        start[idx[r["s"]]] = r["c"]
    start = start / start.sum()
    ai = idx[ATTR_CONV]

    def absorb_prob(removed: str | None) -> float:
        P = C.copy()
        if removed is not None:
            P[idx[removed], :] = 0.0  # removed channel leads nowhere
        row = P.sum(axis=1, keepdims=True)
        P = np.divide(P, row, out=np.zeros_like(P), where=row > 0)
        P[ai, :] = 0.0
        # iterate absorption mass from the start distribution
        x = start.copy()
        if removed is not None:
            x[idx[removed]] = 0.0
        absorbed = x[ai]
        x[ai] = 0.0
        for _ in range(ATTR_ITERS):
            x = x @ P
            absorbed += x[ai]
            x[ai] = 0.0
        return float(absorbed)

    base = absorb_prob(None)
    chans = [s for s in states if s != ATTR_CONV]
    effects = {c: max(base - absorb_prob(c), 0.0) for c in chans}
    tot = sum(effects.values()) or 1.0
    rows = [
        (
            c,
            math.floor(effects[c] * 10000 + 0.5) / 10000,
            math.floor(effects[c] / tot * 10000 + 0.5) / 10000,
            math.floor(base * 10000 + 0.5) / 10000,
        )
        for c in sorted(chans)
    ]
    return spark.createDataFrame(
        rows,
        "channel string, removal_effect double, credit_share double, "
        "base_conversion double",
    ).orderBy("channel")


ev_markov_attribution.__doc__ = ev_markov_attribution.__doc__.format(
    c=ATTR_CONV
)


@query(
    "sql_try_cast",
    oracle="""
    WITH raw AS (SELECT o_orderkey,
                        CASE WHEN o_orderkey % 7 = 0 THEN 'N/A'
                             ELSE CAST(o_totalprice AS VARCHAR) END AS amt
                 FROM orders),
    c AS (SELECT o_orderkey, TRY_CAST(amt AS DOUBLE) AS v FROM raw)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unparseable,
           FLOOR(SUM(COALESCE(v, 0)) * 100 + 0.5) / 100 AS parsed_total
    FROM c
    """,
)
def sql_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe casting surface: a dirty string column (every 7th value is
    'N/A') flows through try_cast — unparseable rows become NULLs that
    are COUNTED, the job never dies, and the total sums what parsed.
    Under ANSI mode (this session's default, as in production Spark 4)
    a plain CAST would kill the query; try_cast is the sanctioned
    escape hatch, and this op pins its semantics.

    Scale: pure narrow expressions."""
    orders = cat(spark, sf_dir)["orders"]
    raw = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("N/A"))
        .otherwise(F.col("o_totalprice").cast("string"))
        .alias("amt"),
    )
    c = raw.select(F.expr("try_cast(amt AS double)").alias("v"))
    from mister_spark.operators.common import money

    return c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("v").isNull().cast("int")).cast("bigint").alias(
            "n_unparseable"
        ),
        money(F.sum(F.coalesce("v", F.lit(0.0)))).alias("parsed_total"),
    )
