"""Wave 252: rebuy cadence, categorical dependence, and post-hoc pairs.

ev_rebuy_interval reports each segment's rebuy cadence from every
consecutive order gap (not just the first-to-second gap the wave-251
survival ops model): exact median/p90 pulled from collapsed gap-day
counts — the operational 'how often do they come back' number, where
stat_nelson_aalen gives the censoring-correct hazard view of the same
clock. stat_mutual_info measures the dependence between order priority
and customer market segment in nats — MI and the sqrt-normalized NMI —
with per-cell pointwise MI, the 'is priority assignment segment-blind?'
audit that a chi-square answers only with a yes/no. stat_tukey_hsd is
the post-hoc companion to stat_anova_f: for every PAIR of event types
it forms the Tukey–Kramer studentized-range statistic
|mean_i − mean_j| / sqrt(MSW/2 · (1/n_i + 1/n_j)) from the same one-pass
moments, naming WHICH pairs differ after the omnibus F says some do.

Exactness: gap days and cell counts are integers; MI's p·ln terms and
Tukey's moment algebra divide identical operands in both engines;
outputs round on the 1e-4/1e-6 grids (the stat_anova_f precedent for
double moment sums on event values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

REBUY_QS = {"median_days": 0.5, "p90_days": 0.9}


@query(
    "ev_rebuy_interval",
    # Real oracle: identical collapsed (segment, gap-days) counts; the
    # exact type-1 quantile is the smallest gap whose cumulative count
    # reaches ceil(q*n) — one ordered window per segment on the
    # bounded day table.
    oracle="""
    WITH nxt AS (SELECT o_custkey,
                        date_diff('day', o_orderdate,
                          LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey)) AS gap
                 FROM orders),
    g AS (SELECT c.c_mktsegment AS seg, n.gap
          FROM nxt n JOIN customer c ON c.c_custkey = n.o_custkey
          WHERE n.gap IS NOT NULL),
    cnt AS (SELECT seg, gap, CAST(COUNT(*) AS BIGINT) AS c
            FROM g GROUP BY 1, 2),
    tot AS (SELECT seg, CAST(SUM(c) AS BIGINT) AS n,
                   SUM(gap * c) AS sg
            FROM cnt GROUP BY 1),
    cum AS (SELECT seg, gap, c,
                   SUM(c) OVER (PARTITION BY seg ORDER BY gap
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cc
            FROM cnt)
    SELECT t.seg, t.n AS n_gaps,
           FLOOR(CAST(t.sg AS DOUBLE) / t.n * 10000 + 0.5) / 10000
             AS mean_days,
           CAST(MIN(CASE WHEN cu.cc >= CEIL(0.5 * t.n)
                    THEN cu.gap END) AS BIGINT) AS median_days,
           CAST(MIN(CASE WHEN cu.cc >= CEIL(0.9 * t.n)
                    THEN cu.gap END) AS BIGINT) AS p90_days
    FROM tot t JOIN cum cu ON cu.seg = t.seg
    GROUP BY t.seg, t.n, t.sg
    ORDER BY t.seg
    """,
)
def ev_rebuy_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebuy cadence per market segment from EVERY consecutive order
    gap: exact mean/median/p90 days between a customer's successive
    orders — the replenishment clock that sizes reactivation windows
    ('quiet for > p90 days' is a churn flag with a defensible
    threshold). stat_nelson_aalen models the first rebuy censoring-
    correctly; this reports the steady-state cadence of the customers
    who do return.

    Scale: one per-customer LEAD window (partitioned, parallel) + one
    customer join; quantiles come from cumulative counts on the
    collapsed (segment, gap-day) table — bounded by the calendar span,
    never row-sized."""
    c = cat(spark, sf_dir)
    w_nxt = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = (
        c["orders"]
        .select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumn(
            "gap",
            F.datediff(F.lead("o_orderdate").over(w_nxt), F.col("o_orderdate")),
        )
        .filter(F.col("gap").isNotNull())
        .join(
            c["customer"].select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_mktsegment").alias("seg"),
            ),
            "o_custkey",
        )
    )
    cnt = g.groupBy("seg", "gap").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = cnt.groupBy("seg").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("gap") * F.col("c")).alias("sg"),
    )
    w_cum = (
        W.partitionBy("seg").orderBy("gap").rowsBetween(W.unboundedPreceding, 0)
    )
    cum = cnt.withColumn("cc", F.sum("c").over(w_cum))
    picks = [
        F.min(
            F.when(
                F.col("cc") >= F.ceil(F.lit(q) * F.col("n")), F.col("gap")
            )
        )
        .cast("bigint")
        .alias(name)
        for name, q in REBUY_QS.items()
    ]
    return (
        cum.join(F.broadcast(tot), "seg")
        .groupBy("seg", "n", "sg")
        .agg(*picks)
        .select(
            "seg",
            F.col("n").alias("n_gaps"),
            rnd(F.col("sg").cast("double") / F.col("n"), 4).alias(
                "mean_days"
            ),
            "median_days",
            "p90_days",
        )
        .orderBy("seg")
    )


@query(
    "stat_mutual_info",
    # Real oracle: identical integer contingency table; every MI term
    # divides exact counts inside one LN per cell; marginal entropies
    # the same way. NMI = MI / sqrt(Hr * Hc).
    oracle="""
    WITH cell AS (SELECT o.o_orderpriority AS prio,
                         c.c_mktsegment AS seg,
                         CAST(COUNT(*) AS BIGINT) AS nij
                  FROM orders o JOIN customer c
                    ON c.c_custkey = o.o_custkey
                  GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(nij) AS BIGINT) AS n FROM cell),
    rowm AS (SELECT prio, CAST(SUM(nij) AS BIGINT) AS ni FROM cell GROUP BY 1),
    colm AS (SELECT seg, CAST(SUM(nij) AS BIGINT) AS nj FROM cell GROUP BY 1),
    terms AS (SELECT cell.prio, cell.seg, cell.nij, rowm.ni, colm.nj, tot.n,
                     LN(CAST(cell.nij AS DOUBLE) * tot.n
                        / (CAST(rowm.ni AS DOUBLE) * colm.nj)) AS pmi
              FROM cell JOIN rowm ON rowm.prio = cell.prio
                        JOIN colm ON colm.seg = cell.seg
                        CROSS JOIN tot),
    mi AS (SELECT SUM(CAST(nij AS DOUBLE) / n * pmi) AS mi FROM terms),
    hr AS (SELECT -SUM(CAST(ni AS DOUBLE) / tot.n
                       * LN(CAST(ni AS DOUBLE) / tot.n)) AS h
           FROM rowm CROSS JOIN tot),
    hc AS (SELECT -SUM(CAST(nj AS DOUBLE) / tot.n
                       * LN(CAST(nj AS DOUBLE) / tot.n)) AS h
           FROM colm CROSS JOIN tot)
    SELECT t.prio, t.seg, t.nij,
           FLOOR(t.pmi * 1000000 + 0.5) / 1000000 AS pmi,
           FLOOR(mi.mi * 1000000 + 0.5) / 1000000 AS mi_nats,
           FLOOR(mi.mi / SQRT(hr.h * hc.h) * 1000000 + 0.5) / 1000000
             AS nmi
    FROM terms t CROSS JOIN mi CROSS JOIN hr CROSS JOIN hc
    ORDER BY t.prio, t.seg
    """,
)
def stat_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between order priority and customer market
    segment: per-cell pointwise MI (which (priority, segment) pairs
    co-occur above/below independence) plus the corpus MI in nats and
    the sqrt-normalized NMI every row carries — the effect-SIZE answer
    to 'is priority assignment segment-blind?' where a chi-square only
    answers significance. Near-zero NMI here is the healthy state; a
    spike says one segment is buying its way up the queue.

    Scale: one fact join + 25-cell contingency rollup (map-
    combinable); marginals, MI, and NMI are broadcast joins of
    model-sized frames."""
    c = cat(spark, sf_dir)
    cell = (
        c["orders"]
        .select("o_custkey", "o_orderpriority")
        .join(
            c["customer"].select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_mktsegment").alias("seg"),
            ),
            "o_custkey",
        )
        .groupBy(F.col("o_orderpriority").alias("prio"), "seg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nij"))
        .localCheckpoint()  # feeds marginals, totals, and the terms
    )
    tot = cell.agg(F.sum("nij").cast("bigint").alias("n"))
    rowm = cell.groupBy("prio").agg(F.sum("nij").cast("bigint").alias("ni"))
    colm = cell.groupBy("seg").agg(F.sum("nij").cast("bigint").alias("nj"))
    terms = (
        cell.join(F.broadcast(rowm), "prio")
        .join(F.broadcast(colm), "seg")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "pmi",
            F.log(
                F.col("nij").cast("double")
                * F.col("n")
                / (F.col("ni").cast("double") * F.col("nj"))
            ),
        )
        .localCheckpoint()
    )
    mi = terms.agg(
        F.sum(F.col("nij").cast("double") / F.col("n") * F.col("pmi")).alias(
            "mi"
        )
    )
    hr = rowm.crossJoin(F.broadcast(tot)).agg(
        (-F.sum(
            F.col("ni").cast("double")
            / F.col("n")
            * F.log(F.col("ni").cast("double") / F.col("n"))
        )).alias("hr")
    )
    hc = colm.crossJoin(F.broadcast(tot)).agg(
        (-F.sum(
            F.col("nj").cast("double")
            / F.col("n")
            * F.log(F.col("nj").cast("double") / F.col("n"))
        )).alias("hc")
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return (
        terms.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hr))
        .crossJoin(F.broadcast(hc))
        .select(
            "prio",
            "seg",
            "nij",
            r6(F.col("pmi")).alias("pmi"),
            r6(F.col("mi")).alias("mi_nats"),
            r6(F.col("mi") / F.sqrt(F.col("hr") * F.col("hc"))).alias("nmi"),
        )
        .orderBy("prio", "seg")
    )


@query(
    "stat_tukey_hsd",
    # Real oracle: the same one-pass per-group moments stat_anova_f
    # uses, expanded to all ordered pairs with the Tukey-Kramer
    # standard error; q statistics divide identical operands.
    oracle="""
    WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                      SUM(value) AS s, SUM(value * value) AS s2
               FROM events GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   SUM(s2) - SUM(s * s / n) AS ssw
            FROM g),
    pairs AS (SELECT a.event_type AS g1, b.event_type AS g2,
                     a.s / a.n - b.s / b.n AS diff,
                     a.n AS n1, b.n AS n2
              FROM g a JOIN g b ON a.event_type < b.event_type)
    SELECT p.g1, p.g2,
           FLOOR(p.diff * 10000 + 0.5) / 10000 AS mean_diff,
           FLOOR(SQRT(t.ssw / (t.nt - t.k) / 2
                      * (1.0 / p.n1 + 1.0 / p.n2))
                 * 1000000 + 0.5) / 1000000 AS se,
           FLOOR(ABS(p.diff) / SQRT(t.ssw / (t.nt - t.k) / 2
                                    * (1.0 / p.n1 + 1.0 / p.n2))
                 * 10000 + 0.5) / 10000 AS q_stat,
           CAST(t.nt - t.k AS BIGINT) AS df_within
    FROM pairs p CROSS JOIN tot t
    ORDER BY p.g1, p.g2
    """,
)
def stat_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey–Kramer honest-significant-difference panel over the five
    event types' values — the post-hoc companion to stat_anova_f: for
    every pair, q = |mean_i − mean_j| / sqrt(MSW/2·(1/n_i + 1/n_j))
    names WHICH pairs differ after the omnibus F says some do, with
    the pooled within-group variance keeping the family honest (10
    pairwise t-tests would inflate the false-positive rate the HSD
    correction exists to cap).

    Scale: the identical one-pass per-group (n, Σx, Σx²) moments —
    one 5-key partial-agg shuffle; the pair panel is a 5x5 broadcast
    self-join of the moment frame."""
    ev = cat(spark, sf_dir)["events"]
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
    ).localCheckpoint()
    tot = g.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        (F.sum("s2") - F.sum(F.col("s") * F.col("s") / F.col("n"))).alias(
            "ssw"
        ),
    )
    a = g.select(
        F.col("event_type").alias("g1"),
        (F.col("s") / F.col("n")).alias("m1"),
        F.col("n").alias("n1"),
    )
    b = g.select(
        F.col("event_type").alias("g2"),
        (F.col("s") / F.col("n")).alias("m2"),
        F.col("n").alias("n2"),
    )
    pairs = a.join(F.broadcast(b), F.col("g1") < F.col("g2"))
    se = F.sqrt(
        F.col("ssw")
        / (F.col("nt") - F.col("k"))
        / 2
        * (1.0 / F.col("n1") + 1.0 / F.col("n2"))
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            "g1",
            "g2",
            rnd(F.col("m1") - F.col("m2"), 4).alias("mean_diff"),
            r6(se).alias("se"),
            rnd(F.abs(F.col("m1") - F.col("m2")) / se, 4).alias("q_stat"),
            (F.col("nt") - F.col("k")).cast("bigint").alias("df_within"),
        )
        .orderBy("g1", "g2")
    )
