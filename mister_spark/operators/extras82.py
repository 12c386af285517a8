"""Wave 82: statistical process control, secure-aggregation structure,
and post-hoc comparisons.

stat_control_chart is the Shewhart chart (center line, 3σ control
limits, out-of-control flags) that separates special-cause from
common-cause variation before anyone 'fixes' noise;
ds_masked_aggregation demonstrates the secure-aggregation identity —
pairwise masks that cancel in the sum, so no partition's contribution
is readable but the total is exact (the crypto-free skeleton of
federated analytics); stat_pairwise_posthoc runs all pairwise Welch
comparisons after an omnibus test WITH Benjamini–Hochberg correction —
the step people skip right before shipping a false discovery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

SPC_SIGMA = 3.0
MASK_SEED = 524287


@query(
    "stat_control_chart",
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS t,
                      AVG(value) AS xbar, CAST(COUNT(*) AS DOUBLE) AS n
               FROM events GROUP BY 1),
    g AS (SELECT AVG(xbar) AS cl,
                 sqrt((SUM(xbar * xbar) - SUM(xbar) * SUM(xbar) / COUNT(*))
                      / (COUNT(*) - 1)) AS sd
          FROM d)
    SELECT CAST(d.t AS BIGINT) AS t,
           FLOOR(d.xbar * 10000 + 0.5) / 10000 AS xbar,
           FLOOR(g.cl * 10000 + 0.5) / 10000 AS center,
           FLOOR((g.cl - {SPC_SIGMA} * g.sd) * 10000 + 0.5) / 10000 AS lcl,
           FLOOR((g.cl + {SPC_SIGMA} * g.sd) * 10000 + 0.5) / 10000 AS ucl,
           CAST(CASE WHEN d.xbar > g.cl + {SPC_SIGMA} * g.sd
                       OR d.xbar < g.cl - {SPC_SIGMA} * g.sd
                THEN 1 ELSE 0 END AS BIGINT) AS out_of_control
    FROM d CROSS JOIN g
    """,
)
def stat_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart X̄ control chart on daily mean event value: center
    line, ±{s}σ control limits from the between-day dispersion, and
    the out-of-control flag per day — the SPC discipline that stops
    teams from chasing common-cause noise (and catches special causes
    the day they happen).

    Scale: one day rollup + one 1-row limits broadcast."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias("t")
    ).agg(
        F.avg("value").alias("xbar"),
        F.count(F.lit(1)).cast("double").alias("n"),
    ).localCheckpoint()
    x = F.col("xbar")
    g = d.agg(
        F.avg(x).alias("cl"),
        F.sqrt(
            (F.sum(x * x) - F.sum(x) * F.sum(x) / F.count(F.lit(1)))
            / (F.count(F.lit(1)) - 1)
        ).alias("sd"),
    )
    lcl = F.col("cl") - SPC_SIGMA * F.col("sd")
    ucl = F.col("cl") + SPC_SIGMA * F.col("sd")
    return d.join(F.broadcast(g)).select(
        F.col("t").cast("bigint").alias("t"),
        ratio(x).alias("xbar"),
        ratio(F.col("cl")).alias("center"),
        ratio(lcl).alias("lcl"),
        ratio(ucl).alias("ucl"),
        ((x > ucl) | (x < lcl)).cast("bigint").alias("out_of_control"),
    )


stat_control_chart.__doc__ = stat_control_chart.__doc__.format(s=SPC_SIGMA)


@query(
    "ds_masked_aggregation",
    # Real oracle: the pairwise masks are pure modular integer
    # arithmetic over the party pairs (antisymmetric by the i<j
    # branch), so the masked partials and the cancellation check are
    # exact integers end-to-end.
    oracle=f"""
    WITH parts AS (SELECT CAST(user_id % 8 AS INT) AS party,
                          CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT)
                            AS tc
                   FROM events GROUP BY 1),
    msk AS (SELECT a.party AS i,
                   SUM(CASE WHEN a.party < b.party
                            THEN ((a.party * 31 + b.party * 17 + 7)
                                  * {MASK_SEED}) % 1000003
                            ELSE -(((b.party * 31 + a.party * 17 + 7)
                                    * {MASK_SEED}) % 1000003) END) AS m
            FROM parts a JOIN parts b ON b.party <> a.party
            GROUP BY 1),
    mp AS (SELECT p.party, p.tc,
                  CAST(p.tc + COALESCE(k.m, 0) AS BIGINT) AS masked
           FROM parts p LEFT JOIN msk k ON k.i = p.party),
    t AS (SELECT SUM(tc) AS tt, SUM(masked) AS tm FROM mp)
    SELECT mp.party, mp.masked AS masked_partial_cents,
           CAST(CASE WHEN mp.masked <> mp.tc THEN 1 ELSE 0 END AS BIGINT)
             AS partial_opaque,
           CAST(CASE WHEN t.tm = t.tt THEN 1 ELSE 0 END AS BIGINT)
             AS total_recovered
    FROM mp CROSS JOIN t
    """,
)
def ds_masked_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secure-aggregation skeleton: P logical parties (partitions by
    user_id % P) each add a deterministic pairwise mask Σ_j≠i m_ij to
    their true subtotal, with m_ij = −m_ji, so every published partial
    is unreadable but the SUM of partials equals the true total
    EXACTLY (integer cents — float masks would leak via rounding).
    This is the algebra under federated analytics / secure telemetry,
    minus the key exchange.

    Scale: one partial aggregation per party (a grouped agg), masks
    are O(P²) driver-generated integers."""
    P = 8
    ev = cat(spark, sf_dir)["events"]
    parts = (
        ev.groupBy((F.col("user_id") % P).alias("party"))
        .agg(
            F.floor(F.sum("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("true_cents")
        )
        .collect()
    )
    true_by_party = {r["party"]: r["true_cents"] for r in parts}
    # pairwise masks: m[i][j] = -m[j][i], deterministic
    def mask(i: int, j: int) -> int:
        v = ((i * 31 + j * 17 + 7) * MASK_SEED) % 1_000_003
        return v if i < j else -(((j * 31 + i * 17 + 7) * MASK_SEED) % 1_000_003)

    masked = {}
    for i in sorted(true_by_party):
        m = sum(mask(i, j) for j in sorted(true_by_party) if j != i)
        masked[i] = true_by_party[i] + m
    total_true = sum(true_by_party.values())
    total_masked = sum(masked.values())
    rows = [
        (
            int(i),
            int(masked[i]),
            int(masked[i] != true_by_party[i]),
        )
        for i in sorted(masked)
    ]
    rows = [
        (party, m, opaque, int(total_masked == total_true))
        for party, m, opaque in rows
    ]
    return spark.createDataFrame(
        rows,
        "party int, masked_partial_cents long, partial_opaque long, "
        "total_recovered long",
    ).orderBy("party")


@query(
    "stat_pairwise_posthoc",
    oracle=f"""
    WITH s AS (SELECT event_type AS g, CAST(COUNT(*) AS DOUBLE) AS n,
                      AVG(value) AS m,
                      (SUM(value * value) - SUM(value) * SUM(value)
                                            / COUNT(*))
                        / (COUNT(*) - 1) AS v
               FROM events GROUP BY 1),
    p AS (SELECT a.g AS g1, b.g AS g2,
                 ABS(a.m - b.m) / sqrt(a.v / a.n + b.v / b.n) AS z
          FROM s a JOIN s b ON a.g < b.g),
    pv AS (SELECT g1, g2,
                  2 * {normal_sf_sql("z")} AS p
           FROM p),
    rk AS (SELECT g1, g2, p,
                  ROW_NUMBER() OVER (ORDER BY FLOOR(p * 1000000 + 0.5)
                                              / 1000000, g1, g2) AS i,
                  COUNT(*) OVER () AS m
           FROM pv),
    bh AS (SELECT g1, g2, p, i, m,
                  MIN(p * m / i) OVER (ORDER BY i DESC
                                       ROWS UNBOUNDED PRECEDING) AS p_adj
           FROM rk)
    SELECT g1, g2,
           FLOOR(p * 10000 + 0.5) / 10000 AS p_raw,
           FLOOR(LEAST(p_adj, 1.0) * 10000 + 0.5) / 10000 AS p_bh,
           CAST(CASE WHEN LEAST(p_adj, 1.0) < 0.05 THEN 1 ELSE 0 END
                AS BIGINT) AS significant
    FROM bh
    """,
)
def stat_pairwise_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-hoc pairwise comparisons after the omnibus ANOVA: all
    C(5,2) Welch z contrasts between event-type mean values,
    Benjamini–Hochberg-adjusted (the step-up min-suffix construction)
    — the multiple-comparisons discipline that keeps 'which groups
    differ' from minting false discoveries at the pair level.

    Scale: group sufficient statistics (|groups| rows) self-join into
    C(k,2) pairs — model-sized; the BH suffix-min runs over 10 rows."""
    ev = cat(spark, sf_dir)["events"]
    v = F.col("value")
    s = ev.groupBy(F.col("event_type").alias("g")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(v).alias("m"),
        (
            (F.sum(v * v) - F.sum(v) * F.sum(v) / F.count(F.lit(1)))
            / (F.count(F.lit(1)) - 1)
        ).alias("v"),
    ).localCheckpoint()
    a = s.select(
        F.col("g").alias("g1"), F.col("n").alias("n1"),
        F.col("m").alias("m1"), F.col("v").alias("v1"),
    )
    b = s.select(
        F.col("g").alias("g2"), F.col("n").alias("n2"),
        F.col("m").alias("m2"), F.col("v").alias("v2"),
    )
    p = a.join(b, F.col("g1") < F.col("g2")).select(
        "g1",
        "g2",
        (
            F.abs(F.col("m1") - F.col("m2"))
            / F.sqrt(F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2"))
        ).alias("z"),
    )
    pv = p.select("g1", "g2", (2 * normal_sf(F.col("z"))).alias("p"))
    rk = pv.select(
        "g1",
        "g2",
        "p",
        F.row_number()
        .over(
            W.orderBy(
                F.floor(F.col("p") * 1000000 + F.lit(0.5)) / 1000000,
                "g1",
                "g2",
            )
        )
        .alias("i"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("m"),
    )
    wsuf = W.orderBy(F.col("i").desc()).rowsBetween(W.unboundedPreceding, 0)
    bh = rk.withColumn(
        "p_adj", F.min(F.col("p") * F.col("m") / F.col("i")).over(wsuf)
    )
    padj = F.least(F.col("p_adj"), F.lit(1.0))
    return bh.select(
        "g1",
        "g2",
        ratio(F.col("p")).alias("p_raw"),
        ratio(padj).alias("p_bh"),
        (padj < 0.05).cast("bigint").alias("significant"),
    )
