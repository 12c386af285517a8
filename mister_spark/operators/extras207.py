"""Wave 207: graph fingerprinting and irregular-sampling spectra.

graph_wl_refinement runs Weisfeiler-Lehman color refinement on the
co-purchase graph: every node's color becomes the hash of its own +
sorted neighbor colors, three rounds. The per-round color-class count
is the graph's structural resolution (how many distinguishable node
roles exist) and the canonical class-multiset hash is a graph
FINGERPRINT — the dedup key for graph-shaped data, the same role
minhash plays for text (WL is also the kernel behind most graph-ML
baselines). Everything is exact string/integer arithmetic — md5 of
sorted concatenations — so the oracle needs no rounding grid at all.
ev_lomb_scargle is the periodogram for UNEVENLY sampled series:
ev_periodogram implicitly assumes a dense regular grid, but real
event calendars have holes (outages, weekends, backfills), and
naively indexing over present-days aliases every frequency; the
Lomb-Scargle phase shift tau restores the least-squares spectrum on
the true timestamps.

Exactness: WL is float-free; Lomb-Scargle runs on integer scaled
residuals with shared trig arguments — only SIN/COS/ATAN2 ulps
drift, inside the grid.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, checkpoint_partitioned, rnd
from mister_spark.operators.extras47 import (
    DUCK_COPURCHASE_SYM,
    _copurchase_edges,
)
from mister_spark.registry import query

WL_ROUNDS = 3
EPOCH = "1970-01-01"
LS_PERIODS = tuple(range(3, 17))  # candidate cycle lengths, days
TWO_PI = 2.0 * math.pi


@query(
    "graph_wl_refinement",
    # Real oracle: WL is pure string/integer arithmetic — degrees,
    # md5 of sorted color concatenations, class counts — so both
    # engines produce IDENTICAL colors and hashes with no float grid
    # anywhere; the recursion replays round for round.
    oracle=f"""
    WITH RECURSIVE {DUCK_COPURCHASE_SYM},
    nbr AS (SELECT v, u FROM (
              SELECT p1 AS v, p2 AS u FROM csym
              UNION ALL SELECT DISTINCT p1, p1 FROM csym) q),
    deg AS (SELECT p1 AS v, CAST(COUNT(*) AS BIGINT) AS dc
            FROM csym GROUP BY 1),
    wl AS (
      SELECT 0 AS r, v, CAST(dc AS VARCHAR) AS c FROM deg
      UNION ALL
      SELECT q.r + 1, q.v, md5(q.sig)
      FROM (SELECT w.r, n.v,
                   string_agg(w.c, ',' ORDER BY w.c) AS sig
            FROM nbr n JOIN wl w ON w.v = n.u
            WHERE w.r < {WL_ROUNDS}
            GROUP BY 1, 2) q
    ),
    cls AS (SELECT r, c, CAST(COUNT(*) AS BIGINT) AS k
            FROM wl GROUP BY 1, 2)
    SELECT r AS round,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           MAX(k) AS largest_class,
           md5(string_agg(c || 'x' || CAST(k AS VARCHAR), ';'
                          ORDER BY c || 'x' || CAST(k AS VARCHAR)))
             AS graph_hash
    FROM cls GROUP BY 1 ORDER BY 1
    """,
)
def graph_wl_refinement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weisfeiler-Lehman refinement on the co-purchase graph: start
    every part at its degree, then {r} rounds of color = md5(sorted
    multiset of own + neighbor colors). One row per round with the
    number of color classes (structural roles resolved so far), the
    largest class, and the canonical md5 fingerprint of the whole
    class multiset. Two graphs with different fingerprints are
    guaranteed non-isomorphic — the cheap pre-filter for graph-level
    dedup, and the refinement curve (how fast classes split) is a
    one-line summary of how role-homogeneous the catalog is.

    Scale: each round is ONE edge join + ONE groupBy with a
    sort_array/concat (all JVM string codegen, no UDF); state is one
    color per node, localCheckpoint-ed per round like the other
    iterative graph ops. The self-loop union folds the node's own
    color into the same aggregation, so no second self-join of the
    color frame is needed (and the oracle's recursion keeps its
    single recursive reference). The edge list is HASH-PARTITIONED ON
    THE JOIN KEY once, outside the loop (guide §2.4): every round's
    join then shuffles only the node-sized color frame, not the edges,
    and the degree init is a count over the same checkpointed frame
    (self-loop row subtracted) instead of a second pass over the
    co-purchase pipeline."""
    e = _copurchase_edges(spark, sf_dir).select("p1", "p2")
    sym = e.union(
        e.select(F.col("p2").alias("p1"), F.col("p1").alias("p2"))
    ).distinct()
    # (v, u) incl. self loops; partitioned on the join key, reused
    # every round
    nbr = checkpoint_partitioned(
        sym.union(sym.select("p1", F.col("p1").alias("p2")).distinct()),
        "p2",
    )
    colors = (
        nbr.groupBy(F.col("p1").alias("v"))
        .agg((F.count(F.lit(1)) - 1).cast("bigint").alias("dc"))
        .select("v", F.col("dc").cast("string").alias("c"))
        .localCheckpoint()  # degree = neighbors excl. the self loop
    )
    rounds = [colors.withColumn("r", F.lit(0))]
    for r in range(1, WL_ROUNDS + 1):
        joined = nbr.join(
            colors.select(F.col("v").alias("p2"), F.col("c").alias("cu")),
            "p2",
        )
        colors = (
            joined.groupBy(F.col("p1").alias("v"))
            .agg(
                # sorting the multiset by value alone is exact:
                # equal strings are interchangeable in the signature
                F.md5(
                    F.array_join(
                        F.array_sort(F.collect_list(F.col("cu"))), ","
                    )
                ).alias("c")
            )
            .localCheckpoint()  # cut per-round lineage
        )
        rounds.append(colors.withColumn("r", F.lit(r)))
    wl = rounds[0]
    for fr in rounds[1:]:
        wl = wl.unionByName(fr)
    cls = wl.groupBy("r", "c").agg(F.count(F.lit(1)).alias("k"))
    return (
        cls.groupBy("r")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.max("k").cast("bigint").alias("largest_class"),
            F.md5(
                F.array_join(
                    F.array_sort(
                        F.collect_list(
                            F.concat(
                                F.col("c"),
                                F.lit("x"),
                                F.col("k").cast("string"),
                            )
                        )
                    ),
                    ";",
                )
            ).alias("graph_hash"),
        )
        .select(F.col("r").alias("round"), "n_classes", "largest_class",
                "graph_hash")
        .orderBy("round")
    )


graph_wl_refinement.__doc__ = graph_wl_refinement.__doc__.format(
    r=WL_ROUNDS
)


@query(
    "ev_lomb_scargle",
    # Real oracle: residuals are the exact integers n*y - sum(y) on
    # the TRUE day timestamps; per period the trig sums, the tau
    # phase (ATAN2), and the two quadratic forms are the same
    # closed-form expressions of those integers — only trig/sum ulps
    # drift, inside the grid.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t, CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy FROM d),
    u AS (SELECT d.t, CAST(m.n * d.y - m.sy AS DOUBLE) AS u, m.n
          FROM d, m),
    var AS (SELECT SUM(u * u) / (MAX(n) - 1.0) AS s2 FROM u),
    per AS (SELECT unnest(ARRAY{list(LS_PERIODS)}) AS p),
    tau AS (SELECT per.p,
                   ATAN2(SUM(SIN(2.0 * {TWO_PI!r} / per.p * u.t)),
                         SUM(COS(2.0 * {TWO_PI!r} / per.p * u.t)))
                     / (2.0 * {TWO_PI!r} / per.p) AS tau
            FROM u, per GROUP BY per.p),
    pw AS (SELECT t2.p,
                  0.5 * (POWER(SUM(u.u * COS({TWO_PI!r} / t2.p
                                             * (u.t - t2.tau))), 2)
                         / SUM(POWER(COS({TWO_PI!r} / t2.p
                                         * (u.t - t2.tau)), 2))
                         + POWER(SUM(u.u * SIN({TWO_PI!r} / t2.p
                                               * (u.t - t2.tau))), 2)
                         / SUM(POWER(SIN({TWO_PI!r} / t2.p
                                         * (u.t - t2.tau)), 2))) AS pr
           FROM u, tau t2 GROUP BY t2.p, t2.tau)
    SELECT pw.p AS period_days,
           CASE WHEN var.s2 > 0
                THEN FLOOR(pw.pr / var.s2 * 1e4 + 0.5) / 1e4
                ELSE 0.0 END AS ls_power
    FROM pw, var ORDER BY period_days
    """,
)
def ev_lomb_scargle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lomb-Scargle normalized periodogram of daily event volume at
    candidate periods 3..16 days, evaluated on the TRUE day
    timestamps: per frequency, solve the phase tau from
    atan2(sum sin 2wt, sum cos 2wt), then take the least-squares
    power of the tau-shifted sin/cos regressors. On a gap-free grid
    this equals the classic periodogram; with missing days it stays
    unbiased where a present-day-index periodogram aliases — the
    spectral tool for real calendars with outages and backfills.

    Scale: ONE day-grain count, then a 14-period broadcast trig pass
    over the calendar-bounded frame (two map-side-combinable
    aggregations: tau, then power). Closed form throughout."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    m = d.agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy"))
    u = (
        d.crossJoin(F.broadcast(m))
        .select(
            "t",
            (F.col("n") * F.col("y") - F.col("sy"))
            .cast("double")
            .alias("u"),
            "n",
        )
        .localCheckpoint()  # feeds variance + both trig passes
    )
    var = u.agg(
        (F.sum(F.col("u") * F.col("u")) / (F.max("n") - 1.0)).alias("s2")
    )
    per = spark.createDataFrame(
        [(int(p),) for p in LS_PERIODS], "p int"
    )
    w = TWO_PI / F.col("p")
    tau = (
        u.crossJoin(F.broadcast(per))
        .groupBy("p")
        .agg(
            (
                F.atan2(
                    F.sum(F.sin(2.0 * w * F.col("t"))),
                    F.sum(F.cos(2.0 * w * F.col("t"))),
                )
                / (2.0 * w)
            ).alias("tau")
        )
    )
    arg = w * (F.col("t") - F.col("tau"))
    pw = (
        u.crossJoin(F.broadcast(tau))
        .groupBy("p", "tau")
        .agg(
            (
                0.5
                * (
                    F.pow(F.sum(F.col("u") * F.cos(arg)), 2)
                    / F.sum(F.pow(F.cos(arg), 2))
                    + F.pow(F.sum(F.col("u") * F.sin(arg)), 2)
                    / F.sum(F.pow(F.sin(arg), 2))
                )
            ).alias("pr")
        )
    )
    return (
        pw.crossJoin(F.broadcast(var))
        .select(
            F.col("p").alias("period_days"),
            F.when(
                F.col("s2") > 0, rnd(F.col("pr") / F.col("s2"), 4)
            )
            .otherwise(0.0)
            .alias("ls_power"),
        )
        .orderBy("period_days")
    )
