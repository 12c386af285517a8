"""Wave 119: functional-graph cycle structure, intra-document drift,
and rolling-origin evaluation.

graph_functional_cycles builds the functional graph 'every part →
its strongest co-purchase partner' and classifies nodes into cycle
cores vs tails with pointer doubling — the ρ-shape decomposition
behind cycle detection in hash chains and succession graphs, done in
O(log n) rounds; tx_intra_doc_drift measures Jensen–Shannon
divergence between each document's first and second half — the
within-document topic-shift signal that corpus-level drift can't
see; ev_rolling_origin_cv evaluates the seasonal-naive forecaster
with rolling-origin folds — the only honest CV for time series
(random K-fold leaks the future).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import (
    COP_SUPPORT,
    _DUCK_BASKETS,
    _copurchase_edges,
)
from mister_spark.registry import query

FC_JUMPS = 6  # pointer-doubling rounds (2^6 = 64 >> graph diameter)
RO_FOLDS = 3
RO_H = 5  # horizon per fold (days)
DRIFT_TOP = 10


@query(
    "graph_functional_cycles",
    # Real oracle: the Spark side composes the best-partner map with
    # itself FC_JUMPS times (pointer doubling → f^(2^FC_JUMPS)); the
    # CTE walks the SAME map one step per iteration for 2^FC_JUMPS
    # steps — identical function power, so identical image. Cycle
    # nodes = distinct far-walk targets (every jump target is itself a
    # mapped node, so Spark's image∩domain join is the image);
    # mutual-best 2-cycles counted directly on the map.
    oracle=f"""
    WITH RECURSIVE {_DUCK_BASKETS},
    cew AS (SELECT x.l_partkey AS p1, y.l_partkey AS p2,
                   CAST(COUNT(*) AS BIGINT) AS w
            FROM bk x JOIN bk y ON x.l_orderkey = y.l_orderkey
                               AND x.l_partkey < y.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= {COP_SUPPORT}),
    wsym AS (SELECT p1 AS u, p2 AS v, w FROM cew
             UNION ALL SELECT p2, p1, w FROM cew),
    best AS (SELECT u, v AS nxt FROM (
               SELECT u, v, ROW_NUMBER() OVER (
                 PARTITION BY u ORDER BY w DESC, v) AS rn
               FROM wsym) s WHERE rn = 1),
    walk AS (
      SELECT 0 AS it, u, nxt AS j FROM best
      UNION ALL
      SELECT w.it + 1, w.u, b.nxt
      FROM walk w JOIN best b ON w.j = b.u
      WHERE w.it < {2 ** FC_JUMPS}),
    far AS (SELECT u, j FROM walk WHERE it = {2 ** FC_JUMPS}),
    n_nodes AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM best),
    n_cyc AS (SELECT CAST(COUNT(DISTINCT j) AS BIGINT) AS c FROM far),
    mut AS (SELECT CAST(COUNT(*) AS BIGINT) AS m
            FROM best a JOIN best b ON a.nxt = b.u AND b.nxt = a.u
            WHERE a.u < a.nxt)
    SELECT n_nodes.n AS nodes, n_cyc.c AS cycle_nodes,
           n_nodes.n - n_cyc.c AS tail_nodes, mut.m AS mutual_pairs
    FROM n_nodes, n_cyc, mut
    """,
)
def graph_functional_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-graph structure of 'strongest co-purchase partner':
    every node keeps ONE out-edge (max weight, min-key tie-break),
    giving a ρ-shaped forest of tails flowing into cycles. Pointer
    doubling (follow 2^k steps per round) classifies nodes: a node is
    ON a cycle iff following n steps returns to it — detected here by
    jump-table convergence. Reports nodes, cycle nodes, tail nodes,
    and the count of 2-cycles (mutual best partners — the
    'power-couple' products).

    Scale: each doubling round is ONE self-join of the jump table
    (f^(2k) = f^k ∘ f^k), O(log n) rounds total — the same trick as
    pointer-jumping components; no per-node walks."""
    e = _copurchase_edges(spark, sf_dir)
    sym = e.select(
        F.col("p1").alias("u"), F.col("p2").alias("v"), "w"
    ).unionByName(
        e.select(F.col("p2").alias("u"), F.col("p1").alias("v"), "w")
    )
    best = (
        sym.groupBy("u")
        .agg(
            F.min_by(
                F.col("v"), F.struct((-F.col("w")).alias("nw"), F.col("v"))
            ).alias("nxt")
        )
        .localCheckpoint()
    )
    # 2-cycles: mutual best partners
    two_cycles = (
        best.alias("a")
        .join(
            best.select(
                F.col("u").alias("nxt"), F.col("nxt").alias("back")
            ),
            "nxt",
        )
        .filter(F.col("u") == F.col("back"))
        .filter(F.col("u") < F.col("nxt"))
        .count()
    )
    # pointer doubling: jump[k] = where you land after 2^k steps
    jump = best.select("u", F.col("nxt").alias("j"))
    for _ in range(FC_JUMPS):
        jump = (
            jump.alias("a")
            .join(
                jump.select(F.col("u").alias("j"), F.col("j").alias("j2")),
                "j",
            )
            .select("u", F.col("j2").alias("j"))
            .localCheckpoint()
        )
    # after 2^FC_JUMPS steps every walk is inside its cycle; a node is
    # on a cycle iff some node's far-jump lands on it AND its own
    # far-jump chain returns: cycle nodes = image of the far jump
    # restricted to nodes that are in the image closure
    img = jump.select(F.col("j").alias("u")).distinct()
    on_cycle = img.join(jump, "u").select("u").distinct()
    n_nodes = best.count()
    n_cycle = on_cycle.count()
    row = (
        int(n_nodes),
        int(n_cycle),
        int(n_nodes - n_cycle),
        int(two_cycles),
    )
    return spark.createDataFrame(
        [row],
        "nodes long, cycle_nodes long, tail_nodes long, mutual_pairs long",
    )


@query(
    "tx_intra_doc_drift",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents
               WHERE len({DUCK_TOKENS}) >= 10),
    halves AS (
      SELECT doc_id,
             toks[1 : len(toks) // 2] AS h1,
             toks[len(toks) // 2 + 1 : len(toks)] AS h2
      FROM t),
    u AS (SELECT doc_id, unnest(h1) AS tok, 1 AS half FROM halves
          UNION ALL
          SELECT doc_id, unnest(h2) AS tok, 2 AS half FROM halves),
    cnt AS (SELECT doc_id, half, tok, CAST(COUNT(*) AS DOUBLE) AS c
            FROM u GROUP BY 1, 2, 3),
    tot AS (SELECT doc_id, half, SUM(c) AS n FROM cnt GROUP BY 1, 2),
    p AS (SELECT cnt.doc_id, cnt.tok,
                 MAX(CASE WHEN cnt.half = 1 THEN cnt.c / tot.n END) AS p1,
                 MAX(CASE WHEN cnt.half = 2 THEN cnt.c / tot.n END) AS p2
          FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
                           AND cnt.half = tot.half
          GROUP BY 1, 2),
    js AS (SELECT doc_id,
                  SUM(CASE WHEN COALESCE(p1, 0) > 0
                       THEN 0.5 * p1
                            * LN(p1 / ((COALESCE(p1, 0)
                                        + COALESCE(p2, 0)) / 2))
                       ELSE 0 END)
                  + SUM(CASE WHEN COALESCE(p2, 0) > 0
                         THEN 0.5 * p2
                              * LN(p2 / ((COALESCE(p1, 0)
                                          + COALESCE(p2, 0)) / 2))
                         ELSE 0 END) AS jsd
           FROM p GROUP BY 1)
    SELECT doc_id, FLOOR(jsd * 10000 + 0.5) / 10000 AS jsd
    FROM js ORDER BY FLOOR(jsd * 10000 + 0.5) / 10000 DESC, doc_id
    LIMIT {DRIFT_TOP}
    """,
)
def tx_intra_doc_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document topic drift: Jensen–Shannon divergence between
    each document's first- and second-half unigram distributions,
    top-{k} drifters. High JSD inside one document flags concatenated
    /stitched content (two sources pasted together) — a dedup- and
    quality-relevant defect that corpus-level statistics average
    away.

    Scale: the halves explode once (map-side slice); per-(doc, half)
    counts are one shuffle keyed by doc; the JSD reduces per doc —
    everything stays partitioned on doc_id."""
    toks = tokens()
    t = (
        cat(spark, sf_dir)["documents"]
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 10)
    )
    n = F.size("toks")
    halves = t.select(
        "doc_id",
        F.slice("toks", 1, (n / 2).cast("int")).alias("h1"),
        F.slice(
            "toks",
            (n / 2).cast("int") + 1,
            n - (n / 2).cast("int"),
        ).alias("h2"),
    )
    u = halves.select(
        "doc_id", F.explode("h1").alias("tok"), F.lit(1).alias("half")
    ).unionByName(
        halves.select(
            "doc_id", F.explode("h2").alias("tok"), F.lit(2).alias("half")
        )
    )
    cnt = u.groupBy("doc_id", "half", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    tot = cnt.groupBy("doc_id", "half").agg(F.sum("c").alias("n"))
    p = (
        cnt.join(tot, ["doc_id", "half"])
        .groupBy("doc_id", "tok")
        .agg(
            F.max(
                F.when(F.col("half") == 1, F.col("c") / F.col("n"))
            ).alias("p1"),
            F.max(
                F.when(F.col("half") == 2, F.col("c") / F.col("n"))
            ).alias("p2"),
        )
    )
    p1 = F.coalesce("p1", F.lit(0.0))
    p2 = F.coalesce("p2", F.lit(0.0))
    m = (p1 + p2) / 2
    term1 = F.when(p1 > 0, 0.5 * p1 * F.log(p1 / m)).otherwise(0.0)
    term2 = F.when(p2 > 0, 0.5 * p2 * F.log(p2 / m)).otherwise(0.0)
    js = p.groupBy("doc_id").agg(
        (F.sum(term1) + F.sum(term2)).alias("jsd_raw")
    )
    # round BEFORE ranking: near-tied raw floats differ in engine
    # summation order, so the rounded value + doc_id is the total order
    return (
        js.select("doc_id", ratio(F.col("jsd_raw")).alias("jsd"))
        .orderBy(F.col("jsd").desc(), "doc_id")
        .limit(DRIFT_TOP)
    )


tx_intra_doc_drift.__doc__ = tx_intra_doc_drift.__doc__.format(k=DRIFT_TOP)


@query(
    "ev_rolling_origin_cv",
    # Real oracle: each fold's origin, seasonal-naive forecast and MAE
    # are index arithmetic on the day series (fold × horizon cross
    # join, scalar lookups at the seasonal offsets) — plus the pooled
    # fold-0 summary row and the spread column.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS day,
                      CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    idx AS (SELECT y, ROW_NUMBER() OVER (ORDER BY day) AS i FROM d),
    nn AS (SELECT COUNT(*) AS n FROM idx),
    folds AS (SELECT f.fold,
                     nn.n - ({RO_FOLDS} + 1 - f.fold) * {RO_H} AS origin
              FROM (SELECT unnest(generate_series(1, {RO_FOLDS})) AS fold) f
              CROSS JOIN nn
              WHERE nn.n - ({RO_FOLDS} + 1 - f.fold) * {RO_H} >= 8),
    sc AS (SELECT fo.fold, fo.origin, js.j,
                  CASE WHEN fo.origin >= 7
                       THEN (SELECT y FROM idx
                             WHERE i = fo.origin - 6 + ((js.j - 1) % 7))
                       ELSE (SELECT y FROM idx WHERE i = fo.origin) END AS f,
                  (SELECT y FROM idx WHERE i = fo.origin + js.j) AS a
           FROM folds fo
           CROSS JOIN (SELECT unnest(generate_series(1, {RO_H})) AS j) js
           CROSS JOIN nn
           WHERE fo.origin + js.j <= nn.n
                 AND js.j <= {RO_H}),
    fm AS (SELECT fold, origin, SUM(ABS(f - a)) / COUNT(*) AS mae
           FROM sc GROUP BY 1, 2),
    agg AS (SELECT SUM(mae) / COUNT(*) AS mean_mae,
                   MAX(mae) - MIN(mae) AS spread
            FROM fm)
    SELECT CAST(fm.fold AS BIGINT) AS fold,
           CAST(fm.origin AS BIGINT) AS origin_day,
           FLOOR(fm.mae * 10000 + 0.5) / 10000 AS mae,
           FLOOR(ag.spread * 10000 + 0.5) / 10000 AS mae_spread
    FROM fm CROSS JOIN agg ag
    UNION ALL
    SELECT 0, nn.n, FLOOR(ag.mean_mae * 10000 + 0.5) / 10000,
           FLOOR(ag.spread * 10000 + 0.5) / 10000
    FROM nn CROSS JOIN agg ag
    """,
)
def ev_rolling_origin_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin cross-validation of the seasonal-naive-7
    forecaster on daily event counts: {f} folds, each training on
    everything before its origin and scoring the next {h} days — the
    time-respecting CV that random folds (which leak the future into
    training) cannot replace. Emits per-fold MAE plus the pooled
    mean and spread, the honest generalization estimate.

    Scale: one rollup; the folds are O(days) driver arithmetic
    (calendar-bounded precedent)."""
    ev = cat(spark, sf_dir)["events"]
    rows = (
        ev.groupBy(
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias(
                "day"
            )
        )
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .orderBy("day")
        .collect()
    )
    ys = [float(r["y"]) for r in rows]
    n = len(ys)
    out = []
    maes = []
    for fold in range(RO_FOLDS):
        origin = n - (RO_FOLDS - fold) * RO_H
        if origin < 8:
            continue
        train, test = ys[:origin], ys[origin : origin + RO_H]
        fc = [
            train[-7 + (j % 7)] if len(train) >= 7 else train[-1]
            for j in range(len(test))
        ]
        mae = sum(abs(f - a) for f, a in zip(fc, test)) / len(test)
        maes.append(mae)
        out.append((fold + 1, origin, math.floor(mae * 10000 + 0.5) / 10000))
    mean_mae = sum(maes) / len(maes)
    spread = max(maes) - min(maes)
    # fold 0 = pooled summary; floor rounding = common.rnd's rule
    out.append((0, n, math.floor(mean_mae * 10000 + 0.5) / 10000))
    return spark.createDataFrame(
        out, "fold long, origin_day long, mae double"
    ).withColumn(
        "mae_spread", F.lit(math.floor(spread * 10000 + 0.5) / 10000)
    )


ev_rolling_origin_cv.__doc__ = ev_rolling_origin_cv.__doc__.format(
    f=RO_FOLDS, h=RO_H
)
