"""Wave 55: causal + curation analytics — Granger causality,
DoReMi-style domain reweighting, isotonic calibration, and weighted
shortest paths.

stat_granger asks the forecasting question ("do clicks predict
purchases?") with the lag-1 Granger F-test; ds_domain_reweight is the
DoReMi idea — upweight domains whose text the corpus-level LM finds
surprising — as one SQL plan; ml_isotonic_calibration fits the PAV
monotone calibrator on distributed bins (the production fixer for
ml_calibration_bins' gaps); graph_sssp_weighted adds weighted
shortest-path distances over the co-purchase graph (graph_bfs is the
unweighted twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.operators.extras47 import _DUCK_BASKETS, COP_SUPPORT
from mister_spark.registry import query

GRANGER_ALPHA = 0.05
DRW_ETA = 2.0  # DoReMi-ish temperature on excess NLL
ISO_BINS = 50
SSSP_ROUNDS = 8
SSSP_TOP = 20


@query(
    "stat_granger",
    oracle=f"""
    WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type
               FROM events WHERE event_type IN ('click', 'purchase')),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM e),
    grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
             FROM bounds),
    d AS (SELECT CAST(g.day AS DATE) AS day,
                 COALESCE(SUM(CASE WHEN e.event_type = 'click'
                              THEN 1 ELSE 0 END), 0) AS x,
                 COALESCE(SUM(CASE WHEN e.event_type = 'purchase'
                              THEN 1 ELSE 0 END), 0) AS y
          FROM grid g LEFT JOIN e ON CAST(g.day AS DATE) = e.day GROUP BY 1),
    k AS (SELECT date_diff('day', DATE '1970-01-01', day) AS t,
                 CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y
          FROM d),
    l AS (SELECT cur.y AS y, prv.y AS y1, prv.x AS x1
          FROM k cur JOIN k prv ON prv.t = cur.t - 1),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(y) AS sy, SUM(y1) AS sy1, SUM(x1) AS sx1,
                 SUM(y * y) AS syy, SUM(y1 * y1) AS sy1y1,
                 SUM(x1 * x1) AS sx1x1, SUM(y * y1) AS syy1,
                 SUM(y * x1) AS syx1, SUM(y1 * x1) AS sy1x1
          FROM l),
    c AS (SELECT n,
                 sy1y1 - sy1 * sy1 / n AS s11,
                 sx1x1 - sx1 * sx1 / n AS s22,
                 sy1x1 - sy1 * sx1 / n AS s12,
                 syy1 - sy * sy1 / n AS s1y,
                 syx1 - sy * sx1 / n AS s2y,
                 syy - sy * sy / n AS syc
          FROM s),
    f AS (SELECT n,
                 (syc - s1y * s1y / s11)
                   - (syc - ((s1y * s22 - s2y * s12) * s1y
                             + (s2y * s11 - s1y * s12) * s2y)
                            / (s11 * s22 - s12 * s12)) AS num,
                 (syc - ((s1y * s22 - s2y * s12) * s1y
                         + (s2y * s11 - s1y * s12) * s2y)
                        / (s11 * s22 - s12 * s12)) AS rss_u
          FROM c)
    SELECT CAST(n AS BIGINT) AS n_days,
           FLOOR(num * (n - 3) / rss_u * 10000 + 0.5) / 10000 AS f_stat,
           FLOOR(2 * {normal_sf_sql("sqrt(GREATEST(num * (n - 3) / rss_u, 0.0))")}
                 * 10000 + 0.5) / 10000 AS p_value,
           CAST(CASE WHEN 2 * {normal_sf_sql(
               "sqrt(GREATEST(num * (n - 3) / rss_u, 0.0))"
           )} < {GRANGER_ALPHA} THEN 1 ELSE 0 END AS BIGINT) AS causal_flag
    FROM f
    """,
)
def stat_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger causality, clicks → purchases: on the zero-filled
    daily grid, compare the restricted AR(1) of purchases against the
    model that adds yesterday's clicks; F = ΔRSS·(n−3)/RSS_u, p from
    the χ²₁ tail (the shared portable normal tail — exact F(1, n−3)
    needs an incomplete beta neither engine exposes; at n≈90 the two
    agree far inside the rounding grid).

    Scale: one event rollup to the calendar-bounded day grid, one
    t → t−1 self-join on the grid, one sufficient-statistics
    aggregation — the regression algebra runs on a single row."""
    ev = cat(spark, sf_dir)["events"].filter(
        F.col("event_type").isin("click", "purchase")
    )
    e = ev.select(F.date_trunc("day", "ts").alias("day"), "event_type")
    bounds = e.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 day"))
        ).alias("day")
    )
    d = (
        F.broadcast(grid)
        .join(e, "day", "left")
        .groupBy("day")
        .agg(
            F.sum(
                F.coalesce((F.col("event_type") == "click").cast("int"), F.lit(0))
            ).alias("x"),
            F.sum(
                F.coalesce(
                    (F.col("event_type") == "purchase").cast("int"), F.lit(0)
                )
            ).alias("y"),
        )
    )
    k = d.select(
        F.datediff("day", F.lit("1970-01-01")).alias("t"),
        F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"),
    )
    cur = k.select(F.col("t"), F.col("y"))
    prv = k.select(
        (F.col("t") + 1).alias("t"),
        F.col("y").alias("y1"),
        F.col("x").alias("x1"),
    )
    l = cur.join(prv, "t").select("y", "y1", "x1")
    y, y1, x1 = F.col("y"), F.col("y1"), F.col("x1")
    s = l.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(y).alias("sy"),
        F.sum(y1).alias("sy1"),
        F.sum(x1).alias("sx1"),
        F.sum(y * y).alias("syy"),
        F.sum(y1 * y1).alias("sy1y1"),
        F.sum(x1 * x1).alias("sx1x1"),
        F.sum(y * y1).alias("syy1"),
        F.sum(y * x1).alias("syx1"),
        F.sum(y1 * x1).alias("sy1x1"),
    )
    n = F.col("n")
    s11 = F.col("sy1y1") - F.col("sy1") * F.col("sy1") / n
    s22 = F.col("sx1x1") - F.col("sx1") * F.col("sx1") / n
    s12 = F.col("sy1x1") - F.col("sy1") * F.col("sx1") / n
    s1y = F.col("syy1") - F.col("sy") * F.col("sy1") / n
    s2y = F.col("syx1") - F.col("sy") * F.col("sx1") / n
    syc = F.col("syy") - F.col("sy") * F.col("sy") / n
    det = s11 * s22 - s12 * s12
    rss_u = syc - ((s1y * s22 - s2y * s12) * s1y + (s2y * s11 - s1y * s12) * s2y) / det
    rss_r = syc - s1y * s1y / s11
    fstat = (rss_r - rss_u) * (n - 3) / rss_u
    p = 2 * normal_sf(F.sqrt(F.greatest(fstat, F.lit(0.0))))
    return s.select(
        n.cast("bigint").alias("n_days"),
        ratio(fstat).alias("f_stat"),
        ratio(p).alias("p_value"),
        (p < GRANGER_ALPHA).cast("bigint").alias("causal_flag"),
    )


@query(
    "ds_domain_reweight",
    oracle=f"""
    WITH t AS (SELECT source, {DUCK_TOKENS} AS toks FROM documents),
    tk AS (SELECT source, unnest(toks) AS term FROM t),
    sc AS (SELECT source, term, CAST(COUNT(*) AS DOUBLE) AS c
           FROM tk GROUP BY 1, 2),
    u AS (SELECT term, SUM(c) AS cu FROM sc GROUP BY 1),
    tot AS (SELECT SUM(cu) AS nn FROM u),
    s AS (SELECT sc.source, SUM(sc.c) AS nt,
                 SUM(sc.c * (-ln(u.cu / tot.nn))) AS h
          FROM sc JOIN u ON sc.term = u.term CROSS JOIN tot GROUP BY 1),
    g AS (SELECT SUM(nt) AS gn, SUM(h) AS gh FROM s),
    x AS (SELECT s.source, s.nt, s.h / s.nt AS nll,
                 s.h / s.nt - g.gh / g.gn AS excess,
                 (s.nt / g.gn) * EXP({DRW_ETA} * (s.h / s.nt - g.gh / g.gn))
                   AS raw
          FROM s CROSS JOIN g),
    z AS (SELECT SUM(raw) AS zz FROM x)
    SELECT x.source, CAST(x.nt AS BIGINT) AS n_tokens,
           FLOOR(x.nll * 10000 + 0.5) / 10000 AS nll,
           FLOOR(x.excess * 10000 + 0.5) / 10000 AS excess,
           FLOOR(x.raw / z.zz * 10000 + 0.5) / 10000 AS weight
    FROM x CROSS JOIN z
    """,
)
def ds_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting: each source's mean token NLL
    under the corpus unigram LM, its excess over the corpus-wide mean,
    and the reweighted mixture w ∝ share · exp(η·excess) (η={eta}) —
    domains the reference model finds surprising get upsampled, the
    over-represented easy ones shrink.

    Scale: per-(source, term) counts are the one vocab-sized shuffle;
    the unigram LM joins on term (never materialized to the driver),
    and everything after the |sources|-row rollup is broadcast
    arithmetic."""
    docs = cat(spark, sf_dir)["documents"]
    sc = (
        docs.select("source", F.explode(tokens()).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    u = sc.groupBy("term").agg(F.sum("c").alias("cu"))
    tot = u.agg(F.sum("cu").alias("nn"))
    s = (
        sc.join(u, "term")
        .join(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.sum("c").alias("nt"),
            F.sum(F.col("c") * (-F.log(F.col("cu") / F.col("nn")))).alias("h"),
        )
        # |sources| rows read by 3 plan branches (g, x, z) — without the
        # checkpoint each branch replays the vocab join (24 exchanges)
        .localCheckpoint()
    )
    g = s.agg(F.sum("nt").alias("gn"), F.sum("h").alias("gh"))
    nll = F.col("h") / F.col("nt")
    excess = nll - F.col("gh") / F.col("gn")
    raw = (F.col("nt") / F.col("gn")) * F.exp(DRW_ETA * excess)
    x = s.join(F.broadcast(g)).select(
        "source",
        F.col("nt").cast("bigint").alias("n_tokens"),
        ratio(nll).alias("nll"),
        ratio(excess).alias("excess"),
        raw.alias("raw"),
    )
    z = x.agg(F.sum("raw").alias("zz"))
    return x.join(F.broadcast(z)).select(
        "source",
        "n_tokens",
        "nll",
        "excess",
        ratio(F.col("raw") / F.col("zz")).alias("weight"),
    )


ds_domain_reweight.__doc__ = ds_domain_reweight.__doc__.format(eta=DRW_ETA)


def iso_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed (bin, n, n_pos) histogram of the sigmoid scorer vs
    the binary label — the sufficient statistics PAV pools."""
    emb = cat(spark, sf_dir)["embeddings"]
    prob = 1.0 / (1.0 + F.exp(-F.element_at("embedding", 1).cast("double")))
    return (
        emb.select(
            F.least(
                F.floor(prob * ISO_BINS).cast("int"), F.lit(ISO_BINS - 1)
            ).alias("bin"),
            (F.col("label") < 5).cast("int").alias("pos"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("n_pos"),
        )
    )


@query(
    "ml_isotonic_calibration",
    # Real oracle: PAV as a one-action-per-step recursive CTE — each
    # step either merges the top two pools (when the last pool's rate
    # undercuts its neighbor, the same integer cross-multiplication
    # test) or pushes the next bin; the pool stack rides as four
    # parallel lists. At most 2·bins steps, and the run ends when all
    # bins are pushed and no violation remains.
    oracle=f"""
    WITH RECURSIVE bins AS (
      SELECT LEAST(CAST(FLOOR(1.0 / (1.0 + EXP(-CAST(embedding[1] AS DOUBLE)))
                         * {ISO_BINS}) AS INT),
                   {ISO_BINS} - 1) AS bin,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CASE WHEN label < 5 THEN 1 ELSE 0 END) AS DOUBLE)
               AS n_pos
      FROM embeddings GROUP BY 1),
    bl AS (SELECT list(bin ORDER BY bin) AS b,
                  list(n ORDER BY bin) AS n,
                  list(n_pos ORDER BY bin) AS p,
                  COUNT(*) AS nb
           FROM bins),
    pav AS (
      SELECT 0 AS st, 0 AS used,
             CAST([] AS INT[]) AS los, CAST([] AS INT[]) AS his,
             CAST([] AS DOUBLE[]) AS ns, CAST([] AS DOUBLE[]) AS ps
      UNION ALL
      SELECT st + 1,
             CASE WHEN q.viol THEN q.used ELSE q.used + 1 END,
             CASE WHEN q.viol
                  THEN list_append(q.los[1:q.ln - 2], q.los[q.ln - 1])
                  ELSE list_append(q.los, q.b[q.used + 1]) END,
             CASE WHEN q.viol
                  THEN list_append(q.his[1:q.ln - 2], q.his[q.ln])
                  ELSE list_append(q.his, q.b[q.used + 1]) END,
             CASE WHEN q.viol
                  THEN list_append(q.ns[1:q.ln - 2],
                                   q.ns[q.ln - 1] + q.ns[q.ln])
                  ELSE list_append(q.ns, q.n[q.used + 1]) END,
             CASE WHEN q.viol
                  THEN list_append(q.ps[1:q.ln - 2],
                                   q.ps[q.ln - 1] + q.ps[q.ln])
                  ELSE list_append(q.ps, q.p[q.used + 1]) END
      FROM (SELECT v.*, l.b, l.n, l.p, l.nb, len(v.los) AS ln,
                   len(v.los) >= 2
                   AND v.ps[len(v.los)] * v.ns[len(v.los) - 1]
                       < v.ps[len(v.los) - 1] * v.ns[len(v.los)] AS viol
            FROM pav v CROSS JOIN bl l) q
      WHERE q.viol OR q.used < q.nb
    ),
    fin AS (SELECT los, his, ns, ps FROM pav
            ORDER BY st DESC LIMIT 1),
    pools AS (SELECT f.los[i] AS lo, f.his[i] AS hi, f.ps[i] / f.ns[i] AS rate
              FROM fin f CROSS JOIN
                   (SELECT unnest(generate_series(1, {ISO_BINS})) AS i) g
              WHERE i <= len(f.los))
    SELECT b.bin, CAST(b.n AS BIGINT) AS n,
           FLOOR(b.n_pos / b.n * 10000 + 0.5) / 10000 AS rate_raw,
           FLOOR(po.rate * 10000 + 0.5) / 10000 AS rate_iso
    FROM bins b JOIN pools po ON b.bin BETWEEN po.lo AND po.hi
    """,
)
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of the sigmoid scorer: Spark reduces
    the corpus to {b} (bin, n, n_pos) sufficient statistics, the
    pool-adjacent-violators merge runs on those {b} rows in the driver
    (O(bins), model-sized — the same contract as ml_kmeans' centroid
    step), and the output maps each bin to its raw vs calibrated rate.

    Scale: one {b}-group shuffle no matter the data size; PAV never
    touches row-level data. The calibrated table broadcast-joins onto
    scores at serving time."""
    rows = sorted(iso_bins(spark, sf_dir).collect(), key=lambda r: r["bin"])
    # PAV: merge adjacent pools while a later pool's rate < earlier's
    pools = []  # [bin_lo, bin_hi, n, pos]
    for r in rows:
        pools.append([r["bin"], r["bin"], r["n"], r["n_pos"]])
        while len(pools) >= 2 and (
            pools[-1][3] * pools[-2][2] < pools[-2][3] * pools[-1][2]
        ):
            b = pools.pop()
            a = pools.pop()
            pools.append([a[0], b[1], a[2] + b[2], a[3] + b[3]])
    iso = {}
    for lo, hi, n, pos in pools:
        for bn in range(lo, hi + 1):
            iso[bn] = pos / n
    import math

    def r4(x: float) -> float:
        return math.floor(x * 10000 + 0.5) / 10000

    out = [
        (r["bin"], int(r["n"]), r4(r["n_pos"] / r["n"]), r4(iso[r["bin"]]))
        for r in rows
    ]
    return spark.createDataFrame(
        out, "bin int, n long, rate_raw double, rate_iso double"
    ).orderBy("bin")


ml_isotonic_calibration.__doc__ = ml_isotonic_calibration.__doc__.format(
    b=ISO_BINS
)


def sssp_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized co-purchase edges with distance 1/w (stronger ties
    are closer)."""
    from mister_spark.operators.extras47 import _copurchase_edges

    e = _copurchase_edges(spark, sf_dir)
    d = e.select(
        F.col("p1").alias("src"),
        F.col("p2").alias("dst"),
        (1.0 / F.col("w")).alias("d"),
    )
    return d.unionAll(
        d.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "d"
        )
    )


@query(
    "graph_sssp_weighted",
    # Real oracle: bounded Bellman-Ford as a recursive CTE — per round,
    # min over (keep current dist) ∪ (relax every edge). Path sums
    # accumulate left-to-right identically in both engines, so the
    # min-selected distances are bit-exact before the final rounding.
    oracle=f"""
    WITH RECURSIVE {_DUCK_BASKETS},
    ce AS (SELECT p1, p2, CAST(COUNT(*) AS DOUBLE) AS w
           FROM (SELECT x.l_orderkey, x.l_partkey AS p1, y.l_partkey AS p2
                 FROM bk x JOIN bk y ON x.l_orderkey = y.l_orderkey
                                    AND x.l_partkey < y.l_partkey) p
           GROUP BY 1, 2 HAVING COUNT(*) >= {COP_SUPPORT}),
    e AS (SELECT src, dst, 1.0 / w AS d FROM (
            SELECT p1 AS src, p2 AS dst, w FROM ce
            UNION ALL SELECT p2, p1, w FROM ce)),
    bf AS (
      SELECT 0 AS it, (SELECT MIN(src) FROM e) AS node,
             CAST(0.0 AS DOUBLE) AS dist
      UNION ALL
      SELECT it + 1, node, MIN(nd) FROM (
        SELECT b.it, b.node, b.dist AS nd FROM bf b
        UNION ALL
        SELECT b.it, e.dst, b.dist + e.d
        FROM bf b JOIN e ON e.src = b.node) u
      WHERE it < {SSSP_ROUNDS}
      GROUP BY it, node
    )
    SELECT node, FLOOR(dist * 1e6 + 0.5) / 1e6 AS dist
    FROM bf WHERE it = {SSSP_ROUNDS}
    ORDER BY 2, node LIMIT {SSSP_TOP}
    """,
)
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths on the co-purchase graph
    (edge length 1/co-count): {r} Bellman-Ford relaxation rounds from
    the smallest part id, reporting the {top} nearest parts. Distances
    after round k are exact over paths of ≤ k edges — the bounded-hop
    contract that makes the iteration deterministic and testable.

    Scale: each round is one edges⋈distances equi-join plus a min-agg
    on dst — both partition by node id; `localCheckpoint` truncates
    lineage per round exactly like mr_pagerank. No driver state beyond
    the 1-row source id."""
    e = sssp_edges(spark, sf_dir).localCheckpoint()
    src = e.agg(F.min("src").alias("s")).collect()[0]["s"]
    dist = e.sparkSession.createDataFrame(
        [(src, 0.0)], "node long, dist double"
    )
    for _ in range(SSSP_ROUNDS):
        relaxed = (
            e.join(dist, e["src"] == dist["node"])
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("d")).alias("nd"))
        )
        dist = (
            dist.select("node", F.col("dist").alias("nd"))
            .unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("nd").alias("dist"))
            .localCheckpoint()
        )
    return (
        dist.select("node", rnd(F.col("dist"), 6).alias("dist"))
        .orderBy("dist", "node")
        .limit(SSSP_TOP)
    )


graph_sssp_weighted.__doc__ = graph_sssp_weighted.__doc__.format(
    r=SSSP_ROUNDS, top=SSSP_TOP
)
