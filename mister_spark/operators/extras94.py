"""Wave 94: burst-state decoding, density clustering, inequality
curves, and weighted association.

ev_kleinberg_bursts runs Kleinberg's two-state burst automaton over
the daily error-count series (Viterbi between a base and an elevated
Poisson rate with a switching cost) — bursts as STATE, not as
single-day threshold crossings; ml_dbscan_grid is DBSCAN with
grid-cell candidate generation — density clustering whose neighbor
search is the spatial bucket join, never all-pairs; stat_lorenz_curve
is the decile Lorenz curve under the two-phase ranking machinery (the
curve stat_gini summarizes to one number); stat_weighted_corr is
quantity-weighted Pearson correlation — rows vote by volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.hashing import FP_MOD, FP_MUL
from mister_spark.functions.ranks import bucketed_cumsum, global_rank
from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras93 import GRID_DEG, RADIUS, _points
from mister_spark.registry import query

BURST_S = 3.0  # elevated-rate multiplier
BURST_GAMMA = 1.0  # state-switch cost weight
DBSCAN_MINPTS = 3
DBSCAN_EPS = 1.0  # own eps: points live in a dense 5x5-degree patch
DBSCAN_ITERS = 8
LORENZ_QS = [i / 10 for i in range(1, 11)]


@query(
    "ev_kleinberg_bursts",
    # Real oracle: the 2-state Viterbi DP is two recursive CTEs — a
    # forward pass carrying (cost0, cost1) plus the back-pointers in a
    # single row per step (sequential float arithmetic, identical
    # order on both engines, so costs are bit-exact), and a backward
    # pass walking the stored pointers from the argmin final state.
    # Tie rules mirror Python's tuple-min: stay-in-state wins for n0,
    # the from-0 path wins for n1, and state 0 wins the final argmin.
    oracle=f"""
    WITH RECURSIVE d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS day,
                                CAST(COUNT(*) AS DOUBLE) AS n
                         FROM events WHERE event_type = 'error'
                         GROUP BY 1),
    idx AS (SELECT day, n, ROW_NUMBER() OVER (ORDER BY day) AS i FROM d),
    meta AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                    SUM(n) / COUNT(*) AS lam0,
                    {BURST_S} * (SUM(n) / COUNT(*)) AS lam1,
                    {BURST_GAMMA} * LN(GREATEST(COUNT(*), 2)) AS sw
             FROM idx),
    fwd AS (
      SELECT 0 AS i, CAST(0.0 AS DOUBLE) AS c0, m.sw AS c1,
             0 AS b0, 0 AS b1
      FROM meta m
      UNION ALL
      SELECT f.i + 1,
             CASE WHEN f.c0 <= f.c1 + m.sw THEN f.c0
                  ELSE f.c1 + m.sw END
               + (m.lam0 - x.n * LN(m.lam0)),
             CASE WHEN f.c0 + m.sw <= f.c1 THEN f.c0 + m.sw
                  ELSE f.c1 END
               + (m.lam1 - x.n * LN(m.lam1)),
             CASE WHEN f.c0 <= f.c1 + m.sw THEN 0 ELSE 1 END,
             CASE WHEN f.c0 + m.sw <= f.c1 THEN 0 ELSE 1 END
      FROM fwd f
      CROSS JOIN meta m
      JOIN idx x ON x.i = f.i + 1
    ),
    bwd AS (
      SELECT m.nd + 1 AS i,
             CASE WHEN f.c0 <= f.c1 THEN 0 ELSE 1 END AS st
      FROM fwd f CROSS JOIN meta m WHERE f.i = m.nd
      UNION ALL
      SELECT b.i - 1,
             CASE WHEN b.st = 0 THEN f.b0 ELSE f.b1 END
      FROM bwd b JOIN fwd f ON f.i = b.i - 1
      WHERE b.i > 1
    )
    SELECT CAST(x.day AS BIGINT) AS day, x.n AS errors,
           CAST(b.st AS BIGINT) AS burst,
           FLOOR(m.lam0 * 10000 + 0.5) / 10000 AS lam0,
           FLOOR(m.lam1 * 10000 + 0.5) / 10000 AS lam1
    FROM idx x
    JOIN bwd b ON b.i = x.i + 1
    CROSS JOIN meta m
    """,
)
def ev_kleinberg_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg-style burst detection on daily 'error' counts: a
    two-state automaton (base rate λ₀ = corpus mean, burst rate
    λ₁ = {s}·λ₀) decoded by Viterbi with Poisson emissions and a
    γ·ln(n) switching cost — so a burst is a PERSISTENT elevated-rate
    state, not any single loud day, and brief dips inside a burst
    don't fragment it. Emits each day with its decoded state.

    Scale: the rollup is one partial-agg shuffle; the DP runs on the
    collected |days| series (calendar-bounded — the theta/DTW
    precedent) with O(days·2) state."""
    import math

    ev = cat(spark, sf_dir)["events"]
    rows = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias(
                "day"
            )
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
        .orderBy("day")
        .collect()
    )
    days = [int(r["day"]) for r in rows]
    ys = [float(r["n"]) for r in rows]
    n = len(ys)
    lam0 = sum(ys) / n
    lam1 = BURST_S * lam0
    switch = BURST_GAMMA * math.log(max(n, 2))

    def nll(lam: float, k: float) -> float:
        return lam - k * math.log(lam)  # Poisson NLL up to k! (shared)

    INF = float("inf")
    cost = [0.0, switch]
    back: list[tuple[int, int]] = []
    for k in ys:
        c0 = nll(lam0, k)
        c1 = nll(lam1, k)
        n0 = min((cost[0], 0), (cost[1] + switch, 1))
        n1 = min((cost[1], 1), (cost[0] + switch, 0))
        back.append((n0[1], n1[1]))
        cost = [n0[0] + c0, n1[0] + c1]
    state = 0 if cost[0] <= cost[1] else 1
    states = [0] * n
    for i in range(n - 1, -1, -1):
        states[i] = state
        state = back[i][state]
    # cross-engine floor rounding (common.rnd's rule) for oracle parity
    rl0 = math.floor(lam0 * 10000 + 0.5) / 10000
    rl1 = math.floor(lam1 * 10000 + 0.5) / 10000
    out = [(days[i], ys[i], states[i], rl0, rl1) for i in range(n)]
    return spark.createDataFrame(
        out, "day long, errors double, burst long, lam0 double, lam1 double"
    )


ev_kleinberg_bursts.__doc__ = ev_kleinberg_bursts.__doc__.format(s=BURST_S)


@query(
    "ml_dbscan_grid",
    # Real oracle: the synthetic coordinates are integer-arithmetic
    # deterministic, the eps-neighbor search is the same 3×3 grid-cell
    # join, core/border/noise classification is plain SQL, and the
    # core-graph components come from transitive-closure min-label
    # reachability (the converged fixpoint of the Spark loop's
    # propagation rounds). Integer output.
    oracle=f"""
    WITH RECURSIVE pts AS (
      SELECT c_custkey AS k,
             ((((c_custkey * {FP_MUL} + 7) % {FP_MOD}) % 18000 / 100.0 - 90)
              % 5) + 5 AS lat,
             ((((c_custkey * {FP_MUL} + 13) % {FP_MOD}) % 36000 / 100.0 - 180)
              % 5) + 5 AS lon
      FROM customer),
    cells AS (SELECT k, lat, lon,
                     CAST(FLOOR(lat / {DBSCAN_EPS}) AS BIGINT) AS cx,
                     CAST(FLOOR(lon / {DBSCAN_EPS}) AS BIGINT) AS cy
              FROM pts),
    nbr AS (SELECT a.k AS ka, b.k AS kb
            FROM cells a
            JOIN (SELECT * FROM (VALUES (-1), (0), (1)) t(dx)) dxs ON TRUE
            JOIN (SELECT * FROM (VALUES (-1), (0), (1)) t(dy)) dys ON TRUE
            JOIN cells b ON b.cx = a.cx + dxs.dx AND b.cy = a.cy + dys.dy
            WHERE a.k <> b.k
              AND (a.lat - b.lat) * (a.lat - b.lat)
                  + (a.lon - b.lon) * (a.lon - b.lon)
                  <= {DBSCAN_EPS} * {DBSCAN_EPS}),
    core AS (SELECT ka AS k FROM nbr GROUP BY ka
             HAVING COUNT(*) >= {DBSCAN_MINPTS}),
    ce AS (SELECT n.ka, n.kb FROM nbr n
           JOIN core c1 ON c1.k = n.ka
           JOIN core c2 ON c2.k = n.kb),
    reach AS (
      SELECT k AS node, k AS lab FROM core
      UNION
      SELECT s.kb, r.lab FROM reach r JOIN ce s ON s.ka = r.node
    ),
    lbl AS (SELECT node AS k, MIN(lab) AS lab FROM reach GROUP BY node),
    border AS (SELECT n.ka AS k, MIN(l.lab) AS lab
               FROM nbr n
               JOIN core ck ON ck.k = n.kb
               JOIN lbl l ON l.k = n.kb
               WHERE NOT EXISTS (SELECT 1 FROM core c WHERE c.k = n.ka)
               GROUP BY n.ka),
    assigned AS (SELECT k, lab FROM lbl
                 UNION ALL SELECT k, lab FROM border),
    sizes AS (SELECT CAST(lab AS BIGINT) AS cluster,
                     CAST(COUNT(*) AS BIGINT) AS size
              FROM assigned GROUP BY 1
              ORDER BY size DESC, cluster LIMIT 10)
    SELECT cluster, size FROM sizes
    UNION ALL
    SELECT CAST(-1 AS BIGINT),
           (SELECT COUNT(*) FROM pts) - (SELECT COUNT(*) FROM assigned)
    """,
)
def ml_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the synthesized customer points (eps = {r}°,
    minPts = {m}): neighbor counts and the core-core edge list both
    come from the grid-cell bucket join (never all-pairs); clusters
    are connected components of the core graph via hash-to-min label
    propagation with pointer jumping (O(log n) rounds to convergence,
    early-exit on a zero changed count — the graph_components
    discipline); border points adopt the min neighboring core label;
    everything else is noise. Emits the 10 largest clusters plus the
    noise row (cluster = −1).

    Scale: the neighbor search is the j_spatial_grid_join plan (one
    cell-key shuffle, ×9 map-side expansion); each propagation round
    is one edge join + min-aggregate with localCheckpoint lineage
    cuts (the components precedent)."""
    # remap the synthesized coordinates into a dense 5x5-degree patch so
    # density clustering has density to find (the global-sprinkle space
    # of j_spatial_grid_join is near-empty at eps scale)
    pts = _points(spark, sf_dir).select(
        F.col("c_custkey").alias("k"),
        (F.col("lat") % 5 + 5).alias("lat"),
        (F.col("lon") % 5 + 5).alias("lon"),
    ).localCheckpoint()
    cells = pts.select(
        "k",
        "lat",
        "lon",
        F.floor(F.col("lat") / DBSCAN_EPS).cast("bigint").alias("cx"),
        F.floor(F.col("lon") / DBSCAN_EPS).cast("bigint").alias("cy"),
    )
    a = cells.select(
        F.col("k").alias("ka"), F.col("lat").alias("la"),
        F.col("lon").alias("oa"), "cx", "cy",
    ).withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))) \
     .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))) \
     .select(
        "ka", "la", "oa",
        (F.col("cx") + F.col("dx")).alias("jx"),
        (F.col("cy") + F.col("dy")).alias("jy"),
    )
    b = cells.select(
        F.col("k").alias("kb"), F.col("lat").alias("lb"),
        F.col("lon").alias("ob"),
        F.col("cx").alias("jx"), F.col("cy").alias("jy"),
    )
    dist2 = (F.col("la") - F.col("lb")) * (F.col("la") - F.col("lb")) + (
        F.col("oa") - F.col("ob")
    ) * (F.col("oa") - F.col("ob"))
    nbr = (
        a.join(b, ["jx", "jy"])
        .filter((F.col("ka") != F.col("kb")) & (dist2 <= DBSCAN_EPS**2))
        .select("ka", "kb")
        .localCheckpoint()
    )
    deg = nbr.groupBy("ka").agg(F.count(F.lit(1)).alias("deg"))
    core = deg.filter(F.col("deg") >= DBSCAN_MINPTS).select(
        F.col("ka").alias("k")
    ).localCheckpoint()
    cc_edges = (
        nbr.join(core.select(F.col("k").alias("ka")), "ka")
        .join(core.select(F.col("k").alias("kb")), "kb")
        .select("ka", "kb")
        .localCheckpoint()
    )
    lab = core.withColumn("lab", F.col("k"))
    for _ in range(DBSCAN_ITERS):
        m = (
            cc_edges.join(lab.withColumnRenamed("k", "ka"), "ka")
            .groupBy(F.col("kb").alias("k"))
            .agg(F.min("lab").alias("nlab"))
        )
        upd = lab.join(m, "k", "left").select(
            "k",
            F.least(
                F.col("lab"), F.coalesce("nlab", F.col("lab"))
            ).alias("lab"),
        )
        # pointer jumping (follow my label's label) halves chain depth
        # per round, so convergence is O(log n) rounds, not O(diameter)
        # — without it a grid-shaped core component's min label cannot
        # cross the component inside the round budget and DBSCAN
        # reports one dense cluster as several (caught by the
        # transitive-closure oracle)
        parent = upd.select(
            F.col("k").alias("lab"), F.col("lab").alias("plab")
        )
        jumped = (
            upd.join(parent, "lab", "left")
            .select(
                "k", F.coalesce(F.col("plab"), F.col("lab")).alias("lab")
            )
            .localCheckpoint()
        )
        changed = (
            jumped.join(lab.withColumnRenamed("lab", "old"), "k")
            .filter(F.col("lab") != F.col("old"))
            .count()
        )
        lab = jumped
        if changed == 0:
            break
    border = (
        nbr.join(core.select(F.col("k").alias("kb")), "kb")
        .join(
            core.withColumnRenamed("k", "ka"), "ka", "left_anti"
        )
        .join(lab.withColumnRenamed("k", "kb"), "kb")
        .groupBy(F.col("ka").alias("k"))
        .agg(F.min("lab").alias("lab"))
    )
    assigned = lab.unionByName(border)
    sizes = (
        assigned.groupBy("lab")
        .agg(F.count(F.lit(1)).cast("bigint").alias("size"))
        .orderBy(F.col("size").desc(), "lab")
        .limit(10)
        .select(F.col("lab").alias("cluster"), "size")
    )
    n_total = pts.count()
    n_assigned = assigned.count()
    noise = spark.createDataFrame(
        [(-1, int(n_total - n_assigned))], "cluster long, size bigint"
    )
    return sizes.unionByName(noise)


ml_dbscan_grid.__doc__ = ml_dbscan_grid.__doc__.format(
    r=DBSCAN_EPS, m=DBSCAN_MINPTS
)


@query(
    "stat_lorenz_curve",
    oracle=f"""
    WITH sp AS (SELECT o_custkey,
                       CAST(FLOOR(SUM(o_totalprice) * 100 + 0.5) AS BIGINT)
                         AS xc
                FROM orders GROUP BY 1),
    r AS (SELECT xc, ROW_NUMBER() OVER (ORDER BY xc, o_custkey) AS i FROM sp),
    t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(xc) AS tot FROM sp),
    c AS (SELECT i, SUM(xc) OVER (ORDER BY i) AS cum FROM r),
    q AS (SELECT * FROM (VALUES {", ".join(f"({q})" for q in LORENZ_QS)})
          AS v(q)),
    pick AS (SELECT q.q, MAX(c.cum) AS cum
             FROM q, c, t WHERE c.i <= CEIL(q.q * t.n) GROUP BY q.q)
    SELECT FLOOR(pick.q * 100 + 0.5) / 100 AS pop_share,
           FLOOR(CAST(pick.cum AS DOUBLE) / t.tot * 10000 + 0.5) / 10000
             AS spend_share
    FROM pick, t
    """,
)
def stat_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer spend at population deciles: sort
    customers by spend ascending, report the cumulative spend share
    held by the bottom q of customers — the full inequality curve that
    stat_gini integrates to one number. Spend in integer cents so the
    prefix sums are exact.

    Scale: ranking is `global_rank` (two-phase range sort) and the
    cumulative spend is `bucketed_cumsum` — no single-task window;
    the 10 decile probes are a broadcast join against the prefix
    frame."""
    sp = (
        cat(spark, sf_dir)["orders"]
        .groupBy("o_custkey")
        .agg(
            F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("xc")
        )
    )
    r = global_rank(sp, "xc", "o_custkey", rank_col="i")
    t = sp.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("xc").alias("tot"),
    )
    c = bucketed_cumsum(r.select("i", "xc"), "i", {"cum": F.col("xc")})
    qs = spark.createDataFrame([(q,) for q in LORENZ_QS], "q double")
    pick = (
        c.crossJoin(F.broadcast(qs))
        .crossJoin(F.broadcast(t))
        .filter(F.col("i") <= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q", "tot")
        .agg(F.max("cum").alias("cum"))
    )
    return pick.select(
        (F.floor(F.col("q") * 100 + 0.5) / 100).alias("pop_share"),
        ratio(F.col("cum").cast("double") / F.col("tot")).alias(
            "spend_share"
        ),
    )


@query(
    "stat_weighted_corr",
    oracle="""
    WITH d AS (SELECT l_extendedprice AS x, l_discount AS y,
                      l_quantity AS w
               FROM lineitem),
    m AS (SELECT SUM(w) AS sw, SUM(w * x) / SUM(w) AS mx,
                 SUM(w * y) / SUM(w) AS my
          FROM d)
    SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n,
           FLOOR(SUM(w * (x - m.mx) * (y - m.my))
                 / SQRT(SUM(w * (x - m.mx) * (x - m.mx))
                        * SUM(w * (y - m.my) * (y - m.my)))
                 * 10000 + 0.5) / 10000 AS weighted_corr
    FROM d, m GROUP BY m.sw
    """,
)
def stat_weighted_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted Pearson correlation between extended price
    and discount: every row votes by its quantity, so a 50-unit line
    moves the estimate 50× more than a single-unit one — the
    correlation a revenue model should actually use when rows
    represent different volumes.

    Scale: one pass for the weighted means (broadcast back), one for
    the weighted moments — two aggregates, no shuffle beyond them."""
    d = cat(spark, sf_dir)["lineitem"].select(
        F.col("l_extendedprice").alias("x"),
        F.col("l_discount").alias("y"),
        F.col("l_quantity").alias("w"),
    )
    m = d.agg(
        (F.sum(F.col("w") * F.col("x")) / F.sum("w")).alias("mx"),
        (F.sum(F.col("w") * F.col("y")) / F.sum("w")).alias("my"),
    )
    j = d.crossJoin(F.broadcast(m))
    xc = F.col("x") - F.col("mx")
    yc = F.col("y") - F.col("my")
    w = F.col("w")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        ratio(
            F.sum(w * xc * yc)
            / F.sqrt(F.sum(w * xc * xc) * F.sum(w * yc * yc))
        ).alias("weighted_corr"),
    )
