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


@query("ev_kleinberg_bursts")  # Viterbi DP on the day series → rows-only
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
    out = [
        (days[i], ys[i], states[i], round(lam0, 4), round(lam1, 4))
        for i in range(n)
    ]
    return spark.createDataFrame(
        out, "day long, errors double, burst long, lam0 double, lam1 double"
    )


ev_kleinberg_bursts.__doc__ = ev_kleinberg_bursts.__doc__.format(s=BURST_S)


@query("ml_dbscan_grid")  # iterative label propagation → rows-only
def ml_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the synthesized customer points (eps = {r}°,
    minPts = {m}): neighbor counts and the core-core edge list both
    come from the grid-cell bucket join (never all-pairs); clusters
    are connected components of the core graph via hash-to-min label
    propagation; border points adopt the min neighboring core label;
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
        lab = (
            lab.join(m, "k", "left")
            .select(
                "k",
                F.least(
                    F.col("lab"), F.coalesce("nlab", F.col("lab"))
                ).alias("lab"),
            )
            .localCheckpoint()
        )
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
