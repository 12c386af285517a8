"""Wave 264: local community detection and investment-rate analytics.

- graph_ppr_sweep_cut: the Andersen–Chung–Lang local clustering
  recipe on top of the existing personalized-PageRank machinery —
  rank nodes by pr/degree, sweep prefixes S_1 ⊂ S_2 ⊂ …, and report
  each prefix's conductance φ(S) = cut(S)/min(vol(S), vol(V∖S)). The
  minimum of the sweep curve IS the seed's local community; PPR alone
  ranks relatedness but draws no boundary.
- fin_irr: per-market-segment internal rate of return on an
  acquisition-style cashflow (month-0 outlay = 1.5× first-year
  revenue, monthly revenue inflows after), solved by 48 bisection
  steps. Discounting is HORNER-FORM — NPV folds the month-descending
  cashflow list as acc·x + cf with x = 1/(1+r) — because pow() is not
  correctly-rounded IEEE and a pow-based NPV could bisect differently
  per engine; the fold is the same +,·,/ sequence in both.

Exactness: the PPR iterates reuse graph_ppr's recursion (already
bit-replayed at 1e-6); sweep arithmetic is integer degrees/edge
counts; IRR bisection is identical double sequences (Horner fold,
(lo+hi)/2, same branch rule), with outputs on the shared grids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.operators.extras47 import DUCK_COPURCHASE_SYM, _copurchase_edges
from mister_spark.operators.extras87 import PPR_ALPHA, PPR_ITERS
from mister_spark.registry import query

SWEEP_K = 30  # sweep prefix cap (the local cluster size budget)
IRR_ITERS = 48  # bisection steps: interval 1.5 / 2^48 — grid-exact
IRR_LO = -0.5  # monthly-rate bracket
IRR_HI = 1.0
IRR_OUTLAY = 1.5  # acquisition outlay = this x first-year revenue


@query(
    "graph_ppr_sweep_cut",
    oracle=f"""
    WITH RECURSIVE {DUCK_COPURCHASE_SYM},
    nodes AS (SELECT DISTINCT p1 AS node FROM csym),
    deg AS (SELECT p1 AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM csym GROUP BY p1),
    seed AS (SELECT MIN(node) AS s FROM nodes),
    ppr AS (
      SELECT 0 AS it, n.node,
             CAST(CASE WHEN n.node = sd.s THEN 1.0 ELSE 0.0 END
                  AS DOUBLE) AS pr
      FROM nodes n CROSS JOIN seed sd
      UNION ALL
      SELECT ci.it + 1, sp.node,
             (1.0 - {PPR_ALPHA})
             * (sp.inflow
                + CASE WHEN sp.node = sd.s
                       THEN 1.0 - SUM(sp.inflow) OVER () ELSE 0.0 END)
             + CASE WHEN sp.node = sd.s THEN {PPR_ALPHA} ELSE 0.0 END
      FROM (
        SELECT n.node, COALESCE(c.inflow, 0.0) AS inflow
        FROM nodes n
        LEFT JOIN (SELECT e.p2 AS node, SUM(p.pr / d.d) AS inflow
                   FROM ppr p
                   JOIN deg d ON d.node = p.node
                   JOIN csym e ON e.p1 = p.node
                   GROUP BY e.p2) c ON c.node = n.node
      ) sp
      CROSS JOIN seed sd
      CROSS JOIN (SELECT DISTINCT it FROM ppr) ci
      WHERE ci.it < {PPR_ITERS}
    ),
    rk AS (SELECT p.node, d.d,
                  ROW_NUMBER() OVER (ORDER BY p.pr / d.d DESC, p.node)
                    AS k
           FROM ppr p JOIN deg d ON d.node = p.node
           WHERE p.it = {PPR_ITERS} AND p.pr > 0),
    tot AS (SELECT CAST(SUM(d) AS BIGINT) AS vol_total FROM deg),
    sw AS (SELECT node, k, d,
                  CAST(SUM(d) OVER (ORDER BY k
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumvol
           FROM rk WHERE k <= {SWEEP_K}),
    em AS (SELECT GREATEST(ra.k, rb.k) AS mk
           FROM csym e
           JOIN rk ra ON ra.node = e.p1
           JOIN rk rb ON rb.node = e.p2
           WHERE ra.k <= {SWEEP_K} AND rb.k <= {SWEEP_K}),
    eh AS (SELECT mk, CAST(COUNT(*) AS BIGINT) AS c FROM em GROUP BY mk),
    cur AS (SELECT sw.node, sw.k, sw.cumvol,
                   sw.cumvol
                   - CAST(COALESCE(SUM(eh.c) OVER (ORDER BY sw.k
                          ROWS UNBOUNDED PRECEDING), 0) AS BIGINT) AS cut
            FROM sw LEFT JOIN eh ON eh.mk = sw.k),
    phi AS (SELECT cur.node, cur.k, cur.cut, cur.cumvol,
                   CAST(cur.cut AS DOUBLE)
                   / LEAST(cur.cumvol, tot.vol_total - cur.cumvol)
                     AS ph
            FROM cur CROSS JOIN tot
            WHERE cur.cumvol < tot.vol_total)
    SELECT k, node, CAST(cut AS BIGINT) AS cut,
           CAST(cumvol AS BIGINT) AS vol,
           FLOOR(ph * 1000000 + 0.5) / 1000000 AS phi,
           CAST(CASE WHEN k = (SELECT MIN(k) FROM phi p2
                               WHERE p2.ph = (SELECT MIN(ph) FROM phi))
                     THEN 1 ELSE 0 END AS BIGINT) AS is_best
    FROM phi
    """,
)
def graph_ppr_sweep_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local community around the seed product via the PPR sweep cut
    (Andersen–Chung–Lang, public literature): run the same
    personalized-PageRank recursion as graph_ppr, rank nodes by
    pr/degree, and for each prefix S_k of the top-{k} sweep report
    cut(S_k), vol(S_k), conductance φ, and the argmin flag — the
    boundary where the random walk's probability mass stops leaking,
    i.e. the seed's community. This is the query behind
    'find this product's neighborhood' merchandising and fraud-ring
    expansion from a seed account.

    Scale: PPR is the audited edge-join loop (node-sized state,
    localCheckpoint per round); the sweep itself runs entirely on
    ≤ {k}-row frames — prefix volumes and internal-edge counts are
    two window cumsums over the max-rank histogram, never a per-pair
    enumeration."""
    e = _copurchase_edges(spark, sf_dir).select("p1", "p2")
    sym = (
        e.select(F.col("p1").alias("src"), F.col("p2").alias("dst"))
        .unionByName(
            e.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
        )
        .localCheckpoint()  # read by the loop (via wsym) AND the sweep's eh
    )
    deg = sym.groupBy(F.col("src").alias("dnode")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # degree-annotated edges, built once: the loop's scatter needs
    # pr(src)/deg(src) per edge — same per-row arithmetic as the old
    # r⋈deg⋈sym chain, one join fewer per iteration (guide §2.4)
    wsym = (
        sym.join(deg, sym.src == deg.dnode)
        .select("src", "dst", "deg")
        .localCheckpoint()
    )
    nodes = deg.select(F.col("dnode").alias("node")).localCheckpoint()
    seed = nodes.agg(F.min("node")).collect()[0][0]
    r = nodes.withColumn(
        "pr", F.when(F.col("node") == seed, 1.0).otherwise(0.0)
    ).localCheckpoint()
    for _ in range(PPR_ITERS):
        contrib = (
            r.join(wsym, r.node == wsym.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        # materialized ONCE per round: the mass readout and the next
        # iterate both read this checkpoint (the former shape executed
        # the whole join pipeline twice per iteration — guide §1.2)
        spread = (
            nodes.join(contrib, "node", "left")
            .select(
                "node", F.coalesce("inflow", F.lit(0.0)).alias("inflow")
            )
            .localCheckpoint()
        )
        mass = spread.agg(F.sum("inflow")).collect()[0][0] or 0.0
        dangling = 1.0 - float(mass)
        r = spread.select(
            "node",
            (
                (1 - PPR_ALPHA)
                * (
                    F.col("inflow")
                    + F.when(
                        F.col("node") == seed, F.lit(dangling)
                    ).otherwise(0.0)
                )
                + F.when(F.col("node") == seed, F.lit(PPR_ALPHA)).otherwise(
                    0.0
                )
            ).alias("pr"),
        )  # lazy projection over the checkpointed spread
    # top-K by score is a TakeOrdered merge (no global window over the
    # node frame); the rank window then runs on the ≤ K-row result
    rk = (
        r.filter(F.col("pr") > 0)
        .join(deg, r.node == deg.dnode)
        .select(
            "node",
            F.col("deg").alias("d"),
            (F.col("pr") / F.col("deg")).alias("score"),
        )
        .orderBy(F.col("score").desc(), "node")
        .limit(SWEEP_K)
        .withColumn(
            "k",
            F.row_number().over(W.orderBy(F.col("score").desc(), "node")),
        )
        .select("node", "d", "k")
        .localCheckpoint()  # model-sized (≤ SWEEP_K rows), read 3x
    )
    vol_total = deg.agg(F.sum("deg").cast("long")).collect()[0][0]
    sw = rk.withColumn(
        "cumvol",
        F.sum("d").over(W.orderBy("k").rowsBetween(W.unboundedPreceding, 0)),
    )
    ra = rk.select(F.col("node").alias("p1"), F.col("k").alias("ka"))
    rb = rk.select(F.col("node").alias("p2"), F.col("k").alias("kb"))
    eh = (
        sym.select(F.col("src").alias("p1"), F.col("dst").alias("p2"))
        .join(F.broadcast(ra), "p1")
        .join(F.broadcast(rb), "p2")
        .select(F.greatest("ka", "kb").alias("mk"))
        .groupBy("mk")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cur = (
        sw.join(eh, sw.k == eh.mk, "left")
        .withColumn(
            "cut",
            F.col("cumvol")
            - F.coalesce(
                F.sum("c").over(
                    W.orderBy("k").rowsBetween(W.unboundedPreceding, 0)
                ),
                F.lit(0),
            ),
        )
        .filter(F.col("cumvol") < vol_total)
        .withColumn(
            "ph",
            F.col("cut").cast("double")
            / F.least(F.col("cumvol"), F.lit(vol_total) - F.col("cumvol")),
        )
        .localCheckpoint()
    )
    best = cur.agg(F.min("ph").alias("mph"))
    bestk = (
        cur.join(F.broadcast(best), cur.ph == best.mph)
        .agg(F.min("k").alias("bk"))
    )
    return (
        cur.crossJoin(F.broadcast(bestk))
        .select(
            "k",
            "node",
            F.col("cut").cast("bigint").alias("cut"),
            F.col("cumvol").cast("bigint").alias("vol"),
            (F.floor(F.col("ph") * 1000000 + F.lit(0.5)) / 1000000).alias(
                "phi"
            ),
            (F.col("k") == F.col("bk")).cast("bigint").alias("is_best"),
        )
    )


graph_ppr_sweep_cut.__doc__ = graph_ppr_sweep_cut.__doc__.format(k=SWEEP_K)


_IRR_CF_SQL = f"""
    o AS (SELECT c.c_mktsegment AS segment,
                 (YEAR(o.o_orderdate) * 12 + MONTH(o.o_orderdate))
                 - (SELECT MIN(YEAR(o_orderdate) * 12 + MONTH(o_orderdate))
                    FROM orders) AS m,
                 CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    mm AS (SELECT CAST(MAX(m) AS BIGINT) AS mmax FROM o),
    grid AS (SELECT s.segment, g.m
             FROM (SELECT DISTINCT segment FROM o) s
             CROSS JOIN (SELECT unnest(generate_series(0,
                           (SELECT mmax FROM mm))) AS m) g),
    rev AS (SELECT g.segment, g.m,
                   CAST(COALESCE(SUM(o.cents), 0) AS BIGINT) AS cents
            FROM grid g LEFT JOIN o ON o.segment = g.segment AND o.m = g.m
            GROUP BY 1, 2),
    outlay AS (SELECT segment,
                      CAST(FLOOR({IRR_OUTLAY} * SUM(cents) + 0.5) AS BIGINT)
                        AS inv
               FROM rev WHERE m < 12 GROUP BY 1),
    cf AS (SELECT r.segment, r.m,
                  CAST(r.cents
                       - CASE WHEN r.m = 0 THEN ol.inv ELSE 0 END
                       AS DOUBLE) / 100 AS cf
           FROM rev r JOIN outlay ol ON ol.segment = r.segment),
    cfl AS (SELECT segment, LIST(cf ORDER BY m DESC) AS cfs,
                   CAST(COUNT(*) AS BIGINT) AS n_months
            FROM cf GROUP BY segment)
"""


@query(
    "fin_irr",
    oracle=f"""
    WITH RECURSIVE {_IRR_CF_SQL},
    bis AS (
      SELECT segment, 0 AS it, CAST({IRR_LO} AS DOUBLE) AS lo,
             CAST({IRR_HI} AS DOUBLE) AS hi
      FROM cfl
      UNION ALL
      SELECT b.segment, b.it + 1,
             CASE WHEN npv.v > 0 THEN (b.lo + b.hi) / 2 ELSE b.lo END,
             CASE WHEN npv.v > 0 THEN b.hi ELSE (b.lo + b.hi) / 2 END
      FROM bis b
      JOIN cfl ON cfl.segment = b.segment
      CROSS JOIN LATERAL (
        SELECT list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE), cfl.cfs),
                 (acc, c) -> acc * (1.0 / (1.0 + (b.lo + b.hi) / 2)) + c)
               AS v) npv
      WHERE b.it < {IRR_ITERS}
    ),
    irr AS (SELECT segment, (lo + hi) / 2 AS r
            FROM bis WHERE it = {IRR_ITERS})
    SELECT cfl.segment, cfl.n_months,
           FLOOR(ol.inv / 100.0 * 100 + 0.5) / 100 AS outlay,
           FLOOR(irr.r * 1000000 + 0.5) / 1000000 AS irr_monthly,
           FLOOR((((1 + irr.r) * (1 + irr.r)) * ((1 + irr.r) * (1 + irr.r))
                  * (((1 + irr.r) * (1 + irr.r))
                     * ((1 + irr.r) * (1 + irr.r)))
                  * (((1 + irr.r) * (1 + irr.r))
                     * ((1 + irr.r) * (1 + irr.r))) - 1)
                 * 10000 + 0.5) / 10000 AS irr_annual
    FROM irr
    JOIN cfl ON cfl.segment = irr.segment
    JOIN outlay ol ON ol.segment = irr.segment
    ORDER BY cfl.segment
    """,
)
def fin_irr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment IRR of an acquisition-style cashflow: the
    month-0 outlay is {om}× first-year revenue and every month's
    revenue is an inflow; {it} bisection steps on the monthly rate in
    [{lo}, {hi}] give the rate to ~5e-15 — reported with the
    annualized equivalent. NPV is evaluated in HORNER form over the
    month-descending cashflow list (acc·x + cf, x = 1/(1+r)): pure
    +,·,/ in a fixed order, so the oracle's list_reduce replays the
    exact same doubles — a pow()-based NPV would not (pow is not
    correctly-rounded and may differ across engines at the last bit,
    which 48 bisection branches would amplify).

    Scale: the monthly revenue rollup (one customer join + one
    (segment, month) partial aggregate over integer cents) is the
    only data-sized stage; the bisection runs on the model-sized
    (segments × months) cashflow table — bounded by business
    calendar, not data volume — collected once."""
    orders = cat(spark, sf_dir)["orders"]
    cust = cat(spark, sf_dir)["customer"]
    o = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias(
                "ym"
            ),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
    )
    base = o.agg(F.min("ym")).collect()[0][0]
    rev = (
        o.select(
            "segment", (F.col("ym") - F.lit(base)).alias("m"), "cents"
        )
        .groupBy("segment", "m")
        .agg(F.sum("cents").alias("cents"))
        .collect()
    )  # model-sized: |segments| x |calendar months|
    by_seg: dict[str, dict[int, int]] = {}
    mmax = 0
    for row in rev:
        by_seg.setdefault(row["segment"], {})[int(row["m"])] = int(
            row["cents"]
        )
        mmax = max(mmax, int(row["m"]))
    out_rows = []
    for segment in sorted(by_seg):
        months = by_seg[segment]
        inv = int(
            __import__("math").floor(
                IRR_OUTLAY * sum(c for m, c in months.items() if m < 12)
                + 0.5
            )
        )
        cfs_desc = []
        for m in range(mmax, -1, -1):
            c = months.get(m, 0) - (inv if m == 0 else 0)
            cfs_desc.append(float(c) / 100)
        lo, hi = float(IRR_LO), float(IRR_HI)
        for _ in range(IRR_ITERS):
            mid = (lo + hi) / 2
            x = 1.0 / (1.0 + mid)
            acc = 0.0
            for cf in cfs_desc:
                acc = acc * x + cf
            if acc > 0:
                lo = mid
            else:
                hi = mid
        rr = (lo + hi) / 2
        a2 = (1 + rr) * (1 + rr)
        a4 = a2 * a2
        a12 = a4 * (a2 * a2) * (a2 * a2)
        import math

        out_rows.append(
            (
                segment,
                mmax + 1,
                math.floor(inv / 100.0 * 100 + 0.5) / 100,
                math.floor(rr * 1000000 + 0.5) / 1000000,
                math.floor((a12 - 1) * 10000 + 0.5) / 10000,
            )
        )
    return spark.createDataFrame(
        out_rows,
        "segment string, n_months long, outlay double, "
        "irr_monthly double, irr_annual double",
    ).orderBy("segment")


fin_irr.__doc__ = fin_irr.__doc__.format(
    om=IRR_OUTLAY, it=IRR_ITERS, lo=IRR_LO, hi=IRR_HI
)
