"""Wave 246: attenuated path centrality and risk-adjusted return ratios.

graph_katz is Katz centrality on the directed nation trade graph:
x = sum_k alpha^k (A^T)^k 1 counts ALL inbound paths with geometric
attenuation, so a nation scores high by being reachable from many
exporters through short chains — the centrality that sees beyond
direct degree without PageRank's stochastic normalization (a nation
with few heavy partners and one with many light ones separate here,
where degree ties them). alpha = 1/16 (exact binary fraction) keeps
the fixed-round iteration well inside the spectral-radius bound on a
25-node graph. fin_sharpe_sortino prices the revenue stream's
volatility: day-over-day revenue changes as returns, Sharpe divides
mean by total volatility, Sortino only by DOWNSIDE volatility — the
pair says whether revenue "risk" is symmetric wobble or actual
drawdown exposure (annualized sqrt(365), zero target).

Exactness: Katz follows the mr_pagerank recipe (fixed rounds, the same
recursion both engines, 1e-6 output grid; alpha an exact binary
fraction over integer path counts). Daily revenues snap to integer
cents, returns are single divisions of those integers, and the
ratio algebra divides identical operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

KATZ_ALPHA = 0.0625  # 1/16: exact binary, safely under 1/lambda_max
KATZ_ITERS = 8

_KATZ_EDGES = """
    edges AS (
      SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE s.s_nationkey <> c.c_nationkey
    ),
    nodes AS (SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges))
"""


@query(
    "graph_katz",
    # Real oracle: the fixed-round Katz iteration replays as a
    # recursive CTE — x_new(v) = 1 + alpha * sum of x over in-
    # neighbors, the mr_pagerank recursion shape without damping
    # normalization; same 1e-6 output grid.
    oracle=f"""
    WITH RECURSIVE {_KATZ_EDGES},
    kz AS (
      -- CAST the seed and the additive unit to DOUBLE: a bare 1.0 is
      -- DECIMAL(2,1) in DuckDB and would quantize the whole recursion
      -- to one decimal place
      SELECT 0 AS it, node, CAST(1.0 AS DOUBLE) AS x FROM nodes
      UNION ALL
      SELECT k.it + 1, n.node,
             CAST(1.0 AS DOUBLE)
             + {KATZ_ALPHA!r} * COALESCE(c.inx, CAST(0.0 AS DOUBLE))
      FROM nodes n
      CROSS JOIN (SELECT DISTINCT it FROM kz) k
      LEFT JOIN (SELECT e.dst AS node, kz2.it, SUM(kz2.x) AS inx
                 FROM kz kz2 JOIN edges e ON e.src = kz2.node
                 GROUP BY 1, 2) c
        ON c.node = n.node AND c.it = k.it
      WHERE k.it < {KATZ_ITERS}
    ),
    indeg AS (SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS ind
              FROM edges GROUP BY 1)
    SELECT kz.node, FLOOR(kz.x * 1e6 + 0.5) / 1e6 AS katz,
           COALESCE(indeg.ind, 0) AS in_degree
    FROM kz LEFT JOIN indeg ON indeg.node = kz.node
    WHERE kz.it = {KATZ_ITERS}
    """,
)
def graph_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality of the directed trade graph ({it} rounds,
    alpha = {a:g}): x <- 1 + alpha A^T x counts every inbound path
    with geometric attenuation. in_degree rides along as the
    1-hop-only baseline — nations whose katz outruns their in-degree
    are reachable through CHAINS (hub-adjacent), the structure degree
    cannot see. Complements mr_pagerank (stochastic, mass-conserving)
    with the non-normalized path-counting centrality.

    Scale: one fact-scan edge rollup (checkpointed, distinct pairs);
    each round is one join + one aggregate on the model-sized edge
    frame — the mr_pagerank plan shape."""
    c = cat(spark, sf_dir)
    sup = c["supplier"].select("s_suppkey", F.col("s_nationkey").alias("src"))
    cus = c["customer"].select("c_custkey", F.col("c_nationkey").alias("dst"))
    edges = (
        c["lineitem"]
        .select("l_suppkey", "l_orderkey")
        .join(
            c["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cus, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint()  # every round re-reads the edge list
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint()
    )
    x = nodes.withColumn("x", F.lit(1.0))
    for _ in range(KATZ_ITERS):
        inx = (
            edges.join(x, F.col("src") == F.col("node"))
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.sum("x").alias("inx"))
        )
        x = (
            nodes.join(inx, F.col("node") == F.col("node2"), "left")
            .select(
                "node",
                (
                    1.0 + KATZ_ALPHA * F.coalesce(F.col("inx"), F.lit(0.0))
                ).alias("x"),
            )
            .localCheckpoint()
        )
    indeg = edges.groupBy(F.col("dst").alias("node2")).agg(
        F.count(F.lit(1)).cast("bigint").alias("in_degree")
    )
    return (
        x.join(indeg, F.col("node") == F.col("node2"), "left")
        .select(
            "node",
            rnd(F.col("x"), 6).alias("katz"),
            F.coalesce(F.col("in_degree"), F.lit(0)).alias("in_degree"),
        )
    )


graph_katz.__doc__ = graph_katz.__doc__.format(it=KATZ_ITERS, a=KATZ_ALPHA)

ANNUALIZE = 365.0


@query(
    "fin_sharpe_sortino",
    # Real oracle: daily revenues snap to integer cents, returns are
    # single divisions of consecutive integers (trading-day rank from
    # a window on the calendar-bounded day frame), and both ratios
    # divide identical operands.
    oracle=f"""
    WITH rev AS (SELECT o_orderdate AS day,
                        SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS cents
                 FROM orders GROUP BY 1),
    rk AS (SELECT day, cents,
                  ROW_NUMBER() OVER (ORDER BY day) AS t
           FROM rev),
    ret AS (SELECT c.t, (CAST(c.cents AS DOUBLE) - p.cents) / p.cents AS r
            FROM rk c JOIN rk p ON p.t = c.t - 1
            WHERE p.cents > 0),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(r) AS mu,
                 SUM(r * r) AS srr,
                 SUM(CASE WHEN r < 0 THEN r * r ELSE 0.0 END) AS sdd
          FROM ret),
    s AS (SELECT n, mu,
                 SQRT((srr - n * mu * mu) / (n - 1)) AS vol,
                 SQRT(sdd / n) AS dvol
          FROM m)
    SELECT n AS n_returns,
           FLOOR(mu * 1e6 + 0.5) / 1e6 AS mean_daily_ret,
           FLOOR(vol * 1e6 + 0.5) / 1e6 AS daily_vol,
           FLOOR(CASE WHEN vol <= 0 THEN 0.0
                 ELSE mu / vol * SQRT({ANNUALIZE!r}) END
                 * 1e4 + 0.5) / 1e4 AS sharpe_annual,
           FLOOR(CASE WHEN dvol <= 0 THEN 0.0
                 ELSE mu / dvol * SQRT({ANNUALIZE!r}) END
                 * 1e4 + 0.5) / 1e4 AS sortino_annual
    FROM s
    """,
)
def fin_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharpe and Sortino ratios of the daily order-revenue stream
    (returns = day-over-day relative change across trading days,
    zero target, sqrt(365) annualization): Sharpe penalizes ALL
    volatility, Sortino only the downside half — a Sortino well above
    Sharpe says the wobble is mostly upside (growth spurts), roughly
    equal says symmetric noise, and both near zero says the revenue
    trend is indistinguishable from its own volatility. The standard
    risk-adjusted pair, applied to the revenue series ev_drawdown
    already stress-tests.

    Scale: one map-side-combinable daily rollup; the return join and
    moment sums run on the calendar-bounded trading-day frame (the
    one ordered window rides that bounded frame, a documented
    carry)."""
    rev = (
        cat(spark, sf_dir)["orders"]
        .select(
            F.col("o_orderdate").alias("day"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"))
        .localCheckpoint()  # calendar-bounded trading-day frame
    )
    rk = rev.select(
        "cents", F.row_number().over(W.orderBy("day")).alias("t")
    )
    prev = rk.select((F.col("t") + 1).alias("t"), F.col("cents").alias("pc"))
    ret = (
        rk.join(prev, "t")
        .filter(F.col("pc") > 0)
        .select(
            ((F.col("cents").cast("double") - F.col("pc")) / F.col("pc")).alias("r")
        )
    )
    m = ret.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("r").alias("mu"),
        F.sum(F.col("r") * F.col("r")).alias("srr"),
        F.sum(F.when(F.col("r") < 0, F.col("r") * F.col("r")).otherwise(0.0)).alias(
            "sdd"
        ),
    )
    vol = F.sqrt(
        (F.col("srr") - F.col("n") * F.col("mu") * F.col("mu"))
        / (F.col("n") - 1)
    )
    dvol = F.sqrt(F.col("sdd") / F.col("n"))
    return m.select(
        F.col("n").alias("n_returns"),
        rnd(F.col("mu"), 6).alias("mean_daily_ret"),
        rnd(vol, 6).alias("daily_vol"),
        rnd(
            F.when(vol <= 0, 0.0).otherwise(
                F.col("mu") / vol * F.sqrt(F.lit(ANNUALIZE))
            ),
            4,
        ).alias("sharpe_annual"),
        rnd(
            F.when(dvol <= 0, 0.0).otherwise(
                F.col("mu") / dvol * F.sqrt(F.lit(ANNUALIZE))
            ),
            4,
        ).alias("sortino_annual"),
    )
