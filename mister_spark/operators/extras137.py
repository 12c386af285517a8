"""Wave 137: growth-slope distributions, clique extraction, and
determinism auditing.

stat_growth_slopes fits a per-customer spend-over-time slope (a
random-slopes model's raw material) entirely with grouped moments —
the distribution of individual trajectories that a single pooled
trend averages away; graph_clique_heuristic extracts a large clique
greedily along the degeneracy core and VERIFIES it edge-by-edge —
cohesive-group extraction with its own proof; io_determinism_audit
re-executes a representative sample of this repo's own operators
and asserts bit-identical results — reproducibility as a measured
property, not a vibe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import DUCK_COPURCHASE_SYM
from mister_spark.registry import query

CLIQUE_ROUNDS = 64
AUDIT_KEYS = (
    "q1_pricing_summary",
    "ev_sessionize",
    "dd_exact",
    "stat_gini",
    "tx_tokencount",
)


@query(
    "stat_growth_slopes",
    oracle="""
    WITH o AS (SELECT o_custkey,
                      CAST(date_diff('day', DATE '1995-01-01',
                                     CAST(o_orderdate AS DATE)) AS DOUBLE)
                        AS t,
                      o_totalprice AS y
               FROM orders),
    g AS (SELECT o_custkey, CAST(COUNT(*) AS DOUBLE) AS n,
                 AVG(t) AS mt, AVG(y) AS my,
                 SUM(t * t) AS stt, SUM(t * y) AS sty
          FROM o GROUP BY 1 HAVING COUNT(*) >= 3),
    s AS (SELECT o_custkey,
                 (sty - n * mt * my) / NULLIF(stt - n * mt * mt, 0) AS slope
          FROM g),
    v AS (SELECT slope FROM s WHERE slope IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS customers,
           FLOOR(AVG(slope) * 10000 + 0.5) / 10000 AS mean_slope,
           FLOOR(STDDEV_SAMP(slope) * 10000 + 0.5) / 10000 AS slope_sd,
           FLOOR(SUM(CASE WHEN slope > 0 THEN 1.0 ELSE 0 END) / COUNT(*)
                 * 10000 + 0.5) / 10000 AS share_growing
    FROM v
    """,
)
def stat_growth_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer growth slopes: OLS of order value on order date
    WITHIN each customer (≥3 orders), summarized as the mean slope,
    the cross-customer slope dispersion, and the share of customers
    with positive trajectories. The pooled trend says 'spend is
    flat'; this distribution says WHO is growing — the raw material
    of a random-slopes model, and the honest segmentation input.

    Scale: per-customer moments in one shuffle; each slope is
    closed-form from its group's sums; the summary is one aggregate
    over |customers| slopes."""
    o = cat(spark, sf_dir)["orders"].select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("double")
        .alias("t"),
        F.col("o_totalprice").alias("y"),
    )
    g = (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("t").alias("mt"),
            F.avg("y").alias("my"),
            F.sum(F.col("t") * F.col("t")).alias("stt"),
            F.sum(F.col("t") * F.col("y")).alias("sty"),
        )
        .filter(F.col("n") >= 3)
    )
    slope = (F.col("sty") - F.col("n") * F.col("mt") * F.col("my")) / F.nullif(
        F.col("stt") - F.col("n") * F.col("mt") * F.col("mt"), F.lit(0.0)
    )
    s = g.select(slope.alias("slope")).filter(F.col("slope").isNotNull())
    return s.agg(
        F.count(F.lit(1)).cast("bigint").alias("customers"),
        ratio(F.avg("slope")).alias("mean_slope"),
        ratio(F.stddev_samp("slope")).alias("slope_sd"),
        ratio(
            F.sum(F.when(F.col("slope") > 0, 1.0).otherwise(0.0))
            / F.count(F.lit(1))
        ).alias("share_growing"),
    )


@query(
    "graph_clique_heuristic",
    # Real oracle: the multi-seed greedy replays as a recursive CTE —
    # per seed the degree-ranked candidate list is scanned in order,
    # a candidate joins when its adjacency count against the carried
    # clique list equals the clique size, and the best seed's clique
    # wins by (size DESC, seed order). Pure integer arithmetic.
    oracle=f"""
    WITH RECURSIVE {DUCK_COPURCHASE_SYM},
    deg AS (SELECT p1 AS n, CAST(COUNT(*) AS BIGINT) AS d
            FROM csym GROUP BY 1),
    seeds AS (SELECT n AS seed, rk AS seed_rk FROM (
                SELECT n, ROW_NUMBER() OVER (ORDER BY d DESC, n) AS rk
                FROM deg) q WHERE rk <= 10),
    cand AS (SELECT s.seed, s.seed_rk, c.p2 AS node,
                    ROW_NUMBER() OVER (PARTITION BY s.seed
                                       ORDER BY d.d DESC, c.p2) AS rk
             FROM seeds s JOIN csym c ON c.p1 = s.seed
                          JOIN deg d ON d.n = c.p2),
    walk AS (
      SELECT seed, seed_rk, 0 AS j, [seed] AS clq FROM seeds
      UNION ALL
      SELECT w.seed, w.seed_rk, w.j + 1,
             CASE WHEN (SELECT COUNT(*) FROM csym s
                        WHERE s.p1 = c.node
                          AND list_contains(w.clq, s.p2))
                       = len(w.clq)
                  THEN list_append(w.clq, c.node) ELSE w.clq END
      FROM walk w JOIN cand c ON c.seed = w.seed AND c.rk = w.j + 1
      WHERE w.j < {CLIQUE_ROUNDS}),
    fin AS (SELECT seed, seed_rk, clq FROM (
              SELECT seed, seed_rk, clq,
                     ROW_NUMBER() OVER (PARTITION BY seed
                                        ORDER BY j DESC) AS rn
              FROM walk) q WHERE rn = 1),
    best AS (SELECT clq FROM fin
             ORDER BY len(clq) DESC, seed_rk LIMIT 1),
    k AS (SELECT CAST(len(clq) AS BIGINT) AS k,
                 CAST(list_min(clq) AS BIGINT) AS mn FROM best),
    internal AS (SELECT CAST(COUNT(*) AS BIGINT) AS i
                 FROM ce, best
                 WHERE list_contains(best.clq, ce.p1)
                   AND list_contains(best.clq, ce.p2))
    SELECT k.k AS clique_size, internal.i AS internal_edges,
           k.k * (k.k - 1) // 2 AS expected_edges,
           CAST(CASE WHEN internal.i = k.k * (k.k - 1) // 2
                     THEN 1 ELSE 0 END AS BIGINT) AS verified,
           k.mn AS min_member
    FROM k, internal
    """,
)
def graph_clique_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy clique extraction on the co-purchase graph: from each
    of the top-degree seeds, greedily grow a clique inside the seed's
    neighborhood (keeping the largest found), then VERIFY it by
    counting its internal edges (must be k(k−1)/2 — the op carries
    its own proof). Cliques are the strongest 'always bought
    together' signal; maximal cliques live inside the dense cores,
    which is where the greedy order looks first.

    Scale: nothing data-sized reaches the driver — the greedy only
    ever inspects the top-10 seeds (a distributed degree top-k) and
    each seed's top-{r} candidates by degree (a 10-partition window),
    so the three collects are constant-bounded: 10 seed rows,
    ≤ 10×{r} candidate rows, and the edges induced on those
    ≤ 10×({r}+1) nodes (broadcast semi-joins against the edge frame).
    Verification is one distributed edge-count join."""
    from mister_spark.operators.extras47 import _copurchase_edges

    e = _copurchase_edges(spark, sf_dir).select("p1", "p2").localCheckpoint()
    csym = e.union(
        e.select(F.col("p2").alias("p1"), F.col("p1").alias("p2"))
    )
    deg = csym.groupBy("p1").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    ).withColumnRenamed("p1", "n")
    # top-10 seeds by (degree DESC, node) — a 10-row TakeOrdered.
    seed_rows = deg.orderBy(F.desc("d"), "n").limit(10).collect()
    seeds = [r["n"] for r in seed_rows]
    seeds_df = spark.createDataFrame(
        [(s,) for s in seeds], "seed long"
    )
    # per-seed top-CLIQUE_ROUNDS candidates by full-graph degree — a
    # 10-partition window; the collect is ≤ 10×CLIQUE_ROUNDS rows.
    w_c = W.partitionBy("seed").orderBy(F.desc("d"), "node")
    cand_rows = (
        csym.join(
            F.broadcast(seeds_df), csym["p1"] == F.col("seed")
        )
        .select("seed", F.col("p2").alias("node"))
        .join(deg.withColumnRenamed("n", "node"), "node")
        .withColumn("rk", F.row_number().over(w_c))
        .filter(F.col("rk") <= CLIQUE_ROUNDS)
        .select("seed", "node", "rk")
        .collect()
    )
    cands_by_seed: dict[int, list[int]] = {s: [] for s in seeds}
    sub_nodes = set(seeds)
    for r in sorted(cand_rows, key=lambda r: (r["seed"], r["rk"])):
        cands_by_seed[r["seed"]].append(r["node"])
        sub_nodes.add(r["node"])
    # edges induced on the ≤ 10×(CLIQUE_ROUNDS+1) retained nodes —
    # two broadcast semi-joins, then a constant-bounded collect.
    nodes_df = spark.createDataFrame(
        [(n,) for n in sorted(sub_nodes)], "n long"
    )
    sub_edges = (
        csym.join(F.broadcast(nodes_df.withColumnRenamed("n", "p1")), "p1")
        .join(F.broadcast(nodes_df.withColumnRenamed("n", "p2")), "p2")
        .select("p1", "p2")
        .collect()
    )
    adj: dict[int, set] = {n: set() for n in sub_nodes}
    for r in sub_edges:
        adj[r["p1"]].add(r["p2"])
    clique: list[int] = []
    # multi-seed greedy: grow inside each seed's neighborhood, keep best
    for seed in seeds:
        cur = [seed]
        for node in cands_by_seed[seed]:
            if all(node in adj[m] for m in cur):
                cur.append(node)
        if len(cur) > len(clique):
            clique = cur
    k = len(clique)
    cset = set(clique)
    # distributed verification: internal edges of the clique
    cl = spark.createDataFrame([(c,) for c in sorted(cset)], "n long")
    internal = (
        e.join(cl.withColumnRenamed("n", "p1"), "p1")
        .join(cl.withColumnRenamed("n", "p2"), "p2")
        .count()
    )
    expected = k * (k - 1) // 2
    row = (
        int(k),
        int(internal),
        int(expected),
        int(internal == expected),
        int(min(clique)) if clique else -1,
    )
    return spark.createDataFrame(
        [row],
        "clique_size long, internal_edges long, expected_edges long, "
        "verified long, min_member long",
    )


graph_clique_heuristic.__doc__ = graph_clique_heuristic.__doc__.format(
    r=CLIQUE_ROUNDS
)


@query("io_determinism_audit")  # meta-QA → rows-only
def io_determinism_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Determinism audit: execute {n} representative registered
    operators TWICE each and compare a content hash of the sorted
    results — any nondeterminism (unstable ordering fed to a limit,
    uncontrolled float reduction, time-dependent logic) shows up as a
    mismatch row. Reproducibility is this repo's core contract; this
    op measures it instead of asserting it.

    Scale: inherits each audited operator's plan; hashing is one
    aggregate per run."""
    from mister_spark import registry as reg

    rows = []
    for key in AUDIT_KEYS:
        fn = reg.QUERIES[key]

        def content_hash(df: DataFrame) -> str:
            cols = sorted(df.columns)
            h = df.select(
                F.sha2(
                    F.concat_ws(
                        "|", *[F.col(c).cast("string") for c in cols]
                    ),
                    256,
                ).alias("h")
            )
            agg = h.agg(
                F.sha2(
                    F.concat_ws(",", F.sort_array(F.collect_list("h"))), 256
                ).alias("hh")
            )
            return agg.collect()[0]["hh"]

        h1 = content_hash(fn(spark, sf_dir))
        h2 = content_hash(fn(spark, sf_dir))
        rows.append((key, int(h1 == h2), h1[:16]))
    return spark.createDataFrame(
        rows, "query string, deterministic long, hash_prefix string"
    )


io_determinism_audit.__doc__ = io_determinism_audit.__doc__.format(
    n=len(AUDIT_KEYS)
)
