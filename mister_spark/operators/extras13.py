"""Wave 13: Spearman rank correlation, inverted-index boolean search,
curriculum phase manifests, k-core decomposition, and closed-form ridge
regression via partitioned Gramian aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import global_rank
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, money, rnd
from mister_spark.operators.duck_linalg import duck_spd_solve
from mister_spark.registry import query

BOOL_TERMS = ("data", "query", "table")
K_CORE = 16  # peels real nodes at sf0.001 (degree range 10-24 there)
RIDGE_LAMBDA = 1.0


@query(
    "stat_spearman",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x,
             FLOOR(SUM(value) * 100 + 0.5) / 100 AS y
      FROM events GROUP BY 1),
    rk AS (
      SELECT CAST(RANK() OVER (ORDER BY x) AS BIGINT) AS rx,
             CAST(RANK() OVER (ORDER BY y) AS BIGINT) AS ry
      FROM u),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(rx) AS sx, SUM(ry) AS sy,
             SUM(rx * ry) AS sxy, SUM(rx * rx) AS sx2, SUM(ry * ry) AS sy2
      FROM rk)
    SELECT n,
           FLOOR((n * sxy - sx * sy)
                 / (SQRT(CAST(n * sx2 - sx * sx AS DOUBLE))
                    * SQRT(CAST(n * sy2 - sy * sy AS DOUBLE)))
                 * 10000 + 0.5) / 10000 AS spearman
    FROM s
    """,
)
def stat_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between a user's event count and total
    value — the monotone-association measure that survives the
    heavy-tailed value column where Pearson (stat_corr) saturates.
    Ranks are RANK() with ties (same semantics both engines, y rounded
    to cents before ranking so float partial-sum order can't reorder
    ties); all Pearson sums then run over exact integers, with one
    rounded float division at the end.

    Scale: one user_id rollup, then each axis ranks via the two-phase
    `functions/ranks.global_rank` (range-partitioned sort, never a
    single-task window): RANK()-with-ties is reconstructed exactly as
    MIN(row_number) over equal values — a partitioned (parallel)
    min-window per axis — and a localCheckpoint between the two axes
    keeps the second range shuffle from replaying the first."""
    ev = cat(spark, sf_dir)["events"]
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("x"), money(F.sum("value")).alias("y")
    )
    r1 = global_rank(u, "x", "user_id", rank_col="_rnx").withColumn(
        "rx", F.min("_rnx").over(W.partitionBy("x"))
    )
    r2 = global_rank(r1.localCheckpoint(), "y", "user_id", rank_col="_rny")
    rk = r2.select(
        "rx", F.min("_rny").over(W.partitionBy("y")).alias("ry")
    )
    s = rk.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sx2"),
        F.sum(F.col("ry") * F.col("ry")).alias("sy2"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = n * F.col("sxy") - sx * sy
    den = F.sqrt((n * F.col("sx2") - sx * sx).cast("double")) * F.sqrt(
        (n * F.col("sy2") - sy * sy).cast("double")
    )
    return s.select("n", rnd(num / den, 4).alias("spearman"))


@query(
    "tx_boolean_search",
    oracle=f"""
    WITH t AS (SELECT DISTINCT doc_id, unnest({DUCK_TOKENS}) AS tk FROM documents)
    SELECT doc_id FROM t
    WHERE tk IN ('{BOOL_TERMS[0]}', '{BOOL_TERMS[1]}', '{BOOL_TERMS[2]}')
    GROUP BY doc_id
    HAVING COUNT(*) = {len(BOOL_TERMS)}
    """,
)
def tx_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) boolean retrieval: documents containing ALL of
    the query terms, answered from the inverted index by counting
    distinct matched terms per doc — the classic posting-list
    intersection, not a per-doc array scan.

    Scale: the IN filter prunes the exploded postings to the query
    terms' lists BEFORE the doc-keyed count, so the shuffle carries
    only matching postings (∝ selectivity, not corpus). A static index
    table bucketed by term would skip the explode entirely."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("doc_id", F.explode(tokens()).alias("tk")).distinct()
    return (
        t.filter(F.col("tk").isin(*BOOL_TERMS))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nt"))
        .filter(F.col("nt") == len(BOOL_TERMS))
        .select("doc_id")
    )


@query(
    "ds_curriculum",
    oracle="""
    WITH ph AS (
      SELECT doc_id, n_chars,
             CAST(NTILE(4) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS phase
      FROM documents)
    SELECT phase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM ph GROUP BY 1
    """,
)
def ds_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum phase manifest: corpus split into 4 equal-count phases
    ordered short→long (the classic length curriculum), each phase row
    carrying its char-budget stats for the training scheduler. NTILE
    over a fully-specified order (n_chars, doc_id) is deterministic in
    both engines.

    Scale: phases come from functions/ranks.global_rank (two-phase
    range-partitioned sort) plus the exact NTILE arithmetic — first
    n mod 4 phases take ⌈n/4⌉ docs, the rest ⌊n/4⌋ — so no task ever
    sorts the whole corpus and the result still matches the oracle's
    NTILE bit-for-bit."""
    from mister_spark.functions.ranks import global_rank

    docs = cat(spark, sf_dir)["documents"]
    n = docs.agg(F.count(F.lit(1)).alias("n_total"))
    ranked = global_rank(
        docs.select("doc_id", "n_chars"), "n_chars", "doc_id"
    ).join(F.broadcast(n))
    q = F.expr("n_total div 4")
    r = F.col("n_total") % 4
    big_span = (q + 1) * r  # ranks covered by the (q+1)-sized phases
    phase = (
        F.when(F.col("rk") <= big_span, F.expr("(rk - 1) div (n_total div 4 + 1) + 1"))
        .otherwise(
            r + F.floor((F.col("rk") - big_span - 1) / F.greatest(q, F.lit(1))) + 1
        )
        .cast("long")
    )
    ph = ranked.select("doc_id", "n_chars", phase.alias("phase"))
    return ph.groupBy("phase").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "graph_k_core",
    # Real oracle: synchronized peeling as a stamped recursive CTE —
    # each step keeps edges whose BOTH endpoints have current degree
    # >= k (window counts over the working table), for the same 20
    # rounds the Spark loop caps at; a stable nonempty fixpoint keeps
    # re-emitting itself so iteration 20 always exists, and a graph
    # that peels to empty yields no it=20 rows = the empty result the
    # Spark loop returns. Integer output.
    oracle=f"""
    WITH RECURSIVE de AS (
      SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE s.s_nationkey <> c.c_nationkey
    ),
    und AS (SELECT DISTINCT a, b FROM (
              SELECT src AS a, dst AS b FROM de
              UNION ALL SELECT dst, src FROM de)),
    peel AS (
      SELECT 0 AS it, a, b FROM und
      UNION ALL
      SELECT it + 1, a, b FROM (
        SELECT it, a, b,
               COUNT(*) OVER (PARTITION BY a) AS da,
               COUNT(*) OVER (PARTITION BY b) AS db
        FROM peel) t
      WHERE it < 20 AND da >= {K_CORE} AND db >= {K_CORE}
    )
    SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM peel WHERE it = 20 GROUP BY a
    """,
)
def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=16) of the undirected nation trade graph:
    iteratively peel nodes with degree < k until fixpoint; the surviving
    subgraph is the densely-interconnected trading core. Emits each core
    node with its within-core degree.

    Scale: each peel round is one degree aggregate + one semi-join on
    the edge list, lineage-checkpointed; rounds are bounded by the peel
    depth (small for real graphs). The same loop shape as PageRank and
    label propagation — iterative joins over a keyed edge list, model
    state only in lineage, never on the driver."""
    from mister_spark.operators.extras9 import _undirected_edges

    edges = _undirected_edges(spark, sf_dir).localCheckpoint()
    for _ in range(20):
        deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= K_CORE).select("a")
        pruned = (
            edges.join(keep, "a")
            .join(keep.withColumnRenamed("a", "b"), "b")
            .select("a", "b")
            .localCheckpoint()
        )
        if pruned.count() == edges.count():
            edges = pruned
            break
        edges = pruned
    return (
        edges.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )


@query(
    "ml_ridge",
    # Real oracle: the 65×65 ridge normal equations assembled from the
    # same Gramian sums and solved by the shared Cholesky recursion
    # (duck_linalg.duck_spd_solve); the 1e-6 weight grid absorbs the
    # ~1e-13 Cholesky-vs-LU float drift on this ridge-conditioned
    # system.
    oracle=f"""
    WITH RECURSIVE
    exr AS (SELECT list_append(CAST(embedding AS DOUBLE[]),
                               CAST(1.0 AS DOUBLE)) AS xv,
                   CAST(label % 2 AS DOUBLE) AS y
            FROM embeddings),
    gram AS (SELECT p.i AS i, p.j AS j, SUM(xv[p.i] * xv[p.j]) AS g
             FROM exr CROSS JOIN LATERAL (
               SELECT i.i AS i, j.j AS j
               FROM (SELECT unnest(range(1, 66)) AS i) i,
                    (SELECT unnest(range(1, 66)) AS j) j) p
             GROUP BY p.i, p.j),
    mat AS (SELECT list(row ORDER BY i) AS a FROM (
        SELECT i, list(g + CASE WHEN i = j THEN {RIDGE_LAMBDA!r}
                               ELSE 0.0 END ORDER BY j) AS row
        FROM gram GROUP BY i) z),
    rhs AS (SELECT [list(s ORDER BY i)] AS b FROM (
        SELECT u.i AS i, SUM(xv[u.i] * y) AS s
        FROM exr CROSS JOIN LATERAL
          (SELECT unnest(range(1, 66)) AS i) u
        GROUP BY u.i) z),
    {duck_spd_solve(65, 1)}
    SELECT CAST(u.i - 1 AS INT) AS dim,
           FLOOR(sol.x[1][u.i] * 1e6 + 0.5) / 1e6 AS weight
    FROM sol CROSS JOIN LATERAL (SELECT unnest(range(1, 66)) AS i) u
    """,
)
def ml_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression (λ=1) of label%2 on the embedding:
    the normal equations (XᵀX + λI)w = Xᵀy solved on the driver from
    Gramian partial sums computed per partition with one BLAS matmul
    each (mapInPandas) — the map-side-combine form of linear model
    fitting. Output is the (dim, weight) vector incl. intercept.

    Scale: the shuffled payload is d(d+1)/2-ish — 65×65 floats per
    partition regardless of row count; the driver solves a 65×65
    system. Data big, model tiny; one pass over the data."""
    import numpy as np
    import pandas as pd

    emb = cat(spark, sf_dir)["embeddings"].select(
        F.col("embedding").cast("array<double>").alias("v"),
        (F.col("label") % 2).cast("double").alias("y"),
    )

    d = 64 + 1  # + intercept

    def gramian(batches):
        G = np.zeros((d, d))
        b = np.zeros(d)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["v"]), dtype=np.float64)
            X = np.hstack([X, np.ones((len(X), 1))])
            yv = pdf["y"].to_numpy(dtype=np.float64)
            G += X.T @ X
            b += X.T @ yv
            n += len(X)
        out = [
            {"i": i, "j": j, "g": G[i, j]} for i in range(d) for j in range(d)
        ] + [{"i": i, "j": -1, "g": b[i]} for i in range(d)]
        yield pd.DataFrame(out)

    parts = emb.mapInPandas(gramian, "i int, j int, g double")
    agg = parts.groupBy("i", "j").agg(F.sum("g").alias("g")).collect()
    G = np.zeros((d, d))
    bb = np.zeros(d)
    for r in agg:
        if r.j == -1:
            bb[r.i] = r.g
        else:
            G[r.i, r.j] = r.g
    w = np.linalg.solve(G + RIDGE_LAMBDA * np.eye(d), bb)
    rows = [(int(i), float(w[i])) for i in range(d)]
    return spark.createDataFrame(rows, "dim int, weight double").select(
        "dim", rnd(F.col("weight"), 6).alias("weight")
    )
