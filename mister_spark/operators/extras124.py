"""Wave 124: matrix sketching, vocabulary stability, and link-
prediction evaluation.

sketch_frequent_directions maintains a tiny l×d matrix sketch whose
Gram matrix approximates the full covariance within the FD
guarantee — the deterministic 'PCA without the data' sketch, built
per partition and merged; tx_vocab_stability rank-correlates token
frequencies between the corpus halves — a stable vocabulary is what
makes frequency-based features transferable, and this is the number
that says so; graph_link_prediction_eval holds out a deterministic
20% of co-purchase edges, scores Adamic–Adar on the rest, and
reports how many held-out edges land in the top predictions — the
honest eval of the repo's own link predictor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.hashing import FP_MOD, FP_MUL
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import (
    COP_SUPPORT,
    _DUCK_BASKETS,
    _baskets,
)
from mister_spark.registry import query

FD_L = 16  # sketch rows (l << n)
LP_HOLDOUT_PCT = 20
LP_TOPK = 50


@query("sketch_frequent_directions")  # matrix sketch → rows-only
def sketch_frequent_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent Directions sketch of the embedding matrix: each
    partition folds its rows into an {l}×d sketch (SVD shrink when
    full), the driver merges partials with one more shrink — BᵀB
    approximates AᵀA with error ≤ ‖A‖_F²/(l/2) in spectral norm (the
    FD guarantee), measured here against the exact Gram top
    eigenvalue. Deterministic, mergeable, O(l·d) memory at ANY row
    count — streaming PCA's workhorse.

    Scale: one Arrow pass with O(l·d) state per partition; the
    driver merge is O(partitions·l·d); the exact side (audit only)
    reuses the O(d²) sufficient-stats pass."""
    import numpy as np
    import pandas as pd

    emb = cat(spark, sf_dir)["embeddings"].select(
        F.col("embedding").cast("array<double>").alias("v")
    )

    def fd_pass(batches):
        B = None
        fro = 0.0
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["v"]), dtype=np.float64)
            fro += float((X * X).sum())
            n += len(X)
            B = X if B is None else np.vstack([B, X])
            if len(B) > 2 * FD_L:
                U, s, Vt = np.linalg.svd(B, full_matrices=False)
                s2 = np.maximum(s[:FD_L] ** 2 - s[FD_L - 1] ** 2, 0.0)
                B = (np.sqrt(s2)[:, None] * Vt[:FD_L])
        if B is None:
            return
        if len(B) > FD_L:
            U, s, Vt = np.linalg.svd(B, full_matrices=False)
            s2 = np.maximum(s[:FD_L] ** 2 - s[min(FD_L, len(s)) - 1] ** 2, 0.0)
            B = np.sqrt(s2)[:, None] * Vt[:FD_L]
        yield pd.DataFrame(
            {"b": [B.ravel().tolist()], "rows": [B.shape[0]],
             "fro": [fro], "n": [n]}
        )

    parts = emb.mapInPandas(
        fd_pass, "b array<double>, rows long, fro double, n long"
    ).collect()
    d = 64
    stack = np.vstack(
        [np.array(r["b"]).reshape(r["rows"], d) for r in parts]
    )
    fro = sum(r["fro"] for r in parts)
    n = sum(r["n"] for r in parts)
    U, s, Vt = np.linalg.svd(stack, full_matrices=False)
    s2 = np.maximum(s[:FD_L] ** 2 - s[min(FD_L, len(s)) - 1] ** 2, 0.0)
    B = np.sqrt(s2)[:, None] * Vt[:FD_L]
    # exact Gram top eigenvalue for the audit
    from mister_spark.operators.extras84 import _emb_cov_stats

    n2, mu, S = _emb_cov_stats(spark, sf_dir)
    G = S * (n2 - 1) + n2 * np.outer(mu, mu)  # raw A^T A
    ev_exact = float(np.linalg.eigvalsh(G)[-1])
    ev_sketch = float(np.linalg.eigvalsh(B.T @ B)[-1])
    bound = fro / (FD_L / 2)
    row = (
        int(n),
        FD_L,
        round(ev_exact, 2),
        round(ev_sketch, 2),
        round(abs(ev_exact - ev_sketch), 2),
        round(bound, 2),
    )
    return spark.createDataFrame(
        [row],
        "n long, sketch_rows long, top_eig_exact double, top_eig_sketch "
        "double, abs_error double, fd_bound double",
    )


sketch_frequent_directions.__doc__ = (
    sketch_frequent_directions.__doc__.format(l=FD_L)
)


@query(
    "tx_vocab_stability",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest({DUCK_TOKENS}) AS tok FROM documents),
    c AS (SELECT tok,
                 CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS c1,
                 CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS c2
          FROM t GROUP BY 1),
    rk AS (SELECT RANK() OVER (ORDER BY c1) AS r1,
                  RANK() OVER (ORDER BY c2) AS r2
           FROM c),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(r1) AS s1, SUM(r2) AS s2,
                 SUM(r1 * r2) AS s12, SUM(r1 * r1) AS s11,
                 SUM(r2 * r2) AS s22
          FROM rk)
    SELECT n AS vocab,
           FLOOR((n * s12 - s1 * s2)
                 / (SQRT(CAST(n * s11 - s1 * s1 AS DOUBLE))
                    * SQRT(CAST(n * s22 - s2 * s2 AS DOUBLE)))
                 * 10000 + 0.5) / 10000 AS rank_corr
    FROM s
    """,
)
def tx_vocab_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary stability: Spearman rank correlation of token
    frequencies between the even- and odd-doc halves of the corpus.
    Near 1 means frequency features (IDF, stop-lists, zipf fits)
    transfer across samples; low values warn that half your corpus
    speaks a different frequency language. Integer counts → exact
    rank arithmetic.

    Scale: one token rollup with conditional sums; the per-axis ranks
    are tiny (|vocab| rows here; at scale the spearman two-phase
    machinery substitutes, same as stat_spearman)."""
    t = cat(spark, sf_dir)["documents"].select(
        "doc_id", F.explode(tokens()).alias("tok")
    )
    c = t.groupBy("tok").agg(
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    rk = c.select(
        F.rank().over(W.orderBy("c1")).alias("r1"),
        F.rank().over(W.orderBy("c2")).alias("r2"),
    )
    s = rk.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r1").alias("s1"),
        F.sum("r2").alias("s2"),
        F.sum(F.col("r1") * F.col("r2")).alias("s12"),
        F.sum(F.col("r1") * F.col("r1")).alias("s11"),
        F.sum(F.col("r2") * F.col("r2")).alias("s22"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    corr = (n * F.col("s12") - s1 * s2) / (
        F.sqrt((n * F.col("s11") - s1 * s1).cast("double"))
        * F.sqrt((n * F.col("s22") - s2 * s2).cast("double"))
    )
    return s.select(
        F.col("n").alias("vocab"), ratio(corr).alias("rank_corr")
    )


@query(
    "graph_link_prediction_eval",
    # Real oracle: the whole eval is relational — hash holdout split,
    # wedge join on the train graph, Adamic-Adar sum, (aa DESC, x, y)
    # top-K, and a hit join against the hidden edges. The only float
    # is the per-pair 1/ln(d) sum (few wedge terms per pair), whose
    # (x, y) tie-break pins the K boundary.
    oracle=f"""
    WITH {_DUCK_BASKETS},
    e AS (SELECT p1, p2 FROM (
            SELECT x.l_partkey AS p1, y.l_partkey AS p2, COUNT(*) AS w
            FROM bk x JOIN bk y ON x.l_orderkey = y.l_orderkey
                               AND x.l_partkey < y.l_partkey
            GROUP BY 1, 2) q WHERE w >= {COP_SUPPORT}),
    hidden AS (SELECT p1, p2 FROM e
               WHERE (p1 * {FP_MUL} + p2) % {FP_MOD} % 100
                     < {LP_HOLDOUT_PCT}),
    train AS (SELECT p1, p2 FROM e
              WHERE NOT ((p1 * {FP_MUL} + p2) % {FP_MOD} % 100
                         < {LP_HOLDOUT_PCT})),
    sym AS (SELECT p1 AS u, p2 AS v FROM train
            UNION ALL SELECT p2, p1 FROM train),
    deg AS (SELECT u, CAST(COUNT(*) AS DOUBLE) AS d FROM sym GROUP BY u),
    wedge AS (SELECT a.u AS x, b.u AS y, a.v AS via
              FROM sym a JOIN sym b ON a.v = b.v AND a.u < b.u),
    scored AS (SELECT w.x, w.y, SUM(1.0 / LN(deg.d)) AS aa
               FROM wedge w JOIN deg ON deg.u = w.via
               LEFT JOIN train t ON t.p1 = w.x AND t.p2 = w.y
               WHERE t.p1 IS NULL GROUP BY w.x, w.y),
    top AS (SELECT x, y FROM scored ORDER BY aa DESC, x, y
            LIMIT {LP_TOPK}),
    hits AS (SELECT CAST(COUNT(*) AS BIGINT) AS c
             FROM top JOIN hidden h ON h.p1 = top.x AND h.p2 = top.y),
    nh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM hidden)
    SELECT nh.n AS hidden_edges, CAST({LP_TOPK} AS BIGINT) AS top_k,
           hits.c AS hits,
           FLOOR(CAST(hits.c AS DOUBLE) / GREATEST(nh.n, 1)
                 * 10000 + 0.5) / 10000 AS recall,
           FLOOR(CAST(hits.c AS DOUBLE) / {LP_TOPK} * 10000 + 0.5) / 10000
             AS precision
    FROM nh, hits
    """,
)
def graph_link_prediction_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction evaluation: hold out a deterministic
    {p}% of co-purchase edges (hash of the pair), recompute
    Adamic–Adar scores on the REMAINING graph, and measure how many
    held-out edges appear in the top-{k} predicted non-edges — the
    honest recall eval of the repo's own predictor, with the
    hidden-edge count as the denominator.

    Scale: the wedge join runs on the reduced edge set (same bounds
    as graph_adamic_adar); the holdout filter is a hash expression;
    the eval is a join of two small frames."""
    b = _baskets(spark, sf_dir)
    x = b.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1"))
    y = b.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2"))
    e = (
        x.join(y, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .filter(F.col("w") >= COP_SUPPORT)
        .localCheckpoint()
    )
    hold = (
        (F.col("p1") * FP_MUL + F.col("p2")) % FP_MOD % 100 < LP_HOLDOUT_PCT
    )
    hidden = e.filter(hold).select("p1", "p2").localCheckpoint()
    train = e.filter(~hold).select("p1", "p2").localCheckpoint()
    n_hidden = hidden.count()
    sym = train.select(
        F.col("p1").alias("u"), F.col("p2").alias("v")
    ).unionByName(train.select(F.col("p2").alias("u"), F.col("p1").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("double").alias("d"))
    a = sym.select(F.col("u").alias("x"), F.col("v").alias("via"))
    bb = sym.select(F.col("u").alias("y"), F.col("v").alias("via"))
    wedge = a.join(bb, "via").filter(F.col("x") < F.col("y"))
    scored = (
        wedge.join(
            F.broadcast(deg.select(F.col("u").alias("via"), "d")), "via"
        )
        .join(
            train.select(F.col("p1").alias("x"), F.col("p2").alias("y")),
            ["x", "y"],
            "left_anti",
        )
        .groupBy("x", "y")
        .agg(F.sum(1.0 / F.log("d")).alias("aa"))
    )
    top = scored.orderBy(F.col("aa").desc(), "x", "y").limit(LP_TOPK)
    hits = top.join(
        hidden.select(F.col("p1").alias("x"), F.col("p2").alias("y")),
        ["x", "y"],
    ).count()
    import math

    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
    row = (
        int(n_hidden),
        LP_TOPK,
        int(hits),
        r4(hits / max(n_hidden, 1)),
        r4(hits / LP_TOPK),
    )
    return spark.createDataFrame(
        [row],
        "hidden_edges long, top_k long, hits long, recall double, "
        "precision double",
    )


graph_link_prediction_eval.__doc__ = graph_link_prediction_eval.__doc__.format(
    p=LP_HOLDOUT_PCT, k=LP_TOPK
)
