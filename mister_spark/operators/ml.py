"""Iterative ML on embeddings: Lloyd's k-means, DataFrame-native.

The model (k centroids) lives on the driver between iterations — it IS
driver-sized by definition — while every data-sized step (assignment,
partial sums) is a distributed DataFrame op. This is the same
model-small/data-big split MLlib uses, re-expressed with the public
DataFrame API only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.duck_linalg import duck_emb_cov_eigvals
from mister_spark.registry import query

K = 10
ITERS = 4


def _sq_dist(a, b):
    """Σ (a_i - b_i)² as a JVM expression (zip_with + aggregate)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans(
    spark: SparkSession, sf_dir: str, k: int = K, iters: int = ITERS
) -> tuple[DataFrame, list[float]]:
    """Lloyd's k-means over the embeddings table. Returns the final
    assignment profile (cid, n, inertia) and the per-iteration total
    inertia history (monotonically non-increasing — pinned in tests).

    Scale design: each iteration is (1) a broadcast of k centroid
    arrays into a map-side assignment — `min_by` over a k-way exploded
    score needs no shuffle of the data — and (2) ONE partial-agg
    shuffle keyed on (cid, dim) to average the new centroids. The k×d
    model is collected to the driver per iteration (it is O(k·d), not
    O(data)); lineage is cut there, so 100 iterations don't stack 100
    plans. Init is the k lowest vec_ids — deterministic, seed-free."""
    emb = cat(spark, sf_dir)["embeddings"].select("vec_id", "embedding")
    cent_rows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").limit(k).collect()
    ]
    centroids = [(i, v) for i, (_, v) in enumerate(cent_rows)]
    history: list[float] = []
    assign = None
    for _ in range(iters):
        cdf = F.broadcast(
            spark.createDataFrame(centroids, "cid int, cvec array<double>")
        )
        scored = emb.crossJoin(cdf).select(
            "vec_id",
            "embedding",
            "cid",
            _sq_dist(F.col("embedding"), F.col("cvec")).alias("d2"),
        )
        assign = scored.groupBy("vec_id").agg(
            F.min_by("cid", "d2").alias("cid"),
            F.min("d2").alias("d2"),
            F.first("embedding").alias("embedding"),
        )
        history.append(assign.agg(F.sum("d2")).collect()[0][0])
        new_c = (
            assign.select("cid", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
        )
        centroids = [
            (int(r["cid"]), [float(x) for x in r["cvec"]]) for r in new_c.collect()
        ]
    profile = assign.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        ratio(F.sum("d2")).alias("inertia"),
    )
    return profile, history


@query(
    "ml_kmeans",
    # Real oracle: Lloyd's loop as a recursive CTE over the centroid
    # rows — per step every vector takes its (distance, cid) argmin
    # and the per-(cid, dim) means rebuild the centroid lists; the
    # profile scores the final assignment against the centroids after
    # ITERS-1 updates, exactly like the Spark loop (the last pass's
    # update is never consumed). Empty clusters drop out of the means
    # aggregate on both sides.
    oracle=f"""
    WITH RECURSIVE emb AS (SELECT vec_id,
                                  CAST(embedding AS DOUBLE[]) AS v
                           FROM embeddings),
    init AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v
             FROM emb ORDER BY vec_id LIMIT {K}),
    km AS (
      SELECT 0 AS it, CAST(cid AS INT) AS cid, v AS c FROM init
      UNION ALL
      SELECT q.it + 1, q.cid, list(q.m ORDER BY q.pos)
      FROM (
        SELECT a.it, a.cid, u.i AS pos, AVG(u.x) AS m
        FROM (
          SELECT k.it, e.vec_id, e.v, k.cid,
                 ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                   list_aggregate(list_transform(
                     range(1, len(e.v) + 1),
                     i -> (e.v[i] - k.c[i]) * (e.v[i] - k.c[i])), 'sum'),
                   k.cid) AS rn
          FROM km k CROSS JOIN emb e
          WHERE k.it < {ITERS} - 1) a
        CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(a.v)))
                              AS i, unnest(a.v) AS x) u
        WHERE a.rn = 1
        GROUP BY a.it, a.cid, u.i) q
      GROUP BY q.it, q.cid
    ),
    fin AS (
      SELECT cid, d2 FROM (
        SELECT k.cid,
               list_aggregate(list_transform(
                 range(1, len(e.v) + 1),
                 i -> (e.v[i] - k.c[i]) * (e.v[i] - k.c[i])), 'sum') AS d2,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_aggregate(list_transform(
                   range(1, len(e.v) + 1),
                   i -> (e.v[i] - k.c[i]) * (e.v[i] - k.c[i])), 'sum'),
                 k.cid) AS rn
        FROM km k CROSS JOIN emb e
        WHERE k.it = {ITERS} - 1) s
      WHERE rn = 1)
    SELECT cid, CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(SUM(d2) * 10000 + 0.5) / 10000 AS inertia
    FROM fin GROUP BY cid
    """,
)
def ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size/inertia profile of k-means(k=10, 4 iters) over the
    embedding corpus — see kmeans() for the scale design."""
    profile, _ = kmeans(spark, sf_dir)
    return profile


PCA_TOP = 8


def pca_train(spark: SparkSession, sf_dir: str):
    """Distributed PCA via sufficient statistics: one Arrow-batched pass
    emits per-batch partials (n, Σx, XᵀX flattened); the driver merges
    the ~num_partitions partial rows into the d×d covariance and runs
    the eigendecomposition there. The collected state is O(d²) per
    partition — model-sized, never data-sized — the same split MLlib's
    RowMatrix.computePrincipalComponents makes.

    Returns (eigvals desc, components[d, k] column-orthonormal, total_var)."""
    import numpy as np
    import pandas as pd

    emb = cat(spark, sf_dir)["embeddings"].select(
        F.col("embedding").cast("array<double>").alias("v")
    )

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["v"]), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "ss": [(X.T @ X).ravel().tolist()],
                }
            )

    rows = emb.mapInPandas(
        partials, "n long, s array<double>, ss array<double>"
    ).collect()
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(d, d) for r in rows], axis=0)
    cov = (ss - np.outer(s, s) / n) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-evals)
    evals, evecs = evals[order], evecs[:, order]
    return evals, evecs, float(evals.sum())


@query(
    "ml_pca",
    # Real oracle: the report is eigenVALUE-only (per-component
    # variance, explained and cumulative shares) — no eigenvector
    # coordinates — so the shared tournament-Jacobi recursion
    # (duck_linalg.duck_jacobi_eigvals, ~3e-16 vs LAPACK) certifies
    # every cell. The cumulative share repeats the op's sequential
    # divide-then-add order over descending components.
    oracle=f"""
    WITH RECURSIVE
    {duck_emb_cov_eigvals()},
    tot AS (SELECT list_aggregate(ev, 'sum') AS t FROM eig)
    SELECT CAST(u.i - 1 AS BIGINT) AS component,
           FLOOR(eig.ev[65 - u.i] * 1e6 + 0.5) / 1e6 AS eigenvalue,
           FLOOR(eig.ev[65 - u.i] / tot.t * 1e4 + 0.5) / 1e4 AS explained,
           FLOOR(list_aggregate(list_transform(range(1, u.i + 1),
                   m -> eig.ev[65 - m] / tot.t), 'sum') * 1e4 + 0.5) / 1e4
             AS cum_explained
    FROM eig CROSS JOIN tot
    CROSS JOIN (SELECT unnest(range(1, {PCA_TOP} + 1)) AS i) u
    ORDER BY component
    """,
)
def ml_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PCA_TOP} principal components of the embedding corpus:
    per-component eigenvalue, explained-variance ratio, and the
    cumulative ratio — the dimensionality screen before choosing an
    ANN index or a projection size. pytest pins agreement with
    numpy.cov on the collected corpus plus orthonormality/ordering
    invariants."""
    import numpy as np

    evals, _, total = pca_train(spark, sf_dir)
    k = min(PCA_TOP, len(evals))
    cum = 0.0
    out = []
    for i in range(k):
        cum += float(evals[i]) / total
        out.append(
            (
                i,
                float(np.floor(evals[i] * 1e6 + 0.5) / 1e6),
                float(np.floor(evals[i] / total * 1e4 + 0.5) / 1e4),
                float(np.floor(cum * 1e4 + 0.5) / 1e4),
            )
        )
    return spark.createDataFrame(
        out, "component long, eigenvalue double, explained double, cum_explained double"
    )


LOGREG_ITERS = 8
LOGREG_LR = 0.5


def logreg_train(spark: SparkSession, sf_dir: str, iters: int = LOGREG_ITERS):
    """Full-batch gradient descent for L2-free logistic regression of
    (label % 2) on the embedding vectors. The weight vector (d+1 with
    bias) broadcasts through the task closure; each iteration is ONE
    narrow mapInPandas pass emitting per-batch (gradient, loss, n)
    partials that the driver merges — gradient state is O(d) per
    partition. The assembled frame is cached so iterations don't
    re-read parquet.

    Returns (w, losses) with losses per-iteration mean log-loss
    (monotone non-increasing for small enough lr — pinned in pytest).
    At 100 TB: same structure with mini-batch sampling per step (or
    L-BFGS on the identical partial-gradient pass)."""
    import numpy as np
    import pandas as pd

    emb = (
        cat(spark, sf_dir)["embeddings"]
        .select(
            F.col("embedding").cast("array<double>").alias("v"),
            (F.col("label") % 2).cast("double").alias("y"),
        )
        .persist()
    )
    d = len(emb.first()["v"])
    w = np.zeros(d + 1)
    losses: list[float] = []
    try:
        for _ in range(iters):
            wb = w.copy()

            def partials(batches):
                for pdf in batches:
                    if not len(pdf):
                        continue
                    X = np.array(list(pdf["v"]), dtype=np.float64)
                    X = np.hstack([X, np.ones((len(X), 1))])
                    y = pdf["y"].to_numpy()
                    z = X @ wb
                    p = 1.0 / (1.0 + np.exp(-z))
                    eps = 1e-12
                    loss = -(
                        y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)
                    ).sum()
                    yield pd.DataFrame(
                        {
                            "g": [(X.T @ (p - y)).tolist()],
                            "loss": [float(loss)],
                            "n": [len(X)],
                        }
                    )

            rows = emb.mapInPandas(
                partials, "g array<double>, loss double, n long"
            ).collect()
            n = sum(r["n"] for r in rows)
            g = np.sum([np.array(r["g"]) for r in rows], axis=0) / n
            losses.append(sum(r["loss"] for r in rows) / n)
            w = w - LOGREG_LR * g
    finally:
        emb.unpersist()
    return w, losses


# The full-batch GD loop as a reusable recursive-CTE fragment (emb /
# nn / gd): gd's row at it = LOGREG_ITERS carries the final 65-weight
# DOUBLE list. Shared by the ml_logreg oracle and every oracle that
# scores rows against the trained probe (e.g. ml_importance_weighted
# _eval) so the training algebra is written once.
DUCK_LOGREG_GD = f"""emb AS (SELECT CAST(embedding AS DOUBLE[]) AS v,
                                  CAST(label % 2 AS DOUBLE) AS y
                           FROM embeddings),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM emb),
    gd AS (
      SELECT 0 AS it,
             list_transform(range(1, 66), i -> CAST(0.0 AS DOUBLE)) AS w
      UNION ALL
      SELECT q.it + 1, list(q.nw ORDER BY q.dim)
      FROM (
        SELECT r.it, u.dim,
               MAX(r.wd[u.dim])
               - {LOGREG_LR} * (SUM((r.p - r.y) * u.x) / MAX(r.n)) AS nw
        FROM (
          SELECT s.it, s.w AS wd, e.y, nx.n,
                 list_append(e.v, CAST(1.0 AS DOUBLE)) AS xv,
                 1.0 / (1.0 + EXP(-(list_aggregate(
                   list_transform(range(1, 65), i -> e.v[i] * s.w[i]),
                   'sum') + s.w[65]))) AS p
          FROM gd s CROSS JOIN emb e CROSS JOIN nn nx
          WHERE s.it < {LOGREG_ITERS}
        ) r
        CROSS JOIN LATERAL (SELECT unnest(generate_series(1, 65)) AS dim,
                                   unnest(r.xv) AS x) u
        GROUP BY r.it, u.dim
      ) q
      GROUP BY q.it
    )"""


@query(
    "ml_logreg",
    # Real oracle: full-batch GD as a recursive CTE carrying the
    # 65-weight vector (64 dims + bias) as a DOUBLE list (the shared
    # DUCK_LOGREG_GD fragment); the reported loss is the one recorded
    # at the LAST loop pass (weights after iters-1 updates),
    # accuracy/|w| use the final weights — exactly the Python
    # accounting.
    oracle=f"""
    WITH RECURSIVE {DUCK_LOGREG_GD},
    wlast AS (SELECT w FROM gd WHERE it = {LOGREG_ITERS}),
    wprev AS (SELECT w FROM gd WHERE it = {LOGREG_ITERS} - 1),
    lossrow AS (SELECT SUM(-(e.y * LN(p + 1e-12)
                             + (1 - e.y) * LN(1 - p + 1e-12))) AS ls
                FROM (SELECT e.y,
                             1.0 / (1.0 + EXP(-(list_aggregate(
                               list_transform(range(1, 65),
                                              i -> e.v[i] * wp.w[i]), 'sum')
                               + wp.w[65]))) AS p
                      FROM emb e CROSS JOIN wprev wp) e),
    accrow AS (SELECT SUM(CASE WHEN (CASE WHEN list_aggregate(
                          list_transform(range(1, 65),
                                         i -> e.v[i] * wl.w[i]), 'sum')
                          + wl.w[65] > 0 THEN 1 ELSE 0 END)
                          = (CASE WHEN e.y > 0.5 THEN 1 ELSE 0 END)
                          THEN 1 ELSE 0 END) AS c
               FROM emb e CROSS JOIN wlast wl)
    SELECT CAST(nn.n AS BIGINT) AS n,
           FLOOR(lr.ls / nn.n * 1e6 + 0.5) / 1e6 AS final_loss,
           FLOOR(ac.c / nn.n * 1e4 + 0.5) / 1e4 AS accuracy,
           FLOOR(SQRT(list_aggregate(list_transform(wl.w, x -> x * x),
                                     'sum')) * 1e6 + 0.5) / 1e6 AS w_norm
    FROM nn CROSS JOIN lossrow lr CROSS JOIN accrow ac CROSS JOIN wlast wl
    """,
)
def ml_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training summary of the distributed logistic regression: sample
    count, final mean log-loss, train accuracy, and |w| — the fields a
    training job logs. See logreg_train for the scale design."""
    import numpy as np

    w, losses = logreg_train(spark, sf_dir)
    wb = w

    emb = cat(spark, sf_dir)["embeddings"].select(
        F.col("embedding").cast("array<double>").alias("v"),
        (F.col("label") % 2).cast("double").alias("y"),
    )

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["v"]), dtype=np.float64)
            X = np.hstack([X, np.ones((len(X), 1))])
            pred = (X @ wb) > 0
            yield pd.DataFrame(
                {
                    "correct": [int((pred == (pdf["y"].to_numpy() > 0.5)).sum())],
                    "n": [len(X)],
                }
            )

    agg = (
        emb.mapInPandas(score, "correct long, n long")
        .agg(F.sum("correct").alias("c"), F.sum("n").alias("n"))
        .collect()[0]
    )
    acc = agg["c"] / agg["n"]
    return spark.createDataFrame(
        [
            (
                int(agg["n"]),
                float(np.floor(losses[-1] * 1e6 + 0.5) / 1e6),
                float(np.floor(acc * 1e4 + 0.5) / 1e4),
                float(np.floor(np.linalg.norm(w) * 1e6 + 0.5) / 1e6),
            )
        ],
        "n long, final_loss double, accuracy double, w_norm double",
    )
