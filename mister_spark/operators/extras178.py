"""Wave 178: trainable corpus quality classifier.

ds_quality_classifier is the DCLM/fastText-style filter pipeline: a
logistic regression over standardized bag-of-words features trained
to recognize a target slice, then scored on a held-out quarter. This
is the learned sibling of the rule-based gates (tx_gopher_quality,
ds_perplexity_filter): rules encode priors, the classifier learns the
discriminating vocabulary from examples — the filter family most
modern pretraining pipelines end with. The synthetic corpus has no
semantic quality label (every language shares one 31-word vocabulary,
so language itself is NOT separable from BoW — verified), so the
target slice is 'length above the train median': vocabulary COVERAGE
is the genuine signal (corr 0.9 with length), and the pipeline shape
— train / standardize / held-out gate — is exactly what a production
reference-corpus label would reuse.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import tokens
from mister_spark.operators.common import cat
from mister_spark.registry import query

QC_DIM = 64  # vocabulary cap: top doc-frequency terms (Heaps-safe)
QC_ITERS = 8  # IRLS (Newton) steps — quadratic convergence near the MLE
QC_RIDGE = 1e-6  # keeps the Hessian invertible on separable data


def _irls_partials(wb: np.ndarray, d1: int):
    """mapInPandas factory: per-batch weighted Newton partials.

    Each Arrow batch contributes X1ᵀ·diag(c·p(1-p))·X1 (the Hessian)
    and X1ᵀ·(c·(p-y)) (the gradient), computed as ONE numpy GEMM per
    batch — the per-iteration state leaving an executor is O(dim²)
    regardless of corpus size."""

    def f(batches):
        H = np.zeros((d1, d1))
        g = np.zeros(d1)
        for pdf in batches:
            if not len(pdf):
                continue
            X1 = np.ones((len(pdf), d1))
            X1[:, :-1] = np.array(pdf["xs"].to_list())
            c = pdf["c"].to_numpy(dtype="float64")
            y = pdf["y"].to_numpy(dtype="float64")
            p = 1.0 / (1.0 + np.exp(-np.clip(X1 @ wb, -35.0, 35.0)))
            g += X1.T @ (c * (p - y))
            H += (X1 * (c * p * (1.0 - p))[:, None]).T @ X1
        yield pd.DataFrame({"h": [H.ravel().tolist()], "g": [g.tolist()]})

    return f


def _qc_oracle() -> str:
    """The entire pipeline — vocab pick, exact train median, pattern
    collapse, standardization, 8 IRLS/Newton steps (each a 65×65
    Cholesky solve via duck_linalg, one instance per step in the same
    WITH RECURSIVE list) and held-out scoring — replayed in SQL. The
    z-clip, ridge and 1e-12 floors are reproduced exactly; float
    drift between numpy GEMM partials and SQL sums is absorbed by the
    1e-4 output grid."""
    from mister_spark.functions.text import DUCK_TOKENS
    from mister_spark.operators.duck_linalg import duck_spd_solve

    d, d1 = QC_DIM, QC_DIM + 1
    blocks = []
    for t in range(QC_ITERS):
        blocks.append(f"""
    pz{t} AS MATERIALIZED (SELECT p.c, p.y, p.xs1,
                     1.0 / (1.0 + EXP(-LEAST(GREATEST(
                       list_aggregate(list_transform(range(1, {d1 + 1}),
                         i -> p.xs1[i] * w.w[i]), 'sum'),
                       -35.0), 35.0))) AS pr
              FROM ptr p CROSS JOIN w{t} w),
    hb{t} AS (SELECT pr2.i AS i, pr2.j AS j,
                     SUM(z.c * z.pr * (1 - z.pr)
                         * z.xs1[pr2.i] * z.xs1[pr2.j]) AS h
              FROM pz{t} z CROSS JOIN pairs pr2
              GROUP BY 1, 2),
    mat{t} AS MATERIALIZED (SELECT list(row ORDER BY i) AS a FROM (
        SELECT i, list(h + CASE WHEN i = j THEN {QC_RIDGE!r}
                           ELSE 0.0 END ORDER BY j) AS row
        FROM hb{t} GROUP BY i) q),
    rhs{t} AS MATERIALIZED (SELECT [list(g ORDER BY i)] AS b FROM (
        SELECT u.i AS i, SUM(z.c * (z.pr - z.y) * z.xs1[u.i]) AS g
        FROM pz{t} z CROSS JOIN dims1 u GROUP BY u.i) q),
    {duck_spd_solve(d1, 1, mat=f"mat{t}", rhs=f"rhs{t}",
                    out=f"sol{t}", tag=f"ls{t}")},
    w{t + 1} AS (SELECT list_transform(range(1, {d1 + 1}),
                   i -> w.w[i] - s.x[1][i]) AS w
                 FROM w{t} w CROSS JOIN sol{t} s)""")
    newton = ",".join(blocks)
    return f"""
    WITH RECURSIVE
    tf AS MATERIALIZED (SELECT DISTINCT doc_id, t.tok AS tok
           FROM documents, LATERAL (
             SELECT unnest({DUCK_TOKENS}) AS tok) t),
    voc AS (SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY tok) AS INT)
                   AS idx
            FROM (SELECT tok FROM (
                SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
                ORDER BY df DESC, tok LIMIT {d}) q) z),
    med AS (SELECT median(CAST(n_chars AS DOUBLE)) AS m
            FROM documents WHERE doc_id % 4 <> 0),
    pres AS (SELECT doc_id, list(DISTINCT idx) AS ids
             FROM tf JOIN voc USING (tok) GROUP BY doc_id),
    xr AS (SELECT dd.doc_id % 4 = 0 AS heldout,
                  CASE WHEN CAST(dd.n_chars AS DOUBLE) > med.m
                       THEN CAST(1.0 AS DOUBLE) ELSE 0.0 END AS y,
                  list_transform(range(1, {d + 1}), i ->
                    CASE WHEN COALESCE(list_contains(p.ids, i), FALSE)
                         THEN CAST(1.0 AS DOUBLE) ELSE 0.0 END) AS x
           FROM documents dd LEFT JOIN pres p USING (doc_id)
           CROSS JOIN med),
    pat AS MATERIALIZED (SELECT x, heldout, y, CAST(COUNT(*) AS DOUBLE) AS c
            FROM xr GROUP BY 1, 2, 3),
    ntr AS (SELECT SUM(c) AS n FROM pat WHERE NOT heldout),
    mus AS (SELECT u.i AS i, SUM(p.c * p.x[u.i]) / any_value(nt.n) AS mu
            FROM pat p CROSS JOIN ntr nt
            CROSS JOIN LATERAL
              (SELECT unnest(range(1, {d + 1})) AS i) u
            WHERE NOT p.heldout GROUP BY u.i),
    musd AS MATERIALIZED (SELECT list(mu ORDER BY i) AS mu,
                    list(GREATEST(SQRT(mu * (1 - mu)), 1e-9)
                         ORDER BY i) AS sd
             FROM mus),
    stdp AS MATERIALIZED (SELECT heldout, y, c,
                    list_append(list_transform(range(1, {d + 1}),
                      i -> (p.x[i] - m.mu[i]) / m.sd[i]),
                      CAST(1.0 AS DOUBLE)) AS xs1
             FROM pat p CROSS JOIN musd m),
    ptr AS MATERIALIZED (SELECT * FROM stdp WHERE NOT heldout),
    pairs AS MATERIALIZED (SELECT i.i AS i, j.j AS j
              FROM (SELECT unnest(range(1, {d1 + 1})) AS i) i,
                   (SELECT unnest(range(1, {d1 + 1})) AS j) j),
    dims1 AS (SELECT unnest(range(1, {d1 + 1})) AS i),
    w0 AS (SELECT list_transform(range(1, {d1 + 1}),
             i -> CAST(0.0 AS DOUBLE)) AS w),
    {newton},
    sc AS (SELECT heldout, y, c,
                  1.0 / (1.0 + EXP(-(list_aggregate(list_transform(
                    range(1, {d1 + 1}), i -> s.xs1[i] * w.w[i]),
                    'sum')))) AS p
           FROM stdp s CROSS JOIN w{QC_ITERS} w),
    mets AS (SELECT
        SUM(CASE WHEN NOT heldout THEN -c * LN(GREATEST(
              CASE WHEN y = 1.0 THEN p ELSE 1.0 - p END, 1e-12))
            ELSE 0.0 END) AS nll_sum,
        SUM(c) FILTER (WHERE heldout) AS n,
        SUM(c) FILTER (WHERE heldout
          AND (CASE WHEN p >= 0.5 THEN 1.0 ELSE 0.0 END) = y)
          AS correct,
        SUM(c) FILTER (WHERE heldout AND p >= 0.5 AND y = 1.0) AS tp,
        SUM(c) FILTER (WHERE heldout AND p >= 0.5) AS pred_pos,
        SUM(c) FILTER (WHERE heldout AND y = 1.0) AS actual_pos
        FROM sc)
    SELECT CAST(nt.n AS BIGINT) AS train_docs,
           CAST(m.n AS BIGINT) AS heldout_docs,
           FLOOR(m.correct / m.n * 1e4 + 0.5) / 1e4 AS accuracy,
           FLOOR(CASE WHEN COALESCE(m.pred_pos, 0) > 0
                      THEN m.tp / m.pred_pos ELSE 0.0 END
                 * 1e4 + 0.5) / 1e4 AS precision,
           FLOOR(CASE WHEN COALESCE(m.actual_pos, 0) > 0
                      THEN m.tp / m.actual_pos ELSE 0.0 END
                 * 1e4 + 0.5) / 1e4 AS recall,
           FLOOR(CASE WHEN COALESCE(m.tp / m.pred_pos, 0)
                        + COALESCE(m.tp / m.actual_pos, 0) > 0
                      THEN 2 * (m.tp / m.pred_pos)
                           * (m.tp / m.actual_pos)
                           / ((m.tp / m.pred_pos)
                              + (m.tp / m.actual_pos))
                      ELSE 0.0 END * 1e4 + 0.5) / 1e4 AS f1,
           FLOOR(GREATEST(m.actual_pos, m.n - m.actual_pos) / m.n
                 * 1e4 + 0.5) / 1e4 AS majority_baseline,
           FLOOR(m.nll_sum / nt.n * 1e4 + 0.5) / 1e4 AS train_nll
    FROM mets m CROSS JOIN ntr nt
    """


@query("ds_quality_classifier", oracle=_qc_oracle())
# Full IRLS replay (8 Cholesky-solved Newton steps) in the oracle;
# pytest additionally gates accuracy above the majority baseline.
def ds_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words logistic quality classifier: binary token-presence
    features over the top-{dim} doc-frequency terms, standardized by
    the TRAIN split's mean/std, label = document length above the
    train median, fit by {it} IRLS/Newton steps (ridge {ridge}, zero
    init — deterministic, seed-free) on the doc_id%4!=0 split, scored
    on the held-out quarter at threshold 0.5. Emits split sizes,
    held-out accuracy / precision / recall / F1, the majority baseline
    it must beat (pytest gates accuracy above it), and train NLL.

    Scale: three design rules keep this flat at 100 TB. (1) The
    vocabulary is capped at the top-{dim} doc-frequency terms, so the
    model, the standardization vectors and the Hessian are O(dim²)
    driver state no matter how Heaps' law grows the raw vocabulary
    (beyond a few hundred dims, switch the optimizer to distributed
    SGD — Newton's dim² partials stop paying). (2) Documents collapse
    to WEIGHTED DISTINCT FEATURE PATTERNS (groupBy x, split, label →
    count) before any iteration: binary BoW over dim terms has far
    fewer patterns than documents, the fit is exactly equivalent on
    the weighted rows, and every IRLS pass scans the collapsed frame,
    not the corpus. (3) Each Newton step is ONE mapInPandas job whose
    per-partition output is the O(dim²) partial Hessian/gradient —
    {it} jobs total versus the 40 a first-order full-batch fit needs,
    because Newton converges quadratically. The exact train median
    would become approx_percentile at corpus scale (same gate,
    sketched threshold)."""
    docs = cat(spark, sf_dir)["documents"]
    # tokenized ONCE: the distinct-token arrays feed the vocab count
    # AND the presence join — without the checkpoint the tokenize +
    # array_distinct pipeline re-executes per branch (guide §1.2)
    td = docs.select(
        "doc_id", F.array_distinct(tokens()).alias("ts")
    ).localCheckpoint()
    # presence, not counts: one row per (doc, distinct term)
    tf = td.select("doc_id", F.explode("ts").alias("w"))
    vocab = sorted(
        r["w"]
        for r in tf.groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), "w")
        .limit(QC_DIM)
        .collect()
    )
    dim = len(vocab)
    d1 = dim + 1
    vmap = F.broadcast(
        spark.createDataFrame(list(enumerate(vocab)), "idx int, w string")
    )
    base = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("nc"),
        (F.col("doc_id") % 4 == 0).alias("heldout"),
    )
    med = (
        base.filter(~F.col("heldout")).agg(F.median("nc")).collect()[0][0]
    )
    present = (
        tf.join(vmap, "w")
        .groupBy("doc_id")
        .agg(F.collect_set("idx").alias("present"))
    )
    feats = base.join(present, "doc_id", "left").select(
        "heldout",
        (F.col("nc") > med).cast("double").alias("y"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(
                F.array_contains("present", i), F.lit(False)
            ).cast("double"),
        ).alias("x"),
    )
    # corpus → weighted distinct patterns: the only corpus-scale
    # shuffle; everything after runs on the collapsed frame
    pat = (
        feats.groupBy("x", "heldout", "y")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .localCheckpoint()
    )
    stats = pat.filter(~F.col("heldout")).agg(
        F.sum("c").alias("n"),
        *[F.sum(F.col("c") * F.col("x")[i]).alias(f"s{i}") for i in range(dim)],
    ).collect()[0]
    n_train = stats["n"]
    mu = [stats[f"s{i}"] / n_train for i in range(dim)]
    # binary features: E[x²] = E[x], so sd = sqrt(p(1-p)) exactly
    sd = [max((m * (1.0 - m)) ** 0.5, 1e-9) for m in mu]
    mulit = F.array(*[F.lit(v) for v in mu])
    sdlit = F.array(*[F.lit(v) for v in sd])
    std = pat.select(
        "heldout",
        "y",
        "c",
        F.zip_with(
            F.zip_with(F.col("x"), mulit, lambda xi, m: xi - m),
            sdlit,
            lambda d, s: d / s,
        ).alias("xs"),
    ).localCheckpoint()
    tr = std.filter(~F.col("heldout"))
    wb = np.zeros(d1)
    ridge = QC_RIDGE * np.eye(d1)
    part_schema = "h array<double>, g array<double>"
    for _ in range(QC_ITERS):
        parts = tr.mapInPandas(_irls_partials(wb, d1), part_schema).collect()
        H = sum(
            (np.array(p["h"]).reshape(d1, d1) for p in parts),
            np.zeros((d1, d1)),
        )
        g = sum((np.array(p["g"]) for p in parts), np.zeros(d1))
        wb = wb - np.linalg.solve(H + ridge, g)
    wlit = F.array(*[F.lit(float(v)) for v in wb[:dim]])
    z = (
        F.aggregate(
            F.zip_with(F.col("xs"), wlit, lambda xi, wi: xi * wi),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        + F.lit(float(wb[dim]))
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    yhat = (p >= 0.5).cast("double")
    q = F.greatest(
        F.when(F.col("y") == 1.0, p).otherwise(F.lit(1.0) - p), F.lit(1e-12)
    )
    ho = F.col("heldout")
    m = std.select(
        "heldout", "y", "c", yhat.alias("yhat"), q.alias("q")
    ).agg(
        F.sum(F.when(~ho, -F.col("c") * F.log(F.col("q")))).alias("nll_sum"),
        F.sum(F.when(ho, F.col("c"))).alias("n"),
        F.sum(F.when(ho & (F.col("yhat") == F.col("y")), F.col("c"))).alias(
            "correct"
        ),
        F.sum(
            F.when(ho & (F.col("yhat") == 1.0) & (F.col("y") == 1.0), F.col("c"))
        ).alias("tp"),
        F.sum(F.when(ho & (F.col("yhat") == 1.0), F.col("c"))).alias(
            "pred_pos"
        ),
        F.sum(F.when(ho & (F.col("y") == 1.0), F.col("c"))).alias(
            "actual_pos"
        ),
    ).collect()[0]
    nll = m["nll_sum"] / n_train
    acc = m["correct"] / m["n"]
    prec = m["tp"] / m["pred_pos"] if m["pred_pos"] else 0.0
    rec = m["tp"] / m["actual_pos"] if m["actual_pos"] else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    base_acc = max(m["actual_pos"], m["n"] - m["actual_pos"]) / m["n"]
    import math

    r4 = lambda x: math.floor(x * 1e4 + 0.5) / 1e4  # noqa: E731
    # floor-grid rounding — identical double arithmetic to the oracle
    return spark.createDataFrame(
        [
            (
                int(n_train),
                int(m["n"]),
                r4(acc),
                r4(prec),
                r4(rec),
                r4(f1),
                r4(base_acc),
                r4(float(nll)),
            )
        ],
        "train_docs long, heldout_docs long, accuracy double, "
        "precision double, recall double, f1 double, "
        "majority_baseline double, train_nll double",
    )


ds_quality_classifier.__doc__ = ds_quality_classifier.__doc__.format(
    it=QC_ITERS, ridge=QC_RIDGE, dim=QC_DIM
)
