"""Wave 195: transform selection and distribution-free intervals.

ml_boxcox_lambda profiles the Box-Cox log-likelihood of order value
over a fixed λ grid — the principled answer to "should this heavy-
tailed column be logged before modeling?", replacing the eyeballed
log-transform every downstream fit (stat_regression, ml_ridge,
stat_anova_f) silently depends on. ml_clustering_agreement scores
the sign-LSH bucket partition against the label partition with NMI
and the adjusted Rand index — the chance-corrected answer to "does
our blocking respect semantics?", which ml_silhouette (geometry
only) and ml_knn_lsh_eval (accuracy of one classifier) don't give.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat
from mister_spark.registry import query

BC_LAMBDAS = (-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0)


def _bc_sum_exprs() -> list[str]:
    """Per-λ transformed sums, one shared string per aggregate."""
    out = ["CAST(COUNT(*) AS DOUBLE) AS n", "SUM(LN(x)) AS slx"]
    for i, lam in enumerate(BC_LAMBDAS):
        if lam == 0.0:
            y = "LN(x)"
        else:
            y = f"(POWER(x, {lam!r}e0) - 1.0e0) / {lam!r}e0"
        out.append(f"SUM({y}) AS s_{i}")
        out.append(f"SUM(({y}) * ({y})) AS q_{i}")
    return out


def _bc_ll_expr(i: int, lam: float) -> str:
    """Profile log-likelihood for grid point i (MLE variance)."""
    var = f"(q_{i} / n - (s_{i} / n) * (s_{i} / n))"
    return (
        f"-(n / 2.0e0) * LN(GREATEST({var}, 1e-300))"
        f" + ({lam!r}e0 - 1.0e0) * slx AS ll_{i}"
    )


_BC_LL_EXPRS = [_bc_ll_expr(i, lam) for i, lam in enumerate(BC_LAMBDAS)]
_BC_MAX_LL = (
    "GREATEST(" + ", ".join(f"ll_{i}" for i in range(len(BC_LAMBDAS))) + ")"
)


@query(
    "ml_boxcox_lambda",
    # Real oracle: the per-λ sums and the likelihood algebra are the
    # SAME strings Spark evaluates; grid points are decimal literals.
    # The only cross-engine noise is libm pow/ln plus summation order
    # (~1e-12 relative), while adjacent-λ likelihood gaps are O(n) —
    # the is_best flag compares ROUNDED values and cannot flip.
    oracle=f"""
    WITH f AS (SELECT o_totalprice AS x FROM orders),
    mom AS (SELECT {", ".join(_bc_sum_exprs())} FROM f),
    ll AS (SELECT mom.*, {", ".join(_BC_LL_EXPRS)} FROM mom),
    g AS (SELECT * FROM (VALUES {", ".join(f"({lam!r}e0, {i})" for i, lam in enumerate(BC_LAMBDAS))})
             AS t(box_lambda, i)),
    o AS (SELECT g.box_lambda,
                 FLOOR(CASE g.i
                       {" ".join(f"WHEN {i} THEN ll.ll_{i}" for i in range(len(BC_LAMBDAS)))}
                       END * 1e4 + 0.5) / 1e4 AS loglik,
                 FLOOR({_BC_MAX_LL} * 1e4 + 0.5) / 1e4 AS best_ll
          FROM ll, g)
    SELECT box_lambda, loglik,
           CASE WHEN loglik = best_ll THEN 1 ELSE 0 END AS is_best
    FROM o ORDER BY box_lambda
    """,
)
def ml_boxcox_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-Cox profile log-likelihood of order value over the λ grid
    (-2 … 2): LL(λ) = −(n/2)·ln σ̂²_λ + (λ−1)·Σ ln x with the MLE
    variance of the transformed column. The argmax row says which
    power transform makes the column most Gaussian — λ near 0 means
    "log it", λ near 1 means "leave it alone" — decided by
    likelihood, not by eyeballing a histogram.

    Scale: ONE pass computes every per-λ sufficient statistic
    (16 map-side-combinable sums); the likelihood algebra runs on a
    single row and the grid never multiplies the data (no explode,
    no per-λ scan)."""
    f = cat(spark, sf_dir)["orders"].select(
        F.col("o_totalprice").alias("x")
    )
    mom = f.selectExpr(*_bc_sum_exprs())
    ll = mom.selectExpr("*", *_BC_LL_EXPRS)
    stack_args = ", ".join(
        f"{lam!r}e0, FLOOR(ll_{i} * 1e4 + 0.5) / 1e4"
        for i, lam in enumerate(BC_LAMBDAS)
    )
    o = ll.selectExpr(
        f"stack({len(BC_LAMBDAS)}, {stack_args}) AS (box_lambda, loglik)",
        f"FLOOR({_BC_MAX_LL} * 1e4 + 0.5) / 1e4 AS best_ll",
    )
    return o.selectExpr(
        "box_lambda",
        "loglik",
        "CASE WHEN loglik = best_ll THEN 1 ELSE 0 END AS is_best",
    ).orderBy("box_lambda")


SIG_BITS = 3  # 8 sign-LSH buckets from the first three md5 planes


def _plane_sign(d: int, c: int) -> float:
    """±1 plane weight, identical to the _LS_PLANES_SQL convention
    (extras129): md5 of "d:c", low bit of the first 15 hex digits."""
    import hashlib

    return (
        1.0
        if int(hashlib.md5(f"{d}:{c}".encode()).hexdigest()[:15], 16) & 1
        else -1.0
    )


def _dot_terms(c: int, elem) -> list[str]:
    """The 64-term signed sum for plane c, one shared textual order;
    `elem` formats a 0-based dimension index into an element access."""
    return [
        ("+ " if _plane_sign(d, c) > 0 else "- ") + elem(d)
        for d in range(64)
    ]


def _bucket_sql(elem) -> str:
    bits = []
    for c in range(SIG_BITS):
        dot = " ".join(_dot_terms(c, elem)).lstrip("+ ")
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << c} ELSE 0 END)")
    return " + ".join(bits)


_BUCKET_SPARK = _bucket_sql(lambda d: f"CAST(embedding[{d}] AS DOUBLE)")
_BUCKET_DUCK = _bucket_sql(lambda d: f"CAST(embedding[{d + 1}] AS DOUBLE)")


@query(
    "ml_clustering_agreement",
    # Real oracle: the bucket assignment is the SAME textual signed
    # sum (0- vs 1-based element access only), so both engines agree
    # bit-for-bit on every partition cell; the contingency table is
    # integer counts and NMI/ARI are closed forms over those integers
    # — only the final ln/divisions touch floats, inside the grid.
    oracle=f"""
    WITH a AS (SELECT label, {_BUCKET_DUCK} AS bucket FROM embeddings),
    ct AS (SELECT label, bucket, CAST(COUNT(*) AS DOUBLE) AS nij
           FROM a GROUP BY label, bucket),
    ra AS (SELECT label, SUM(nij) AS ai FROM ct GROUP BY label),
    rb AS (SELECT bucket, SUM(nij) AS bj FROM ct GROUP BY bucket),
    nn AS (SELECT SUM(nij) AS n FROM ct),
    mi AS (SELECT SUM(ct.nij / nn.n
                      * LN(ct.nij * nn.n / (ra.ai * rb.bj))) AS i
           FROM ct JOIN ra USING (label) JOIN rb USING (bucket), nn),
    ha AS (SELECT -SUM(ai / nn.n * LN(ai / nn.n)) AS h FROM ra, nn),
    hb AS (SELECT -SUM(bj / nn.n * LN(bj / nn.n)) AS h FROM rb, nn),
    pr AS (SELECT (SELECT SUM(nij * (nij - 1) / 2) FROM ct) AS sidx,
                  (SELECT SUM(ai * (ai - 1) / 2) FROM ra) AS sa,
                  (SELECT SUM(bj * (bj - 1) / 2) FROM rb) AS sb,
                  (SELECT n * (n - 1) / 2 FROM nn) AS tp)
    SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n_points,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ra) AS n_labels,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM rb) AS n_buckets,
           FLOOR(COALESCE(mi.i / NULLIF(SQRT(ha.h * hb.h), 0), 0.0)
                 * 1e6 + 0.5) / 1e6 AS nmi,
           FLOOR(COALESCE(
               (pr.sidx - pr.sa * pr.sb / NULLIF(pr.tp, 0))
               / NULLIF((pr.sa + pr.sb) / 2.0e0
                        - pr.sa * pr.sb / NULLIF(pr.tp, 0), 0),
               0.0) * 1e6 + 0.5) / 1e6 AS ari
    FROM mi, ha, hb, pr
    """,
)
def ml_clustering_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External cluster validation: NMI and adjusted Rand index
    between the embedding LABEL partition and the 8-bucket sign-LSH
    partition (first three md5 hyperplanes — the same family every
    sim_*/dd_* blocking op uses). High agreement means LSH buckets
    respect label structure, i.e. blocked near-dup and kNN ops are
    recall-safe; agreement near chance (ARI ≈ 0) means the blocking
    is orthogonal to semantics and candidate generation needs more
    bits or tables. ml_silhouette scores geometry; this scores
    partition-vs-partition association with chance correction.

    Scale: the bucket assignment is three 64-term codegen expressions
    (no UDF, no shuffle); everything downstream runs on the ≤
    |labels|×8 contingency table — integer counts, closed-form NMI
    and ARI."""
    emb = cat(spark, sf_dir)["embeddings"].selectExpr(
        "label", f"{_BUCKET_SPARK} AS bucket"
    )
    ct = emb.groupBy("label", "bucket").agg(
        F.count(F.lit(1)).cast("double").alias("nij")
    )
    ct = ct.localCheckpoint()  # model-sized; feeds four aggregates
    ra = ct.groupBy("label").agg(F.sum("nij").alias("ai"))
    rb = ct.groupBy("bucket").agg(F.sum("nij").alias("bj"))
    nn = ct.agg(F.sum("nij").alias("n"))
    mi = (
        ct.join(ra, "label")
        .join(rb, "bucket")
        .crossJoin(F.broadcast(nn))
        .agg(
            F.sum(
                F.col("nij")
                / F.col("n")
                * F.log(
                    F.col("nij") * F.col("n") / (F.col("ai") * F.col("bj"))
                )
            ).alias("i")
        )
    )
    ha = ra.crossJoin(F.broadcast(nn)).agg(
        (-F.sum(F.col("ai") / F.col("n") * F.log(F.col("ai") / F.col("n"))))
        .alias("h_a")
    )
    hb = rb.crossJoin(F.broadcast(nn)).agg(
        (-F.sum(F.col("bj") / F.col("n") * F.log(F.col("bj") / F.col("n"))))
        .alias("h_b")
    )
    pr = (
        ct.agg(F.sum(F.col("nij") * (F.col("nij") - 1) / 2).alias("sidx"))
        .crossJoin(ra.agg(F.sum(F.col("ai") * (F.col("ai") - 1) / 2).alias("sa")))
        .crossJoin(rb.agg(F.sum(F.col("bj") * (F.col("bj") - 1) / 2).alias("sb")))
        .crossJoin(nn.select((F.col("n") * (F.col("n") - 1) / 2).alias("tp")))
    )
    counts = (
        ra.agg(F.count(F.lit(1)).cast("bigint").alias("n_labels"))
        .crossJoin(rb.agg(F.count(F.lit(1)).cast("bigint").alias("n_buckets")))
        .crossJoin(nn.select(F.col("n").cast("bigint").alias("n_points")))
    )
    return (
        counts.crossJoin(mi)
        .crossJoin(ha)
        .crossJoin(hb)
        .crossJoin(pr)
        .selectExpr(
            "n_points",
            "n_labels",
            "n_buckets",
            "FLOOR(COALESCE(i / NULLIF(SQRT(h_a * h_b), 0), 0.0)"
            " * 1e6 + 0.5) / 1e6 AS nmi",
            "FLOOR(COALESCE((sidx - sa * sb / NULLIF(tp, 0))"
            " / NULLIF((sa + sb) / 2.0e0 - sa * sb / NULLIF(tp, 0), 0),"
            " 0.0) * 1e6 + 0.5) / 1e6 AS ari",
        )
    )
