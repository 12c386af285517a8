"""Wave 77: rank fusion, errors-in-variables regression, fairness
auditing, and storage integrity.

ml_borda_fusion aggregates three scorers' rankings with Borda counts
(the ensemble-retrieval fusion that needs no score calibration);
stat_deming_regression fits the line when BOTH variables carry error
(OLS attenuates; Deming doesn't — the measurement-comparison
companion to stat_bland_altman); ml_fairness_audit is the
equalized-odds read (per-group TPR/FPR gaps with significance flags)
every deployed classifier owes its review board; io_file_checksums
builds the content-hash manifest that turns silent bit-rot into a
detectable diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

BORDA_QUERIES = 8
BORDA_K = 10
FAIR_Z = 1.96


@query(
    "ml_borda_fusion",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < {BORDA_QUERIES}),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id >= {BORDA_QUERIES}),
    sc AS (SELECT q.q_id, c.vec_id,
                  FLOOR(list_cosine_similarity(c.v, q.qv) * 10000 + 0.5)
                    / 10000 AS s1,
                  FLOOR(list_dot_product(c.v, q.qv) * 10000 + 0.5) / 10000
                    AS s2,
                  FLOOR(-list_distance(c.v, q.qv) * 10000 + 0.5) / 10000
                    AS s3
           FROM q CROSS JOIN c),
    r AS (SELECT q_id, vec_id,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY s1 DESC, vec_id) AS r1,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY s2 DESC, vec_id) AS r2,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY s3 DESC, vec_id) AS r3
          FROM sc),
    b AS (SELECT q_id, vec_id, r1 + r2 + r3 AS borda FROM r),
    top AS (SELECT q_id, vec_id, CAST(borda AS BIGINT) AS borda,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY borda, vec_id) AS rn
            FROM b)
    SELECT q_id, vec_id, borda, CAST(rn AS BIGINT) AS rn
    FROM top WHERE rn <= {BORDA_K}
    """,
)
def ml_borda_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borda-count rank fusion of three scorers (cosine, dot product,
    negative L2) per query: each candidate's fused score is the SUM of
    its three ranks — scale-free, so the scorers need no calibration
    to combine, which is exactly why rank fusion beats score averaging
    across heterogeneous retrievers. Top {k} per query reported.

    Scale: one broadcast-query scoring pass feeds three rank windows
    over the same frame; at corpus scale each window takes the
    two-phase top-k prune first (sim_topk_join's plan)."""
    from mister_spark.functions.vectors import dot as vdot, norm as vnorm

    emb = cat(spark, sf_dir)["embeddings"]
    q = emb.filter(F.col("vec_id") < BORDA_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c = emb.filter(F.col("vec_id") >= BORDA_QUERIES).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with("v", "qv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    sc = c.join(F.broadcast(q)).select(
        "q_id",
        "vec_id",
        ratio(vdot("v", "qv") / (vnorm("v") * vnorm("qv"))).alias("s1"),
        ratio(vdot("v", "qv")).alias("s2"),
        ratio(-l2).alias("s3"),
    ).localCheckpoint()
    r = sc
    for i in (1, 2, 3):
        w = W.partitionBy("q_id").orderBy(F.desc(f"s{i}"), "vec_id")
        r = r.withColumn(f"r{i}", F.row_number().over(w))
    b = r.select(
        "q_id",
        "vec_id",
        (F.col("r1") + F.col("r2") + F.col("r3")).cast("bigint").alias("borda"),
    )
    wt = W.partitionBy("q_id").orderBy("borda", "vec_id")
    return (
        b.withColumn("rn", F.row_number().over(wt).cast("bigint"))
        .filter(F.col("rn") <= BORDA_K)
        .select("q_id", "vec_id", "borda", "rn")
    )


ml_borda_fusion.__doc__ = ml_borda_fusion.__doc__.format(k=BORDA_K)


@query(
    "stat_deming_regression",
    oracle="""
    WITH m AS (SELECT CAST(embedding[1] AS DOUBLE) AS x,
                      CAST(embedding[2] AS DOUBLE) AS y
               FROM embeddings),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
          FROM m),
    c AS (SELECT n,
                 (syy - sy * sy / n) / n AS vy,
                 (sxx - sx * sx / n) / n AS vx,
                 (sxy - sx * sy / n) / n AS cxy,
                 sx / n AS mx, sy / n AS my
          FROM s)
    SELECT CAST(n AS BIGINT) AS n,
           FLOOR(((vy - vx) + sqrt((vy - vx) * (vy - vx) + 4 * cxy * cxy))
                 / (2 * cxy) * 10000 + 0.5) / 10000 AS slope,
           FLOOR((my - ((vy - vx) + sqrt((vy - vx) * (vy - vx)
                                         + 4 * cxy * cxy))
                        / (2 * cxy) * mx) * 10000 + 0.5) / 10000 AS intercept,
           FLOOR(cxy / sqrt(vx * vy) * 10000 + 0.5) / 10000 AS corr
    FROM c
    """,
)
def stat_deming_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deming regression (δ=1) between two noisy measurements: the
    closed-form slope ((v_y−v_x) + √((v_y−v_x)² + 4c²))/(2c) treats
    error in BOTH variables symmetrically — OLS of y-on-x attenuates
    toward zero when x is noisy, which is why instrument comparisons
    use Deming (and Bland–Altman for agreement; this wave ships the
    fit, wave 72 shipped the agreement).

    Scale: one sufficient-statistics pass."""
    emb = cat(spark, sf_dir)["embeddings"]
    m = emb.select(
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    x, y = F.col("x"), F.col("y")
    s = m.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    vy = (F.col("syy") - sy * sy / n) / n
    vx = (F.col("sxx") - sx * sx / n) / n
    cxy = (F.col("sxy") - sx * sy / n) / n
    slope = ((vy - vx) + F.sqrt((vy - vx) * (vy - vx) + 4 * cxy * cxy)) / (
        2 * cxy
    )
    return s.select(
        n.cast("bigint").alias("n"),
        ratio(slope).alias("slope"),
        ratio(sy / n - slope * sx / n).alias("intercept"),
        ratio(cxy / F.sqrt(vx * vy)).alias("corr"),
    )


@query(
    "ml_fairness_audit",
    oracle=f"""
    WITH s AS (SELECT d.lang,
                      CASE WHEN 1.0 / (1.0 + exp(-CAST(e.embedding[1]
                                                       AS DOUBLE))) > 0.5
                           THEN 1 ELSE 0 END AS pred,
                      CASE WHEN e.label < 5 THEN 1 ELSE 0 END AS y
               FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
    g AS (SELECT SUM(CASE WHEN y = 1 AND pred = 1 THEN 1.0 ELSE 0 END)
                   / NULLIF(SUM(CASE WHEN y = 1 THEN 1.0 ELSE 0 END), 0)
                   AS gtpr,
                 SUM(CASE WHEN y = 0 AND pred = 1 THEN 1.0 ELSE 0 END)
                   / NULLIF(SUM(CASE WHEN y = 0 THEN 1.0 ELSE 0 END), 0)
                   AS gfpr
          FROM s),
    sl AS (SELECT lang,
                  CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                    AS np,
                  CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                    AS nn,
                  SUM(CASE WHEN y = 1 AND pred = 1 THEN 1.0 ELSE 0 END)
                    / NULLIF(SUM(CASE WHEN y = 1 THEN 1.0 ELSE 0 END), 0)
                    AS tpr,
                  SUM(CASE WHEN y = 0 AND pred = 1 THEN 1.0 ELSE 0 END)
                    / NULLIF(SUM(CASE WHEN y = 0 THEN 1.0 ELSE 0 END), 0)
                    AS fpr
           FROM s GROUP BY 1)
    SELECT sl.lang, CAST(sl.np + sl.nn AS BIGINT) AS n,
           FLOOR(sl.tpr * 10000 + 0.5) / 10000 AS tpr,
           FLOOR(sl.fpr * 10000 + 0.5) / 10000 AS fpr,
           FLOOR((sl.tpr - g.gtpr) * 10000 + 0.5) / 10000 AS tpr_gap,
           FLOOR((sl.fpr - g.gfpr) * 10000 + 0.5) / 10000 AS fpr_gap,
           CAST(CASE WHEN ABS(sl.tpr - g.gtpr)
                          / sqrt(g.gtpr * (1 - g.gtpr) / sl.np) > {FAIR_Z}
                       OR ABS(sl.fpr - g.gfpr)
                          / sqrt(g.gfpr * (1 - g.gfpr) / sl.nn) > {FAIR_Z}
                THEN 1 ELSE 0 END AS BIGINT) AS eq_odds_flag
    FROM sl CROSS JOIN g
    """,
)
def ml_fairness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equalized-odds audit by language group: per-group TPR and FPR
    against the global rates, with binomial z-flags on either gap —
    the fairness table a model review opens with (accuracy parity can
    hide error-TYPE disparity; equalized odds can't).

    Scale: one join to attach groups, one group rollup + one global
    row; all audit math is arithmetic on aggregates."""
    c = cat(spark, sf_dir)
    s = c["documents"].select("doc_id", "lang").join(
        c["embeddings"].select(
            F.col("vec_id").alias("doc_id"),
            (
                (1.0 / (1.0 + F.exp(-F.element_at("embedding", 1).cast("double"))))
                > 0.5
            ).cast("int").alias("pred"),
            (F.col("label") < 5).cast("int").alias("y"),
        ),
        "doc_id",
    ).localCheckpoint()
    y, p = F.col("y"), F.col("pred")
    tpr = F.sum(((y == 1) & (p == 1)).cast("double")) / F.nullif(
        F.sum((y == 1).cast("double")), F.lit(0.0)
    )
    fpr = F.sum(((y == 0) & (p == 1)).cast("double")) / F.nullif(
        F.sum((y == 0).cast("double")), F.lit(0.0)
    )
    g = s.agg(tpr.alias("gtpr"), fpr.alias("gfpr"))
    sl = s.groupBy("lang").agg(
        F.sum((y == 1).cast("int")).cast("double").alias("np"),
        F.sum((y == 0).cast("int")).cast("double").alias("nn"),
        tpr.alias("tpr"),
        fpr.alias("fpr"),
    )
    ztpr = F.abs(F.col("tpr") - F.col("gtpr")) / F.sqrt(
        F.col("gtpr") * (1 - F.col("gtpr")) / F.col("np")
    )
    zfpr = F.abs(F.col("fpr") - F.col("gfpr")) / F.sqrt(
        F.col("gfpr") * (1 - F.col("gfpr")) / F.col("nn")
    )
    return sl.join(F.broadcast(g)).select(
        "lang",
        (F.col("np") + F.col("nn")).cast("bigint").alias("n"),
        ratio(F.col("tpr")).alias("tpr"),
        ratio(F.col("fpr")).alias("fpr"),
        ratio(F.col("tpr") - F.col("gtpr")).alias("tpr_gap"),
        ratio(F.col("fpr") - F.col("gfpr")).alias("fpr_gap"),
        ((ztpr > FAIR_Z) | (zfpr > FAIR_Z)).cast("bigint").alias(
            "eq_odds_flag"
        ),
    )


ml_fairness_audit.__doc__ = ml_fairness_audit.__doc__.format(z=FAIR_Z)


@query("io_file_checksums")  # content hashing → rows-only; pytest pins
# tamper detection on a mutated copy.
def io_file_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash manifest for a table's files: per parquet file the
    md5, byte size, and mtime-free identity — the baseline that turns
    silent corruption (bit-rot, partial overwrite, truncated upload)
    into a diff against the last manifest instead of a mystery OOM
    three jobs downstream.

    Scale: hashing is IO-bound per file and embarrassingly parallel
    (run as a binaryFile read on a cluster; the driver loop here is
    the same accounting at test scale)."""
    import hashlib
    import os

    path = os.path.join(sf_dir, "orders.parquet")
    files = (
        [os.path.join(path, f) for f in sorted(os.listdir(path))
         if f.endswith(".parquet")]
        if os.path.isdir(path)
        else [path]
    )
    rows = []
    for fp in files:
        h = hashlib.md5()
        with open(fp, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        rows.append(
            (os.path.basename(fp), h.hexdigest(), os.path.getsize(fp))
        )
    return spark.createDataFrame(
        rows, "file string, md5 string, n_bytes long"
    ).orderBy("file")
