"""Wave 59: diffusion modeling, dispersion diagnostics, retrieval
recall curves, and snapshot CDC reads.

ev_bass_diffusion fits the Bass product-diffusion model to the user
adoption series with the classic discrete-time OLS linearization;
stat_overdispersion is the Poisson-dispersion health check that decides
between Poisson and negative-binomial modeling of event counts;
ml_recall_at_k completes the retrieval-eval trio (ndcg ranks, mrr
first-hit, recall@k coverage); io_snapshot_changes is the lakehouse
incremental/CDC read — "give me only what changed between v1 and v2"
without rescanning the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

RECALL_K = 5


@query(
    "ev_bass_diffusion",
    oracle="""
    WITH fe AS (SELECT user_id,
                       MIN(date_diff('day', DATE '1970-01-01',
                                     CAST(date_trunc('day', ts) AS DATE)))
                         AS dn
                FROM events WHERE event_type = 'purchase' GROUP BY 1),
    n AS (SELECT dn, CAST(COUNT(*) AS DOUBLE) AS nt FROM fe GROUP BY 1),
    c AS (SELECT dn, nt,
                 COALESCE(SUM(nt) OVER (ORDER BY dn
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) AS cprev
          FROM n),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(nt) AS sy, SUM(cprev) AS s1, SUM(cprev * cprev) AS s2,
                 SUM(cprev * cprev * cprev) AS s3,
                 SUM(cprev * cprev * cprev * cprev) AS s4,
                 SUM(nt * cprev) AS sy1, SUM(nt * cprev * cprev) AS sy2
          FROM c),
    m AS (SELECT n, sy, s1, s2, s3, s4, sy1, sy2,
                 s2 - s1 * s1 / n AS a11, s3 - s1 * s2 / n AS a12,
                 s4 - s2 * s2 / n AS a22,
                 sy1 - sy * s1 / n AS b1, sy2 - sy * s2 / n AS b2
          FROM s),
    f AS (SELECT n, sy, s1, s2,
                 CASE WHEN a11 * a22 - a12 * a12 = 0 THEN 0
                      ELSE (b1 * a22 - b2 * a12)
                           / (a11 * a22 - a12 * a12) END AS cb,
                 CASE WHEN a11 * a22 - a12 * a12 = 0 THEN 0
                      ELSE (b2 * a11 - b1 * a12)
                           / (a11 * a22 - a12 * a12) END AS cc
          FROM m),
    g AS (SELECT n, (sy - cb * s1 - cc * s2) / n AS ca, cb, cc FROM f),
    h AS (SELECT n, ca, cb, cc,
                 cb * cb - 4 * cc * ca AS disc
          FROM g)
    SELECT CAST(n AS BIGINT) AS n_days,
           FLOOR(ca * 10000 + 0.5) / 10000 AS coef_a,
           FLOOR(cb * 10000 + 0.5) / 10000 AS coef_b,
           FLOOR(cc * 1000000 + 0.5) / 1000000 AS coef_c,
           CAST(FLOOR(CASE WHEN disc > 0 AND cc < 0
                      THEN (-cb - sqrt(disc)) / (2 * cc) ELSE 0 END + 0.5)
                AS BIGINT) AS m_est,
           FLOOR(CASE WHEN disc > 0 AND cc < 0
                 THEN ca / ((-cb - sqrt(disc)) / (2 * cc)) ELSE 0 END
                 * 10000 + 0.5) / 10000 AS p_innov,
           FLOOR(CASE WHEN disc > 0 AND cc < 0
                 THEN -cc * ((-cb - sqrt(disc)) / (2 * cc)) ELSE 0 END
                 * 10000 + 0.5) / 10000 AS q_imit
    FROM h
    """,
)
def ev_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bass diffusion fit on the purchase-adoption series (first
    purchase day per user — first *events* all land on day one in the
    synthetic data, which is a degenerate curve): the discrete Bass
    model linearizes to
    n_t = a + b·C_(t−1) + c·C², an OLS with two regressors; the market
    size M solves cM² + bM + a = 0, then p = a/M (innovation) and
    q = −cM (imitation). Degenerate fits (non-S-curve data → disc ≤ 0
    or c ≥ 0) report zeros instead of NaNs so both engines agree
    bit-for-bit.

    Scale: first-event per user is one rollup; the adoption series is
    calendar-bounded (cumulative window over days); the quadratic OLS
    is a single sufficient-statistics row."""
    ev = cat(spark, sf_dir)["events"].filter(
        F.col("event_type") == "purchase"
    )
    fe = ev.groupBy("user_id").agg(
        F.min(
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01"))
        ).alias("dn")
    )
    n = fe.groupBy("dn").agg(F.count(F.lit(1)).cast("double").alias("nt"))
    wc = W.orderBy("dn").rowsBetween(W.unboundedPreceding, -1)
    c = n.withColumn("cprev", F.coalesce(F.sum("nt").over(wc), F.lit(0.0)))
    y, c1 = F.col("nt"), F.col("cprev")
    s = c.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(y).alias("sy"),
        F.sum(c1).alias("s1"),
        F.sum(c1 * c1).alias("s2"),
        F.sum(c1 * c1 * c1).alias("s3"),
        F.sum(c1 * c1 * c1 * c1).alias("s4"),
        F.sum(y * c1).alias("sy1"),
        F.sum(y * c1 * c1).alias("sy2"),
    )
    nn, sy = F.col("n"), F.col("sy")
    s1, s2, s3, s4 = F.col("s1"), F.col("s2"), F.col("s3"), F.col("s4")
    sy1, sy2 = F.col("sy1"), F.col("sy2")
    a11 = s2 - s1 * s1 / nn
    a12 = s3 - s1 * s2 / nn
    a22 = s4 - s2 * s2 / nn
    b1 = sy1 - sy * s1 / nn
    b2 = sy2 - sy * s2 / nn
    det = a11 * a22 - a12 * a12
    cb = F.when(det != 0, (b1 * a22 - b2 * a12) / det).otherwise(0.0)
    cc = F.when(det != 0, (b2 * a11 - b1 * a12) / det).otherwise(0.0)
    ca = (sy - cb * s1 - cc * s2) / nn
    disc = cb * cb - 4 * cc * ca
    ok = (disc > 0) & (cc < 0)
    m_est = F.when(ok, (-cb - F.sqrt(disc)) / (2 * cc)).otherwise(0.0)
    return s.select(
        nn.cast("bigint").alias("n_days"),
        ratio(ca).alias("coef_a"),
        ratio(cb).alias("coef_b"),
        rnd(cc, 6).alias("coef_c"),
        F.floor(m_est + 0.5).alias("m_est"),
        ratio(F.when(ok, ca / m_est).otherwise(0.0)).alias("p_innov"),
        ratio(F.when(ok, -cc * m_est).otherwise(0.0)).alias("q_imit"),
    )


@query(
    "stat_overdispersion",
    oracle=f"""
    WITH u AS (SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS k
               FROM events GROUP BY 1),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(k) AS m,
                 (SUM(k * k) - SUM(k) * SUM(k) / COUNT(*))
                   / (COUNT(*) - 1) AS v
          FROM u)
    SELECT CAST(n AS BIGINT) AS n_users,
           FLOOR(m * 10000 + 0.5) / 10000 AS mean_k,
           FLOOR(v * 10000 + 0.5) / 10000 AS var_k,
           FLOOR(v / m * 10000 + 0.5) / 10000 AS dispersion,
           FLOOR(CASE WHEN v > m
                 THEN m * m / (v - m) ELSE 0 END * 10000 + 0.5) / 10000
             AS nb_r,
           FLOOR(2 * {normal_sf_sql(
               "ABS((n - 1) * v / m - (n - 1)) / sqrt(2.0 * (n - 1))"
           )} * 10000 + 0.5) / 10000 AS p_dispersion
    FROM s
    """,
)
def stat_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson overdispersion diagnostic on per-user event counts:
    dispersion = var/mean (1 under Poisson), the method-of-moments
    negative-binomial size r = m²/(v−m) when overdispersed, and the
    dispersion test p-value (χ²_(n−1) ≈ normal for large n — the
    decision between Poisson and NB models for count data).

    Scale: one user rollup + one sufficient-statistics row."""
    ev = cat(spark, sf_dir)["events"]
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("k")
    )
    k = F.col("k")
    s = u.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(k).alias("m"),
        (
            (F.sum(k * k) - F.sum(k) * F.sum(k) / F.count(F.lit(1)))
            / (F.count(F.lit(1)) - 1)
        ).alias("v"),
    )
    n, m, v = F.col("n"), F.col("m"), F.col("v")
    chi = (n - 1) * v / m
    z = F.abs(chi - (n - 1)) / F.sqrt(2.0 * (n - 1))
    return s.select(
        n.cast("bigint").alias("n_users"),
        ratio(m).alias("mean_k"),
        ratio(v).alias("var_k"),
        ratio(v / m).alias("dispersion"),
        ratio(F.when(v > m, m * m / (v - m)).otherwise(0.0)).alias("nb_r"),
        ratio(2 * normal_sf(z)).alias("p_dispersion"),
    )


@query(
    "ml_recall_at_k",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv,
                      label AS qlab
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label AS clab
          FROM embeddings WHERE vec_id >= 8),
    top AS (SELECT q_id, qlab, clab, rn
            FROM (SELECT q.q_id, q.qlab, c.clab,
                         ROW_NUMBER() OVER (
                           PARTITION BY q.q_id
                           ORDER BY FLOOR((list_cosine_similarity(c.v, q.qv))
                                          * 10000 + 0.5) / 10000 DESC,
                                    c.vec_id) AS rn
                  FROM q, c)
            WHERE rn <= {RECALL_K}),
    ks AS (SELECT unnest(generate_series(1, {RECALL_K})) AS k),
    h AS (SELECT ks.k, top.q_id,
                 CAST(SUM(CASE WHEN top.qlab = top.clab AND top.rn <= ks.k
                          THEN 1 ELSE 0 END) AS DOUBLE) AS hits
          FROM top CROSS JOIN ks GROUP BY 1, 2),
    r AS (SELECT h.k, h.q_id, h.hits / CAST(h.k AS DOUBLE) AS prec,
                 h.hits / CAST((SELECT COUNT(*) FROM c c2
                                JOIN q q2 ON q2.q_id = h.q_id
                                WHERE c2.clab = q2.qlab) AS DOUBLE) AS rec
          FROM h)
    SELECT CAST(k AS BIGINT) AS k,
           FLOOR(AVG(prec) * 10000 + 0.5) / 10000 AS prec,
           FLOOR(AVG(rec) * 10000 + 0.5) / 10000 AS recall
    FROM r GROUP BY 1
    """,
)
def ml_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision@k and recall@k curves (k = 1..{k}) for the batch
    retrieval: per query, hits-in-top-k over k (precision) and over R,
    the number of relevant same-label corpus items (recall — monotone
    in k by construction) — the coverage view that completes ml_ndcg
    (rank quality) and ml_mrr (first hit).

    Scale: reuses sim_topk_join's two-phase plan; the k expansion is a
    {k}-row broadcast against {k}-row-per-query shortlists, and the
    per-query relevant counts come from one |labels|-sized rollup
    broadcast back."""
    from mister_spark.operators.similarity import sim_topk_join

    emb = cat(spark, sf_dir)["embeddings"]
    labels = emb.select("vec_id", "label")
    qlab = labels.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("qlab")
    )
    # relevant corpus count per label (corpus = vec_id >= 8)
    rel = (
        labels.filter(F.col("vec_id") >= 8)
        .groupBy(F.col("label").alias("qlab"))
        .agg(F.count(F.lit(1)).cast("double").alias("r"))
    )
    top = (
        sim_topk_join(spark, sf_dir)
        .join(F.broadcast(qlab), "q_id")
        .join(F.broadcast(labels.withColumnRenamed("label", "clab")), "vec_id")
    )
    ks = spark.range(1, RECALL_K + 1).select(F.col("id").alias("k"))
    h = (
        top.join(F.broadcast(ks))
        .groupBy("k", "q_id", "qlab")
        .agg(
            F.sum(
                (
                    (F.col("qlab") == F.col("clab"))
                    & (F.col("rn") <= F.col("k"))
                ).cast("int")
            )
            .cast("double")
            .alias("hits")
        )
    )
    r = h.join(F.broadcast(rel), "qlab").select(
        "k",
        (F.col("hits") / F.col("k").cast("double")).alias("prec"),
        (F.col("hits") / F.col("r")).alias("rec"),
    )
    return r.groupBy(F.col("k").cast("bigint").alias("k")).agg(
        ratio(F.avg("prec")).alias("prec"),
        ratio(F.avg("rec")).alias("recall"),
    )


ml_recall_at_k.__doc__ = ml_recall_at_k.__doc__.format(k=RECALL_K)


@query(
    "io_snapshot_changes",
    # Real oracle: the 3-commit structure is fixed — create adds the
    # %3=0 dir, append the %3=1 dir, and the %6=0 merge's key range
    # spans both dirs so the stats pruning rewrites both (plus the
    # empty insert dir): the CDC read reports both dirs' contents as
    # that commit's additions.
    oracle="""
    WITH c AS (SELECT
      CAST(SUM(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS a,
      CAST(SUM(CASE WHEN o_orderkey % 3 = 1 THEN 1 ELSE 0 END)
           AS BIGINT) AS b
     FROM orders)
    SELECT CAST(0 AS INT) AS version, 'create' AS op,
           CAST(1 AS INT) AS new_dirs, a AS rows_added FROM c
    UNION ALL SELECT 1, 'append', 1, b FROM c
    UNION ALL SELECT 2, 'merge', 3, a + b FROM c
    """,
)
def io_snapshot_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental/CDC read from the transactional snapshot table:
    build a 3-commit table (create, append, merge), then answer
    "what rows did each commit ADD?" purely from manifest diffs —
    each version's new data dirs (entries absent from its parent
    manifest) are read directly, no full-table scan or row diff.

    Scale: manifest work is O(#dirs) driver metadata; the data read
    touches only the changed dirs — the property that makes
    incremental downstream jobs linear in the CHANGE, not the table.
    (The upsert-overwritten rows show as removed dirs; this op reports
    the additions, the usual CDC-consumer contract.)"""
    import os
    import uuid

    from mister_spark.sources.snapshots import SnapshotTable
    from mister_spark.sources.staged import REPO_TMP

    path = os.path.join(REPO_TMP, f"snap_changes_{uuid.uuid4().hex[:8]}")
    t = SnapshotTable(spark, path, stats_cols=["o_orderkey"])
    orders = cat(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.create(orders.filter(F.col("o_orderkey") % 3 == 0))
    t.append(orders.filter(F.col("o_orderkey") % 3 == 1))
    t.merge(
        orders.filter(F.col("o_orderkey") % 6 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 1.1
        ),
        "o_orderkey",
    )
    out = []
    prev_dirs: set[str] = set()
    for v in t.versions():
        man = t._load(v)
        new_dirs = [
            e for e in man["entries"] if e["dir"] not in prev_dirs
        ]
        added = 0
        for e in new_dirs:
            added += spark.read.parquet(os.path.join(path, e["dir"])).count()
        out.append((v, man["op"], len(new_dirs), added))
        prev_dirs = {e["dir"] for e in man["entries"]}
    return spark.createDataFrame(
        out, "version int, op string, new_dirs int, rows_added long"
    ).orderBy("version")
