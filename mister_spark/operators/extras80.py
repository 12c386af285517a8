"""Wave 80: model cards, rich-club structure, and codec economics.

ml_model_card composes the repo's own eval operators (AUC, KS,
calibration, fairness) into one reviewable card — the registry acting
as a library, not just a test surface; graph_rich_club measures
whether hubs preferentially interconnect (the 'old boys network'
coefficient that degree distributions alone can't see);
io_codec_compare writes the same data under snappy/gzip/zstd and
reports the size/ratio table a storage-tuning decision actually needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import COP_SUPPORT, _DUCK_BASKETS
from mister_spark.registry import query

RC_TOP_PCTS = (10, 25)
CODECS = ("snappy", "gzip", "zstd")


@query(
    "ml_model_card",
    # Real oracle: all four components are oracle-exact, so the card
    # unions their SQL (each wrapped in its own WITH scope) and reads
    # the same ROUNDED outputs the Spark side collects.
    oracle="""
    WITH auc_q AS (
      SELECT * FROM (
        WITH s AS (SELECT CAST(embedding[1] AS DOUBLE) AS score,
                          CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
                   FROM embeddings),
        g AS (SELECT score, SUM(pos) AS np, COUNT(*) AS cnt
              FROM s GROUP BY 1),
        c AS (SELECT np, cnt,
                     SUM(cnt) OVER (ORDER BY score
                                    ROWS UNBOUNDED PRECEDING) - cnt
                       AS below
              FROM g),
        r AS (SELECT SUM(np * (below + (cnt + 1) / 2.0)) AS ra FROM c),
        t AS (SELECT CAST(SUM(pos) AS DOUBLE) AS p,
                     CAST(SUM(1 - pos) AS DOUBLE) AS n FROM s)
        SELECT p AS n_pos, n AS n_neg,
               FLOOR((ra - p * (p + 1) / 2) / (p * n) * 10000 + 0.5)
                 / 10000 AS auc
        FROM r, t) q),
    ks_q AS (
      SELECT * FROM (
        WITH s AS (SELECT LEAST(CAST(FLOOR(1.0 / (1.0
                     + exp(-CAST(embedding[1] AS DOUBLE))) * 50)
                     AS BIGINT), 49) AS bin,
                          CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
                   FROM embeddings),
        c AS (SELECT bin, CAST(SUM(y) AS DOUBLE) AS np,
                     CAST(SUM(1 - y) AS DOUBLE) AS nn
              FROM s GROUP BY 1),
        t AS (SELECT SUM(np) AS tp, SUM(nn) AS tn FROM c),
        k AS (SELECT SUM(c.np / t.tp) OVER (ORDER BY c.bin
                       ROWS UNBOUNDED PRECEDING)
                     - SUM(c.nn / t.tn) OVER (ORDER BY c.bin
                         ROWS UNBOUNDED PRECEDING) AS gap
              FROM c CROSS JOIN t)
        SELECT FLOOR(MAX(ABS(gap)) * 10000 + 0.5) / 10000 AS ks_stat
        FROM k) q),
    cal_q AS (
      SELECT MAX(gap) AS max_gap FROM (
        WITH s AS (SELECT 1.0 / (1.0 + exp(-CAST(embedding[1]
                     AS DOUBLE))) AS prob,
                          CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
                   FROM embeddings),
        b AS (SELECT LEAST(CAST(FLOOR(prob * 10) AS BIGINT), 9) AS bin,
                     CAST(FLOOR(prob * 1000000 + 0.5) AS BIGINT) AS p6,
                     pos
              FROM s),
        g AS (SELECT bin,
                     FLOOR(CAST(SUM(p6) AS DOUBLE) / COUNT(*) / 1000000
                           * 10000 + 0.5) / 10000 AS mean_pred,
                     FLOOR(CAST(SUM(pos) AS DOUBLE) / COUNT(*)
                           * 10000 + 0.5) / 10000 AS pos_rate
              FROM b GROUP BY 1)
        SELECT FLOOR(ABS(mean_pred - pos_rate) * 10000 + 0.5) / 10000
          AS gap
        FROM g) q),
    fair_q AS (
      SELECT CAST(SUM(flag) AS DOUBLE) AS flagged FROM (
        WITH s AS (SELECT d.lang,
                          CASE WHEN 1.0 / (1.0 + exp(-CAST(e.embedding[1]
                                 AS DOUBLE))) > 0.5 THEN 1 ELSE 0 END
                            AS pred,
                          CASE WHEN e.label < 5 THEN 1 ELSE 0 END AS y
                   FROM documents d
                   JOIN embeddings e ON d.doc_id = e.vec_id),
        g AS (SELECT SUM(CASE WHEN y = 1 AND pred = 1 THEN 1.0 ELSE 0
                         END)
                       / NULLIF(SUM(CASE WHEN y = 1 THEN 1.0 ELSE 0
                                    END), 0) AS gtpr,
                     SUM(CASE WHEN y = 0 AND pred = 1 THEN 1.0 ELSE 0
                         END)
                       / NULLIF(SUM(CASE WHEN y = 0 THEN 1.0 ELSE 0
                                    END), 0) AS gfpr
              FROM s),
        sl AS (SELECT lang,
                      CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END)
                           AS DOUBLE) AS np,
                      CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END)
                           AS DOUBLE) AS nn,
                      SUM(CASE WHEN y = 1 AND pred = 1 THEN 1.0 ELSE 0
                          END)
                        / NULLIF(SUM(CASE WHEN y = 1 THEN 1.0 ELSE 0
                                     END), 0) AS tpr,
                      SUM(CASE WHEN y = 0 AND pred = 1 THEN 1.0 ELSE 0
                          END)
                        / NULLIF(SUM(CASE WHEN y = 0 THEN 1.0 ELSE 0
                                     END), 0) AS fpr
               FROM s GROUP BY 1)
        SELECT CASE WHEN ABS(sl.tpr - g.gtpr)
                         / sqrt(g.gtpr * (1 - g.gtpr) / sl.np) > 1.96
                      OR ABS(sl.fpr - g.gfpr)
                         / sqrt(g.gfpr * (1 - g.gfpr) / sl.nn) > 1.96
                    THEN 1 ELSE 0 END AS flag
        FROM sl CROSS JOIN g) q)
    SELECT 'calibration' AS section, 'max_bin_gap' AS metric,
           max_gap AS value FROM cal_q
    UNION ALL
    SELECT 'data', 'n_neg', n_neg FROM auc_q
    UNION ALL
    SELECT 'data', 'n_pos', n_pos FROM auc_q
    UNION ALL
    SELECT 'discrimination', 'auc', auc FROM auc_q
    UNION ALL
    SELECT 'discrimination', 'ks_stat', ks_stat FROM ks_q
    UNION ALL
    SELECT 'fairness', 'eq_odds_flagged_groups', flagged FROM fair_q
    """,
)
def ml_model_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model card for the sigmoid scorer, assembled by CALLING the
    repo's own eval operators — discrimination (ml_auc,
    ml_ks_discrimination), calibration (ml_calibration_bins' max gap),
    and fairness (ml_fairness_audit's flagged-group count) — one
    labeled metric frame a reviewer signs off on. The op is also the
    proof that registry entries compose as a library.

    Scale: each metric is its own already-audited plan; the card is a
    driver-side union of their 1-row summaries."""
    from mister_spark import registry as reg

    auc = reg.QUERIES["ml_auc"](spark, sf_dir).collect()[0]
    ks = reg.QUERIES["ml_ks_discrimination"](spark, sf_dir).collect()[0]
    cal = reg.QUERIES["ml_calibration_bins"](spark, sf_dir).collect()
    fair = reg.QUERIES["ml_fairness_audit"](spark, sf_dir).collect()
    max_gap = max(r["gap"] for r in cal)
    flagged = sum(r["eq_odds_flag"] for r in fair)
    rows = [
        ("discrimination", "auc", float(auc["auc"])),
        ("discrimination", "ks_stat", float(ks["ks_stat"])),
        ("calibration", "max_bin_gap", float(max_gap)),
        ("fairness", "eq_odds_flagged_groups", float(flagged)),
        ("data", "n_pos", float(auc["n_pos"])),
        ("data", "n_neg", float(auc["n_neg"])),
    ]
    return spark.createDataFrame(
        rows, "section string, metric string, value double"
    ).orderBy("section", "metric")


@query(
    "graph_rich_club",
    oracle=f"""
    WITH {_DUCK_BASKETS},
    e0 AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
           FROM bk a JOIN bk b ON a.l_orderkey = b.l_orderkey
           WHERE a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING COUNT(*) >= {COP_SUPPORT}),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
              SELECT p1 AS node FROM e0
              UNION ALL SELECT p2 FROM e0) GROUP BY 1),
    rk AS (SELECT node, d,
                  ROW_NUMBER() OVER (ORDER BY d DESC, node) AS rn,
                  COUNT(*) OVER () AS n
           FROM deg),
    pcts AS (SELECT unnest([{", ".join(str(p) for p in RC_TOP_PCTS)}]) AS pct),
    club AS (SELECT pcts.pct, rk.node
             FROM rk CROSS JOIN pcts
             WHERE rk.rn * 100 <= rk.n * pcts.pct),
    sz AS (SELECT pct, CAST(COUNT(*) AS DOUBLE) AS k FROM club GROUP BY 1),
    ce AS (SELECT c1.pct, CAST(COUNT(*) AS DOUBLE) AS m
           FROM e0 JOIN club c1 ON e0.p1 = c1.node
                   JOIN club c2 ON e0.p2 = c2.node AND c1.pct = c2.pct
           GROUP BY 1)
    SELECT CAST(sz.pct AS BIGINT) AS top_pct,
           CAST(sz.k AS BIGINT) AS club_size,
           CAST(COALESCE(ce.m, 0) AS BIGINT) AS club_edges,
           FLOOR(COALESCE(ce.m, 0) / (sz.k * (sz.k - 1) / 2)
                 * 10000 + 0.5) / 10000 AS phi
    FROM sz LEFT JOIN ce ON sz.pct = ce.pct
    """,
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient of the co-purchase graph: for the
    top-{p}% highest-degree nodes, φ = realized edges among them over
    the possible k(k−1)/2 — hubs that interconnect more than chance
    signal a core-periphery market structure that degree histograms
    (graph_degree) can't reveal.

    Scale: degree rollup + a rank cut (two-phase global_rank at
    scale), then an edges⋈club semi-join — club-sized, not
    graph-sized."""
    from pyspark.sql import Window as W

    from mister_spark.operators.extras47 import _copurchase_edges

    e0 = _copurchase_edges(spark, sf_dir).select("p1", "p2").localCheckpoint()
    deg = (
        e0.select(F.col("p1").alias("node"))
        .unionAll(e0.select(F.col("p2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    rk = deg.select(
        "node",
        "d",
        F.row_number().over(W.orderBy(F.desc("d"), "node")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    pcts = spark.createDataFrame([(p,) for p in RC_TOP_PCTS], "pct long")
    club = (
        rk.join(F.broadcast(pcts))
        .filter(F.col("rn") * 100 <= F.col("n") * F.col("pct"))
        .select("pct", "node")
        .localCheckpoint()
    )
    sz = club.groupBy("pct").agg(F.count(F.lit(1)).cast("double").alias("k"))
    c1 = club.select(F.col("pct"), F.col("node").alias("p1"))
    c2 = club.select(F.col("pct"), F.col("node").alias("p2"))
    ce = (
        e0.join(c1, "p1")
        .join(c2, ["pct", "p2"])
        .groupBy("pct")
        .agg(F.count(F.lit(1)).cast("double").alias("m"))
    )
    return (
        sz.join(ce, "pct", "left")
        .select(
            F.col("pct").cast("bigint").alias("top_pct"),
            F.col("k").cast("bigint").alias("club_size"),
            F.coalesce("m", F.lit(0.0)).cast("bigint").alias("club_edges"),
            ratio(
                F.coalesce("m", F.lit(0.0))
                / (F.col("k") * (F.col("k") - 1) / 2)
            ).alias("phi"),
        )
    )


graph_rich_club.__doc__ = graph_rich_club.__doc__.format(p=RC_TOP_PCTS)


@query("io_codec_compare")  # write-side economics → rows-only; pytest
# pins ratio ordering + lossless round-trip.
def io_codec_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec economics: the lineitem table written under {c},
    reporting bytes, compression ratio vs snappy, and a lossless
    round-trip check per codec — the table that settles the
    'zstd everywhere?' debate with numbers instead of vibes (zstd
    usually wins size; snappy wins CPU; gzip loses both on modern
    stacks).

    Scale: the write IS the benchmark; per-codec cost is one pass."""
    import os
    import shutil
    import uuid

    from mister_spark.sources.staged import REPO_TMP

    li = cat(spark, sf_dir)["lineitem"]
    n = li.count()
    base = os.path.join(REPO_TMP, f"codec_{uuid.uuid4().hex[:8]}")
    sizes = {}
    for codec in CODECS:
        dest = os.path.join(base, codec)
        li.write.mode("overwrite").option("compression", codec).parquet(dest)
        total = 0
        for root, _d, files in os.walk(dest):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if f.endswith(".parquet")
            )
        ok = spark.read.parquet(dest).count() == n
        sizes[codec] = (total, ok)
    snappy = sizes["snappy"][0]
    rows = [
        (
            codec,
            int(sz),
            __import__("math").floor(sz / snappy * 10000 + 0.5) / 10000,
            int(ok),
        )
        for codec, (sz, ok) in sorted(sizes.items())
    ]
    shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "codec string, n_bytes long, vs_snappy double, roundtrip_ok long",
    ).orderBy("codec")
