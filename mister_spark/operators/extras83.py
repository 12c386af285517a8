"""Wave 83: nonparametric omnibus testing, rank fusion, density
estimation, and community quality.

stat_kruskal_wallis is the rank-based one-way ANOVA (the omnibus test
you reach for when normality is off the table), with exact midranks
computed by the repo's two-phase prefix sum — no single-task sort;
ml_rrf_fusion is reciprocal-rank fusion, the embarrassingly-effective
way to combine heterogeneous rankers without score calibration;
stat_kde is a Gaussian kernel density estimate on a fixed grid with
Silverman bandwidth — the honest histogram; graph_modularity scores a
community assignment (part brand) on the weighted co-purchase graph —
the number label-propagation et al. are trying to maximize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.ranks import bucketed_cumsum, global_rank
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.operators.extras47 import (
    COP_SUPPORT,
    _DUCK_BASKETS,
    _copurchase_edges,
)
from mister_spark.registry import query

RRF_K = 60
KDE_GRID = 20  # grid points = KDE_GRID + 1


@query(
    "stat_kruskal_wallis",
    oracle="""
    WITH x AS (SELECT o_orderpriority AS g, o_totalprice AS v FROM orders),
    rk AS (SELECT g,
                  RANK() OVER (ORDER BY v)
                    + (COUNT(*) OVER (PARTITION BY v) - 1) / 2.0 AS mr
           FROM x),
    byg AS (SELECT g, SUM(mr) AS rsum, CAST(COUNT(*) AS DOUBLE) AS nj
            FROM rk GROUP BY 1),
    s AS (SELECT SUM(rsum * rsum / nj) AS srn FROM byg),
    tot AS (SELECT SUM(nj) AS n, CAST(COUNT(*) AS BIGINT) AS k FROM byg),
    tie AS (SELECT COALESCE(SUM(t * t * t - t), 0) AS tt
            FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM x GROUP BY v))
    SELECT CAST(k - 1 AS BIGINT) AS dof,
           FLOOR((12.0 / (n * (n + 1)) * srn - 3 * (n + 1))
                 / (1 - tt / (n * n * n - n)) * 10000 + 0.5) / 10000 AS h,
           FLOOR((12.0 / (n * (n + 1)) * srn - 3 * (n + 1))
                 / (1 - tt / (n * n * n - n)) / (n - 1) * 10000 + 0.5)
             / 10000 AS eps_sq
    FROM tot, tie, s
    """,
)
def stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across order priorities on order totalprice:
    rank every order globally (midranks for ties), H = 12/(N(N+1)) ·
    Σ R_j²/n_j − 3(N+1), divided by the tie-correction
    1 − Σ(t³−t)/(N³−N); eps_sq = H/(N−1) is the ε² effect size. The
    nonparametric one-way ANOVA — no normality assumption.

    Scale: midranks are computed on the |distinct values| frame — one
    groupBy collapses the scan, then `bucketed_cumsum` (two-phase
    range-bucketed prefix sum) produces exact cumulative counts with
    no single-task sort; midrank sums are exact half-integer
    arithmetic in doubles, so both engines agree bit-for-bit. The
    per-group reduction is a k-row aggregate."""
    x = cat(spark, sf_dir)["orders"].select(
        F.col("o_orderpriority").alias("g"), F.col("o_totalprice").alias("v")
    )
    pv = x.groupBy("v", "g").agg(F.count(F.lit(1)).cast("double").alias("c"))
    vc = pv.groupBy("v").agg(F.sum("c").alias("t"))
    cum = bucketed_cumsum(vc, "v", {"cum": F.col("t")})
    mr = cum.select(
        "v", (F.col("cum") - F.col("t") + (F.col("t") + 1) / 2).alias("mr")
    )
    byg = (
        pv.join(mr, "v")
        .groupBy("g")
        .agg(
            F.sum(F.col("mr") * F.col("c")).alias("rsum"),
            F.sum("c").alias("nj"),
        )
    )
    tie = vc.agg(
        F.coalesce(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")), F.lit(0.0)
        ).alias("tt")
    )
    n = F.sum("nj")
    srn = F.sum(F.col("rsum") * F.col("rsum") / F.col("nj"))
    raw = (12.0 / (n * (n + 1)) * srn - 3 * (n + 1)) / (
        1 - F.min("tt") / (n * n * n - n)
    )
    return (
        byg.join(F.broadcast(tie))
        .agg(
            (F.count(F.lit(1)) - 1).cast("bigint").alias("dof"),
            ratio(raw).alias("h"),
            ratio(raw / (n - 1)).alias("eps_sq"),
        )
    )


@query(
    "ml_rrf_fusion",
    oracle=f"""
    WITH t AS (SELECT doc_id, n_chars,
                      CAST(len({DUCK_TOKENS}) AS BIGINT) AS tok_n
               FROM documents),
    r AS (SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS ra,
                 ROW_NUMBER() OVER (ORDER BY tok_n DESC, doc_id) AS rb
          FROM t)
    SELECT doc_id, CAST(ra AS BIGINT) AS r_chars, CAST(rb AS BIGINT) AS r_tokens,
           FLOOR((1.0 / ({RRF_K} + ra) + 1.0 / ({RRF_K} + rb)) * 1000000 + 0.5)
             / 1000000 AS rrf
    FROM r
    ORDER BY 1.0 / ({RRF_K} + ra) + 1.0 / ({RRF_K} + rb) DESC, doc_id
    LIMIT 20
    """,
)
def ml_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two document rankers (by raw length
    and by token count): rrf = Σ 1/({k}+rank_i), top 20. RRF needs no
    score calibration — only ranks — which is why it is the default
    fusion for hybrid lexical+vector retrieval.

    Scale: each ranker is an exact `global_rank` (range-partitioned
    two-phase sort — no single-task window); the fusion join shuffles
    on doc_id and the top-20 is a distributed TakeOrdered. The rrf
    score is a deterministic function of integer ranks, so both
    engines select identical rows."""
    t = cat(spark, sf_dir)["documents"].select(
        "doc_id", "n_chars", F.size(tokens()).cast("long").alias("tok_n")
    ).localCheckpoint()
    ra = global_rank(
        t.select("doc_id", "n_chars"),
        F.col("n_chars").desc(),
        "doc_id",
        rank_col="r_chars",
    ).select("doc_id", "r_chars")
    rb = global_rank(
        t.select("doc_id", "tok_n"),
        F.col("tok_n").desc(),
        "doc_id",
        rank_col="r_tokens",
    ).select("doc_id", "r_tokens")
    score = 1.0 / (RRF_K + F.col("r_chars")) + 1.0 / (RRF_K + F.col("r_tokens"))
    return (
        ra.join(rb, "doc_id")
        .select(
            "doc_id",
            F.col("r_chars").cast("bigint").alias("r_chars"),
            F.col("r_tokens").cast("bigint").alias("r_tokens"),
            rnd(score, 6).alias("rrf"),
            score.alias("_s"),
        )
        .orderBy(F.col("_s").desc(), "doc_id")
        .limit(20)
        .drop("_s")
    )


ml_rrf_fusion.__doc__ = ml_rrf_fusion.__doc__.format(k=RRF_K)


@query(
    "stat_kde",
    oracle=f"""
    WITH s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                      STDDEV_SAMP(c_acctbal) AS sd,
                      MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
               FROM customer),
    g AS (SELECT i, s.lo + i * (s.hi - s.lo) / {KDE_GRID} AS gx,
                 1.06 * s.sd * POW(s.n, -0.2) AS h, s.n
          FROM generate_series(0, {KDE_GRID}) AS t(i), s)
    SELECT CAST(g.i AS BIGINT) AS i,
           FLOOR(g.gx * 100 + 0.5) / 100 AS grid_x,
           FLOOR(SUM(EXP(-0.5 * ((g.gx - c.c_acctbal) / g.h)
                                * ((g.gx - c.c_acctbal) / g.h)))
                 / (g.n * g.h * SQRT(2 * PI())) * 1000000 * 10000 + 0.5)
             / 10000 AS density_ppm
    FROM g, customer c
    GROUP BY g.i, g.gx, g.h, g.n
    """,
)
def stat_kde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian kernel density estimate of customer account balance on
    a fixed {p}-point grid, Silverman bandwidth h = 1.06·σ·n^(-1/5).
    Reported as density × 10⁶ (ppm scale) so the 4-decimal rounding
    grid keeps real precision. The smooth, bandwidth-principled
    alternative to a histogram.

    Scale: the stats row (n, σ, min, max) is one tiny aggregate
    broadcast back; each data row then emits {p} kernel contributions
    map-side (a constant ×{p} explode, no shuffle growth) and the
    density is one partial-agg groupBy over {p} grid cells."""
    cust = cat(spark, sf_dir)["customer"]
    s = cust.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.stddev_samp("c_acctbal").alias("sd"),
        F.min("c_acctbal").alias("lo"),
        F.max("c_acctbal").alias("hi"),
    )
    two_pi = 6.283185307179586
    withs = cust.select("c_acctbal").crossJoin(F.broadcast(s))
    e = withs.select(
        "c_acctbal",
        "n",
        F.explode(F.sequence(F.lit(0), F.lit(KDE_GRID))).alias("i"),
        (F.lit(1.06) * F.col("sd") * F.pow(F.col("n"), -0.2)).alias("h"),
        (F.col("hi") - F.col("lo")).alias("span"),
        F.col("lo"),
    )
    gx = F.col("lo") + F.col("i") * F.col("span") / KDE_GRID
    z = (gx - F.col("c_acctbal")) / F.col("h")
    return (
        e.withColumn("gx", gx)
        .groupBy(F.col("i").cast("bigint").alias("i"), "gx", "h", "n")
        .agg(F.sum(F.exp(-0.5 * z * z)).alias("ksum"))
        .select(
            "i",
            rnd(F.col("gx"), 2).alias("grid_x"),
            rnd(
                F.col("ksum")
                / (F.col("n") * F.col("h") * F.sqrt(F.lit(two_pi)))
                * 1e6,
                4,
            ).alias("density_ppm"),
        )
    )


stat_kde.__doc__ = stat_kde.__doc__.format(p=KDE_GRID + 1)


@query(
    "graph_modularity",
    oracle=f"""
    WITH {_DUCK_BASKETS},
    e AS (SELECT x.l_partkey AS p1, y.l_partkey AS p2,
                 CAST(COUNT(*) AS DOUBLE) AS w
          FROM bk x JOIN bk y ON x.l_orderkey = y.l_orderkey
                             AND x.l_partkey < y.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= {COP_SUPPORT}),
    be AS (SELECT a.p_brand AS b1, b.p_brand AS b2, e.w
           FROM e JOIN part a ON e.p1 = a.p_partkey
                  JOIN part b ON e.p2 = b.p_partkey),
    m AS (SELECT SUM(w) AS m FROM be),
    win AS (SELECT b1 AS brand, SUM(w) AS w_in FROM be
            WHERE b1 = b2 GROUP BY 1),
    deg AS (SELECT brand, SUM(w) AS d FROM (
              SELECT b1 AS brand, w FROM be
              UNION ALL SELECT b2 AS brand, w FROM be) GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS communities,
           FLOOR(SUM(COALESCE(win.w_in, 0) / m.m
                     - (deg.d / (2 * m.m)) * (deg.d / (2 * m.m)))
                 * 10000 + 0.5) / 10000 AS q
    FROM deg LEFT JOIN win ON deg.brand = win.brand, m
    """,
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Newman modularity of the part-brand partition on the
    co-purchase graph: Q = Σ_c (w_in(c)/m − (d(c)/2m)²). The objective
    community detectors maximize, computed for a concrete assignment —
    near 0 here is itself the finding (brands don't drive baskets).

    Scale: reuses the capped co-purchase edge builder (one orderkey
    shuffle, partition-local pair expansion); brand lookup is a
    broadcast of the part dim; every aggregate after that is
    |brands|-sized."""
    e = _copurchase_edges(spark, sf_dir).withColumn(
        "w", F.col("w").cast("double")
    )
    part = cat(spark, sf_dir)["part"].select("p_partkey", "p_brand")
    be = (
        e.join(
            F.broadcast(part.select(F.col("p_partkey").alias("p1"),
                                    F.col("p_brand").alias("b1"))),
            "p1",
        )
        .join(
            F.broadcast(part.select(F.col("p_partkey").alias("p2"),
                                    F.col("p_brand").alias("b2"))),
            "p2",
        )
        .select("b1", "b2", "w")
        .localCheckpoint()
    )
    m = be.agg(F.sum("w").alias("m"))
    win = (
        be.filter(F.col("b1") == F.col("b2"))
        .groupBy(F.col("b1").alias("brand"))
        .agg(F.sum("w").alias("w_in"))
    )
    deg = (
        be.select(F.col("b1").alias("brand"), "w")
        .unionByName(be.select(F.col("b2").alias("brand"), "w"))
        .groupBy("brand")
        .agg(F.sum("w").alias("d"))
    )
    return (
        deg.join(F.broadcast(win), "brand", "left")
        .join(F.broadcast(m))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("communities"),
            ratio(
                F.sum(
                    F.coalesce(F.col("w_in"), F.lit(0.0)) / F.col("m")
                    - (F.col("d") / (2 * F.col("m")))
                    * (F.col("d") / (2 * F.col("m")))
                )
            ).alias("q"),
        )
    )
