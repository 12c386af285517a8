"""Wave 90: referential integrity auditing, distribution-free ECDF
bands, integral two-sample testing, and permutation importance.

io_referential_integrity counts orphans across every foreign-key edge
of the star schema in one report — the data-quality gate that should
run before any join-based metric is trusted; stat_dkw_band wraps the
exact decile order statistics in the Dvoretzky–Kiefer–Wolfowitz 95%
confidence band (distribution-free, no bootstrap); stat_cvm is the
Cramér–von Mises two-sample statistic — KS's integral twin that sees
body-wide drift a single sup-point misses; ml_permutation_importance
scores the trained logreg's features by loss-increase-under-permutation
— importance measured by damage, not by coefficient folklore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras8 import _SEG_FILTER, _two_sample
from mister_spark.registry import query

DKW_ALPHA = 0.05
DKW_QS = [i / 10 for i in range(1, 10)]
PERM_TOP = 5
PERM_BUCKETS = 64  # wrap-shift permutation buckets (vec_id % B)


@query(
    "io_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS relation,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS child_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
             AS orphan_rows
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey))
    UNION ALL
    SELECT 'orders->customer',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    """,
)
def io_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key integrity audit across the star schema: for each
    FK edge, the child row count and the orphan count (child rows
    whose parent key is missing). Zero everywhere is the expected —
    and now PROVEN — state; any nonzero is the first thing to fix
    before any join-based metric is believed.

    Scale: each edge is one left-anti join with the dimension side
    broadcast (customer/part/supplier are dim-sized; orders→lineitem
    anti-join shuffles on orderkey — the same exchange the TPC-H
    queries reuse)."""
    c = cat(spark, sf_dir)
    li, orders = c["lineitem"], c["orders"]
    edges = [
        (
            "lineitem->orders",
            li,
            orders.select(F.col("o_orderkey").alias("k")),
            "l_orderkey",
            False,
        ),
        (
            "lineitem->part",
            li,
            c["part"].select(F.col("p_partkey").alias("k")),
            "l_partkey",
            True,
        ),
        (
            "lineitem->supplier",
            li,
            c["supplier"].select(F.col("s_suppkey").alias("k")),
            "l_suppkey",
            True,
        ),
        (
            "orders->customer",
            orders,
            c["customer"].select(F.col("c_custkey").alias("k")),
            "o_custkey",
            True,
        ),
    ]
    out = None
    for name, child, parent, fk, bcast in edges:
        p = F.broadcast(parent) if bcast else parent
        orphans = child.join(
            p, child[fk] == p["k"], "left_anti"
        ).agg(F.count(F.lit(1)).cast("bigint").alias("orphan_rows"))
        tot = child.agg(F.count(F.lit(1)).cast("bigint").alias("child_rows"))
        r = (
            tot.crossJoin(F.broadcast(orphans))
            .select(
                F.lit(name).alias("relation"), "child_rows", "orphan_rows"
            )
        )
        out = r if out is None else out.unionByName(r)
    return out


def _dkw_qs_sql() -> str:
    return ", ".join(f"({q})" for q in DKW_QS)


@query(
    "stat_dkw_band",
    oracle=f"""
    WITH x AS (SELECT o_totalprice AS v FROM orders),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM x),
    g AS (SELECT v, CAST(COUNT(*) AS DOUBLE) AS c FROM x GROUP BY 1),
    e AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM g),
    q AS (SELECT * FROM (VALUES {_dkw_qs_sql()}) AS t(q)),
    pick AS (SELECT q.q, MIN(e.v) AS xq
             FROM q, e, n WHERE e.cum >= CEIL(q.q * n.n) GROUP BY q.q)
    SELECT FLOOR(pick.q * 100 + 0.5) / 100 AS q,
           FLOOR(pick.xq * 100 + 0.5) / 100 AS x_q,
           FLOOR(SQRT(LN(2 / {DKW_ALPHA}) / (2 * n.n)) * 10000 + 0.5) / 10000
             AS eps,
           FLOOR(GREATEST(pick.q - SQRT(LN(2 / {DKW_ALPHA}) / (2 * n.n)), 0)
                 * 10000 + 0.5) / 10000 AS band_lo,
           FLOOR(LEAST(pick.q + SQRT(LN(2 / {DKW_ALPHA}) / (2 * n.n)), 1)
                 * 10000 + 0.5) / 10000 AS band_hi
    FROM pick, n
    """,
)
def stat_dkw_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile order statistics of order totalprice with the
    Dvoretzky–Kiefer–Wolfowitz 95% confidence band: at each decile q,
    the EXACT quantile x_q (smallest value whose ECDF reaches q) plus
    the distribution-free band q ± √(ln(2/α)/2n) on the ECDF — honest
    uncertainty for quantile reports without bootstrapping.

    Scale: quantiles come from the |distinct values| prefix frame
    (`bucketed_cumsum`, two-phase — no single-task sort) joined
    against 9 broadcast decile targets; no approx sketch involved, so
    the quantiles are exact at any scale."""
    x = cat(spark, sf_dir)["orders"].select(F.col("o_totalprice").alias("v"))
    n = x.agg(F.count(F.lit(1)).cast("double").alias("n"))
    g = x.groupBy("v").agg(F.count(F.lit(1)).cast("double").alias("c"))
    e = bucketed_cumsum(g, "v", {"cum": F.col("c")})
    qs = spark.createDataFrame([(q,) for q in DKW_QS], "q double")
    eps = F.sqrt(F.log(F.lit(2.0 / DKW_ALPHA)) / (2 * F.col("n")))
    pick = (
        e.crossJoin(F.broadcast(qs))
        .crossJoin(F.broadcast(n))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q", "n")
        .agg(F.min("v").alias("xq"))
    )
    return pick.select(
        (F.floor(F.col("q") * 100 + 0.5) / 100).alias("q"),
        (F.floor(F.col("xq") * 100 + 0.5) / 100).alias("x_q"),
        ratio(eps).alias("eps"),
        ratio(F.greatest(F.col("q") - eps, F.lit(0.0))).alias("band_lo"),
        ratio(F.least(F.col("q") + eps, F.lit(1.0))).alias("band_hi"),
    )


@query(
    "stat_cvm",
    oracle=f"""
    WITH s AS (
      SELECT c_acctbal AS v,
             CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS ga,
             CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END AS gb
      FROM customer WHERE {_SEG_FILTER}),
    g AS (SELECT v, SUM(ga) AS da, SUM(gb) AS db, COUNT(*) AS cnt
          FROM s GROUP BY 1),
    c AS (SELECT cnt, SUM(da) OVER (ORDER BY v) AS ca,
                 SUM(db) OVER (ORDER BY v) AS cb FROM g),
    t AS (SELECT CAST(SUM(ga) AS DOUBLE) AS na,
                 CAST(SUM(gb) AS DOUBLE) AS nb FROM s)
    SELECT CAST(t.na AS BIGINT) AS na, CAST(t.nb AS BIGINT) AS nb,
           FLOOR(t.na * t.nb / ((t.na + t.nb) * (t.na + t.nb))
                 * SUM(c.cnt * (c.ca / t.na - c.cb / t.nb)
                               * (c.ca / t.na - c.cb / t.nb))
                 * 10000 + 0.5) / 10000 AS cvm_t
    FROM c, t GROUP BY t.na, t.nb
    """,
)
def stat_cvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér–von Mises two-sample statistic between the same two
    segments stat_ks_test compares: T = (n·m/N²)·Σ over pooled
    observations of (F̂(x)−Ĝ(x))² — the INTEGRAL of the ECDF gap, so a
    broad small shift accumulates where KS's single sup-point stays
    quiet. Run both: KS finds the spike, CvM finds the smear.

    Scale: identical plan shape to stat_ks_test — one partial-agg
    collapse to |distinct values|, `bucketed_cumsum` two-phase prefix
    sums, one final aggregate."""
    s = _two_sample(spark, sf_dir)
    g = s.groupBy("v").agg(
        F.sum("ga").alias("da"),
        F.sum("gb").alias("db"),
        F.count(F.lit(1)).alias("cnt"),
    )
    c = bucketed_cumsum(g, "v", {"ca": F.col("da"), "cb": F.col("db")})
    t = s.agg(
        F.sum("ga").cast("double").alias("na"),
        F.sum("gb").cast("double").alias("nb"),
    )
    gap = F.col("ca") / F.col("na") - F.col("cb") / F.col("nb")
    return (
        c.crossJoin(F.broadcast(t))
        .groupBy(
            F.col("na").cast("bigint").alias("na"),
            F.col("nb").cast("bigint").alias("nb"),
        )
        .agg(
            ratio(
                F.first("na")
                * F.first("nb")
                / (
                    (F.first("na") + F.first("nb"))
                    * (F.first("na") + F.first("nb"))
                )
                * F.sum(F.col("cnt") * gap * gap)
            ).alias("cvm_t")
        )
    )


def _perm_imp_oracle() -> str:
    from mister_spark.operators.ml import DUCK_LOGREG_GD, LOGREG_ITERS

    # DuckDB lambdas cannot capture correlated columns through a
    # LATERAL, so the logistic probability is inlined (twice per loss
    # term — identical deterministic arithmetic)
    z_base = (
        "list_aggregate(list_transform(range(1, 65), "
        "j -> e.v[j] * wl.w[j]), 'sum') + wl.w[65]"
    )
    p_base = f"(1.0 / (1.0 + EXP(-({z_base}))))"
    z_perm = (
        "list_aggregate(list_transform(range(1, 65), "
        "j -> (CASE WHEN j = pe.dim THEN pe.pv ELSE pe.v[j] END)"
        " * wl.w[j]), 'sum') + wl.w[65]"
    )
    p_perm = f"(1.0 / (1.0 + EXP(-({z_perm}))))"
    return f"""
    WITH RECURSIVE {DUCK_LOGREG_GD},
    wl AS (SELECT w FROM gd WHERE it = {LOGREG_ITERS}),
    exv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   CAST(label % 2 AS DOUBLE) AS y
            FROM embeddings),
    dims AS (SELECT dim FROM (
        SELECT u.i AS dim, ABS(wl.w[u.i]) AS a
        FROM wl CROSS JOIN LATERAL
          (SELECT unnest(range(1, 65)) AS i) u) q
      ORDER BY a DESC, dim LIMIT {PERM_TOP}),
    bl AS (SELECT AVG(-(e.y * LN({p_base} + 1e-12)
                        + (1 - e.y) * LN(1 - {p_base} + 1e-12))) AS loss
           FROM exv e CROSS JOIN wl),
    pe AS (SELECT d.dim AS dim, e.vec_id, e.v, e.y,
                  COALESCE(
                    LAG(e.v[d.dim]) OVER
                      (PARTITION BY d.dim, e.vec_id % {PERM_BUCKETS}
                       ORDER BY e.vec_id),
                    LAST_VALUE(e.v[d.dim]) OVER
                      (PARTITION BY d.dim, e.vec_id % {PERM_BUCKETS}
                       ORDER BY e.vec_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING)) AS pv
           FROM exv e CROSS JOIN dims d),
    pl AS (SELECT pe.dim AS dim,
                  AVG(-(pe.y * LN({p_perm} + 1e-12)
                        + (1 - pe.y) * LN(1 - {p_perm} + 1e-12))) AS loss
           FROM pe CROSS JOIN wl
           GROUP BY pe.dim)
    SELECT CAST(pl.dim - 1 AS BIGINT) AS dim,
           FLOOR(wl.w[pl.dim] * 1e6 + 0.5) / 1e6 AS weight,
           FLOOR(bl.loss * 1e6 + 0.5) / 1e6 AS base_loss,
           FLOOR(pl.loss * 1e6 + 0.5) / 1e6 AS perm_loss,
           FLOOR((pl.loss - bl.loss) * 1e6 + 0.5) / 1e6 AS delta
    FROM pl CROSS JOIN bl CROSS JOIN wl
    """


@query("ml_permutation_importance", oracle=_perm_imp_oracle())
def ml_permutation_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation importance for the trained logistic model: for each
    of the top-{t} |weight| features, re-score the corpus with that
    feature's column permuted (a deterministic bucketed wrap-shift:
    within each vec_id%{b} bucket, ordered by vec_id, every row takes
    its predecessor's value and the first row takes the last's —
    breaks the feature↔label link reproducibly in any engine) and
    report the log-loss increase. A feature whose permutation doesn't
    hurt wasn't earning its coefficient — the importance check that
    survives correlated features better than reading weights.

    Scale: scoring is pure JVM column math (weights are literals — no
    Python row path); the permutation is one window per audited
    feature, partitioned by the id bucket, so each sort is
    bucket-local and bounded — never a global sort. The oracle replays
    training via the shared DUCK_LOGREG_GD fragment and the identical
    window."""
    import numpy as np

    from pyspark.sql import Window as W

    from mister_spark.operators.ml import logreg_train

    w, _losses = logreg_train(spark, sf_dir)
    w = np.asarray(w, dtype=np.float64)
    aw = np.abs(w[:-1])
    # deterministic top-|w| pick: (|w| desc, dim asc)
    dims = np.lexsort((np.arange(len(aw)), -aw))[:PERM_TOP]
    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        (F.col("label") % 2).cast("double").alias("y"),
    ).localCheckpoint()

    def loss(df, perm_dim: int | None = None) -> float:
        z = None
        for j in range(len(w) - 1):
            xj = F.col("pv") if j == perm_dim else F.col("v")[j]
            t = xj * float(w[j])
            z = t if z is None else z + t
        z = z + F.lit(float(w[-1]))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        eps = F.lit(1e-12)
        ll = -(
            F.col("y") * F.log(p + eps)
            + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p + eps)
        )
        return float(df.agg(F.avg(ll)).collect()[0][0])

    base = loss(emb)
    win = W.partitionBy(F.col("vec_id") % PERM_BUCKETS).orderBy("vec_id")
    full = win.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    import math

    out = []
    for d in dims:
        xd = F.col("v")[int(d)]
        pv = F.coalesce(F.lag(xd, 1).over(win), F.last(xd).over(full))
        pl = loss(emb.withColumn("pv", pv), int(d))
        out.append(
            (
                int(d),
                math.floor(float(w[d]) * 1e6 + 0.5) / 1e6,
                math.floor(base * 1e6 + 0.5) / 1e6,
                math.floor(pl * 1e6 + 0.5) / 1e6,
                math.floor((pl - base) * 1e6 + 0.5) / 1e6,
            )
        )
    out.sort(key=lambda r: (-r[4], r[0]))
    return spark.createDataFrame(
        out,
        "dim long, weight double, base_loss double, perm_loss double, "
        "delta double",
    )


ml_permutation_importance.__doc__ = ml_permutation_importance.__doc__.format(
    t=PERM_TOP, b=PERM_BUCKETS
)
