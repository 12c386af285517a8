"""Wave 134: variance components, shard rebalancing plans, and
embedding isotropy.

stat_variance_components decomposes order-value variance into
between-customer and within-customer parts with the ICC — the
number that says whether 'customer' is a real clustering level
(and how wrong unclustered standard errors are);
ds_rebalance_plan turns measured shard sizes into a concrete
greedy move list toward balance — the plan a storage rebalance
executes; ml_embedding_isotropy reports effective rank and top-
eigenvalue share of the embedding covariance — anisotropy is why
cosine similarities saturate, and this is its measurement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS
from mister_spark.operators.common import cat, ratio
from mister_spark.operators.duck_linalg import duck_emb_cov_eigvals
from mister_spark.registry import query

RB_SHARDS = 8


@query(
    "stat_variance_components",
    oracle="""
    WITH g AS (SELECT o_custkey, CAST(COUNT(*) AS DOUBLE) AS n,
                      AVG(o_totalprice) AS m,
                      SUM((o_totalprice - 0) * (o_totalprice - 0)) AS ss
               FROM orders GROUP BY 1),
    w AS (SELECT SUM(ss - n * m * m) AS ss_within,
                 SUM(n) AS nn,
                 CAST(COUNT(*) AS DOUBLE) AS k,
                 SUM(n * m) / SUM(n) AS gm,
                 SUM(n * m * m) AS snm2,
                 SUM(n * n) AS sn2
          FROM g),
    c AS (SELECT ss_within / (nn - k) AS ms_within,
                 (snm2 - nn * gm * gm) / (k - 1) AS ms_between,
                 (nn - sn2 / nn) / (k - 1) AS n0,
                 nn, k
          FROM w),
    v AS (SELECT ms_within,
                 GREATEST((ms_between - ms_within) / n0, 0) AS var_between,
                 nn, k
          FROM c)
    SELECT CAST(k AS BIGINT) AS customers,
           CAST(nn AS BIGINT) AS orders,
           FLOOR(ms_within / 1000000 * 100 + 0.5) / 100 AS ms_within_m,
           FLOOR(var_between / 1000000 * 100 + 0.5) / 100 AS var_between_m,
           FLOOR(var_between / (var_between + ms_within) * 10000 + 0.5)
             / 10000 AS icc
    FROM v
    """,
)
def stat_variance_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way random-effects variance components for order value
    clustered by customer: MS_within, MS_between, and the intraclass
    correlation ICC = σ²_between/(σ²_between+σ²_within) via the
    unbalanced-design n₀ correction. ICC near 0 says orders are
    exchangeable across customers (unclustered SEs are fine); a
    material ICC multiplies your effective design effect by
    1+(n̄−1)·ICC and your naive CIs are too narrow by that factor.

    Scale: per-customer moments in one shuffle; the components are
    k-row arithmetic."""
    g = (
        cat(spark, sf_dir)["orders"]
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("o_totalprice").alias("m"),
            F.sum(F.col("o_totalprice") * F.col("o_totalprice")).alias("ss"),
        )
    )
    w = g.agg(
        F.sum(F.col("ss") - F.col("n") * F.col("m") * F.col("m")).alias(
            "ss_within"
        ),
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).cast("double").alias("k"),
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("gm"),
        F.sum(F.col("n") * F.col("m") * F.col("m")).alias("snm2"),
        F.sum(F.col("n") * F.col("n")).alias("sn2"),
    )
    ms_within = F.col("ss_within") / (F.col("nn") - F.col("k"))
    ms_between = (
        F.col("snm2") - F.col("nn") * F.col("gm") * F.col("gm")
    ) / (F.col("k") - 1)
    n0 = (F.col("nn") - F.col("sn2") / F.col("nn")) / (F.col("k") - 1)
    var_between = F.greatest((ms_between - ms_within) / n0, F.lit(0.0))
    return w.select(
        F.col("k").cast("bigint").alias("customers"),
        F.col("nn").cast("bigint").alias("orders"),
        (F.floor(ms_within / 1000000 * 100 + 0.5) / 100).alias(
            "ms_within_m"
        ),
        (F.floor(var_between / 1000000 * 100 + 0.5) / 100).alias(
            "var_between_m"
        ),
        ratio(var_between / (var_between + ms_within)).alias("icc"),
    )


@query(
    "ds_rebalance_plan",
    # Real oracle: the greedy donor→receiver loop runs as a recursive
    # CTE over the 8 shard-volume rows — per step the (tok DESC,
    # shard) max donates min(excess, deficit) to the (tok ASC, shard)
    # min, stopping under the 5%-of-mean floor or at 32 rounds; the
    # move list is read back from consecutive retained states.
    oracle=f"""
    WITH RECURSIVE t AS (SELECT doc_id, len({DUCK_TOKENS}) AS nt
                         FROM documents),
    sz AS (SELECT CAST(doc_id % {RB_SHARDS} AS INT) AS shard,
                  CAST(SUM(nt) AS DOUBLE) AS tok
           FROM t GROUP BY 1),
    mm AS (SELECT SUM(tok) / COUNT(*) AS mean FROM sz),
    rb AS (
      SELECT 0 AS it, shard, tok FROM sz
      UNION ALL
      SELECT q.it + 1, q.shard,
             CASE WHEN q.shard = q.hi THEN q.tok - q.amt
                  WHEN q.shard = q.lo THEN q.tok + q.amt
                  ELSE q.tok END
      FROM (
        SELECT r.it, r.shard, r.tok, m.mean,
               FIRST_VALUE(r.shard)
                 OVER (ORDER BY r.tok DESC, r.shard) AS hi,
               FIRST_VALUE(r.shard)
                 OVER (ORDER BY r.tok ASC, r.shard) AS lo,
               LEAST(MAX(r.tok) OVER () - m.mean,
                     m.mean - MIN(r.tok) OVER ()) AS amt
        FROM rb r CROSS JOIN mm m) q
      WHERE q.it < 32 AND q.amt >= q.mean * 0.05
    ),
    st AS (SELECT r.it,
                  FIRST_VALUE(r.shard) OVER (PARTITION BY r.it
                    ORDER BY r.tok DESC, r.shard) AS hi,
                  FIRST_VALUE(r.shard) OVER (PARTITION BY r.it
                    ORDER BY r.tok ASC, r.shard) AS lo,
                  LEAST(MAX(r.tok) OVER (PARTITION BY r.it) - m.mean,
                        m.mean - MIN(r.tok) OVER (PARTITION BY r.it))
                    AS amt
           FROM rb r CROSS JOIN mm m),
    mv AS (SELECT it, MAX(hi) AS hi, MAX(lo) AS lo, MAX(amt) AS amt
           FROM st
           WHERE EXISTS (SELECT 1 FROM rb r2 WHERE r2.it = st.it + 1)
           GROUP BY it),
    bounds AS (SELECT
                 (SELECT MAX(tok) FROM rb WHERE it = 0) / m.mean AS before,
                 (SELECT MAX(tok) FROM rb
                  WHERE it = (SELECT MAX(it) FROM rb)) / m.mean AS after
               FROM mm m)
    SELECT CAST(mv.hi AS BIGINT) AS from_shard,
           CAST(mv.lo AS BIGINT) AS to_shard,
           CAST(FLOOR(mv.amt) AS BIGINT) AS tokens_moved,
           FLOOR(b.before * 10000 + 0.5) / 10000 AS imbalance_before,
           FLOOR(b.after * 10000 + 0.5) / 10000 AS imbalance_after
    FROM mv CROSS JOIN bounds b
    UNION ALL
    SELECT -1, -1, 0,
           FLOOR(b.before * 10000 + 0.5) / 10000,
           FLOOR(b.after * 10000 + 0.5) / 10000
    FROM bounds b WHERE NOT EXISTS (SELECT 1 FROM mv)
    """,
)
def ds_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard rebalance plan: hash documents into {s} shards by
    doc_id, measure per-shard token volume, and emit the greedy move
    list (largest donor → largest receiver, one stratum at a time)
    that brings every shard within 10% of the mean — the concrete
    migration plan a storage rebalance executes, with before/after
    imbalance measured.

    Scale: shard volumes are one rollup; the greedy planner is
    O(shards²) driver arithmetic on that tiny frame."""
    from mister_spark.functions.text import tokens

    docs = cat(spark, sf_dir)["documents"]
    per = (
        docs.groupBy((F.col("doc_id") % RB_SHARDS).alias("shard"))
        .agg(F.sum(F.size(tokens())).cast("double").alias("tok"))
        .collect()
    )
    sizes = {int(r["shard"]): float(r["tok"]) for r in per}
    mean = sum(sizes.values()) / len(sizes)
    before = max(sizes.values()) / mean
    moves = []
    work = dict(sizes)
    for _ in range(32):
        hi = max(work, key=lambda k: work[k])
        lo = min(work, key=lambda k: work[k])
        excess = work[hi] - mean
        deficit = mean - work[lo]
        amt = min(excess, deficit)
        if amt < mean * 0.05:
            break
        work[hi] -= amt
        work[lo] += amt
        moves.append((hi, lo, amt))
    after = max(work.values()) / mean
    import math

    # cross-engine floor rounding (common.rnd's rule) for oracle parity
    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
    rows = [
        (int(src), int(dst), int(amt), r4(before), r4(after))
        for src, dst, amt in moves
    ]
    if not rows:
        rows = [(-1, -1, 0, r4(before), r4(after))]
    return spark.createDataFrame(
        rows,
        "from_shard long, to_shard long, tokens_moved long, "
        "imbalance_before double, imbalance_after double",
    )


ds_rebalance_plan.__doc__ = ds_rebalance_plan.__doc__.format(s=RB_SHARDS)


@query(
    "ml_embedding_isotropy",
    # Real oracle: every reported number is a function of the
    # covariance SPECTRUM alone, and the shared tournament-Jacobi
    # recursion (duck_linalg.duck_jacobi_eigvals) reproduces the
    # spectrum to ~3e-16 — inside every grid here (nearest boundary
    # 2e-6 abs). The entropy/effective-rank sum runs in the same
    # ascending eigenvalue order numpy uses.
    oracle=f"""
    WITH RECURSIVE
    {duck_emb_cov_eigvals()},
    evp AS (SELECT list_transform(eig.ev, x -> GREATEST(x, 0.0)) AS ev
            FROM eig),
    s AS (SELECT ev, list_aggregate(ev, 'sum') AS tot FROM evp),
    ent AS (SELECT ev, tot,
                   list_aggregate(list_transform(ev, x ->
                     CASE WHEN x / tot > 0 THEN -(x / tot) * ln(x / tot)
                          ELSE 0.0 END), 'sum') AS h
            FROM s)
    SELECT CAST(64 AS BIGINT) AS dim,
           FLOOR(ev[64] / tot * 1e4 + 0.5) / 1e4 AS top_eig_share,
           FLOOR(exp(h) * 1e4 + 0.5) / 1e4 AS effective_rank,
           FLOOR(ev[1] / ev[64] * 1e6 + 0.5) / 1e6 AS isotropy_ratio
    FROM ent
    """,
)
def ml_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy report: from the covariance spectrum, the
    top-eigenvalue share, the effective rank exp(H(λ/Σλ)), and the
    isotropy ratio λ_min/λ_max. Anisotropic spaces (one dominant
    direction) make every cosine similarity look alike — the common
    cause of 'all my similarities are 0.9'; effective rank near d
    certifies the space actually uses its dimensions.

    Scale: reuses the O(d²) sufficient-statistics pass; the spectrum
    is a driver-side d×d solve."""
    import numpy as np

    from mister_spark.operators.extras84 import _emb_cov_stats

    n, mu, S = _emb_cov_stats(spark, sf_dir)
    ev = np.linalg.eigvalsh(S)
    ev = np.maximum(ev, 0)
    p = ev / ev.sum()
    ent = -np.sum(p[p > 0] * np.log(p[p > 0]))
    eff_rank = float(np.exp(ent))
    row = (
        len(ev),
        round(float(ev[-1] / ev.sum()), 4),
        round(eff_rank, 4),
        round(float(ev[0] / ev[-1]), 6),
    )
    return spark.createDataFrame(
        [row],
        "dim long, top_eig_share double, effective_rank double, "
        "isotropy_ratio double",
    )
