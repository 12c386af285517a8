"""Wave 92: covariance conditioning, shuffle-quality auditing, and
blocklist screening.

stat_ledoit_wolf shrinks the sample covariance toward the scaled
identity with the analytically optimal intensity — the fix for the
ill-conditioned Σ that breaks Mahalanobis/GLS when d is not tiny
relative to n; ds_shuffle_audit measures whether the deterministic
training shuffle actually MIXED the sources (adjacent-pair collision
rate vs the i.i.d. expectation, as a z-score) — the check between
'we shuffled' and 'the model sees runs of one source';
tx_blocklist_screen is the per-source blocklist hit report — the
unglamorous curation gate that runs before anything fancier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.duck_linalg import duck_emb_cov_eigvals
from mister_spark.operators.extras84 import _emb_cov_stats
from mister_spark.operators.pipeline2 import SHUFFLE_SEED
from mister_spark.registry import query

BLOCKLIST = ("error", "dup", "slow")


@query(
    "stat_ledoit_wolf",
    # Real oracle: μ, δ and the fourth-moment noise estimate are plain
    # moment algebra over the same covariance; the two condition
    # numbers need only the EXTREME eigenvalues, which the shared
    # tournament-Jacobi recursion (duck_linalg.duck_jacobi_eigvals)
    # reproduces to ~3e-16. The shrunk spectrum is the affine map
    # (1−δ)λ + δμ with (1−δ) ≥ 0, so cond_after comes from the same
    # two extremes — no second eigensolve. All grids (1e-6 / 1e-4)
    # sit ≥ 7.7e-9 from their nearest boundary at the compare scales.
    oracle=f"""
    WITH RECURSIVE
    {duck_emb_cov_eigvals()},
    trc AS (SELECT list_aggregate(list_transform(range(1, 65), i ->
                     m.a[i][i]), 'sum') / 64.0 AS mu
            FROM mat m),
    fro AS (SELECT
              list_aggregate(list_transform(range(1, 65), i ->
                list_aggregate(list_transform(range(1, 65), j ->
                  m.a[i][j] * m.a[i][j]), 'sum')), 'sum') AS ss2,
              list_aggregate(list_transform(range(1, 65), i ->
                list_aggregate(list_transform(range(1, 65), j ->
                  POW(m.a[i][j] - CASE WHEN i = j THEN t.mu
                                       ELSE 0.0 END, 2)), 'sum')),
                'sum') AS d2
            FROM mat m CROSS JOIN trc t),
    qq AS (SELECT SUM(POW(list_aggregate(list_transform(range(1, 65),
                     i -> (e.v[i] - mx.mu[i]) * (e.v[i] - mx.mu[i])),
                     'sum'), 2)) AS q
           FROM ex e CROSS JOIN emu mx),
    dl AS (SELECT t.mu, f.d2, nx.n,
                  CASE WHEN f.d2 > 0
                       THEN GREATEST(LEAST((qq.q / nx.n - f.ss2) / nx.n,
                                           f.d2), 0.0) / f.d2
                       ELSE 1.0 END AS delta
           FROM trc t, fro f, qq, enn nx),
    c AS (SELECT dl.mu, dl.n, dl.delta,
                 eig.ev[64] / GREATEST(eig.ev[1], 1e-18) AS cond_b,
                 ((1.0 - dl.delta) * eig.ev[64] + dl.delta * dl.mu)
                 / GREATEST((1.0 - dl.delta) * eig.ev[1]
                            + dl.delta * dl.mu, 1e-18) AS cond_a
          FROM dl CROSS JOIN eig)
    SELECT CAST(64 AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
           FLOOR(mu * 1e6 + 0.5) / 1e6 AS mu,
           FLOOR(delta * 1e6 + 0.5) / 1e6 AS delta,
           FLOOR(cond_b * 1e4 + 0.5) / 1e4 AS cond_before,
           FLOOR(cond_a * 1e4 + 0.5) / 1e4 AS cond_after
    FROM c
    """,
)
def stat_ledoit_wolf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ledoit–Wolf covariance shrinkage for the embedding corpus:
    Σ_lw = (1−δ)·S + δ·μI with μ = tr(S)/d and the analytically
    optimal δ = min(1, b̄²/d̄²), where d̄² = ‖S−μI‖_F² and b̄² estimates
    the sampling noise from fourth moments. Reports δ and the
    condition number before/after — the reason to shrink: a
    well-conditioned Σ⁻¹ for Mahalanobis/whitening when n/d is small.

    Scale: S comes from the O(d²)-per-partition sufficient-stats pass
    (extras84); the fourth-moment term is ONE more narrow Arrow pass
    emitting a scalar per batch; eigenvalues are a driver-side d×d
    solve."""
    import numpy as np
    import pandas as pd

    n, mu_vec, S = _emb_cov_stats(spark, sf_dir)
    d = len(mu_vec)

    emb = cat(spark, sf_dir)["embeddings"].select(
        F.col("embedding").cast("array<double>").alias("v")
    )

    def fourth(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["v"]), dtype=np.float64) - mu_vec
            yield pd.DataFrame({"q": [float((np.sum(X * X, axis=1) ** 2).sum())]})

    q = sum(
        r["q"] for r in emb.mapInPandas(fourth, "q double").collect()
    )
    mu = float(np.trace(S)) / d
    d2 = float(np.sum((S - mu * np.eye(d)) ** 2))
    b2 = max(min((q / n - float(np.sum(S * S))) / n, d2), 0.0)
    delta = b2 / d2 if d2 > 0 else 1.0
    ev_before = np.linalg.eigvalsh(S)
    S_lw = (1 - delta) * S + delta * mu * np.eye(d)
    ev_after = np.linalg.eigvalsh(S_lw)
    cond_b = float(ev_before[-1] / max(ev_before[0], 1e-18))
    cond_a = float(ev_after[-1] / max(ev_after[0], 1e-18))
    row = (
        d,
        int(n),
        round(mu, 6),
        round(delta, 6),
        round(cond_b, 4),
        round(cond_a, 4),
    )
    return spark.createDataFrame(
        [row],
        "dim long, n long, mu double, delta double, cond_before double, "
        "cond_after double",
    )


@query(
    "ds_shuffle_audit",
    oracle=f"""
    WITH h AS (SELECT doc_id, source,
                      md5(CAST(doc_id AS VARCHAR) || ':{SHUFFLE_SEED}') AS hx
               FROM documents),
    s AS (SELECT source, hx, doc_id,
                 CAST(ascii(substr(hx, 1, 1)) % 8 AS BIGINT) AS shard
          FROM h),
    o AS (SELECT source, shard,
                 LAG(source) OVER (PARTITION BY shard
                                   ORDER BY hx, doc_id) AS prev
          FROM s),
    pairs AS (SELECT CAST(COUNT(*) AS DOUBLE) AS pairs,
                     CAST(SUM(CASE WHEN source = prev THEN 1 ELSE 0 END)
                          AS DOUBLE) AS same
              FROM o WHERE prev IS NOT NULL),
    pr AS (SELECT SUM(p * p) AS exp_rate FROM (
             SELECT CAST(COUNT(*) AS DOUBLE)
                    / (SELECT COUNT(*) FROM documents) AS p
             FROM documents GROUP BY source)),
    z AS (SELECT pairs.pairs, pairs.same / pairs.pairs AS same_rate,
                 pr.exp_rate,
                 (pairs.same / pairs.pairs - pr.exp_rate)
                   / SQRT(pr.exp_rate * (1 - pr.exp_rate) / pairs.pairs) AS zs
          FROM pairs, pr)
    SELECT CAST(pairs AS BIGINT) AS pairs,
           FLOOR(same_rate * 10000 + 0.5) / 10000 AS same_rate,
           FLOOR(exp_rate * 10000 + 0.5) / 10000 AS expected_rate,
           FLOOR(zs * 10000 + 0.5) / 10000 AS z
    FROM z
    """,
)
def ds_shuffle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-quality audit of the deterministic training order
    (ds_global_shuffle's md5 order): the adjacent-pair same-source
    collision rate versus the i.i.d. expectation Σp², as a z-score.
    |z| small ⇒ the shuffle mixed sources properly; a large positive z
    means the model would see source RUNS — curriculum by accident.

    Scale: the audit inherits the shuffle's own partitioning — the lag
    window is per shard (independent sorted streams, no global sort);
    the source-share frame is |sources| rows broadcast."""
    docs = cat(spark, sf_dir)["documents"]
    h = docs.select(
        "doc_id",
        "source",
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(f":{SHUFFLE_SEED}"))
        ).alias("hx"),
    )
    s = h.withColumn(
        "shard", (F.ascii(F.substring("hx", 1, 1)) % 8).cast("bigint")
    )
    w = W.partitionBy("shard").orderBy("hx", "doc_id")
    o = s.select("source", F.lag("source").over(w).alias("prev")).filter(
        F.col("prev").isNotNull()
    )
    pairs = o.agg(
        F.count(F.lit(1)).cast("double").alias("pairs"),
        F.sum((F.col("source") == F.col("prev")).cast("double")).alias(
            "same"
        ),
    )
    tot = docs.count()
    pr = (
        docs.groupBy("source")
        .agg((F.count(F.lit(1)).cast("double") / tot).alias("p"))
        .agg(F.sum(F.col("p") * F.col("p")).alias("exp_rate"))
    )
    j = pairs.crossJoin(F.broadcast(pr))
    same_rate = F.col("same") / F.col("pairs")
    zs = (same_rate - F.col("exp_rate")) / F.sqrt(
        F.col("exp_rate") * (1 - F.col("exp_rate")) / F.col("pairs")
    )
    return j.select(
        F.col("pairs").cast("bigint").alias("pairs"),
        ratio(same_rate).alias("same_rate"),
        ratio(F.col("exp_rate")).alias("expected_rate"),
        ratio(zs).alias("z"),
    )


def _bl_sql() -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in BLOCKLIST) + "]"
    return arr


@query(
    "tx_blocklist_screen",
    oracle=f"""
    WITH t AS (SELECT source,
                      len(list_filter(list_filter(string_split(text, ' '),
                                                  x -> x <> ''),
                                      x -> list_contains({_bl_sql()}, x)))
                        AS hits
               FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS flagged,
           CAST(SUM(hits) AS BIGINT) AS total_hits,
           FLOOR(CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) * 10000 + 0.5) / 10000 AS flag_rate
    FROM t GROUP BY 1
    """,
)
def tx_blocklist_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist screening per source: documents containing any
    blocklisted token ({bl}), with per-source flag rates and total
    hits — the first, cheapest curation gate (policy terms, known-bad
    boilerplate markers) that runs before model-based filters, and the
    report a source-quality review reads.

    Scale: the token membership test is a narrow JVM array filter
    against a literal — no UDF, no join; one partial-agg shuffle to
    |sources| rows."""
    docs = cat(spark, sf_dir)["documents"]
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    lit = F.array(*[F.lit(w) for w in BLOCKLIST])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(lit, t)))
    t = docs.select("source", hits.alias("hits"))
    return t.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs"),
        F.sum((F.col("hits") > 0).cast("long")).cast("bigint").alias(
            "flagged"
        ),
        F.sum("hits").cast("bigint").alias("total_hits"),
        ratio(
            F.sum((F.col("hits") > 0).cast("double")) / F.count(F.lit(1))
        ).alias("flag_rate"),
    )
