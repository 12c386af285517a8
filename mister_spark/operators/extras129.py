"""Wave 129: prediction intervals, semi-supervised label spreading,
and MinHash accuracy curves.

stat_prediction_interval attaches the OLS prediction interval (for a
NEW observation — wider than the mean's CI by the full residual
variance) at probe points; ml_label_spreading propagates a few
'labeled' seeds over the embedding kNN graph — semi-supervised
classification with O(edges) iterations; dd_minhash_error_curve
measures |MinHash-estimated − exact| Jaccard on verified near-dup
pairs as k grows — the sketch-size accuracy curve that justifies (or
indicts) k=64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.hashing import (
    duck_minhash_mins,
    mh_hash60,
    minhash_signatures,
)
from mister_spark.functions.text import DUCK_TOKENS
from mister_spark.operators.dedup import DD_NGRAM_ORACLE
from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

PI_PROBES = (10.0, 25.0, 45.0)  # quantity probe points
LS_SEEDS_PER_CLASS = 5
LS_KNN = 5
LS_ITERS = 6
MH_KS = (8, 16, 32, 64)


@query(
    "stat_prediction_interval",
    oracle=f"""
    WITH d AS (SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(x) AS mx, AVG(y) AS my,
                 SUM(x * x) AS sxx0, SUM(x * y) AS sxy0, SUM(y * y) AS syy0
          FROM d),
    c AS (SELECT n, mx, my,
                 sxx0 - n * mx * mx AS sxx,
                 sxy0 - n * mx * my AS sxy,
                 syy0 - n * my * my AS syy
          FROM m),
    f AS (SELECT n, mx, my, sxx, sxy / sxx AS b,
                 (syy - sxy * sxy / sxx) / (n - 2) AS s2
          FROM c)
    SELECT v.px AS probe_x,
           FLOOR((my + b * (v.px - mx)) * 100 + 0.5) / 100 AS predicted,
           FLOOR((my + b * (v.px - mx)
                  - 1.959964 * SQRT(s2 * (1 + 1 / n
                                          + (v.px - mx) * (v.px - mx) / sxx)))
                 * 100 + 0.5) / 100 AS pi_lo,
           FLOOR((my + b * (v.px - mx)
                  + 1.959964 * SQRT(s2 * (1 + 1 / n
                                          + (v.px - mx) * (v.px - mx) / sxx)))
                 * 100 + 0.5) / 100 AS pi_hi
    FROM f, (VALUES {", ".join(f"({p})" for p in PI_PROBES)}) v(px)
    """,
)
def stat_prediction_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS prediction intervals for extendedprice at quantity probes
    {p}: PI = ŷ ± z·s·√(1 + 1/n + (x−x̄)²/Sxx) — the '+1' is the whole
    story: a CI for the MEAN shrinks with n, but a new observation
    keeps the full residual spread forever. The interval to quote when
    someone asks 'what will THIS order cost', not 'what do orders cost
    on average'.

    Scale: one moments pass; the probes are a 3-row broadcast of
    closed-form arithmetic."""
    d = cat(spark, sf_dir)["lineitem"].select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )
    m = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.sum(F.col("x") * F.col("x")).alias("sxx0"),
        F.sum(F.col("x") * F.col("y")).alias("sxy0"),
        F.sum(F.col("y") * F.col("y")).alias("syy0"),
    )
    n = F.col("n")
    sxx = F.col("sxx0") - n * F.col("mx") * F.col("mx")
    sxy = F.col("sxy0") - n * F.col("mx") * F.col("my")
    syy = F.col("syy0") - n * F.col("my") * F.col("my")
    f = m.select(
        "n",
        "mx",
        "my",
        sxx.alias("sxx"),
        (sxy / sxx).alias("b"),
        ((syy - sxy * sxy / sxx) / (n - 2)).alias("s2"),
    )
    probes = spark.createDataFrame([(p,) for p in PI_PROBES], "px double")
    j = f.crossJoin(F.broadcast(probes))
    pred = F.col("my") + F.col("b") * (F.col("px") - F.col("mx"))
    half = 1.959964 * F.sqrt(
        F.col("s2")
        * (
            1
            + 1 / F.col("n")
            + (F.col("px") - F.col("mx"))
            * (F.col("px") - F.col("mx"))
            / F.col("sxx")
        )
    )
    return j.select(
        F.col("px").alias("probe_x"),
        money(pred).alias("predicted"),
        money(pred - half).alias("pi_lo"),
        money(pred + half).alias("pi_hi"),
    )


stat_prediction_interval.__doc__ = stat_prediction_interval.__doc__.format(
    p=PI_PROBES
)


@query(
    "ml_label_spreading",
    # Real oracle: the mutual-cosine kNN graph (deterministic
    # sim-desc/vec_id tie-break), the 5+5 lowest-vec_id seed pick and
    # all {it} clamped propagation rounds replay as SQL — the
    # propagation is a recursive CTE pulling each node's neighbor
    # mean per round.
    oracle=f"""
    WITH RECURSIVE
    ex AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                  CAST(label % 2 AS INT) AS y
           FROM embeddings),
    nrm AS (SELECT vec_id, y, list_transform(v, x -> x /
              GREATEST(SQRT(list_aggregate(list_transform(v,
                z -> z * z), 'sum')), 1e-12)) AS u
            FROM ex),
    knn AS (SELECT a, b FROM (
        SELECT a.vec_id AS a, b.vec_id AS b,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY list_aggregate(list_transform(range(1, 65),
                   i -> a.u[i] * b.u[i]), 'sum') DESC, b.vec_id) AS rn
        FROM nrm a JOIN nrm b ON a.vec_id <> b.vec_id) q
      WHERE rn <= {LS_KNN}),
    seeds AS (SELECT vec_id, y FROM (
        SELECT vec_id, y,
               ROW_NUMBER() OVER (PARTITION BY y ORDER BY vec_id) AS rc
        FROM (SELECT vec_id, y,
                     ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
              FROM ex) q
        WHERE rn <= {10 * LS_SEEDS_PER_CLASS}) z
      WHERE rc <= {LS_SEEDS_PER_CLASS}),
    prop AS (
      SELECT 0 AS it, e.vec_id AS vec_id,
             CASE WHEN sd.vec_id IS NOT NULL AND sd.y = 0
                  THEN CAST(1.0 AS DOUBLE) ELSE 0.0 END AS f0,
             CASE WHEN sd.vec_id IS NOT NULL AND sd.y = 1
                  THEN CAST(1.0 AS DOUBLE) ELSE 0.0 END AS f1
      FROM ex e LEFT JOIN seeds sd ON e.vec_id = sd.vec_id
      UNION ALL
      SELECT q.it, q.vec_id,
             CASE WHEN sd.vec_id IS NOT NULL
                  THEN CASE WHEN sd.y = 0 THEN 1.0 ELSE 0.0 END
                  ELSE q.m0 END,
             CASE WHEN sd.vec_id IS NOT NULL
                  THEN CASE WHEN sd.y = 1 THEN 1.0 ELSE 0.0 END
                  ELSE q.m1 END
      FROM (SELECT p.it + 1 AS it, k.a AS vec_id,
                   AVG(p.f0) AS m0, AVG(p.f1) AS m1
            FROM prop p JOIN knn k ON p.vec_id = k.b
            WHERE p.it < {LS_ITERS}
            GROUP BY p.it, k.a) q
      LEFT JOIN seeds sd ON q.vec_id = sd.vec_id
    ),
    fin AS (SELECT p.vec_id, p.f0, p.f1, e.y,
                   sd.vec_id IS NOT NULL AS is_seed
            FROM prop p JOIN ex e ON p.vec_id = e.vec_id
            LEFT JOIN seeds sd ON p.vec_id = sd.vec_id
            WHERE p.it = {LS_ITERS}),
    m AS (SELECT
        (SELECT COUNT(*) FROM seeds) AS n_seeds,
        COUNT(*) FILTER (WHERE f0 + f1 > 0 AND NOT is_seed) AS spread,
        CAST(COUNT(*) FILTER (WHERE f0 + f1 > 0 AND NOT is_seed)
             AS DOUBLE) / COUNT(*) AS coverage,
        CAST(COUNT(*) FILTER (WHERE f0 + f1 > 0 AND NOT is_seed
               AND (CASE WHEN f1 > f0 THEN 1 ELSE 0 END) = y)
             AS DOUBLE)
          / NULLIF(COUNT(*) FILTER (WHERE f0 + f1 > 0
                                      AND NOT is_seed), 0) AS acc
        FROM fin)
    SELECT CAST(n_seeds AS BIGINT) AS seeds,
           CAST(spread AS BIGINT) AS spread_to,
           FLOOR(coverage * 1e4 + 0.5) / 1e4 AS coverage,
           FLOOR(COALESCE(acc, 0.0) * 1e4 + 0.5) / 1e4 AS accuracy
    FROM m
    """,
)
def ml_label_spreading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label spreading: keep {s} labeled seeds per
    class (lowest vec_ids of each parity label), build the mutual
    kNN graph over embedding cosine (brute-force here; the IVF bucket
    path at scale), and propagate class scores {it} rounds (seeds
    clamped). Reports coverage and accuracy of the spread labels
    against the held-back truth — what a labeling budget of 10 buys
    on this corpus, honestly measured.

    Scale: the kNN edges come from the bucketed candidate machinery
    at scale (brute here is the fixture path); each propagation round
    is one edge join + one mean-aggregate with lineage cuts."""
    import numpy as np

    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        (F.col("label") % 2).alias("y"),
    ).localCheckpoint()
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    y = np.array([r["y"] for r in rows])
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    # NOTE: fixture-sized brute kNN (500×500) — the candidate
    # generation at scale is the LSH/IVF bucket join, same downstream
    S = Xn @ Xn.T
    np.fill_diagonal(S, -np.inf)
    # deterministic tie-break: (similarity desc, vec_id asc) — exact
    # duplicate embeddings produce exact cosine ties, and an unstable
    # argsort would make the neighbor set engine-dependent
    nn = np.array(
        [np.lexsort((ids, -S[i]))[:LS_KNN] for i in range(len(ids))]
    )
    seeds = {}
    for cls in (0, 1):
        for i in np.argsort(ids)[: 10 * LS_SEEDS_PER_CLASS]:
            if y[i] == cls and sum(
                1 for s2 in seeds.values() if s2 == cls
            ) < LS_SEEDS_PER_CLASS:
                seeds[i] = cls
    f = np.zeros((len(ids), 2))
    for i, cls in seeds.items():
        f[i, cls] = 1.0
    for _ in range(LS_ITERS):
        nf = f[nn].mean(axis=1)
        for i, cls in seeds.items():
            nf[i] = 0.0
            nf[i, cls] = 1.0
        f = nf
    assigned = f.sum(axis=1) > 0
    pred = f.argmax(axis=1)
    mask = assigned & ~np.isin(
        np.arange(len(ids)), list(seeds.keys())
    )
    import math

    acc = float((pred[mask] == y[mask]).mean()) if mask.any() else 0.0
    # floor-grid rounding — identical double arithmetic to the oracle
    row = (
        len(seeds),
        int(mask.sum()),
        math.floor(float(mask.mean()) * 1e4 + 0.5) / 1e4,
        math.floor(acc * 1e4 + 0.5) / 1e4,
    )
    return spark.createDataFrame(
        [row],
        "seeds long, spread_to long, coverage double, accuracy double",
    )


ml_label_spreading.__doc__ = ml_label_spreading.__doc__.format(
    s=LS_SEEDS_PER_CLASS, it=LS_ITERS
)


def _mh_curve_oracle() -> str:
    # the exact pair set is rebuilt from the chain's own `sh` CTE
    # (nesting DD_NGRAM_ORACLE as a subquery shadows `sh` and trips a
    # DuckDB internal error)
    parts = [
        duck_minhash_mins(max(MH_KS), DUCK_TOKENS),
        """psz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)""",
        """pcold AS (SELECT s FROM sh GROUP BY s
                     HAVING COUNT(*) <= 100)""",
        """pshc AS (SELECT sh.doc_id, sh.s FROM sh
                    JOIN pcold USING (s))""",
        """pinter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                             COUNT(*) AS i
                      FROM pshc a JOIN pshc b
                        ON a.s = b.s AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)""",
        """pairs AS MATERIALIZED (
        SELECT doc_a, doc_b,
               FLOOR((i / (sa.n + sb.n - i)) * 10000 + 0.5) / 10000
                 AS jaccard
        FROM pinter JOIN psz sa ON doc_a = sa.doc_id
                    JOIN psz sb ON doc_b = sb.doc_id
        WHERE FLOOR((i / (sa.n + sb.n - i)) * 10000 + 0.5) / 10000
              >= 0.5)""",
    ]
    rows = []
    for k in MH_KS:
        parts.append(f"""
    est{k} AS (SELECT p.doc_a, p.doc_b, p.jaccard,
                      SUM(CASE WHEN a.m = b.m THEN 1 ELSE 0 END)
                        / CAST({k} AS DOUBLE) AS mh_est
               FROM pairs p
               JOIN mins a ON a.doc_id = p.doc_a AND a.i < {k}
               JOIN mins b ON b.doc_id = p.doc_b AND b.i = a.i
               GROUP BY 1, 2, 3)""")
        rows.append(f"""
    SELECT CAST({k} AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS pairs,
           FLOOR(AVG(ABS(mh_est - jaccard)) * 10000 + 0.5) / 10000
             AS mean_abs_error
    FROM est{k}""")
    return "WITH " + ",\n".join(parts) + "\nUNION ALL\n".join(rows)


@query(
    "dd_minhash_error_curve",
    # Real oracle: one 64-perm universal-hash signature table serves
    # every k (permutation i < k is the same map on both engines); the
    # estimate is an exact dyadic match fraction per verified pair.
    oracle=_mh_curve_oracle(),
)
def dd_minhash_error_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash accuracy curve: on the exact-verified near-dup pairs
    (dd_ngram_jaccard), compare the k-hash MinHash Jaccard estimate
    (matching signature fraction) against the exact value for
    k ∈ {ks} — mean absolute error per k. The curve that says what
    k=64 buys over k=16 ON THIS CORPUS, replacing the 1/√k folklore
    with a measurement.

    Scale: signatures are the JVM hash-min aggregates (one shuffle);
    the eval joins signatures onto the (small) verified pair list."""
    from mister_spark.operators.dedup import _doc_shingles, dd_ngram_jaccard

    pairs = dd_ngram_jaccard(spark, sf_dir).localCheckpoint()
    ds = _doc_shingles(spark, sf_dir)
    hashed = ds.filter(F.size("sh") > 0).select(
        "doc_id",
        F.explode(F.transform("sh", lambda s: mh_hash60(s))).alias("h"),
    )
    out_rows = []
    for k in MH_KS:
        sigs = minhash_signatures(hashed, k).localCheckpoint()
        sa = sigs.select(
            F.col("doc_id").alias("doc_a"),
            *[F.col(f"m{i}").alias(f"a{i}") for i in range(k)],
        )
        sb = sigs.select(
            F.col("doc_id").alias("doc_b"),
            *[F.col(f"m{i}").alias(f"b{i}") for i in range(k)],
        )
        match = None
        for i in range(k):
            term = (F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
            match = term if match is None else match + term
        est = (
            pairs.join(sa, "doc_a")
            .join(sb, "doc_b")
            .select(
                "jaccard", (match / F.lit(float(k))).alias("mh_est")
            )
        )
        r = est.agg(
            F.avg(F.abs(F.col("mh_est") - F.col("jaccard"))).alias("mae"),
            F.count(F.lit(1)).alias("pairs"),
        ).collect()[0]
        out_rows.append(
            (
                k,
                int(r["pairs"]),
                __import__("math").floor(float(r["mae"]) * 10000 + 0.5)
                / 10000,
            )
        )
    return spark.createDataFrame(
        out_rows, "k long, pairs long, mean_abs_error double"
    )


dd_minhash_error_curve.__doc__ = dd_minhash_error_curve.__doc__.format(
    ks=MH_KS
)
