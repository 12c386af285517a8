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
# kNN candidate generation: sign-LSH with the md5-derived ±1 plane
# matrix (the sim_rp_lsh construction — cross-engine deterministic),
# regrouped as 8 tables × 8 bits so random (non-neighbor) pairs
# collide ~3% of the time while cosine≈0.9 near-neighbors still land
# in ≥1 table w.p. ~0.9. At 100 TB, LS_BITS grows with corpus size to
# keep per-bucket GEMMs bounded (same knob as sim_rp_lsh).
LS_TABLES = 8
LS_BITS = 8
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


def _ls_knn_edges(
    spark: SparkSession, sf_dir: str, with_score: bool = False
) -> DataFrame:
    """Distributed kNN edge frame (a, b) over sign-LSH candidates.
    ``with_score=True`` keeps the grid-rounded cosine as column ``s``
    (ml_lof needs the distances, not just the adjacency).

    Signatures are one narrow Arrow pass (batch GEMM against the md5
    ±1 plane matrix, regenerated per worker); candidates never leave
    their (tbl, sig) bucket — each bucket GEMMs its members and emits
    only per-member local top-LS_KNN, and a window over the ≤
    LS_TABLES·LS_KNN survivors per node takes the exact global top-k
    (a pair in the global top-k ranks ≤ k inside every bucket that
    contains it). Ranking is on the floor-rounded cosine with a
    vec_id tie-break — the grid-stable cut the oracle replays."""
    import hashlib

    import numpy as np
    import pandas as pd

    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    def _signatures(batches):
        planes = np.array(
            [
                [
                    1.0
                    if int(
                        hashlib.md5(f"{d}:{c}".encode()).hexdigest()[:15],
                        16,
                    )
                    & 1
                    else -1.0
                    for c in range(LS_TABLES * LS_BITS)
                ]
                for d in range(64)
            ]
        )
        weights = 1 << np.arange(LS_BITS)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([np.asarray(v) for v in pdf["v"]])
            bits = (x @ planes) > 0
            sigs = bits.reshape(len(pdf), LS_TABLES, LS_BITS) @ weights
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), LS_TABLES),
                    "tbl": np.tile(np.arange(LS_TABLES), len(pdf)),
                    "sig": sigs.reshape(-1),
                }
            )

    sigs = emb.mapInPandas(_signatures, "vec_id long, tbl int, sig long")
    bucketed = sigs.join(emb, "vec_id")

    def _bucket_knn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"a": [], "b": [], "s": []}).astype(
                {"a": "int64", "b": "int64", "s": "float64"}
            )
        ids = pdf["vec_id"].to_numpy()
        X = np.asarray([np.asarray(v) for v in pdf["v"]], dtype=np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        G = np.floor((Xn @ Xn.T) * 10000 + 0.5) / 10000
        np.fill_diagonal(G, -np.inf)
        k = min(LS_KNN, len(ids) - 1)
        a_out, b_out, s_out = [], [], []
        for i in range(len(ids)):
            top = np.lexsort((ids, -G[i]))[:k]
            a_out.extend([ids[i]] * k)
            b_out.extend(ids[top])
            s_out.extend(G[i][top])
        return pd.DataFrame({"a": a_out, "b": b_out, "s": s_out})

    local = bucketed.groupBy("tbl", "sig").applyInPandas(
        _bucket_knn, "a long, b long, s double"
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("a").orderBy(F.desc("s"), "b")
    return (
        # a pair colliding in several tables is scored once per bucket;
        # MAX keeps a DETERMINISTIC representative (dropDuplicates kept
        # an arbitrary shuffle row — if two buckets' GEMMs rounded to
        # different 1e-4 cells, the top-k cut could flip run-to-run)
        local.groupBy("a", "b")
        .agg(F.max("s").alias("s"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= LS_KNN)
        .select("a", "b", *(["s"] if with_score else []))
    )


_LS_PLANES_SQL = f"""
    planes AS MATERIALIZED (
      SELECT d.d, c.c,
             CASE WHEN (CAST('0x' || substr(md5(
                    CAST(d.d AS VARCHAR) || ':' || CAST(c.c AS VARCHAR)),
                    1, 15) AS BIGINT) & 1) = 1
                  THEN 1.0 ELSE -1.0 END AS w
      FROM (SELECT unnest(range(0, 64)) AS d) d,
           (SELECT unnest(range(0, {LS_TABLES * LS_BITS})) AS c) c)"""


def _ls_knn_cte(label_expr: str) -> str:
    """The planes→knn CTE chain of the sign-LSH kNN graph — shared by
    the ml_label_spreading and ml_knn_classifier_eval oracles (the
    SQL twin of _ls_knn_edges). `e` carries y = label_expr so each
    consumer picks its own label encoding."""
    return f"""{_LS_PLANES_SQL},
    e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                              {label_expr} AS y
                       FROM embeddings),
    dots AS (SELECT e.vec_id, p.c,
                    SUM(e.v[CAST(p.d AS INT) + 1] * p.w) AS s
             FROM e, planes p GROUP BY 1, 2),
    sigs AS (SELECT vec_id, c // {LS_BITS} AS tbl,
                    CAST(SUM(CASE WHEN s > 0
                             THEN CAST(1 AS BIGINT) << (c % {LS_BITS})
                             ELSE 0 END) AS BIGINT) AS sig
             FROM dots GROUP BY 1, 2),
    cand AS (SELECT DISTINCT sa.vec_id AS a, sb.vec_id AS b
             FROM sigs sa JOIN sigs sb
               ON sa.tbl = sb.tbl AND sa.sig = sb.sig
              AND sa.vec_id <> sb.vec_id),
    scored AS MATERIALIZED (
      SELECT c.a, c.b,
             FLOOR(list_cosine_similarity(x.v, y2.v) * 10000 + 0.5)
               / 10000 AS s
      FROM cand c JOIN e x ON x.vec_id = c.a
                  JOIN e y2 ON y2.vec_id = c.b),
    knn AS MATERIALIZED (SELECT a, b FROM (
        SELECT a, b, ROW_NUMBER() OVER (PARTITION BY a
                       ORDER BY s DESC, b) AS rn
        FROM scored) q
      WHERE rn <= {LS_KNN})"""


@query(
    "ml_label_spreading",
    # Real oracle: the sign-LSH bucketing (md5 ±1 planes — integer
    # signatures, cross-engine exact), the grid-stable per-node top-k
    # cut, the 5+5 lowest-vec_id seed pick and all {it} clamped
    # propagation rounds replay as SQL — the propagation is a
    # recursive CTE pulling each node's neighbor mean per round.
    oracle=f"""
    WITH RECURSIVE
    {_ls_knn_cte("CAST(label % 2 AS INT)")},
    seeds AS (SELECT vec_id, y FROM (
        SELECT vec_id, y,
               ROW_NUMBER() OVER (PARTITION BY y ORDER BY vec_id) AS rc
        FROM (SELECT vec_id, y,
                     ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
              FROM e) q
        WHERE rn <= {10 * LS_SEEDS_PER_CLASS}) z
      WHERE rc <= {LS_SEEDS_PER_CLASS}),
    prop AS (
      SELECT 0 AS it, e2.vec_id AS vec_id,
             CASE WHEN sd.vec_id IS NOT NULL AND sd.y = 0
                  THEN CAST(1.0 AS DOUBLE) ELSE 0.0 END AS f0,
             CASE WHEN sd.vec_id IS NOT NULL AND sd.y = 1
                  THEN CAST(1.0 AS DOUBLE) ELSE 0.0 END AS f1
      FROM e e2 LEFT JOIN seeds sd ON e2.vec_id = sd.vec_id
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
    fin AS (SELECT en.vec_id, COALESCE(p.f0, 0.0) AS f0,
                   COALESCE(p.f1, 0.0) AS f1, en.y,
                   sd.vec_id IS NOT NULL AS is_seed
            FROM e en
            LEFT JOIN (SELECT * FROM prop
                       WHERE it = {LS_ITERS}) p
              ON en.vec_id = p.vec_id
            LEFT JOIN seeds sd ON en.vec_id = sd.vec_id),
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
    class (lowest vec_ids of each parity label), build the kNN graph
    over embedding cosine from sign-LSH candidate buckets (no pair
    ever leaves its bucket; no full-table driver collect anywhere),
    and propagate class scores {it} rounds (seeds clamped). Reports
    coverage and accuracy of the spread labels against the held-back
    truth — what a labeling budget of 10 buys on this corpus.

    Scale: signatures are one narrow Arrow pass; candidate kNN is a
    per-bucket GEMM + one window over ≤ tables·k survivors per node;
    each propagation round is one edge join + one mean-aggregate with
    lineage cuts. Nodes with no LSH collisions simply stay unlabeled
    (counted in the coverage denominator)."""
    nodes = (
        cat(spark, sf_dir)["embeddings"]
        .select("vec_id", (F.col("label") % 2).cast("int").alias("y"))
        .localCheckpoint()
    )
    e = _ls_knn_edges(spark, sf_dir).withColumnRenamed("b", "src")
    edges = e.localCheckpoint()
    low = nodes.orderBy("vec_id").limit(10 * LS_SEEDS_PER_CLASS)
    from pyspark.sql import Window as W

    wcls = W.partitionBy("y").orderBy("vec_id")
    seeds = (
        low.withColumn("rc", F.row_number().over(wcls))
        .filter(F.col("rc") <= LS_SEEDS_PER_CLASS)
        .select("vec_id", F.col("y").alias("sy"))
        .localCheckpoint()
    )
    clamp0 = F.when(F.col("sy") == 0, 1.0).otherwise(0.0)
    clamp1 = F.when(F.col("sy") == 1, 1.0).otherwise(0.0)
    f = nodes.join(F.broadcast(seeds), "vec_id", "left").select(
        "vec_id", clamp0.alias("f0"), clamp1.alias("f1")
    )
    for _ in range(LS_ITERS):
        nf = (
            edges.join(f, edges["src"] == f["vec_id"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.avg("f0").alias("m0"), F.avg("f1").alias("m1"))
        )
        f = (
            nf.join(
                F.broadcast(seeds),
                nf["node"] == seeds["vec_id"],
                "left",
            )
            .select(
                F.col("node").alias("vec_id"),
                F.when(F.col("sy").isNotNull(), clamp0)
                .otherwise(F.col("m0"))
                .alias("f0"),
                F.when(F.col("sy").isNotNull(), clamp1)
                .otherwise(F.col("m1"))
                .alias("f1"),
            )
            .localCheckpoint()
        )
    fin = (
        nodes.join(F.broadcast(seeds), "vec_id", "left")
        .join(f, "vec_id", "left")
        .select(
            "y",
            F.col("sy").isNotNull().alias("is_seed"),
            F.coalesce("f0", F.lit(0.0)).alias("f0"),
            F.coalesce("f1", F.lit(0.0)).alias("f1"),
        )
    )
    spreadc = (F.col("f0") + F.col("f1") > 0) & ~F.col("is_seed")
    pred = F.when(F.col("f1") > F.col("f0"), 1).otherwise(0)
    m = fin.agg(
        F.sum(F.col("is_seed").cast("int")).alias("n_seeds"),
        F.sum(spreadc.cast("int")).alias("spread"),
        (
            F.sum(spreadc.cast("int")).cast("double")
            / F.count(F.lit(1))
        ).alias("coverage"),
        (
            F.sum((spreadc & (pred == F.col("y"))).cast("int")).cast(
                "double"
            )
            / F.nullif(F.sum(spreadc.cast("int")), F.lit(0)).cast("double")
        ).alias("acc"),
    )
    return m.select(
        F.col("n_seeds").cast("bigint").alias("seeds"),
        F.col("spread").cast("bigint").alias("spread_to"),
        ratio(F.col("coverage")).alias("coverage"),
        ratio(F.coalesce(F.col("acc"), F.lit(0.0))).alias("accuracy"),
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
    # no size(sh) > 0 gate: explode drops empty arrays anyway, and the
    # pushed-down filter would inline (re-evaluate) the whole
    # tokenize+trigram subtree a second time per doc
    hashed = ds.select(
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
