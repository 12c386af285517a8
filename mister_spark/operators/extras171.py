"""Wave 171: DSIR importance resampling and SemDeDup.

ds_dsir scores every document by hashed/unigram importance weights
toward a target distribution (Data Selection via Importance
Resampling, Xie et al. 2023, public literature): log p_target(doc) -
log p_raw(doc) under smoothed unigram LMs, then keeps the top-K — the
cheap, principled alternative to training a quality classifier.
ds_semdedup is SemDeDup (Abbas et al. 2023, public literature):
k-means the embedding space, then drop near-duplicate vectors WITHIN
each cluster by cosine — semantic dedup whose pair budget is bounded
by the largest cluster, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

DSIR_K = 40  # docs kept by importance resampling
SEMDEDUP_K = 8  # k-means clusters
SEMDEDUP_ITERS = 4
SEMDEDUP_TAU = 0.95  # intra-cluster cosine dedup threshold


@query(
    "ds_dsir",
    oracle=f"""
    WITH tok AS (SELECT doc_id,
                        UNNEST({DUCK_TOKENS}) AS w
                 FROM documents),
    tgt AS (SELECT doc_id FROM documents WHERE lang = 'en'),
    ct AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c_all,
                  CAST(COUNT(*) FILTER (
                    WHERE doc_id IN (SELECT doc_id FROM tgt)
                  ) AS BIGINT) AS c_tgt
           FROM tok GROUP BY 1),
    tot AS (SELECT CAST(SUM(c_all) AS DOUBLE) AS n_all,
                   CAST(SUM(c_tgt) AS DOUBLE) AS n_tgt,
                   CAST(COUNT(*) AS DOUBLE) AS v
            FROM ct),
    wt AS (SELECT ct.w,
                  CAST(FLOOR(1e6 * LN(
                    ((ct.c_tgt + 1) * (tot.n_all + tot.v))
                    / ((ct.c_all + 1) * (tot.n_tgt + tot.v))
                  ) + 0.5) AS BIGINT) AS micro
           FROM ct, tot),
    sc AS (SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS toks,
                  SUM(wt.micro) AS micro_sum
           FROM tok JOIN wt ON tok.w = wt.w GROUP BY 1)
    SELECT doc_id, toks,
           FLOOR(micro_sum / CAST(toks AS DOUBLE) / 100 + 0.5) / 10000
             AS logw_per_tok
    FROM sc
    ORDER BY micro_sum / CAST(toks AS DOUBLE) DESC, doc_id
    LIMIT {DSIR_K}
    """,
)
def ds_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR: per-token importance weight ln(p_target(w)/p_raw(w))
    under add-one-smoothed unigram LMs (target = the English slice,
    raw = the whole corpus), summed per document and LENGTH-NORMALIZED
    (per-token average, so long documents can't buy rank with bulk),
    keep the top-{k}. Per-token weights snap to an integer 1e-6 grid
    BEFORE the per-doc sum, so the ranking is exact integer arithmetic
    on both engines — no float-accumulation-order drift at the
    selection boundary.

    Scale: token counts are one shuffle; the weight table is
    vocab-bounded and broadcasts into the exploded token stream; the
    per-doc sum is one partial-agg shuffle; top-K plans
    TakeOrderedAndProject, never a global sort."""
    docs = cat(spark, sf_dir)["documents"]
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens()).alias("w")
    )
    ct = tok.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_all"),
        F.count(F.when(F.col("lang") == "en", 1)).cast("bigint").alias("c_tgt"),
    )
    tot = ct.agg(
        F.sum("c_all").cast("double").alias("n_all"),
        F.sum("c_tgt").cast("double").alias("n_tgt"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    wt = ct.crossJoin(F.broadcast(tot)).select(
        "w",
        F.floor(
            1e6
            * F.log(
                ((F.col("c_tgt") + 1) * (F.col("n_all") + F.col("v")))
                / ((F.col("c_all") + 1) * (F.col("n_tgt") + F.col("v")))
            )
            + 0.5
        )
        .cast("bigint")
        .alias("micro"),
    )
    sc = (
        tok.join(F.broadcast(wt), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("toks"),
            F.sum("micro").alias("micro_sum"),
        )
    )
    per_tok = F.col("micro_sum") / F.col("toks").cast("double")
    return (
        sc.select(
            "doc_id",
            "toks",
            (F.floor(per_tok / 100 + 0.5) / 10000).alias("logw_per_tok"),
            per_tok.alias("_o"),
        )
        .orderBy(F.col("_o").desc(), "doc_id")
        .limit(DSIR_K)
        .drop("_o")
    )


ds_dsir.__doc__ = ds_dsir.__doc__.format(k=DSIR_K)


@query("ds_semdedup")  # iterative k-means upstream → rows-only
def ds_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over DOCUMENT term-frequency vectors (the raw
    embeddings table is isotropic noise — max pairwise cosine 0.51 —
    so the semantic structure lives in the text): each document
    becomes its vocab-dimension TF vector, Lloyd's k-means (k={k},
    {it} iters, deterministic lowest-doc_id init — the ml.py recipe)
    partitions the space, then ONLY within-cluster pairs are
    cosine-compared; a document is dropped when a LOWER-id
    cluster-mate exceeds cosine {tau} (greedy keep-first, the paper's
    convention). Emits the audit row: vectors, clusters, candidate
    pairs actually compared, duplicate pairs, documents removed/kept,
    and the share of the quadratic pair space the clustering pruned.

    Scale: the pair budget is sum over clusters of n_c^2 instead of
    N^2 — the clustering IS the blocking structure; each iteration of
    the upstream k-means is a broadcast assignment + one (cid, dim)
    partial-agg shuffle (O(k*d) driver state only); the within-cluster
    similarity block is ONE numpy GEMM per cluster inside an
    Arrow-batched applyInPandas kernel (the dd_embedding_cosine
    block-matmul lesson — measured 11.6 s -> ~1 s at sf0.1 vs the
    per-pair zip_with join), and only survivor (i, j) rows plus one
    pair-count row per cluster leave it; the TF vectors are
    vocab-bounded (the vocab index broadcasts)."""
    from mister_spark.operators.ml import _sq_dist

    docs = cat(spark, sf_dir)["documents"]
    tf = (
        docs.select("doc_id", F.explode(tokens()).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    vocab = sorted(
        r["w"] for r in tf.select("w").distinct().collect()
    )  # O(vocab) driver state — the model, not the data
    vidx = F.broadcast(
        spark.createDataFrame(list(enumerate(vocab)), "idx int, w string")
    )
    dim = len(vocab)
    emb = (
        tf.join(vidx, "w")
        .groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("idx", "c"))).alias("m"))
        .select(
            F.col("doc_id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0.0)),
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    cent_rows = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(SEMDEDUP_K).collect()
    ]
    centroids = list(enumerate(cent_rows))
    assign = None
    for _ in range(SEMDEDUP_ITERS):
        cdf = F.broadcast(
            spark.createDataFrame(centroids, "cid int, cvec array<double>")
        )
        assign = (
            emb.crossJoin(cdf)
            .select(
                "vec_id",
                "embedding",
                "cid",
                _sq_dist(F.col("embedding"), F.col("cvec")).alias("d2"),
            )
            .groupBy("vec_id")
            .agg(
                F.min_by("cid", "d2").alias("cid"),
                F.first("embedding").alias("embedding"),
            )
        )
        new_c = (
            assign.select("cid", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
        )
        centroids = [
            (int(r["cid"]), [float(x) for x in r["cvec"]])
            for r in new_c.collect()
        ]
    # within-cluster pairwise cosine as ONE Arrow-batched GEMM per
    # cluster (applyInPandas on cid): the n_c x n_c similarity block is
    # a numpy matmul instead of n_c^2 zip_with row allocations — the
    # dd_embedding_cosine block-GEMM lesson applied to the blocked
    # (clustered) pair space. Only (i, j, cos) survivor rows leave the
    # kernel; pair counts come back as exact integers per cluster.
    def _cluster_pairs(pdf):
        import numpy as np
        import pandas as pd

        X = np.array(list(pdf["embedding"]), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids, X = ids[order], X[order]
        Xn = X / np.maximum(
            np.linalg.norm(X, axis=1, keepdims=True), 1e-12
        )
        S = Xn @ Xn.T
        iu, ju = np.triu_indices(len(ids), 1)
        hit = S[iu, ju] >= SEMDEDUP_TAU
        return pd.concat(
            [
                pd.DataFrame(
                    {
                        "i": ids[iu[hit]],
                        "j": ids[ju[hit]],
                        "cluster_pairs": np.full(
                            int(hit.sum()), -1, dtype=np.int64
                        ),
                    }
                ),
                pd.DataFrame(
                    {
                        "i": [-1],
                        "j": [-1],
                        "cluster_pairs": [len(ids) * (len(ids) - 1) // 2],
                    }
                ),
            ],
            ignore_index=True,
        )

    blocks = (
        assign.select("cid", "vec_id", "embedding")
        .groupBy("cid")
        .applyInPandas(
            _cluster_pairs, "i long, j long, cluster_pairs long"
        )
        .localCheckpoint()
    )
    n_pairs = (
        blocks.filter(F.col("cluster_pairs") >= 0)
        .agg(F.sum("cluster_pairs"))
        .collect()[0][0]
    )
    dups = blocks.filter(F.col("i") >= 0)
    n_dup_pairs = dups.count()
    removed = dups.select(F.col("j").alias("vec_id")).distinct().count()
    n = assign.count()
    quad = n * (n - 1) // 2
    return spark.createDataFrame(
        [
            (
                n,
                SEMDEDUP_K,
                n_pairs,
                n_dup_pairs,
                removed,
                n - removed,
                round(1.0 - n_pairs / quad, 4),
            )
        ],
        "vectors long, clusters int, candidate_pairs long, dup_pairs long, "
        "removed long, kept long, pair_space_pruned double",
    )


ds_semdedup.__doc__ = ds_semdedup.__doc__.format(
    k=SEMDEDUP_K, it=SEMDEDUP_ITERS, tau=SEMDEDUP_TAU
)
