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
SEMDEDUP_K_MIN = 8  # k-means cluster floor (k scales with corpus size)
SEMDEDUP_TARGET = 512  # target docs per cluster: k = max(K_MIN, ceil(n/TARGET))
SEMDEDUP_DIM = 256  # feature-hashed clustering dims (fixed, data-independent)
SEMDEDUP_ITERS = 4
SEMDEDUP_TAU = 0.95  # intra-cluster cosine dedup threshold
SEMDEDUP_GEMM_CAP = 2048  # kernel bisects clusters above this row count


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


def _semdedup_pair_kernel(pdf, tau, cap):
    """Per-cluster similarity kernel: EXACT sparse cosine over the
    cluster's documents. Builds a cluster-LOCAL dense matrix from the
    64-bit token-hash sparse vectors (the local vocabulary is bounded
    by cluster-size x doc-length, never the corpus vocabulary), then
    compares pairs with a numpy GEMM. Clusters larger than `cap` are
    recursively bisected with a deterministic 2-means (seeded by the
    lowest-id row and its cosine-farthest row) so no similarity block
    ever exceeds cap^2 — the GEMM budget is bounded by construction,
    not by hoping k-means balanced the space. Emits survivor (i, j)
    rows plus one summary row carrying the exact count of pairs
    actually compared."""
    import numpy as np
    import pandas as pd

    ids = pdf["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    tids = [np.asarray(pdf["tids"].iloc[int(o)], dtype=np.int64) for o in order]
    tvals = [
        np.asarray(pdf["tvals"].iloc[int(o)], dtype=np.float64) for o in order
    ]
    uniq = np.unique(np.concatenate(tids)) if tids else np.array([], np.int64)
    X = np.zeros((len(ids), len(uniq)))
    for r, (ti, tv) in enumerate(zip(tids, tvals)):
        X[r, np.searchsorted(uniq, ti)] = tv
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    out_i, out_j, compared = [], [], 0

    def rec(idx):
        nonlocal compared
        if len(idx) > cap:
            a = Xn[idx[0]]
            b = Xn[idx[int(np.argmin(Xn[idx] @ a))]]
            left = right = None
            for _ in range(3):
                da = ((Xn[idx] - a) ** 2).sum(axis=1)
                db = ((Xn[idx] - b) ** 2).sum(axis=1)
                mask = da <= db
                left, right = idx[mask], idx[~mask]
                if len(left) == 0 or len(right) == 0:
                    break
                a = Xn[left].mean(axis=0)
                b = Xn[right].mean(axis=0)
            if left is None or len(left) == 0 or len(right) == 0:
                mid = len(idx) // 2  # degenerate split: halve by id
                left, right = idx[:mid], idx[mid:]
            rec(left)
            rec(right)
            return
        if len(idx) < 2:
            return
        S = Xn[idx] @ Xn[idx].T
        iu, ju = np.triu_indices(len(idx), 1)
        hit = S[iu, ju] >= tau
        compared += len(iu)
        out_i.extend(ids[idx[iu[hit]]])
        out_j.extend(ids[idx[ju[hit]]])

    rec(np.arange(len(ids)))
    return pd.concat(
        [
            pd.DataFrame(
                {
                    "i": np.asarray(out_i, dtype=np.int64),
                    "j": np.asarray(out_j, dtype=np.int64),
                    "cluster_pairs": np.full(len(out_i), -1, dtype=np.int64),
                }
            ),
            pd.DataFrame({"i": [-1], "j": [-1], "cluster_pairs": [compared]}),
        ],
        ignore_index=True,
    )


@query("ds_semdedup")  # iterative k-means upstream → rows-only
def ds_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over DOCUMENT term-frequency vectors (the raw
    embeddings table is isotropic noise — max pairwise cosine 0.51 —
    so the semantic structure lives in the text). Two representations,
    each sized for its job: (1) a FEATURE-HASHED {d}-dim TF vector
    (token -> xxhash64 mod {d}) drives Lloyd's k-means — the dimension
    is fixed and data-independent, so no corpus vocabulary is ever
    collected to the driver and centroid state is O(k*{d}) regardless
    of Heaps-law vocab growth; (2) the EXACT sparse TF vector keyed by
    64-bit token hashes rides into the pair kernel, so the cosine that
    decides duplicates is exact, not hashed. k scales with corpus
    size (k = max({kmin}, ceil(n/{tgt})) — expected cluster size stays
    constant at 100x the data), {it} Lloyd iterations, deterministic
    lowest-doc_id init. Within each cluster a document is dropped when
    a LOWER-id cluster-mate exceeds cosine {tau} (greedy keep-first,
    the paper's convention). Emits the audit row: vectors, clusters,
    candidate pairs actually compared, duplicate pairs, documents
    removed/kept, the share of the quadratic pair space pruned, and
    the largest cluster's share of all vectors (the skew signal).

    Scale: the pair budget is sum over clusters of n_c^2 with
    E[n_c] = {tgt} fixed; each k-means iteration is a broadcast
    assignment + one (cid, dim) partial-agg shuffle; the similarity
    stage is one Arrow-batched applyInPandas GEMM per cluster
    (block-matmul, the dd_embedding_cosine lesson), and the kernel
    recursively bisects any cluster above {cap} rows before the GEMM
    so a skewed cluster can never go quadratic in the corpus; only
    survivor (i, j) rows plus one count row per cluster leave it."""
    from mister_spark.operators.ml import _sq_dist

    docs = cat(spark, sf_dir)["documents"]
    feat = (
        docs.select("doc_id", F.explode(tokens()).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .select(
            "doc_id",
            F.xxhash64("w").alias("tid"),
            F.pmod(F.xxhash64("w"), F.lit(SEMDEDUP_DIM)).cast("int").alias("hidx"),
            "c",
        )
    )
    hashed = (
        feat.groupBy("doc_id", "hidx")
        .agg(F.sum("c").alias("hc"))
        .groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("hidx", "hc"))).alias("m"))
        .select(
            F.col("doc_id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(SEMDEDUP_DIM - 1)),
                lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0.0)),
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    sparse = (
        feat.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("tid", "c"))).alias("sp"))
        .select(
            F.col("doc_id").alias("vec_id"),
            F.col("sp.tid").alias("tids"),
            F.col("sp.c").alias("tvals"),
        )
    )
    n = hashed.count()
    k = max(SEMDEDUP_K_MIN, -(-n // SEMDEDUP_TARGET))
    cent_rows = [
        [float(x) for x in r["embedding"]]
        for r in hashed.orderBy("vec_id").limit(k).collect()
    ]
    centroids = list(enumerate(cent_rows))
    assign = None
    for _ in range(SEMDEDUP_ITERS):
        cdf = F.broadcast(
            spark.createDataFrame(centroids, "cid int, cvec array<double>")
        )
        assign = (
            hashed.crossJoin(cdf)
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
    final = assign.select("vec_id", "cid").localCheckpoint()
    max_share = (
        final.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg((F.max("sz") / F.lit(float(n))).alias("s"))
        .collect()[0]["s"]
    )
    tau, cap = SEMDEDUP_TAU, SEMDEDUP_GEMM_CAP
    blocks = (
        sparse.join(final, "vec_id")
        .groupBy("cid")
        .applyInPandas(
            lambda pdf: _semdedup_pair_kernel(pdf, tau, cap),
            "i long, j long, cluster_pairs long",
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
    quad = n * (n - 1) // 2
    return spark.createDataFrame(
        [
            (
                n,
                k,
                n_pairs,
                n_dup_pairs,
                removed,
                n - removed,
                round(1.0 - n_pairs / quad, 4),
                round(float(max_share), 4),
            )
        ],
        "vectors long, clusters int, candidate_pairs long, dup_pairs long, "
        "removed long, kept long, pair_space_pruned double, "
        "max_cluster_share double",
    )


ds_semdedup.__doc__ = ds_semdedup.__doc__.format(
    kmin=SEMDEDUP_K_MIN,
    tgt=SEMDEDUP_TARGET,
    d=SEMDEDUP_DIM,
    it=SEMDEDUP_ITERS,
    tau=SEMDEDUP_TAU,
    cap=SEMDEDUP_GEMM_CAP,
)
