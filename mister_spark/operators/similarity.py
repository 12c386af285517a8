"""Similarity search over the embeddings table (array<float>[64]).

Brute-force cosine top-k is the correctness baseline (oracle-checked);
IVF cluster pruning is the scale path: assign every vector to its
nearest seed centroid once (broadcast centroids, narrow map), shuffle by
cluster, probe only nprobe clusters per query. At 100 TB the IVF variant
turns an O(n) scan per query into O(n * nprobe / nlist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.vectors import dot as _dot, norm as _norm
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

NPROBE = 2
CENTROID_STRIDE = 50  # deterministic seed centroids: vec_id % stride == 0


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cat(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )





@query(
    "sim_brute_topk",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           FLOOR((list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv)) * 10000 + 0.5) / 10000 AS cosine
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def sim_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for one query vector (vec_id=0): the
    query is joined as a broadcast 1-row frame, scoring is a narrow map,
    top-k is a global sort-limit (TakeOrdered, no full sort at scale)."""
    emb = _emb(spark, sf_dir)
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qv))
        .withColumn(
            "cosine", rnd(_dot("v", "qv") / (_norm("v") * _norm("qv")), 4)
        )
        .select("vec_id", "cosine")
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


@query(
    "sim_topk_join",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id >= 8)
    SELECT q_id, vec_id,
           FLOOR((list_cosine_similarity(v, qv)) * 10000 + 0.5) / 10000 AS cosine,
           rn
    FROM (SELECT q_id, vec_id, v, qv,
                 ROW_NUMBER() OVER (
                   PARTITION BY q_id
                   ORDER BY FLOOR((list_cosine_similarity(v, qv)) * 10000 + 0.5) / 10000 DESC, vec_id) AS rn
          FROM q, c)
    WHERE rn <= 5
    """,
)
def sim_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch top-k join: 8 query vectors × corpus, top-5 each. Queries
    broadcast; scoring stays in codegen; per-query top-k via window on
    the rounded score with vec_id tiebreak (oracle-identical rows)."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    c = emb.filter(F.col("vec_id") >= 8)
    scored = (
        c.join(F.broadcast(q))
        .withColumn("cosine", rnd(_dot("v", "qv") / (_norm("v") * _norm("qv")), 4))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .select("q_id", "vec_id", "cosine", "rn")
    )


@query("sim_ivf")  # rows-only: pytest measures recall vs sim_brute_topk
def sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pruned ANN for query vec_id=0: seed centroids are every
    CENTROID_STRIDE-th vector (deterministic, no iterative k-means —
    the pruning topology is what matters), vectors are assigned to the
    nearest centroid via broadcast + per-vector argmin, and only the
    NPROBE closest clusters to the query are scanned.

    100 TB path: assignment is one narrow map over the corpus (centroids
    broadcast); the probe scans |corpus| * NPROBE / nlist vectors."""
    emb = _emb(spark, sf_dir)
    cents = emb.filter(F.col("vec_id") % CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    # assign every vector to nearest centroid (cosine argmax)
    scored = emb.join(F.broadcast(cents)).withColumn(
        "sim", _dot("v", "cv") / (_norm("v") * _norm("cv"))
    )
    wv = W.partitionBy("vec_id").orderBy(F.desc("sim"), "c_id")
    assigned = (
        scored.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", F.col("c_id").alias("cluster"))
    )
    # probe clusters = NPROBE centroids nearest to the query vector
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    probe = (
        cents.join(F.broadcast(qv))
        .withColumn("sim", _dot("cv", "qv") / (_norm("cv") * _norm("qv")))
        .orderBy(F.desc("sim"), "c_id")
        .limit(NPROBE)
        .select(F.col("c_id").alias("cluster"))
    )
    return (
        assigned.join(F.broadcast(probe), "cluster")
        .filter(F.col("vec_id") != 0)
        .join(F.broadcast(qv))
        .withColumn("cosine", rnd(_dot("v", "qv") / (_norm("v") * _norm("qv")), 4))
        .select("vec_id", "cosine")
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


# --- Product quantization (PQ) ANN -----------------------------------
# 64-dim vectors → M=8 subspaces × 8 dims, K=16 centroids per subspace:
# each vector compresses to 8 small codes (4 bits each in principle),
# and query scoring becomes table lookups (asymmetric distance, ADC).
PQ_M, PQ_DSUB, PQ_K = 8, 8, 16
PQ_SAMPLE_STRIDE = 7  # deterministic training sample: vec_id % 7 == 0
PQ_SHORTLIST = 150  # ADC candidates per query before exact re-rank
PQ_TOPK = 5


def _pq_train(sample):
    """Per-subspace Lloyd's k-means (5 iters) on an L2-normalized
    sample; deterministic init = first K sample points in vec_id order.
    Returns codebooks shaped (M, K, DSUB)."""
    import numpy as np

    X = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    books = []
    for j in range(PQ_M):
        Xj = X[:, j * PQ_DSUB : (j + 1) * PQ_DSUB]
        C = Xj[:PQ_K].copy()
        for _ in range(5):
            d = ((Xj[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for k in range(PQ_K):
                m = a == k
                if m.any():
                    C[k] = Xj[m].mean(axis=0)
        books.append(C)
    return np.stack(books)


@query("sim_pq")  # rows-only: pytest measures recall vs sim_topk_join
def sim_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed ANN: codebooks trained driver-side on a bounded
    deterministic sample (the FAISS pattern — training never scans the
    corpus), every corpus vector encoded to 8 one-byte codes by one
    Arrow-batched mapInPandas pass, then each query scored against the
    CODES ONLY via an 8×16 lookup table (asymmetric distance), the
    top-50 shortlist exact-re-ranked to top-5 with the true vectors.

    100 TB path: the codes table is 16 bytes/vector vs 256 — the ADC
    scan reads ~6% of the raw bytes and never shuffles (lookup tables
    ride the closure); only the ≤50·|Q| shortlist touches full vectors
    again. Complements sim_ivf: IVF prunes WHICH vectors to score, PQ
    shrinks WHAT scoring reads — production ANN composes both."""
    import numpy as np

    emb = _emb(spark, sf_dir)
    sample = np.array(
        emb.filter((F.col("vec_id") % PQ_SAMPLE_STRIDE == 0) & (F.col("vec_id") >= 8))
        .orderBy("vec_id")
        .limit(512)
        .select("v")
        .collect()
    )[:, 0, :]
    books = _pq_train(sample)

    qrows = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    qids = np.array([r["vec_id"] for r in qrows])
    Q = np.array([r["v"] for r in qrows])
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    # ADC tables: T[q, j, k] = ||q_j - c_jk||² (tiny; rides the closure)
    T = np.stack(
        [
            ((Q[:, None, j * PQ_DSUB : (j + 1) * PQ_DSUB] - books[j][None]) ** 2).sum(
                axis=2
            )
            for j in range(PQ_M)
        ],
        axis=1,
    )

    def encode_and_score(batches):
        import pandas as pd

        for pdf in batches:
            V = np.array(list(pdf["v"]), dtype=np.float64)
            V = V / np.linalg.norm(V, axis=1, keepdims=True)
            codes = np.empty((len(V), PQ_M), dtype=np.int64)
            for j in range(PQ_M):
                Vj = V[:, j * PQ_DSUB : (j + 1) * PQ_DSUB]
                d = ((Vj[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d.argmin(axis=1)
            cols = np.arange(PQ_M)
            for qi, qid in enumerate(qids):
                adist = T[qi][cols[None, :], codes].sum(axis=1)
                yield pd.DataFrame(
                    {
                        "q_id": np.full(len(V), qid, dtype=np.int64),
                        "vec_id": pdf["vec_id"].to_numpy(),
                        "adist": adist,
                    }
                )

    scored = (
        emb.filter(F.col("vec_id") >= 8)
        .mapInPandas(encode_and_score, "q_id long, vec_id long, adist double")
    )
    wshort = W.partitionBy("q_id").orderBy("adist", "vec_id")
    shortlist = (
        scored.withColumn("srn", F.row_number().over(wshort))
        .filter(F.col("srn") <= PQ_SHORTLIST)
        .select("q_id", "vec_id")
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    rer = (
        emb.join(F.broadcast(shortlist), "vec_id")
        .join(F.broadcast(q), "q_id")
        .withColumn("cosine", rnd(_dot("v", "qv") / (_norm("v") * _norm("qv")), 4))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        rer.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= PQ_TOPK)
        .select("q_id", "vec_id", "cosine", "rn")
    )
