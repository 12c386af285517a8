"""Wave 259: 1-bit embedding quantization with measured recall.

emb_binary_quantize compresses the 64-dim embedding store 32× by
keeping ONE SIGN BIT per dimension (the whole vector becomes a single
BIGINT word) and then MEASURES what that buys and costs: for a
deterministic query panel, Hamming-distance top-10 over the packed
words is compared against exact cosine top-10, and each query's
recall@10 is reported. Sign-bit (binary) quantization is the extreme
point of the emb_quantize_int8 → sim_pq compression ladder — the
candidate-generation representation for billion-vector stores, where
XOR+popcount over packed words replaces float arithmetic entirely;
recall@10 quantifies exactly how much re-ranking the cheap
representation still owes.

Exactness: the packed word is integer bit arithmetic (bit 63 spelled
as the two's-complement literal, the dd_simhash idiom); Hamming is
bit_count(xor); cosine ranks hit a 1e-9 grid with vec_id tie-breaks
before the top-k, so both engines pick identical neighbor sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

BQ_DIM = 64
BQ_TOPK = 10
BQ_QMOD = 50  # query spacing inside the fixed panel
BQ_PANEL = 10  # FIXED panel size — |queries| must NOT grow with the
# corpus, or the broadcast scan is O(N^2) (the round-10 scaling gate
# caught exactly this: slope 1.80, 337 s at sf1, with a %-only panel)

_BIT_LITS = [
    str(1 << i) if i < 63 else "(-9223372036854775807 - 1)"
    for i in range(BQ_DIM)
]


def _duck_pack(v: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN {v}[{i + 1}] > 0 THEN {_BIT_LITS[i]} ELSE 0 END)"
        for i in range(BQ_DIM)
    )
    return f"CAST({terms} AS BIGINT)"


def _spark_pack(v) -> F.Column:
    acc = F.lit(0).cast("long")
    for i in range(BQ_DIM):
        bit = (
            F.lit(-9223372036854775807 - 1).cast("long")
            if i == 63
            else F.lit(1 << i).cast("long")
        )
        acc = acc + F.when(v[i] > 0, bit).otherwise(F.lit(0).cast("long"))
    return acc


@query(
    "emb_binary_quantize",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    packed AS (SELECT vec_id, v, {_duck_pack("v")} AS code FROM e),
    q AS (SELECT vec_id AS qid, v AS qv, code AS qcode
          FROM packed WHERE vec_id % {BQ_QMOD} = 0
            AND vec_id < {BQ_QMOD} * {BQ_PANEL}),
    pairs AS (SELECT q.qid, p.vec_id,
                     bit_count(xor(q.qcode, p.code)) AS ham,
                     FLOOR(list_cosine_similarity(q.qv, p.v)
                           * 1000000000 + 0.5) / 1000000000 AS cs
              FROM q JOIN packed p ON p.vec_id <> q.qid),
    hr AS (SELECT qid, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY qid
                    ORDER BY ham, vec_id) AS rh
           FROM pairs),
    cr AS (SELECT qid, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY qid
                    ORDER BY cs DESC, vec_id) AS rc
           FROM pairs)
    SELECT h.qid,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           FLOOR(CAST(COUNT(*) AS DOUBLE) / {BQ_TOPK} * 10000 + 0.5)
             / 10000 AS recall_at_{BQ_TOPK},
           CAST(32 AS BIGINT) AS compression_x
    FROM hr h JOIN cr c ON c.qid = h.qid AND c.vec_id = h.vec_id
    WHERE h.rh <= {BQ_TOPK} AND c.rc <= {BQ_TOPK}
    GROUP BY h.qid ORDER BY h.qid
    """,
)
def emb_binary_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit embedding quantization audit: pack each 64-dim vector's
    SIGN BITS into one BIGINT (32× smaller than float32), then for
    the FIXED {p}-query panel (vec_id % {m} == 0, first {p}) compare
    Hamming top-{k}
    (bit_count of xor over packed words — the billion-scale
    candidate-generation arithmetic) against exact cosine top-{k} and
    report recall@{k} per query. The number that decides how much
    exact re-ranking the binary index still owes; sim_pq sits between
    this and full precision on the same ladder.

    Scale: packing is one narrow JVM map (no UDF); the query panel is
    FIXED-SIZE and broadcast against the packed store, so the scoring
    pass is O(panel × corpus) map-side work with NO all-pairs shuffle
    (a corpus-proportional panel would be O(N²) — measured slope 1.80
    before the panel was pinned); the per-query top-k windows ride
    |panel|-keyed partitions."""
    e = cat(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    # norms ride as columns BELOW the panel cross join (projects are
    # not collapsed across a join), so each side's norm fold runs once
    # per vector instead of once per (panel x corpus) pair — the dot
    # is the only per-pair fold left (guide §1.2); same multiply, same
    # rounding, so the cosine grid is unchanged
    packed = e.select(
        "vec_id", "v", _spark_pack(F.col("v")).alias("code"),
        nrm(F.col("v")).alias("nv"),
    )
    q = (
        packed.filter(
            (F.col("vec_id") % BQ_QMOD == 0)
            & (F.col("vec_id") < BQ_QMOD * BQ_PANEL)
        )
        .select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("code").alias("qcode"),
            F.col("nv").alias("nq"),
        )
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cs = F.floor(
        dot / (F.col("nq") * F.col("nv")) * 1000000000 + F.lit(0.5)
    ) / 1000000000
    pairs = (
        F.broadcast(q)
        .crossJoin(packed)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.bit_count(F.expr("qcode ^ code")).alias("ham"),
            cs.alias("cs"),
        )
        .localCheckpoint()  # feeds both rank branches
    )
    w_h = W.partitionBy("qid").orderBy("ham", "vec_id")
    w_c = W.partitionBy("qid").orderBy(F.desc("cs"), "vec_id")
    hr = pairs.withColumn("rh", F.row_number().over(w_h)).filter(
        F.col("rh") <= BQ_TOPK
    )
    cr = pairs.withColumn("rc", F.row_number().over(w_c)).filter(
        F.col("rc") <= BQ_TOPK
    )
    return (
        hr.select("qid", "vec_id")
        .join(cr.select("qid", "vec_id"), ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
        .select(
            "qid",
            "n_hits",
            ratio(F.col("n_hits").cast("double") / BQ_TOPK).alias(
                f"recall_at_{BQ_TOPK}"
            ),
            F.lit(32).cast("bigint").alias("compression_x"),
        )
        .orderBy("qid")
    )


emb_binary_quantize.__doc__ = emb_binary_quantize.__doc__.format(
    m=BQ_QMOD, k=BQ_TOPK, p=BQ_PANEL
)
