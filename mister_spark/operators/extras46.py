"""Wave 46: corpus-quality signals and mergeable distinct sketches.

tx_char_entropy is the compression-ratio proxy pretraining filters use
(low character entropy ≈ templated/repetitive text) made deterministic
via integer-quantized per-term sums; tx_oov_rate measures tokenizer
vocabulary coverage per source (the first number to check before
committing a vocab size); tx_burrows_delta is the classic stylometric
source-distance (z-scored top-word frequencies) — a cheap drift check
between corpus slices; sketch_kmv_setops does distinct-set algebra
(union/intersection) on bottom-k hash sketches, the mergeable
alternative to exact distinct when the keys don't fit a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.functions.hashing import mh_hash60
from mister_spark.registry import query

ENT_Q = 1_000_000  # per-term quantization grid (1e-6)
OOV_VOCAB_K = 500
DELTA_TOP_WORDS = 40
KMV_K = 256
KMV_MOD = 9_007_199_254_740_881  # prime near 2^53: hash → [0,1) denominator


@query(
    "tx_char_entropy",
    oracle=f"""
    WITH ch AS (SELECT doc_id, source, unnest(string_split(text, '')) AS c
                FROM documents),
    cnt AS (SELECT doc_id, source, c, CAST(COUNT(*) AS BIGINT) AS k
            FROM ch GROUP BY 1, 2, 3),
    term AS (SELECT doc_id, source,
                    CAST(FLOOR(k * log2(CAST(k AS DOUBLE)) * {ENT_Q} + 0.5)
                         AS BIGINT) AS tq,
                    k
             FROM cnt),
    d AS (SELECT doc_id, source,
                 CAST(SUM(k) AS BIGINT) AS n,
                 CAST(SUM(tq) AS BIGINT) AS sq
          FROM term GROUP BY 1, 2),
    e AS (SELECT source,
                 CAST(FLOOR((log2(CAST(n AS DOUBLE))
                             - CAST(sq AS DOUBLE) / {ENT_Q} / n)
                            * {ENT_Q} + 0.5) AS BIGINT) AS eq
          FROM d)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           FLOOR(CAST(SUM(eq) AS DOUBLE) / COUNT(*) / {ENT_Q} * 10000 + 0.5)
             / 10000 AS avg_entropy,
           FLOOR(CAST(MIN(eq) AS DOUBLE) / {ENT_Q} * 10000 + 0.5) / 10000
             AS min_entropy,
           FLOOR(CAST(MAX(eq) AS DOUBLE) / {ENT_Q} * 10000 + 0.5) / 10000
             AS max_entropy
    FROM e GROUP BY source
    """,
)
def tx_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-entropy profile — Shannon entropy of each
    doc's character distribution (bits), then avg/min/max per source.
    Low char entropy flags templated or repetitive text the way a
    compression-ratio filter would, without a compressor. Every
    cross-row sum is INTEGER: each (doc, char) term k·log2(k) is
    quantized to a 1e-6 grid before summing, and per-doc entropies are
    quantized again before the source average — so partition order
    can't move a single ulp, and both engines agree exactly.

    Scale: the char explode partial-aggregates map-side to (doc ×
    alphabet) rows — bounded by ~100/doc, not corpus bytes; two more
    linear groupBys collapse doc → source. No windows, no joins."""
    docs = cat(spark, sf_dir)["documents"]
    ch = docs.select(
        "doc_id", "source", F.explode(F.split(F.col("text"), "")).alias("c")
    )
    cnt = ch.groupBy("doc_id", "source", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    term = cnt.select(
        "doc_id",
        "source",
        "k",
        F.floor(
            F.col("k") * F.log2(F.col("k").cast("double")) * ENT_Q + F.lit(0.5)
        )
        .cast("bigint")
        .alias("tq"),
    )
    d = term.groupBy("doc_id", "source").agg(
        F.sum("k").cast("bigint").alias("n"),
        F.sum("tq").cast("bigint").alias("sq"),
    )
    e = d.select(
        "source",
        F.floor(
            (
                F.log2(F.col("n").cast("double"))
                - F.col("sq").cast("double") / ENT_Q / F.col("n")
            )
            * ENT_Q
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("eq"),
    )
    return e.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        ratio(F.sum("eq").cast("double") / F.count(F.lit(1)) / ENT_Q).alias(
            "avg_entropy"
        ),
        ratio(F.min("eq").cast("double") / ENT_Q).alias("min_entropy"),
        ratio(F.max("eq").cast("double") / ENT_Q).alias("max_entropy"),
    )


@query(
    "tx_oov_rate",
    oracle=f"""
    WITH t AS (SELECT source, unnest({DUCK_TOKENS}) AS tok FROM documents),
    freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY 1),
    vocab AS (SELECT tok FROM freq ORDER BY n DESC, tok LIMIT {OOV_VOCAB_K}),
    j AS (SELECT s.source, s.tok,
                 CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
          FROM t s LEFT JOIN vocab v USING (tok))
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           FLOOR(CAST(SUM(oov) AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000
             AS oov_rate
    FROM j GROUP BY source
    """,
)
def tx_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against the corpus's own
    top-{OOV_VOCAB_K} token vocabulary (count-desc, token-asc
    tiebreak) — the coverage number that decides a tokenizer's vocab
    size, and a per-source skew check (a source with high OOV against
    the corpus vocab is distributionally far from the rest).

    Scale: vocabulary = one token-count shuffle then a distributed
    top-K (TakeOrdered, never a single-task full sort) broadcast to
    every executor; the second pass is a map-side broadcast hash join
    + per-source partial agg. Token stream is never shuffled raw."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("source", F.explode(tokens()).alias("tok"))
    freq = t.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    vocab = (
        freq.orderBy(F.col("n").desc(), F.col("tok"))
        .limit(OOV_VOCAB_K)
        .select("tok", F.lit(1).alias("_inv"))
    )
    j = t.join(F.broadcast(vocab), "tok", "left").select(
        "source", F.when(F.col("_inv").isNull(), 1).otherwise(0).alias("oov")
    )
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("oov").cast("bigint").alias("n_oov"),
        ratio(F.sum("oov").cast("double") / F.count(F.lit(1))).alias("oov_rate"),
    )


@query(
    "tx_burrows_delta",
    oracle=f"""
    WITH t AS (SELECT source, unnest({DUCK_TOKENS}) AS tok FROM documents),
    tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY 1),
    freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY 1),
    topw AS (SELECT tok FROM freq ORDER BY n DESC, tok
             LIMIT {DELTA_TOP_WORDS}),
    cellr AS (SELECT s.source, s.tok, CAST(COUNT(*) AS BIGINT) AS c
              FROM t s JOIN topw USING (tok) GROUP BY 1, 2),
    grid AS (SELECT tot.source, topw.tok, tot.n FROM tot CROSS JOIN topw),
    cell AS (SELECT grid.source, grid.tok,
                    CAST(COALESCE(cellr.c, 0) AS DOUBLE) / grid.n AS f
             FROM grid LEFT JOIN cellr
               ON grid.source = cellr.source AND grid.tok = cellr.tok),
    mstat AS (SELECT tok, AVG(f) AS mu,
                     CASE WHEN STDDEV_SAMP(f) = 0 THEN NULL
                          ELSE STDDEV_SAMP(f) END AS sd
              FROM cell GROUP BY 1),
    z AS (SELECT cell.source, cell.tok,
                 COALESCE((cell.f - mstat.mu) / mstat.sd, 0.0) AS z
          FROM cell JOIN mstat USING (tok)),
    pair AS (SELECT a.source AS src_a, b.source AS src_b,
                    AVG(ABS(a.z - b.z)) AS delta
             FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
             GROUP BY 1, 2)
    SELECT src_a, src_b, FLOOR(delta * 10000 + 0.5) / 10000 AS delta
    FROM pair ORDER BY delta, src_a, src_b LIMIT 10
    """,
)
def tx_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between sources — the stylometric distance:
    z-score each source's relative frequency of the corpus's
    top-{DELTA_TOP_WORDS} words across sources, then Delta(a,b) =
    mean |z_a − z_b|; the 10 most similar pairs. In a pipeline this is
    a slice-drift check: two slices with near-zero Delta are stylistic
    duplicates, a far-out slice needs its own mixing weight.

    Scale: token stream collapses to (source × {DELTA_TOP_WORDS})
    cells via a broadcast top-word join + partial agg; all later
    frames are model-sized (|sources|² pairs at most) so the z-score
    window and pair join are free. Float sums only over the bounded
    source dimension (house stat_entropy precedent)."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("source", F.explode(tokens()).alias("tok"))
    tot = t.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    freq = t.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    topw = (
        freq.orderBy(F.col("n").desc(), F.col("tok"))
        .limit(DELTA_TOP_WORDS)
        .select("tok")
    )
    cellr = (
        t.join(F.broadcast(topw), "tok")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    grid = tot.crossJoin(F.broadcast(topw))
    cell = grid.join(cellr, ["source", "tok"], "left").select(
        "source",
        "tok",
        (F.coalesce(F.col("c"), F.lit(0)).cast("double") / F.col("n")).alias(
            "f"
        ),
    ).localCheckpoint()  # model-sized (|sources| x top-words); feeds 2 branches
    mstat = cell.groupBy("tok").agg(
        F.avg("f").alias("mu"),
        F.when(F.stddev_samp("f") == 0, None)
        .otherwise(F.stddev_samp("f"))
        .alias("sd"),
    )
    z = cell.join(F.broadcast(mstat), "tok").select(
        "source",
        "tok",
        F.coalesce((F.col("f") - F.col("mu")) / F.col("sd"), F.lit(0.0)).alias(
            "z"
        ),
    ).localCheckpoint()  # self-joined below; checkpoint cuts the dup subtree
    a = z.select(
        F.col("source").alias("src_a"), "tok", F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("src_b"), "tok", F.col("z").alias("zb")
    )
    pair = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.avg(F.abs(F.col("za") - F.col("zb"))).alias("d"))
    )
    return (
        pair.select("src_a", "src_b", ratio(F.col("d")).alias("delta"))
        .orderBy("delta", "src_a", "src_b")
        .limit(10)
    )


@query(
    "sketch_kmv_setops",
    # Real oracle: the bottom-k hashes are exact rationals of the
    # shared 60-md5-bit family, so theta, the (k-1)/theta estimates,
    # the theta-intersection rule and inclusion-exclusion are all
    # deterministic arithmetic both engines reproduce.
    oracle=f"""
    WITH pair AS (SELECT DISTINCT event_type, user_id FROM events
                  WHERE event_type IN ('view', 'click')),
    h AS (SELECT DISTINCT event_type,
                 CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                          1, 15) AS BIGINT)
                      % {KMV_MOD} AS DOUBLE) / {KMV_MOD} AS u
          FROM pair),
    sk AS (SELECT event_type, u FROM (
             SELECT event_type, u,
                    ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY u) AS rk
             FROM h) q WHERE rk <= {KMV_K}),
    theta AS (SELECT event_type, COUNT(*) AS k,
                     CASE WHEN COUNT(*) < {KMV_K} THEN 1.0
                          ELSE MAX(u) END AS theta
              FROM sk GROUP BY 1),
    est AS (SELECT event_type,
                   CASE WHEN k < {KMV_K} THEN CAST(k AS DOUBLE)
                        ELSE (k - 1) / theta END AS est, theta
            FROM theta),
    tmin AS (SELECT MIN(theta) AS th FROM est),
    inter_n AS (SELECT th, CAST(COUNT(*) AS BIGINT) AS n_common FROM (
                  SELECT u, tmin.th, COUNT(*) AS c
                  FROM sk, tmin WHERE u < tmin.th
                  GROUP BY u, tmin.th) q
                WHERE c = 2 GROUP BY th),
    singles AS (SELECT 'distinct(' || event_type || ')' AS set_expr,
                       est AS estimate
                FROM est),
    inter AS (SELECT 'view ∩ click' AS set_expr,
                     n_common / th AS estimate
              FROM inter_n),
    uni AS (SELECT 'view ∪ click' AS set_expr,
                   s.s - i.estimate AS estimate
            FROM (SELECT SUM(estimate) AS s FROM singles) s, inter i)
    SELECT set_expr, FLOOR(estimate * 10000 + 0.5) / 10000 AS estimate
    FROM (SELECT * FROM singles
          UNION ALL SELECT * FROM inter
          UNION ALL SELECT * FROM uni) all_rows
    """,
)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k / theta) sketch set algebra over per-type distinct
    users: keep each type's {KMV_K} smallest distinct user hashes;
    estimate |A| = (k−1)/θ_A, and |A∩B| by the theta intersection rule
    (survivors below θ = min(θ_A, θ_B), scaled by 1/θ) — then |A∪B| by
    inclusion–exclusion. This is the mergeable path when exact
    distinct-set algebra would shuffle every key: sketches are k rows
    each, union/intersect cost is O(k), error ~1/√k.

    Scale: per-type distinct hashing partial-aggregates map-side; the
    bottom-k is a per-type window over ≤|distinct users| rows
    PARTITIONED by type (parallel across types), and all sketch algebra
    runs on ≤2k-row frames. Estimates carry a pytest gate vs exact
    (rel. err ≤ 4/√k) in tests/test_wave46.py."""
    ev = cat(spark, sf_dir)["events"]
    pair = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .select("event_type", "user_id")
        .distinct()
    )
    h = pair.select(
        "event_type",
        (
            # 60 md5 bits (cross-engine, like the MinHash family) mod a
            # prime near 2^53 -> uniform [0,1) both engines reproduce
            F.pmod(
                mh_hash60(F.col("user_id").cast("string")),
                F.lit(KMV_MOD),
            )
            .cast("double")
            / KMV_MOD
        ).alias("u"),
    ).distinct()
    w = W.partitionBy("event_type").orderBy("u")
    sk = (
        h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KMV_K)
        .localCheckpoint()  # <=2k rows; feeds theta + intersection branches
    )
    theta = sk.groupBy("event_type").agg(
        F.max("u").alias("umax"), F.count(F.lit(1)).alias("k")
    ).select(
        "event_type",
        "k",
        # unsaturated sketch holds the whole set: θ=1, estimate exact
        F.when(F.col("k") < KMV_K, F.lit(1.0))
        .otherwise(F.col("umax"))
        .alias("theta"),
    )
    est = theta.select(
        "event_type",
        (
            F.when(F.col("k") < KMV_K, F.col("k").cast("double")).otherwise(
                (F.col("k") - 1) / F.col("theta")
            )
        ).alias("est"),
        "theta",
    )
    tmin = est.agg(F.min("theta").alias("th"))
    inter_n = (
        sk.join(F.broadcast(tmin))
        .filter(F.col("u") < F.col("th"))
        .groupBy("u", "th")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") == 2)
        .groupBy("th")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    inter = inter_n.select(
        F.lit("view ∩ click").alias("set_expr"),
        (F.col("n_common") / F.col("th")).alias("estimate"),
    )
    singles = est.select(
        F.concat(F.lit("distinct("), "event_type", F.lit(")")).alias(
            "set_expr"
        ),
        F.col("est").alias("estimate"),
    )
    both = singles.agg(F.sum("estimate").alias("s")).crossJoin(
        F.broadcast(inter.select(F.col("estimate").alias("i")))
    )
    union = both.select(
        F.lit("view ∪ click").alias("set_expr"),
        (F.col("s") - F.col("i")).alias("estimate"),
    )
    return singles.unionByName(inter).unionByName(union).select(
        "set_expr", ratio(F.col("estimate")).alias("estimate")
    )
