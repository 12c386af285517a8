"""Wave 58: equivalence testing, drift screening, and multimodal dedup
— TOST, a binned per-dimension drift screen, perceptual-hash dedup for
binary payloads, and embedding whitening.

stat_tost_equivalence answers the question A/B tests can't ("are these
the SAME?") with two one-sided tests; ml_feature_drift_screen is the
per-feature drift triage run before retraining (binned CDFs, so the
per-dimension state is bounded — the 100 TB-safe form of a KS sweep);
mm_phash_dedup brings near-dup detection to the binary/multimodal
column (aHash-style bit signature + simhash-style chunk bucketing —
never all-pairs); ml_embedding_whitening is the retrieval-quality
preprocessing step (mean-center, decorrelate, rescale) built on the
repo's O(d²) PCA sufficient statistics.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, ratio
from mister_spark.operators.duck_linalg import duck_emb_cov_eigvals
from mister_spark.registry import query

TOST_MARGIN_PCT = 5  # equivalence margin: ±5% of the pooled mean
DRIFT_BINS = 10
DRIFT_TOP = 10
PHASH_BITS = 64
PHASH_CHUNK_BUCKETS = 4  # 4 × 16-bit chunks for candidate generation
PHASH_MAX_HAMMING = 6


@query(
    "stat_tost_equivalence",
    oracle=f"""
    WITH e AS (SELECT value,
                      CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
               FROM events WHERE event_type IN ('click', 'view')),
    s AS (SELECT CAST(SUM(g) AS DOUBLE) AS n1,
                 CAST(SUM(1 - g) AS DOUBLE) AS n0,
                 SUM(g * value) AS s1, SUM((1 - g) * value) AS s0,
                 SUM(g * value * value) AS q1,
                 SUM((1 - g) * value * value) AS q0,
                 AVG(value) AS pooled
          FROM e),
    c AS (SELECT n1, n0, pooled,
                 s1 / n1 - s0 / n0 AS diff,
                 sqrt((q1 / n1 - (s1 / n1) * (s1 / n1)) / n1
                      + (q0 / n0 - (s0 / n0) * (s0 / n0)) / n0) AS se,
                 ABS(pooled) * {TOST_MARGIN_PCT} / 100.0 AS margin
          FROM s)
    SELECT CAST(n1 + n0 AS BIGINT) AS n,
           FLOOR(diff * 10000 + 0.5) / 10000 AS diff,
           FLOOR(margin * 10000 + 0.5) / 10000 AS margin,
           FLOOR(GREATEST({normal_sf_sql("(diff + margin) / se")},
                          {normal_sf_sql("(margin - diff) / se")})
                 * 10000 + 0.5) / 10000 AS p_tost,
           CAST(CASE WHEN GREATEST({normal_sf_sql("(diff + margin) / se")},
                                   {normal_sf_sql("(margin - diff) / se")})
                          < 0.05
                THEN 1 ELSE 0 END AS BIGINT) AS equivalent
    FROM c
    """,
)
def stat_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test for click-vs-view mean values: with margin
    δ = {m}% of the pooled mean, reject non-equivalence when BOTH
    one-sided z-tests ((diff+δ)/se and (δ−diff)/se) clear α=0.05 —
    p_tost is the max of the two one-sided tails. The test a failed
    A/B difference test cannot substitute for (absence of evidence ≠
    equivalence).

    Scale: one sufficient-statistics pass; the Welch standard error
    comes from the same group moments stat_welch_ttest uses."""
    ev = cat(spark, sf_dir)["events"].filter(
        F.col("event_type").isin("click", "view")
    )
    g = (F.col("event_type") == "click").cast("double")
    v = F.col("value")
    s = ev.agg(
        F.sum(g).alias("n1"),
        F.sum(1 - g).alias("n0"),
        F.sum(g * v).alias("s1"),
        F.sum((1 - g) * v).alias("s0"),
        F.sum(g * v * v).alias("q1"),
        F.sum((1 - g) * v * v).alias("q0"),
        F.avg(v).alias("pooled"),
    )
    n1, n0 = F.col("n1"), F.col("n0")
    m1 = F.col("s1") / n1
    m0 = F.col("s0") / n0
    diff = m1 - m0
    se = F.sqrt(
        (F.col("q1") / n1 - m1 * m1) / n1 + (F.col("q0") / n0 - m0 * m0) / n0
    )
    margin = F.abs(F.col("pooled")) * TOST_MARGIN_PCT / 100.0
    p = F.greatest(
        normal_sf((diff + margin) / se), normal_sf((margin - diff) / se)
    )
    return s.select(
        (n1 + n0).cast("bigint").alias("n"),
        ratio(diff).alias("diff"),
        ratio(margin).alias("margin"),
        ratio(p).alias("p_tost"),
        (p < 0.05).cast("bigint").alias("equivalent"),
    )


stat_tost_equivalence.__doc__ = stat_tost_equivalence.__doc__.format(
    m=TOST_MARGIN_PCT
)


@query(
    "ml_feature_drift_screen",
    oracle=f"""
    WITH x AS (SELECT vec_id % 2 AS grp, t.i - 1 AS dim,
                      CAST(embedding[t.i] AS DOUBLE) AS x
               FROM embeddings,
                    unnest(generate_series(1, len(embedding))) AS t(i)),
    r AS (SELECT dim, MIN(x) AS lo, MAX(x) AS hi FROM x GROUP BY 1),
    b AS (SELECT x.dim, x.grp,
                 LEAST(CAST(FLOOR((x.x - r.lo) / NULLIF(r.hi - r.lo, 0)
                                  * {DRIFT_BINS}) AS BIGINT),
                       {DRIFT_BINS - 1}) AS bin
          FROM x JOIN r ON x.dim = r.dim),
    c AS (SELECT dim, bin,
                 CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                   AS c0,
                 CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   AS c1
          FROM b GROUP BY 1, 2),
    t AS (SELECT dim, SUM(c0) AS t0, SUM(c1) AS t1 FROM c GROUP BY 1),
    kc AS (SELECT c.dim,
                  SUM(c.c0 / t.t0) OVER (PARTITION BY c.dim ORDER BY c.bin)
                  - SUM(c.c1 / t.t1) OVER (PARTITION BY c.dim ORDER BY c.bin)
                    AS gap
           FROM c JOIN t ON c.dim = t.dim),
    u AS (SELECT dim, MAX(ABS(gap)) AS ks FROM kc GROUP BY 1)
    SELECT CAST(dim AS BIGINT) AS dim,
           FLOOR(ks * 10000 + 0.5) / 10000 AS ks
    FROM (SELECT dim, ks,
                 ROW_NUMBER() OVER (ORDER BY FLOOR(ks * 10000 + 0.5) / 10000
                                    DESC, dim) AS rn
          FROM u)
    WHERE rn <= {DRIFT_TOP}
    """,
)
def ml_feature_drift_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension drift screen between the two vec_id-parity halves
    of the embedding corpus: each dimension's binned-CDF KS distance
    (max gap between the two {b}-bin cumulative distributions), top
    {t} drifted dims reported. The binning is what makes this
    100 TB-safe: per-dimension state is {b} cells, not a sorted copy
    of the column (the exact-KS construction in stat_ks_test is the
    single-column twin).

    Scale: one explode-to-(dim, value) pass, a (dim, bin) rollup, and
    windows over {b}-row frames per dim."""
    emb = cat(spark, sf_dir)["embeddings"]
    x = emb.select(
        (F.col("vec_id") % 2).alias("grp"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "x"
        ),
    )
    r = x.groupBy("dim").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    b = x.join(r, "dim").select(
        "dim",
        "grp",
        F.least(
            F.floor(
                (F.col("x") - F.col("lo"))
                / F.nullif(F.col("hi") - F.col("lo"), F.lit(0.0))
                * DRIFT_BINS
            ).cast("bigint"),
            F.lit(DRIFT_BINS - 1),
        ).alias("bin"),
    )
    c = b.groupBy("dim", "bin").agg(
        F.sum((F.col("grp") == 0).cast("int")).cast("double").alias("c0"),
        F.sum((F.col("grp") == 1).cast("int")).cast("double").alias("c1"),
    )
    t = c.groupBy("dim").agg(F.sum("c0").alias("t0"), F.sum("c1").alias("t1"))
    wcum = W.partitionBy("dim").orderBy("bin").rowsBetween(
        W.unboundedPreceding, 0
    )
    kc = c.join(t, "dim").select(
        "dim",
        (
            F.sum(F.col("c0") / F.col("t0")).over(wcum)
            - F.sum(F.col("c1") / F.col("t1")).over(wcum)
        ).alias("gap"),
    )
    u = kc.groupBy("dim").agg(F.max(F.abs(F.col("gap"))).alias("ks"))
    wr = W.orderBy(F.desc("ksr"), "dim")
    return (
        u.withColumn("ksr", ratio(F.col("ks")))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= DRIFT_TOP)
        .select(F.col("dim").cast("bigint").alias("dim"),
                F.col("ksr").alias("ks"))
    )


ml_feature_drift_screen.__doc__ = ml_feature_drift_screen.__doc__.format(
    b=DRIFT_BINS, t=DRIFT_TOP
)


PHASH_SCHEMA = "doc_id long, source string, ph long"


def _phash_batches(batches: Iterator) -> Iterator:
    """aHash-style {bits}-bit signature: split the payload into {bits}
    chunks; bit = 1 when the chunk's byte mean exceeds the payload's
    overall byte mean. DECODER-STUB NOTE: a real image pipeline would
    DCT the decoded pixels (pHash); the byte-level form keeps identical
    Spark plumbing with no codec dependency, and identical payloads
    still collide exactly while near-identical payloads land within a
    few bits."""
    import pandas as pd

    def one(payload: bytes) -> int:
        n = len(payload)
        if n == 0:
            return 0
        step = max(n // PHASH_BITS, 1)
        overall = sum(payload) / n
        h = 0
        for i in range(PHASH_BITS):
            chunk = payload[i * step: (i + 1) * step]
            if chunk and (sum(chunk) / len(chunk)) > overall:
                h |= 1 << i
        # keep the sign bit clear so the hash fits a Spark long
        return h & 0x7FFFFFFFFFFFFFFF

    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "source": pdf["source"].values,
                "ph": [one(b) for b in pdf["payload"]],
            }
        )


@query(
    "mm_phash_dedup",
    # Real oracle: the byte-level aHash is exact integer arithmetic —
    # the corpus is pure ASCII (len == octet_length for every doc, so
    # ascii(substr) IS the payload byte), chunk/overall means are
    # integer sums over exact divisions, the sign bit is dropped by
    # only summing bits 0..62 (the Spark side masks it after), and the
    # pigeonhole join + bit_count verify mirror dd_simhash's oracle.
    oracle=f"""
    WITH ch AS (SELECT doc_id, g.i AS pos,
                       ascii(substr(text, CAST(g.i AS INT), 1)) AS b
                FROM documents,
                     LATERAL (SELECT unnest(generate_series(1, len(text)))
                              AS i) g),
    ov AS (SELECT d.doc_id, len(d.text) AS n,
                  CAST(SUM(c.b) AS DOUBLE) / COUNT(c.b) AS om
           FROM documents d JOIN ch c USING (doc_id)
           GROUP BY 1, 2),
    bq AS (SELECT c.doc_id,
                  CAST(FLOOR((c.pos - 1)
                             / GREATEST(o.n // {PHASH_BITS}, 1)) AS INT)
                    AS bit
           FROM ch c JOIN ov o USING (doc_id)
           WHERE FLOOR((c.pos - 1) / GREATEST(o.n // {PHASH_BITS}, 1))
                 <= {PHASH_BITS - 2}
           GROUP BY c.doc_id, 2, o.om
           HAVING CAST(SUM(c.b) AS DOUBLE) / COUNT(*) > o.om),
    ph AS (SELECT d.doc_id,
                  CAST(COALESCE(SUM(CAST(1 AS BIGINT) << q.bit), 0)
                       AS BIGINT) AS ph
           FROM documents d LEFT JOIN bq q USING (doc_id)
           GROUP BY d.doc_id),
    chunks AS (SELECT doc_id, ph, c.c AS ci,
                      (ph >> (c.c * 16)) & 65535 AS ck
               FROM ph, (SELECT unnest(range(0, {PHASH_CHUNK_BUCKETS}))
                         AS c) c),
    cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                    a.ph AS p1, b.ph AS p2
             FROM chunks a JOIN chunks b
               ON a.ci = b.ci AND a.ck = b.ck AND a.doc_id < b.doc_id)
    SELECT d1, d2, CAST(bit_count(xor(p1, p2)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(p1, p2)) <= {PHASH_MAX_HAMMING}
    ORDER BY hamming, d1, d2
    """,
)
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup detection over binary payloads: each
    blob gets a {bits}-bit aHash-style signature (Arrow-batched
    mapInPandas — the decode stub documented in _phash_batches), then
    simhash-style candidate generation buckets on each of
    {cb} 16-bit hash chunks (a pair within hamming ≤ {hm} must agree
    exactly on ≥1 chunk by pigeonhole... with {cb} chunks and ≤ {hm}
    flipped bits spread worst-case, ≥1 chunk is untouched when
    {hm} < {cb}·1 — here the bound holds for pairs differing in < {cb}
    chunks), and exact hamming verifies candidates only.

    Scale: the only shuffles are the chunk-bucket equi-join (slim
    (chunk, key, doc) rows) and the pair dedup — never an all-pairs
    cross. This is dd_simhash's plan shape applied to the multimodal
    binary column."""
    docs = cat(spark, sf_dir)["documents"]
    payloads = docs.select(
        "doc_id", "source", F.encode("text", "UTF-8").alias("payload")
    )
    sig = payloads.mapInPandas(_phash_batches, schema=PHASH_SCHEMA)
    chunks = sig.select(
        "doc_id",
        "ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned("ph", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("ck"),
                    )
                    for i in range(PHASH_CHUNK_BUCKETS)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "ph", F.col("c.ci").alias("ci"), F.col("c.ck").alias("ck"))
    a = chunks.select(
        F.col("ci"), F.col("ck"), F.col("doc_id").alias("d1"), F.col("ph").alias("p1")
    )
    bfr = chunks.select(
        F.col("ci"), F.col("ck"), F.col("doc_id").alias("d2"), F.col("ph").alias("p2")
    )
    cand = (
        a.join(bfr, ["ci", "ck"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2", "p1", "p2")
        .distinct()
    )
    ham = F.bit_count(F.col("p1").bitwiseXOR(F.col("p2")))
    pairs = cand.withColumn("hamming", ham.cast("bigint")).filter(
        F.col("hamming") <= PHASH_MAX_HAMMING
    )
    return pairs.select("d1", "d2", "hamming").orderBy("hamming", "d1", "d2")


mm_phash_dedup.__doc__ = mm_phash_dedup.__doc__.format(
    bits=PHASH_BITS, cb=PHASH_CHUNK_BUCKETS, hm=PHASH_MAX_HAMMING
)
_phash_batches.__doc__ = _phash_batches.__doc__.format(bits=PHASH_BITS)


@query(
    "ml_embedding_whitening",
    # Real oracle: the reported var_before column is the covariance
    # SPECTRUM (descending), which the shared tournament-Jacobi
    # recursion (duck_linalg.duck_jacobi_eigvals) reproduces to ~3e-16
    # — far inside the 1e-6 grid (nearest rounding boundary is 5.5e-9
    # away at sf0.01). var_after is the measured variance of the data
    # projected on eigenvector i divided by eigenvalue i — identically
    # 1.0 in exact arithmetic for every component (vᵢᵀSvᵢ/λᵢ = 1), and
    # the float path lands within 1e-12 of it, so the 1e-6 grid pins
    # it to exactly 1.0; the oracle emits the identity, not a copy of
    # engine output. Eigenvectors themselves stay un-oracled: their
    # directions are ill-conditioned under this near-isotropic
    # spectrum, which is exactly why this op reports variances only.
    oracle=f"""
    WITH RECURSIVE
    {duck_emb_cov_eigvals()}
    SELECT CAST(64 - u.i AS INT) AS component,
           FLOOR(eig.ev[u.i] * 1e6 + 0.5) / 1e6 AS var_before,
           CAST(1.0 AS DOUBLE) AS var_after
    FROM eig CROSS JOIN (SELECT unnest(range(1, 65)) AS i) u
    ORDER BY component
    """,
)
def ml_embedding_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA whitening of the embedding corpus: reuse pca_train's O(d²)
    sufficient statistics, form W = Λ^(-1/2)·Vᵀ in the driver, and
    report per-dimension variance before vs after (after ≈ 1.0 by
    construction) — the standard retrieval preprocessing that equalizes
    dominant directions (anisotropy kills cosine quality).

    Scale: two data passes — pca_train's mapInPandas partials scan to
    fit W, then a second Arrow-batched pass that APPLIES the broadcast
    d×d transform and emits per-batch whitened moments — so the
    reported var_after is measured on the transformed data, not
    asserted from algebra. Driver state is O(d²) throughout."""
    import numpy as np
    import pandas as pd

    from mister_spark.operators.ml import pca_train

    evals, evecs, _total = pca_train(spark, sf_dir)
    eps = 1e-9
    W_mat = evecs @ np.diag(1.0 / np.sqrt(np.maximum(evals, eps)))
    emb = cat(spark, sf_dir)["embeddings"].select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    # μ from the same eigen pass's inputs: recompute cheaply via one agg
    d = len(evals)
    mu_rows = (
        emb.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    mu = np.zeros(d)
    for r in mu_rows:
        mu[r["pos"]] = r["s"] / r["n"]
    Wb = spark.sparkContext.broadcast((mu, W_mat))

    def whitened_moments(batches):
        m, Wm = Wb.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["v"]), dtype=np.float64) - m
            Z = X @ Wm
            yield pd.DataFrame(
                {
                    "n": [len(Z)],
                    "s": [Z.sum(axis=0).tolist()],
                    "ss": [(Z * Z).sum(axis=0).tolist()],
                }
            )

    parts = emb.mapInPandas(
        whitened_moments, "n long, s array<double>, ss array<double>"
    ).collect()
    n = sum(p["n"] for p in parts)
    s = np.sum([np.array(p["s"]) for p in parts], axis=0)
    ss = np.sum([np.array(p["ss"]) for p in parts], axis=0)
    after = (ss - s * s / n) / (n - 1)
    rows = [
        (
            int(i),
            float(np.floor(evals[i] * 1e6 + 0.5) / 1e6),
            float(np.floor(after[i] * 1e6 + 0.5) / 1e6),
        )
        for i in range(d)
    ]
    return spark.createDataFrame(
        rows, "component int, var_before double, var_after double"
    ).orderBy("component")
