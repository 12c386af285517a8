"""Wave 51: retrieval + resampling round-out — BM25 ranking, MRR
retrieval eval, a compression-ratio quality filter, and Poisson
bootstrap confidence intervals.

sim_bm25 is the lexical-retrieval flagship (tf-idf already exists;
BM25's saturated tf and length normalization is what production search
actually runs); ml_mrr adds the third ranking metric family next to
ml_ndcg/ml_auc (first-relevant-hit reciprocal rank); tx_compression_ratio
is the Gopher-style compressibility filter — the one quality signal
that genuinely needs Python (zlib), so it demonstrates the Arrow-batched
pandas-UDF path; ml_bootstrap_ci shows distributed resampling done
right: Poisson(1) replicate weights from deterministic hash arithmetic,
so the B replicates are one map + one aggregation instead of B scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql.types import DoubleType

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
BM25_QMOD = 97  # doc_id % 97 == 0 -> query docs
BM25_QTERMS = 5  # first 5 tokens of the query doc form the query
MRR_K = 5
BOOT_B = 48  # bootstrap replicates
BOOT_A = 1_000_003  # row mix multiplier
BOOT_C = 7_919  # replicate mix multiplier
BOOT_M = 1_000_033  # prime modulus for the uniform grid
# Poisson(1) inverse-CDF thresholds: P(X <= k) for k = 0..4; u above the
# last one maps to 5. Spelled once and f-stringed into the oracle so both
# engines compare against bit-identical literals.
POIS_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
)


def _poisson_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(POIS_CDF)
    )
    return f"CASE {cases} ELSE 5 END"


def _poisson_col(u):
    w = F.lit(5)
    for k in reversed(range(len(POIS_CDF))):
        w = F.when(u < float(POIS_CDF[k]), F.lit(k)).otherwise(w)
    return w


@query(
    "sim_bm25",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
    d AS (SELECT doc_id, toks, len(toks) AS dl FROM t WHERE len(toks) > 0),
    g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 AVG(CAST(dl AS DOUBLE)) AS avgdl FROM d),
    tf AS (SELECT doc_id, unnest(toks) AS term FROM d),
    tfc AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
            FROM tf GROUP BY 1, 2),
    df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tfc GROUP BY 1),
    qt AS (SELECT doc_id AS q_id, unnest(list_distinct(toks[1:{BM25_QTERMS}]))
                    AS term
           FROM d WHERE doc_id % {BM25_QMOD} = 0),
    qk AS (SELECT qt.q_id, qt.term, ln(1.0 + (g.n - df.df + 0.5)
                                             / (df.df + 0.5)) AS idf
           FROM qt JOIN df ON qt.term = df.term CROSS JOIN g
           WHERE df.df * 10 <= g.n * 9),
    s AS (SELECT qk.q_id, tfc.doc_id,
                 SUM(qk.idf * tfc.tf * ({BM25_K1} + 1.0)
                     / (tfc.tf + {BM25_K1}
                        * (1.0 - {BM25_B}
                           + {BM25_B} * d.dl / g.avgdl))) AS score
          FROM qk JOIN tfc ON qk.term = tfc.term
                JOIN d ON tfc.doc_id = d.doc_id CROSS JOIN g
          GROUP BY 1, 2)
    SELECT q_id, doc_id, bm25, rn
    FROM (SELECT q_id, doc_id,
                 FLOOR(score * 10000 + 0.5) / 10000 AS bm25,
                 ROW_NUMBER() OVER (
                   PARTITION BY q_id
                   ORDER BY FLOOR(score * 10000 + 0.5) / 10000 DESC, doc_id)
                   AS rn
          FROM s)
    WHERE rn <= {BM25_TOPK}
    """,
)
def sim_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{k} retrieval: query docs (doc_id % {mod} == 0) issue
    their first {q} distinct tokens as a query against the whole corpus;
    k1={k1}, b={b}, idf = ln(1 + (N - df + .5)/(df + .5)), query terms
    with df > 0.9·N dropped (stopword prune — also what bounds the
    candidate fan-out; the synthetic corpus's tiny vocab puts every
    term in ~80% of docs, so a production N/2 cutoff would be vacuous
    here).

    Scale: the only corpus-sized shuffles are the postings build
    (groupBy (doc, term)) and the candidate equi-join on term; query
    terms are a tiny broadcast, the stopword prune caps any single
    term's posting list at N/2 (and hot terms have ~zero idf anyway),
    and the final top-k window partitions by q_id over candidate rows
    only — never all q×N pairs.
    """
    docs = cat(spark, sf_dir)["documents"]
    d = (
        docs.select("doc_id", tokens().alias("toks"))
        .withColumn("dl", F.size("toks").cast("double"))
        .filter(F.col("dl") > 0)
    )
    g = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    tfc = d.select(
        "doc_id", "dl", F.explode("toks").alias("term")
    ).groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    df = tfc.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    qt = (
        d.filter(F.col("doc_id") % BM25_QMOD == 0)
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(
                F.array_distinct(F.slice("toks", 1, BM25_QTERMS))
            ).alias("term"),
        )
    )
    qk = (
        qt.join(df, "term")
        .join(F.broadcast(g))
        .filter(F.col("df") * 10 <= F.col("n") * 9)
        .withColumn(
            "idf",
            F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .select("term", "q_id", "idf")
    )
    s = (
        tfc.join(F.broadcast(qk), "term")
        .join(F.broadcast(g))
        .groupBy("q_id", "doc_id")
        .agg(
            F.sum(
                F.col("idf")
                * F.col("tf")
                * (BM25_K1 + 1.0)
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("score")
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("bm25"), "doc_id")
    return (
        s.withColumn("bm25", rnd(F.col("score"), 4))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BM25_TOPK)
        .select("q_id", "doc_id", "bm25", "rn")
    )


sim_bm25.__doc__ = sim_bm25.__doc__.format(
    k=BM25_TOPK, mod=BM25_QMOD, q=BM25_QTERMS, k1=BM25_K1, b=BM25_B
)


@query(
    "ml_mrr",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv,
                      label AS qlab
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label AS clab
          FROM embeddings WHERE vec_id >= 8),
    top AS (SELECT q_id, qlab, clab, rn
            FROM (SELECT q.q_id, q.qlab, c.clab,
                         ROW_NUMBER() OVER (
                           PARTITION BY q.q_id
                           ORDER BY FLOOR((list_cosine_similarity(c.v, q.qv))
                                          * 10000 + 0.5) / 10000 DESC,
                                    c.vec_id) AS rn
                  FROM q, c)
            WHERE rn <= {MRR_K}),
    rr AS (SELECT q_id,
                  COALESCE(MIN(CASE WHEN qlab = clab THEN rn END), 0) AS fr
           FROM top GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN fr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           FLOOR(SUM(CASE WHEN fr > 0 THEN 1.0 / fr ELSE 0.0 END)
                 / COUNT(*) * 10000 + 0.5) / 10000 AS mrr
    FROM rr
    """,
)
def ml_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@{k} of the batch retrieval: reciprocal rank of the FIRST
    same-label neighbor in sim_topk_join's top-{k} list, 0 when no
    relevant hit — the metric that scores "did the right answer come
    first" (ml_ndcg scores the whole list, ml_auc scores classifiers).

    Scale: reuses sim_topk_join's two-phase top-k plan; the metric
    itself is a {k}-row-per-query min + one global single-row
    aggregation. Reciprocal ranks are exact small rationals, so the
    only float is the final division."""
    from mister_spark.operators.similarity import sim_topk_join

    emb = cat(spark, sf_dir)["embeddings"]
    labels = emb.select("vec_id", "label")
    top = (
        sim_topk_join(spark, sf_dir)
        .join(
            F.broadcast(
                labels.select(
                    F.col("vec_id").alias("q_id"), F.col("label").alias("qlab")
                )
            ),
            "q_id",
        )
        .join(F.broadcast(labels.withColumnRenamed("label", "clab")), "vec_id")
    )
    rr = top.groupBy("q_id").agg(
        F.coalesce(
            F.min(F.when(F.col("qlab") == F.col("clab"), F.col("rn"))),
            F.lit(0),
        ).alias("fr")
    )
    fr = F.col("fr")
    return rr.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum((fr > 0).cast("int")).cast("bigint").alias("n_hit"),
        ratio(
            F.sum(F.when(fr > 0, 1.0 / fr).otherwise(0.0)) / F.count(F.lit(1))
        ).alias("mrr"),
    )


ml_mrr.__doc__ = ml_mrr.__doc__.format(k=MRR_K)


@query("tx_compression_ratio")  # rows-only: zlib is not expressible in SQL;
# pytest gates bounds + the repetitive-text-compresses-more invariant.
# Conversion re-audited 2026-08-17 (r11, after the qsketch /
# freq_items / misra_gries conversions proved "permanent" labels can
# fall): a portable order-0/order-1 entropy estimate WOULD replay in
# DuckDB, but it measures character/bigram skew, not the LZ77
# back-reference matching that makes repetitive boilerplate compress —
# the exact signal this Gopher-style filter exists to capture (a doc
# of one repeated sentence has near-normal char entropy and a tiny
# zlib ratio). Swapping the metric would keep the oracle and lose the
# op. Stays rows-only on purpose; revisit only if a deterministic,
# SQL-expressible LZ cost model lands in both engines.
def tx_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressibility quality filter (Gopher-style): per source, the
    mean zlib-compressed/raw byte ratio and the share of documents
    below {lo} (highly repetitive boilerplate) or above {hi}
    (near-random / already-compressed junk) — the classic cheap proxy
    for "is this natural language".

    This is the one text-quality signal that genuinely needs Python
    (zlib), so it runs as an Arrow-batched scalar pandas UDF — one
    C-speed pass per batch, no per-row Python fallback — and everything
    after the ratio column is JVM aggregation.

    Scale: narrow map (UDF) + one shuffle to |sources| groups; text
    bytes never shuffle (the UDF projects them down to one double
    before the exchange)."""
    # no type hints: module-level `from __future__ import annotations`
    # stringifies them and pandas_udf can't resolve 'pd.Series'
    @F.pandas_udf(DoubleType())
    def zratio(texts):
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(one)

    docs = cat(spark, sf_dir)["documents"]
    r = docs.select("source", zratio("text").alias("zr")).filter(
        F.col("zr").isNotNull()
    )
    lo, hi = CR_LO, CR_HI
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            ratio(F.avg("zr")).alias("avg_ratio"),
            ratio(F.avg((F.col("zr") < lo).cast("double"))).alias("share_repetitive"),
            ratio(F.avg((F.col("zr") > hi).cast("double"))).alias("share_random"),
        )
        .orderBy("source")
    )


CR_LO = 0.35
CR_HI = 1.0
tx_compression_ratio.__doc__ = tx_compression_ratio.__doc__.format(
    lo=CR_LO, hi=CR_HI
)


@query(
    "ml_bootstrap_ci",
    oracle=f"""
    WITH b AS (SELECT unnest(generate_series(0, {BOOT_B - 1})) AS b),
    w AS (SELECT b.b, o.o_totalprice AS x,
                 {_poisson_sql(
                     f"CAST((o.o_orderkey * {BOOT_A} + b.b * {BOOT_C})"
                     f" % {BOOT_M} AS DOUBLE) / {BOOT_M}"
                 )} AS w
          FROM orders o CROSS JOIN b),
    m AS (SELECT b, SUM(w * x) / SUM(w) AS mb FROM w GROUP BY b
          HAVING SUM(w) > 0),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nb, SUM(mb) AS sm,
                 SUM(mb * mb) AS smm
          FROM m),
    p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
                 AVG(o_totalprice) AS mean_raw
          FROM orders)
    SELECT p.n_orders,
           FLOOR(p.mean_raw * 100 + 0.5) / 100 AS mean_price,
           FLOOR(sqrt((s.smm - s.sm * s.sm / s.nb) / (s.nb - 1)) * 100 + 0.5)
             / 100 AS boot_se,
           FLOOR((s.sm / s.nb - 1.96 * sqrt((s.smm - s.sm * s.sm / s.nb)
                                            / (s.nb - 1))) * 100 + 0.5)
             / 100 AS ci_lo,
           FLOOR((s.sm / s.nb + 1.96 * sqrt((s.smm - s.sm * s.sm / s.nb)
                                            / (s.nb - 1))) * 100 + 0.5)
             / 100 AS ci_hi
    FROM s CROSS JOIN p
    """,
)
def ml_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap CI for mean(o_totalprice): every (row, b)
    pair draws a Poisson(1) replicate weight from deterministic hash
    arithmetic ((orderkey·{a} + b·{c}) mod {m} → uniform → inverse
    CDF), replicate means are weighted averages, and the CI is the
    normal bootstrap mean ± 1.96·sd(replicate means).

    This is THE scalable resampling pattern: no data duplication per
    replicate beyond a {bb}-way explode that map-side combines down to
    {bb} partials per partition before the one shuffle, and no
    driver-side RNG state — the "randomness" is a pure column
    expression, so the same rows draw the same weights on any cluster
    layout. Intermediate replicate means stay unrounded (rounding them
    would amplify float-order noise across engines); only the four
    reported numbers round, at money scale.

    Scale: one scan, one {bb}-group aggregation, O({bb}) result —
    works unchanged at 100 TB."""
    orders = cat(spark, sf_dir)["orders"]
    b = spark.range(BOOT_B).select(F.col("id").alias("b"))
    u = (
        (F.col("o_orderkey") * BOOT_A + F.col("b") * BOOT_C) % BOOT_M
    ).cast("double") / BOOT_M
    w = orders.select("o_orderkey", F.col("o_totalprice").alias("x")).join(
        F.broadcast(b)
    ).select("b", "x", _poisson_col(u).cast("double").alias("w"))
    m = (
        w.groupBy("b")
        .agg(F.sum(F.col("w") * F.col("x")).alias("swx"), F.sum("w").alias("sw"))
        .filter(F.col("sw") > 0)
        .select((F.col("swx") / F.col("sw")).alias("mb"))
    )
    s = m.agg(
        F.count(F.lit(1)).cast("double").alias("nb"),
        F.sum("mb").alias("sm"),
        F.sum(F.col("mb") * F.col("mb")).alias("smm"),
    )
    p = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.avg("o_totalprice").alias("mean_raw"),
    )
    se = F.sqrt(
        (F.col("smm") - F.col("sm") * F.col("sm") / F.col("nb"))
        / (F.col("nb") - 1)
    )
    ctr = F.col("sm") / F.col("nb")
    return s.join(F.broadcast(p)).select(
        "n_orders",
        money(F.col("mean_raw")).alias("mean_price"),
        money(se).alias("boot_se"),
        money(ctr - 1.96 * se).alias("ci_lo"),
        money(ctr + 1.96 * se).alias("ci_hi"),
    )


ml_bootstrap_ci.__doc__ = ml_bootstrap_ci.__doc__.format(
    a=BOOT_A, c=BOOT_C, m=BOOT_M, bb=BOOT_B
)
