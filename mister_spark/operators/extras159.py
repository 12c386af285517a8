"""Wave 159: Heaps-law vocabulary growth and soft deduplication.

tx_heaps_law fits V(n) = K·n^beta over prefix checkpoints — the
vocabulary-growth exponent that predicts how many NEW tokens the
next 10× of corpus will bring (tokenizer sizing, OOV budgeting);
dd_soft_dedup reweights template-duplicate clusters down by 1/size
instead of dropping them — the SoftDeDup idea: keep every document,
let near-copies share one document's worth of training weight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

HEAPS_POINTS = 10
HEAPS_MAX_LEN = 200  # constant series cap; docs top out well below
SOFT_PREFIX = 40


@query(
    "tx_heaps_law",
    oracle=f"""
    WITH mx AS (SELECT MAX(doc_id) AS m, COUNT(*) AS nd FROM documents),
    tk AS (SELECT doc_id, {DUCK_TOKENS} AS ts FROM documents),
    t AS (SELECT tk.doc_id,
                 tk.ts[s.i] || ' ' || tk.ts[s.i + 1] || ' '
                   || tk.ts[s.i + 2] AS tok
          FROM tk, (SELECT UNNEST(generate_series(1, {HEAPS_MAX_LEN}))
                      AS i) s
          WHERE s.i + 2 <= len(tk.ts)),
    fst AS (SELECT tok, MIN(doc_id) AS fd FROM t GROUP BY 1),
    ck AS (SELECT CAST(FLOOR(mx.m * i.g / {HEAPS_POINTS}.0) AS BIGINT)
                    AS thr
           FROM mx, (SELECT UNNEST(generate_series(1, {HEAPS_POINTS}))
                       AS g) i),
    pts AS (SELECT ck.thr,
                   CAST((SELECT COUNT(*) FROM documents d
                         WHERE d.doc_id <= ck.thr) AS DOUBLE) AS n_docs,
                   CAST((SELECT COUNT(*) FROM fst
                         WHERE fst.fd <= ck.thr) AS DOUBLE) AS vocab
            FROM ck),
    lg AS (SELECT LN(n_docs) AS x, LN(vocab) AS y FROM pts
           WHERE n_docs > 0 AND vocab > 0),
    fit AS (SELECT (AVG(x * y) - AVG(x) * AVG(y))
                   / (AVG(x * x) - AVG(x) * AVG(x)) AS beta,
                   AVG(y) AS my, AVG(x) AS mx2
            FROM lg)
    SELECT FLOOR(beta * 10000 + 0.5) / 10000 AS heaps_beta,
           FLOOR(EXP(my - beta * mx2) * 100 + 0.5) / 100 AS heaps_k,
           CAST({HEAPS_POINTS} AS BIGINT) AS checkpoints
    FROM fit
    """,
)
def tx_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law fit V(n) = K·n^beta over the word-TRIGRAM
    vocabulary (the unigram vocab saturates at 31 in this corpus) at
    {p} doc-id prefix checkpoints, then an OLS line in log-log
    space. beta well below 1 (sublinear growth) is the signature of
    natural vocabulary. The prefix vocab needs no re-scan per
    checkpoint — each trigram's FIRST document position is computed
    once and the checkpoints just count thresholds.

    Scale: one min-per-token rollup; {p} checkpoint probes are
    broadcast-joined threshold counts, and the fit is closed-form."""
    docs = cat(spark, sf_dir)["documents"]
    mx = docs.agg(F.max("doc_id").alias("m"))
    t = docs.select("doc_id", tokens().alias("ts"))
    n = F.size("ts")
    tri = F.when(
        n >= 3,
        F.zip_with(
            F.zip_with(
                F.slice("ts", 1, n - 2),
                F.slice("ts", 2, n - 2),
                lambda x, y: F.concat_ws(" ", x, y),
            ),
            F.slice("ts", 3, n - 2),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    fst = (
        t.select("doc_id", F.explode(tri).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("fd"))
    )
    ck = (
        spark.range(1, HEAPS_POINTS + 1)
        .crossJoin(F.broadcast(mx))
        .select(
            F.floor(F.col("m") * F.col("id") / float(HEAPS_POINTS))
            .cast("bigint")
            .alias("thr")
        )
    )
    n_docs = (
        docs.crossJoin(F.broadcast(ck))
        .filter(F.col("doc_id") <= F.col("thr"))
        .groupBy("thr")
        .agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    )
    vocab = (
        fst.crossJoin(F.broadcast(ck))
        .filter(F.col("fd") <= F.col("thr"))
        .groupBy("thr")
        .agg(F.count(F.lit(1)).cast("double").alias("vocab"))
    )
    lg = (
        n_docs.join(vocab, "thr")
        .filter((F.col("n_docs") > 0) & (F.col("vocab") > 0))
        .select(
            F.log("n_docs").alias("x"), F.log("vocab").alias("y")
        )
    )
    fit = lg.agg(
        (
            (F.avg(F.col("x") * F.col("y")) - F.avg("x") * F.avg("y"))
            / (F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x"))
        ).alias("beta"),
        F.avg("y").alias("my"),
        F.avg("x").alias("mx2"),
    )
    return fit.select(
        ratio(F.col("beta")).alias("heaps_beta"),
        (
            F.floor(
                F.exp(F.col("my") - F.col("beta") * F.col("mx2")) * 100
                + 0.5
            )
            / 100
        ).alias("heaps_k"),
        F.lit(HEAPS_POINTS).cast("bigint").alias("checkpoints"),
    )


tx_heaps_law.__doc__ = tx_heaps_law.__doc__.format(p=HEAPS_POINTS)


@query(
    "dd_soft_dedup",
    oracle=f"""
    WITH cl AS (SELECT md5(substr(text, 1, {SOFT_PREFIX})) AS ck
                FROM documents),
    sz AS (SELECT ck, CAST(COUNT(*) AS DOUBLE) AS n FROM cl GROUP BY 1)
    SELECT CAST(SUM(n) AS BIGINT) AS total_docs,
           CAST(COUNT(*) AS BIGINT) AS clusters,
           FLOOR(COUNT(*) * 10000.0 / SUM(n) + 0.5) / 10000
             AS effective_fraction,
           CAST(MAX(n) AS BIGINT) AS max_cluster,
           CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
             AS docs_in_dup_clusters
    FROM sz
    """,
)
def dd_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication accounting: documents cluster by a
    {p}-char template-prefix hash, and instead of dropping
    duplicates each doc would carry weight 1/cluster-size — so the
    EFFECTIVE dataset size is the cluster count. Reports the
    effective fraction, the biggest template cluster, and how many
    docs sit in duplicated clusters — the keep-but-downweight
    alternative to hard dedup that preserves rare variants.

    Scale: one hash-groupBy on a fixed-width key; sums are a
    |clusters|-row collapse. The weights, if materialized, are a
    broadcast-join of cluster sizes back onto docs."""
    cl = cat(spark, sf_dir)["documents"].select(
        F.md5(F.substring("text", 1, SOFT_PREFIX)).alias("ck")
    )
    sz = cl.groupBy("ck").agg(F.count(F.lit(1)).cast("double").alias("n"))
    return sz.agg(
        F.sum("n").cast("bigint").alias("total_docs"),
        F.count(F.lit(1)).cast("bigint").alias("clusters"),
        (
            F.floor(F.count(F.lit(1)) * 10000.0 / F.sum("n") + 0.5)
            / 10000
        ).alias("effective_fraction"),
        F.max("n").cast("bigint").alias("max_cluster"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0.0))
        .cast("bigint")
        .alias("docs_in_dup_clusters"),
    )


dd_soft_dedup.__doc__ = dd_soft_dedup.__doc__.format(p=SOFT_PREFIX)
