"""Wave 24: size-balanced sharding, template detection, and the
one-row dataset card.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

BAL_BINS = 8


@query(
    "ds_balanced_pack",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, n_chars,
             ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS rk
      FROM documents),
    assign AS (
      SELECT doc_id, n_chars,
             CASE WHEN (rk // {BAL_BINS}) % 2 = 0
                  THEN rk % {BAL_BINS}
                  ELSE {BAL_BINS - 1} - rk % {BAL_BINS} END AS bin
      FROM r),
    b AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM assign GROUP BY 1)
    SELECT CAST(bin AS BIGINT) AS bin, n_docs, total_chars,
           FLOOR(CAST(total_chars AS DOUBLE)
                 / (SELECT AVG(total_chars) FROM b) * 10000 + 0.5) / 10000
             AS balance_ratio
    FROM b
    """,
)
def ds_balanced_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-balanced sharding: documents dealt into 8 bins in snake
    (boustrophedon) order of descending length — the deterministic
    one-pass approximation of longest-processing-time scheduling that
    keeps every bin's char budget within a few percent of the mean
    (balance_ratio ≈ 1.0 per bin, asserted in tests). The complement to
    ds_shard_assign's hash sharding when shard SIZE equality matters
    (equal-work training shards), not just stable membership.

    Scale: the length rank uses functions/ranks.global_rank (two-phase
    range-partitioned sort, no single-task window); descending length
    is expressed as ascending −n_chars so the range partitioner's
    ascending contract holds. Assignment is a projection and the
    manifest an 8-key rollup."""
    from mister_spark.functions.ranks import global_rank

    docs = cat(spark, sf_dir)["documents"]
    r = global_rank(
        docs.select("doc_id", "n_chars", (-F.col("n_chars")).alias("neg")),
        "neg",
        "doc_id",
    ).select("doc_id", "n_chars", (F.col("rk") - 1).alias("rk"))
    fwd = F.col("rk") % BAL_BINS
    assign = r.withColumn(
        "bin",
        F.when((F.col("rk") / BAL_BINS).cast("long") % 2 == 0, fwd).otherwise(
            BAL_BINS - 1 - fwd
        ),
    )
    b = assign.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    ).localCheckpoint()
    avg = b.agg(F.avg("total_chars").alias("avg_chars"))
    return (
        b.join(F.broadcast(avg))
        .select(
            F.col("bin").cast("long").alias("bin"),
            "n_docs",
            "total_chars",
            ratio(F.col("total_chars").cast("double") / F.col("avg_chars")).alias(
                "balance_ratio"
            ),
        )
    )


@query(
    "tx_template_detect",
    oracle=f"""
    WITH shape AS (
      SELECT doc_id,
             array_to_string(list_transform({DUCK_TOKENS}, t -> CAST(len(t) AS VARCHAR)), ',')
               AS shape_sig
      FROM documents),
    g AS (
      SELECT shape_sig, CAST(COUNT(*) AS BIGINT) AS n_docs,
             MIN(doc_id) AS example_doc
      FROM shape GROUP BY 1)
    SELECT shape_sig, n_docs, example_doc
    FROM g WHERE n_docs > 1
    """,
)
def tx_template_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template detection: documents sharing an identical token-LENGTH
    sequence (the structural fingerprint that survives word
    substitution) — catches form letters and generated boilerplate
    whose words differ but whose shape doesn't, a duplication mode
    neither exact dedup (different text) nor shingle Jaccard (different
    shingles) sees. Emits each multi-document template with its size
    and an example doc.

    Scale: the shape signature is a narrow JVM transform; grouping on
    it is one shuffle. Production would group on xxhash64(sig) to keep
    the shuffle key 8 bytes (dd_exact's trick) — the string key here
    keeps the oracle exact."""
    docs = cat(spark, sf_dir)["documents"]
    sig = F.array_join(
        F.transform(tokens(), lambda t: F.length(t).cast("string")), ","
    )
    shape = docs.select("doc_id", sig.alias("shape_sig"))
    return (
        shape.groupBy("shape_sig")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("example_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


@query(
    "ds_dataset_card",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest({DUCK_TOKENS}) AS tk FROM documents),
    toks AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
                    CAST(COUNT(DISTINCT tk) AS BIGINT) AS n_types
             FROM t),
    dups AS (
      SELECT CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dups
      FROM (SELECT COUNT(*) AS n FROM documents GROUP BY text)),
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             FLOOR(AVG(n_chars) * 100 + 0.5) / 100 AS avg_chars
      FROM documents)
    SELECT base.n_docs, base.n_langs, base.n_sources, base.total_chars,
           base.avg_chars, toks.n_tokens, toks.n_types, dups.n_dups,
           FLOOR(CAST(dups.n_dups AS DOUBLE) / base.n_docs * 10000 + 0.5)
             / 10000 AS dup_rate
    FROM base, toks, dups
    """,
)
def ds_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row dataset card: corpus size, language and source
    spread, character budget, token/type counts, and exact-duplicate
    rate — the header block of a dataset release document, computed in
    one job instead of five notebook cells.

    Scale: three independent aggregate passes (doc-level, token-level,
    dup-group) joined as 1-row broadcasts; the token pass is the only
    data-sized shuffle."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("doc_id", F.explode(tokens()).alias("tk"))
    toks = t.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("tk").cast("long").alias("n_types"),
    )
    dups = (
        docs.groupBy(F.xxhash64("text").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg((F.sum("n") - F.count(F.lit(1))).cast("long").alias("n_dups"))
    )
    base = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        rnd(F.avg("n_chars"), 2).alias("avg_chars"),
    )
    return (
        base.join(F.broadcast(toks))
        .join(F.broadcast(dups))
        .select(
            "n_docs",
            "n_langs",
            "n_sources",
            "total_chars",
            "avg_chars",
            "n_tokens",
            "n_types",
            "n_dups",
            ratio(F.col("n_dups").cast("double") / F.col("n_docs")).alias(
                "dup_rate"
            ),
        )
    )
