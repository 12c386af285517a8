"""Wave 36: pipeline observability — the quality-gate funnel and the
end-to-end curation pipeline with per-stage attrition.

Individual gates exist as their own keys (tx_quality, tx_code_detect,
dd_exact, ds_contamination); what an operator actually watches is the
FUNNEL — how many documents each gate kills, in order, and what
survives the whole pipeline. Both keys compute every per-doc feature
in one pass and reduce to a handful of integer counters, so the
observability layer costs one extra aggregate, not one extra scan per
gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS, shingles, tokens
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

MIN_TOKENS = 50
MIN_DISTINCT_RATIO = 0.05
MAX_SYM_RATIO = 0.05
MAX_TOP_TOKEN_SHARE = 0.30
E2E_MIN_TOKENS = 30
E2E_BENCH_MOD = 97  # doc_id % mod == 0 plays the benchmark corpus


@query(
    "ds_quality_filter_funnel",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks, text FROM documents),
    mx AS (SELECT doc_id, MAX(c) AS maxc FROM (
             SELECT doc_id, COUNT(*) AS c
             FROM (SELECT doc_id, unnest(toks) AS tk FROM t)
             GROUP BY doc_id, tk)
           GROUP BY 1),
    f AS (SELECT t.doc_id, len(t.toks) AS nt,
                 len(list_distinct(t.toks)) AS ndist,
                 CAST(length(regexp_replace(t.text, '[^{{}}();=\\[\\]<>]', '',
                                            'g')) AS BIGINT) AS nsym,
                 CAST(octet_length(encode(t.text)) AS BIGINT) AS nb,
                 COALESCE(mx.maxc, 0) AS maxc
          FROM t LEFT JOIN mx ON t.doc_id = mx.doc_id),
    p AS (SELECT
            CASE WHEN nt >= {MIN_TOKENS} THEN 1 ELSE 0 END AS p1,
            CASE WHEN nt > 0 AND ndist * 1.0 / nt >= {MIN_DISTINCT_RATIO}
                 THEN 1 ELSE 0 END AS p2,
            CASE WHEN nb > 0 AND nsym * 1.0 / nb <= {MAX_SYM_RATIO}
                 THEN 1 ELSE 0 END AS p3,
            CASE WHEN nt > 0 AND maxc * 1.0 / nt <= {MAX_TOP_TOKEN_SHARE}
                 THEN 1 ELSE 0 END AS p4
          FROM f),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS in1,
                 CAST(SUM(p1) AS BIGINT) AS in2,
                 CAST(SUM(p1 * p2) AS BIGINT) AS in3,
                 CAST(SUM(p1 * p2 * p3) AS BIGINT) AS in4,
                 CAST(SUM(p1 * p2 * p3 * p4) AS BIGINT) AS out4
          FROM p)
    SELECT 'min_tokens' AS gate, in1 AS n_in, in1 - in2 AS n_fail,
           in2 AS n_out FROM s
    UNION ALL SELECT 'distinct_ratio', in2, in2 - in3, in3 FROM s
    UNION ALL SELECT 'symbol_ratio', in3, in3 - in4, in4 FROM s
    UNION ALL SELECT 'top_token_share', in4, in4 - out4, out4 FROM s
    """,
)
def ds_quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-gate funnel: four ordered document gates (minimum
    length, lexical diversity, code-symbol ratio, single-token
    dominance) with per-gate in/fail/out attrition — the observability
    row an operator reads before trusting a curation run (a gate that
    suddenly kills 40% is a bug or a corpus shift, and you want to know
    WHICH gate). Gate ORDER matters operationally (cheapest first), so
    the funnel reports conditional attrition, not marginal rates.

    Scale: one pass computes every per-doc feature (the only shuffle
    is the per-doc top-token rollup), one aggregate folds the gate
    conjunctions into five counters, and the four output rows unpivot
    map-side from that single row."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("doc_id", tokens().alias("toks"), "text").localCheckpoint()
    mx = (
        t.select("doc_id", F.explode("toks").alias("tk"))
        .groupBy("doc_id", "tk")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("maxc"))
    )
    f = t.join(mx, "doc_id", "left").select(
        F.size("toks").alias("nt"),
        F.size(F.array_distinct("toks")).alias("ndist"),
        F.length(F.regexp_replace("text", r"[^{}();=\[\]<>]", ""))
        .cast("long")
        .alias("nsym"),
        F.octet_length("text").cast("long").alias("nb"),
        F.coalesce(F.col("maxc"), F.lit(0)).alias("maxc"),
    )
    nt, nb = F.col("nt"), F.col("nb")
    p1 = F.when(nt >= MIN_TOKENS, 1).otherwise(0)
    p2 = F.when((nt > 0) & (F.col("ndist") / nt >= MIN_DISTINCT_RATIO), 1).otherwise(0)
    p3 = F.when((nb > 0) & (F.col("nsym") / nb <= MAX_SYM_RATIO), 1).otherwise(0)
    p4 = F.when(
        (nt > 0) & (F.col("maxc") / nt <= MAX_TOP_TOKEN_SHARE), 1
    ).otherwise(0)
    s = f.agg(
        F.count(F.lit(1)).cast("bigint").alias("in1"),
        F.sum(p1).cast("bigint").alias("in2"),
        F.sum(p1 * p2).cast("bigint").alias("in3"),
        F.sum(p1 * p2 * p3).cast("bigint").alias("in4"),
        F.sum(p1 * p2 * p3 * p4).cast("bigint").alias("out4"),
    )
    rows = [
        ("min_tokens", "in1", "in2"),
        ("distinct_ratio", "in2", "in3"),
        ("symbol_ratio", "in3", "in4"),
        ("top_token_share", "in4", "out4"),
    ]
    parts = [
        s.select(
            F.lit(gate).alias("gate"),
            F.col(a).alias("n_in"),
            (F.col(a) - F.col(b)).alias("n_fail"),
            F.col(b).alias("n_out"),
        )
        for gate, a, b in rows
    ]
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out


@query(
    "ds_pipeline_e2e",
    oracle=f"""
    WITH t AS (SELECT doc_id, lower(trim(text)) AS norm, {DUCK_TOKENS} AS toks
               FROM documents),
    corpus AS (SELECT * FROM t WHERE doc_id % {E2E_BENCH_MOD} <> 0),
    d1 AS (SELECT corpus.* FROM corpus
           JOIN (SELECT norm, MIN(doc_id) AS keep FROM corpus GROUP BY 1) k
             ON corpus.doc_id = k.keep),
    d2 AS (SELECT * FROM d1 WHERE len(toks) >= {E2E_MIN_TOKENS}),
    sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
                    generate_series(1, len(toks) - 2),
                    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])))
                  AS g
           FROM d2 WHERE len(toks) >= 3),
    bsh AS (SELECT DISTINCT unnest(list_distinct(list_transform(
                    generate_series(1, len(toks) - 2),
                    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])))
                  AS g
            FROM t WHERE doc_id % {E2E_BENCH_MOD} = 0 AND len(toks) >= 3),
    dirty AS (SELECT DISTINCT sh.doc_id FROM sh JOIN bsh ON sh.g = bsh.g),
    d3 AS (SELECT d2.doc_id FROM d2 LEFT JOIN dirty ON d2.doc_id = dirty.doc_id
           WHERE dirty.doc_id IS NULL),
    c AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM corpus) AS n0,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM d1) AS n1,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM d2) AS n2,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM d3) AS n3)
    SELECT 'exact_dedup' AS stage, n0 AS n_in, n1 AS n_out FROM c
    UNION ALL SELECT 'min_length', n1, n2 FROM c
    UNION ALL SELECT 'decontaminate', n2, n3 FROM c
    """,
)
def ds_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline, end to end: exact dedup (keep
    the lowest doc_id per normalized text) → minimum-length gate →
    3-gram decontamination against the benchmark slice — with the
    per-stage survivor counts that make the whole run auditable. This
    is the proof the individual keys COMPOSE: each stage is the same
    logic as its standalone key (dd_exact, ds_length_buckets's gate,
    ds_contamination), chained on one frame.

    Scale: dedup is one shuffle on the normalized-text key (xxhash64
    at 100 TB); the length gate is map-side; decontamination joins
    survivor shingles against the benchmark shingle set (broadcast
    when the bench corpus is small, as here). Stage counts are 1-row
    aggregates — observability costs no extra scan."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select(
        "doc_id", F.lower(F.trim(F.col("text"))).alias("norm"), tokens().alias("toks")
    )
    corpus = t.filter(F.col("doc_id") % E2E_BENCH_MOD != 0).localCheckpoint()
    keep = corpus.groupBy("norm").agg(F.min("doc_id").alias("keep")).select("keep")
    d1 = (
        corpus.join(keep, corpus["doc_id"] == keep["keep"], "inner")
        .select("doc_id", "toks")
        .localCheckpoint()
    )
    d2 = d1.filter(F.size("toks") >= E2E_MIN_TOKENS).localCheckpoint()
    sh = d2.filter(F.size("toks") >= 3).select(
        "doc_id", F.explode(shingles(F.col("toks"))).alias("g")
    )
    bsh = (
        t.filter((F.col("doc_id") % E2E_BENCH_MOD == 0) & (F.size("toks") >= 3))
        .select(F.explode(shingles(F.col("toks"))).alias("g"))
        .distinct()
    )
    dirty = sh.join(F.broadcast(bsh), "g").select("doc_id").distinct()
    d3 = d2.join(dirty, "doc_id", "left_anti")
    n0 = corpus.agg(F.count(F.lit(1)).cast("bigint").alias("n0"))
    n1 = d1.agg(F.count(F.lit(1)).cast("bigint").alias("n1"))
    n2 = d2.agg(F.count(F.lit(1)).cast("bigint").alias("n2"))
    n3 = d3.agg(F.count(F.lit(1)).cast("bigint").alias("n3"))
    c = (
        n0.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(n3))
    )
    a = c.select(
        F.lit("exact_dedup").alias("stage"),
        F.col("n0").alias("n_in"),
        F.col("n1").alias("n_out"),
    )
    b = c.select(
        F.lit("min_length").alias("stage"),
        F.col("n1").alias("n_in"),
        F.col("n2").alias("n_out"),
    )
    d = c.select(
        F.lit("decontaminate").alias("stage"),
        F.col("n2").alias("n_in"),
        F.col("n3").alias("n_out"),
    )
    return a.unionByName(b).unionByName(d)
