"""Training-data pipeline wave 2: sequence packing, deterministic
corpus shuffle, spend deciles, and benchmark decontamination.

These fill out the tokenizer-facing end of a pretraining pipeline: lay
documents out into fixed-token training sequences (concat-and-chunk, the
GPT-2-style packing every large run uses), shuffle the corpus into a
reproducible training order, and drop documents that leak evaluation
benchmarks (n-gram decontamination, Brown et al. 2020 §4 methodology).
Everything is JVM-side column expressions; the only Python is none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from mister_spark.functions.text import DUCK_TOKENS, bigrams, tokens, trigrams
from mister_spark.operators.pipeline import STOPWORDS
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

SEQ_LEN = 2048  # tokens per packed training sequence
PACK_SHARDS = 16  # independent packing streams (≙ writer tasks at scale)
SHUFFLE_SEED = "42"
BENCH_MOD = 97  # doc_id % BENCH_MOD == 0 plays the "benchmark" corpus


@query(
    "ds_pack",
    oracle=f"""
    WITH t AS (SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
                      CAST(len({DUCK_TOKENS}) AS BIGINT) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, shard, n_tokens,
                 CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                      AS BIGINT) AS cum
          FROM t WHERE n_tokens >= 1)
    SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
           CAST(FLOOR((cum - n_tokens) / {SEQ_LEN}.0) AS BIGINT) AS seq_start,
           CAST(FLOOR((cum - 1) / {SEQ_LEN}.0) AS BIGINT) AS seq_end
    FROM c
    """,
)
def ds_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing layout: concatenate each
    shard's documents in doc_id order and cut the token stream into
    SEQ_LEN-token training sequences; emit, per document, the range of
    sequence indices it lands in. This is the standard packing used by
    GPT-2/3-style pretraining (documents may straddle a boundary).

    Scale: the window is partitioned by shard, so the running sum is
    PACK_SHARDS independent sorted streams — no global sort, no single
    reducer. At 100 TB you raise PACK_SHARDS to O(writer tasks) (each
    shard becomes one output file sequence) and the plan shape is
    unchanged; the cumsum is one shuffle on a uniform synthetic key."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).cast("bigint").alias("shard"),
        F.size(tokens()).cast("bigint").alias("n_tokens"),
    ).filter(F.col("n_tokens") >= 1)
    w = Window.partitionBy("shard").orderBy("doc_id")
    c = t.withColumn("cum", F.sum("n_tokens").over(w).cast("bigint"))
    return c.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / float(SEQ_LEN))
        .cast("bigint")
        .alias("seq_start"),
        F.floor((F.col("cum") - 1) / float(SEQ_LEN)).cast("bigint").alias("seq_end"),
    )


@query(
    "ds_global_shuffle",
    oracle=f"""
    WITH h AS (SELECT doc_id,
                      md5(CAST(doc_id AS VARCHAR) || ':{SHUFFLE_SEED}') AS hx
               FROM documents),
    s AS (SELECT doc_id, hx,
                 CAST(ascii(substr(hx, 1, 1)) % 8 AS BIGINT) AS shard
          FROM h)
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id)
                AS BIGINT) AS pos
    FROM s
    """,
)
def ds_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic, reproducible corpus shuffle for training order:
    key every document by md5(doc_id || seed), route it to a shard by
    the hash's first byte, and number it within the shard by hash
    order. (shard, pos) is a total training order that any worker can
    recompute from the seed alone — no stored permutation.

    Scale: per-shard row_number is a window over hash-partitioned,
    hash-sorted data — 8 (or at 100 TB, thousands of) independent
    sorted streams, never a global single-partition sort. Re-seeding
    re-shuffles with zero data movement beyond the one shuffle."""
    docs = cat(spark, sf_dir)["documents"]
    h = docs.select(
        "doc_id",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{SHUFFLE_SEED}"))).alias(
            "hx"
        ),
    )
    s = h.withColumn(
        "shard", (F.ascii(F.substring("hx", 1, 1)) % 8).cast("bigint")
    )
    w = Window.partitionBy("shard").orderBy("hx", "doc_id")
    return s.select(
        "doc_id", "shard", F.row_number().over(w).cast("bigint").alias("pos")
    )


@query(
    "w_ntile_deciles",
    oracle="""
    WITH s AS (SELECT o_custkey AS custkey,
                      FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS spend
               FROM orders GROUP BY 1)
    SELECT custkey, spend,
           CAST(ntile(10) OVER (ORDER BY spend DESC, custkey) AS BIGINT)
             AS decile
    FROM s
    """,
)
def w_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend deciles via ntile(10), ordered by rounded spend
    with custkey tiebreak so both engines cut identical tiles.

    Scale: ntile over a global order is a range-partitioned sort (fine)
    but a single-partition window (not fine at 100 TB) — the scale path
    is approx_percentile boundaries (stat_approx_percentiles) broadcast
    back as a bucket join, trading exact tile sizes for full
    parallelism. This operator is the exact small-dim form."""
    orders = cat(spark, sf_dir)["orders"]
    s = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        rnd(F.sum("o_totalprice"), 2).alias("spend")
    )
    w = Window.orderBy(F.desc("spend"), "custkey")
    return s.select(
        "custkey", "spend", F.ntile(10).over(w).cast("bigint").alias("decile")
    )


@query(
    "ds_contamination",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct(list_transform(
                      generate_series(1, len(toks) - 2),
                      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
                    AS gs
           FROM t WHERE len(toks) >= 3),
    ex AS (SELECT doc_id, unnest(gs) AS g FROM sh),
    bench AS (SELECT DISTINCT g FROM ex WHERE doc_id % {BENCH_MOD} = 0),
    ev AS (SELECT doc_id, g FROM ex WHERE doc_id % {BENCH_MOD} <> 0),
    hit AS (SELECT ev.doc_id, CAST(COUNT(*) AS BIGINT) AS hits
            FROM ev JOIN bench USING (g) GROUP BY ev.doc_id),
    tot AS (SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_shingles
            FROM sh WHERE doc_id % {BENCH_MOD} <> 0)
    SELECT tot.doc_id, tot.n_shingles,
           CAST(COALESCE(hit.hits, 0) AS BIGINT) AS hits,
           FLOOR(CAST(COALESCE(hit.hits, 0) AS DOUBLE) / tot.n_shingles
                 * 10000 + 0.5) / 10000 AS contamination
    FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id
    """,
)
def ds_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: for every training document, the
    share of its distinct token 3-gram shingles that also appear in the
    "benchmark" corpus (here: docs with doc_id % BENCH_MOD == 0 stand
    in for an eval set). Real pipelines gate on contamination > 0 with
    8-13-gram shingles (Brown et al. 2020 appendix C); 3-grams keep the
    synthetic short docs meaningfully overlapping.

    Scale: the benchmark shingle set is small by construction (eval
    suites, not crawl data), so the membership probe is a broadcast
    hash join against an exploded shingle stream — one narrow scan, no
    shuffle of the corpus side; the per-doc count is a partial-agg
    groupBy on doc_id."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("doc_id", tokens().alias("toks")).filter(F.size("toks") >= 3)
    sh = t.select("doc_id", F.array_distinct(trigrams(F.col("toks"))).alias("gs"))
    ex = sh.select("doc_id", F.explode("gs").alias("g"))
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench = ex.filter(is_bench).select("g").distinct()
    ev = ex.filter(~is_bench)
    hit = (
        ev.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("hits"))
    )
    tot = sh.filter(~is_bench).select(
        "doc_id", F.size("gs").cast("bigint").alias("n_shingles")
    )
    joined = tot.join(hit, "doc_id", "left")
    hits = F.coalesce(F.col("hits"), F.lit(0)).cast("bigint")
    return joined.select(
        "doc_id",
        "n_shingles",
        hits.alias("hits"),
        ratio(hits.cast("double") / F.col("n_shingles")).alias("contamination"),
    )


REP_SHARE_MAX = 0.1  # top-bigram share gate
REP_DUP_MAX = 0.05  # duplicate-trigram ratio gate


@query(
    "ds_curate",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {DUCK_TOKENS} AS toks FROM documents),
    base AS (SELECT doc_id, text, toks,
                    CAST(len(toks) AS BIGINT) AS n,
                    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(toks, x -> len(x))), (a, b) -> a + b)
                         AS DOUBLE) / len(toks) AS mean_len,
                    len(list_filter(toks,
                          x -> list_contains(['the','a','of','and','to','in'], x)))
                      AS stop_hits
             FROM t WHERE len(toks) >= 1),
    big AS (SELECT doc_id,
                   list_transform(generate_series(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i + 1]) AS bg,
                   list_transform(generate_series(1, len(toks) - 2),
                                  i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS tg
            FROM base WHERE n >= 3),
    cnt AS (SELECT doc_id, bigram, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(bg) AS bigram FROM big) GROUP BY 1, 2),
    rep AS (SELECT cnt.doc_id,
                   CAST(MAX(cnt.c) AS DOUBLE) / SUM(cnt.c) AS share,
                   ANY_VALUE(d.dup) AS dup
            FROM cnt JOIN (SELECT doc_id,
                                  CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE)
                                    / len(tg) AS dup
                           FROM big) d ON cnt.doc_id = d.doc_id
            GROUP BY 1),
    sh AS (SELECT doc_id, list_distinct(tg) AS gs FROM big),
    ex AS (SELECT doc_id, unnest(gs) AS g FROM sh),
    bench AS (SELECT DISTINCT g FROM ex WHERE doc_id % {BENCH_MOD} = 0),
    hit AS (SELECT ex.doc_id, COUNT(*) AS hits
            FROM ex JOIN bench USING (g)
            WHERE ex.doc_id % {BENCH_MOD} <> 0 GROUP BY 1),
    dd AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS keep_id
           FROM base)
    SELECT base.doc_id, base.n AS n_tokens,
           CAST(CASE WHEN base.n BETWEEN 30 AND 50000
                      AND base.mean_len BETWEEN 2 AND 12
                      AND base.stop_hits >= 1 THEN 1 ELSE 0 END AS INTEGER)
             AS g_quality,
           CAST(CASE WHEN base.n < 3 OR (rep.share < {REP_SHARE_MAX}
                      AND rep.dup < {REP_DUP_MAX}) THEN 1 ELSE 0 END AS INTEGER)
             AS g_rep,
           CAST(CASE WHEN dd.keep_id = base.doc_id THEN 1 ELSE 0 END AS INTEGER)
             AS g_dedup,
           CAST(CASE WHEN COALESCE(hit.hits, 0) = 0 THEN 1 ELSE 0 END AS INTEGER)
             AS g_decontam,
           CAST(CASE WHEN base.doc_id % {BENCH_MOD} = 0 THEN 1 ELSE 0 END
                AS INTEGER) AS is_bench,
           CAST(CASE WHEN base.n BETWEEN 30 AND 50000
                      AND base.mean_len BETWEEN 2 AND 12
                      AND base.stop_hits >= 1
                      AND (base.n < 3 OR (rep.share < {REP_SHARE_MAX}
                           AND rep.dup < {REP_DUP_MAX}))
                      AND dd.keep_id = base.doc_id
                      AND COALESCE(hit.hits, 0) = 0
                      AND base.doc_id % {BENCH_MOD} <> 0
                 THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM base
    LEFT JOIN rep ON base.doc_id = rep.doc_id
    LEFT JOIN hit ON base.doc_id = hit.doc_id
    JOIN dd ON base.doc_id = dd.doc_id
    """,
)
def ds_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pipeline as ONE declarative plan:
    Gopher-style quality gate ∧ repetition gate ∧ exact-dedup
    canonicalization ∧ benchmark decontamination, emitted as per-gate
    bits + the final keep decision for every document. This is the
    flagship composition — each gate is the same logic as its
    standalone operator (tx_gopher_quality, tx_repetition, dd_exact,
    ds_contamination), fused so Catalyst shares the single corpus scan
    and schedules the gates' shuffles independently.

    Scale: per-row gates (quality) are pure codegen; repetition
    shuffles on (doc_id, bigram); dedup canonicalizes with a window
    over the text key (at 100 TB: xxhash64(text) — 8-byte shuffle
    rows, same plan); decontamination broadcasts the eval-set shingle
    index. No gate blocks another — the plan is a DAG of independent
    branches joined back on doc_id, so the critical path is the
    slowest gate, not the sum."""
    docs = cat(spark, sf_dir)["documents"]
    base = (
        docs.select("doc_id", "text", tokens().alias("toks"))
        .filter(F.size("toks") >= 1)
        .select(
            "doc_id",
            "text",
            "toks",
            F.size("toks").cast("bigint").alias("n"),
            (
                F.aggregate(
                    F.transform(F.col("toks"), F.length),
                    F.lit(0).cast("bigint"),
                    lambda a, b: a + b,
                ).cast("double")
                / F.size("toks")
            ).alias("mean_len"),
            F.size(
                F.filter(
                    F.col("toks"),
                    lambda x: F.array_contains(
                        F.array(*[F.lit(w) for w in STOPWORDS]), x
                    ),
                )
            ).alias("stop_hits"),
        )
    )
    big = base.filter(F.col("n") >= 3).select(
        "doc_id", bigrams(F.col("toks")).alias("bg"), trigrams(F.col("toks")).alias("tg")
    )
    rep = (
        big.select("doc_id", F.explode("bg").alias("bigram"),
                   ((F.size("tg") - F.size(F.array_distinct("tg"))).cast("double")
                    / F.size("tg")).alias("dup"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"), F.first("dup").alias("dup"))
        .groupBy("doc_id")
        .agg(
            (F.max("c").cast("double") / F.sum("c")).alias("share"),
            F.first("dup").alias("dup"),
        )
    )
    ex = big.select("doc_id", F.explode(F.array_distinct("tg")).alias("g"))
    is_bench_ex = F.col("doc_id") % BENCH_MOD == 0
    bench = ex.filter(is_bench_ex).select("g").distinct()
    hit = (
        ex.filter(~is_bench_ex)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    from pyspark.sql import Window

    keep_id = F.min("doc_id").over(Window.partitionBy("text"))
    dd = base.select("doc_id", keep_id.alias("keep_id"))
    j = (
        base.join(rep, "doc_id", "left")
        .join(hit, "doc_id", "left")
        .join(dd, "doc_id")
    )
    as_int = lambda c: F.when(c, 1).otherwise(0).cast("int")  # noqa: E731
    g_quality = (
        F.col("n").between(30, 50000)
        & F.col("mean_len").between(2, 12)
        & (F.col("stop_hits") >= 1)
    )
    g_rep = (F.col("n") < 3) | (
        (F.col("share") < REP_SHARE_MAX) & (F.col("dup") < REP_DUP_MAX)
    )
    g_dedup = F.col("keep_id") == F.col("doc_id")
    g_decontam = F.coalesce(F.col("hits"), F.lit(0)) == 0
    not_bench = F.col("doc_id") % BENCH_MOD != 0
    return j.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        as_int(g_quality).alias("g_quality"),
        as_int(g_rep).alias("g_rep"),
        as_int(g_dedup).alias("g_dedup"),
        as_int(g_decontam).alias("g_decontam"),
        as_int(~not_bench).alias("is_bench"),
        as_int(g_quality & g_rep & g_dedup & g_decontam & not_bench).alias("keep"),
    )
