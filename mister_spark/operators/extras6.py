"""Wave 6: growth-accounting user classification and cross-document
passage (exact-substring) deduplication.

dd_passage_dedup completes the dedup ladder: document-level exact
(dd_exact), near-dup (minhash/simhash/ngram/embedding), and now
sub-document duplicated-passage detection — the RefinedWeb/C4 "exact
substring dedup" stage at passage granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query


@query(
    "ev_new_returning",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
    f AS (SELECT user_id, MIN(day) AS first_day FROM d GROUP BY 1)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(COUNT(*) FILTER (d.day = f.first_day) AS BIGINT) AS n_new,
           CAST(COUNT(*) FILTER (d.day > f.first_day) AS BIGINT) AS n_returning
    FROM d JOIN f ON d.user_id = f.user_id GROUP BY 1
    """,
)
def ev_new_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day, how many active users are seen for
    the first time ever vs returning — the new/returning split every
    product dashboard leads with (and the basis of the fuller
    new/retained/resurrected/churned state machine).

    Scale: dedup to (user, day) first (partial-agg), then first-day is
    a window MIN over the SAME user_id partitioning the dedup shuffle
    produced — no second exchange; the final day rollup is a tiny
    aggregate. The raw stream is touched once."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    d = d.withColumn("first_day", F.min("day").over(W.partitionBy("user_id")))
    return d.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        F.count(F.when(F.col("day") == F.col("first_day"), 1))
        .cast("bigint")
        .alias("n_new"),
        F.count(F.when(F.col("day") > F.col("first_day"), 1))
        .cast("bigint")
        .alias("n_returning"),
    )


CHUNK = 8  # tokens per passage chunk


@query(
    "dd_passage_dedup",
    oracle=f"""
    WITH toks AS (SELECT doc_id,
                         list_filter(string_split(text, ' '), x -> x <> '') AS t
                  FROM documents),
    c AS (SELECT doc_id,
                 array_to_string(t[(i*{CHUNK}+1):(i*{CHUNK}+{CHUNK})], ' ') AS chunk
          FROM toks,
               unnest(generate_series(0, CAST(floor(len(t)/{CHUNK}) AS BIGINT) - 1))
                 AS g(i)
          WHERE len(t) >= {CHUNK}),
    dup AS (SELECT chunk FROM c GROUP BY 1 HAVING COUNT(DISTINCT doc_id) > 1)
    SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(d.chunk) AS BIGINT) AS n_dup,
           FLOOR(CAST(COUNT(d.chunk) AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000
             AS dup_share
    FROM c LEFT JOIN dup d ON c.chunk = d.chunk
    GROUP BY 1
    """,
)
def dd_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document passage duplication: tile each document into
    consecutive 8-token chunks, mark chunks that occur in ≥2 distinct
    documents, and report each document's duplicated-passage share —
    the signal behind exact-substring dedup (RefinedWeb) and
    boilerplate stripping, at the granularity between whole-doc hash
    (dd_exact) and n-gram overlap (dd_ngram_jaccard).

    Scale: chunking is a map-side explode (n/8 rows per doc, NOT n
    like shingling); duplicate detection is one groupBy on the chunk
    key. In production the chunk string is replaced by xxhash64(chunk)
    so the shuffle carries 8-byte keys — kept as the string here so
    the DuckDB oracle is exact. The dup set is usually tiny (true
    boilerplate) and broadcasts back onto the chunk stream."""
    docs = cat(spark, sf_dir)["documents"]
    toks = docs.select("doc_id", tokens().alias("t")).withColumn(
        "n_chunks_raw", F.floor(F.size("t") / CHUNK)
    )
    c = (
        toks.filter(F.col("n_chunks_raw") >= 1)
        .select(
            "doc_id",
            "t",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks_raw") - 1)).alias("i"),
        )
        .select(
            "doc_id",
            F.array_join(F.slice("t", F.col("i") * CHUNK + 1, CHUNK), " ").alias(
                "chunk"
            ),
        )
    )
    dup = (
        c.groupBy("chunk")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("chunk", F.lit(1).alias("is_dup"))
    )
    # no broadcast hint: on boilerplate-heavy corpora the duplicated-
    # chunk set is NOT small, and a forced broadcast would blow driver /
    # executor memory — AQE picks broadcast itself when dup fits the
    # auto threshold, and falls back to a shuffle join when it doesn't
    j = c.join(dup, "chunk", "left")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.count("is_dup").cast("bigint").alias("n_dup"),
        ratio(F.count("is_dup").cast("double") / F.count(F.lit(1))).alias(
            "dup_share"
        ),
    )
