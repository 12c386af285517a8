"""Wave 35: the Python extension surface — registered pandas UDFs and
UDTFs callable from SQL, plus explicit cache reuse.

A user migrating imperative jobs needs the escape hatches: a VECTORIZED
scalar function registered into the SQL namespace (pandas UDF — the
Arrow-batched slow path, ~10-100× faster than row-at-a-time Python), a
table function that fans one row into many (Python UDTF — the passage
chunker every retrieval corpus build runs), and the cache() idiom for
reusing an expensive intermediate across two aggregations without
recomputing it. Each carries a DuckDB oracle proving the extension
point computes exactly what the declarative equivalent would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query

TIER_LOW, TIER_MID = 100000.0, 300000.0
CHUNK_TOKENS = 20


@query(
    "sql_pandas_udf",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < {TIER_LOW} THEN 'low'
                WHEN o_totalprice < {TIER_MID} THEN 'mid'
                ELSE 'high' END AS tier,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS revenue
    FROM orders GROUP BY 1
    """,
)
def sql_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A VECTORIZED pandas UDF (`price_tier`) registered into the SQL
    namespace and used from a plain SQL string — the supported path for
    logic that genuinely needs Python (here deliberately trivial so the
    DuckDB oracle can prove the round trip exact). Arrow ships whole
    column batches to one Python worker call, ~10-100× fewer
    serializations than a row-at-a-time udf().

    Scale: the UDF is a narrow map stage feeding a normal partial-agg
    shuffle — the aggregate itself never leaves the JVM. The honest
    cost note: this still breaks whole-stage codegen and pays one
    Arrow round trip; the CASE WHEN form (every other key here) is
    strictly faster when expressible."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    # no type hints: module-level `from __future__ import annotations`
    # stringifies them and pandas_udf can't resolve 'pd.Series'
    @pandas_udf("string")
    def price_tier(p):
        out = pd.Series("high", index=p.index)
        out[p < TIER_MID] = "mid"
        out[p < TIER_LOW] = "low"
        return out

    spark.udf.register("price_tier", price_tier)
    cat(spark, sf_dir).register_views()
    return spark.sql(
        """
        SELECT price_tier(o_totalprice) AS tier,
               CAST(COUNT(*) AS BIGINT) AS n,
               FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS revenue
        FROM orders GROUP BY 1
        """
    )


@query(
    "ds_passage_chunk",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
               FROM documents WHERE trim(text) <> ''),
    ix AS (SELECT doc_id, toks,
                  unnest(generate_series(0, (len(toks) - 1) // {CHUNK_TOKENS}))
                    AS idx
           FROM t)
    SELECT doc_id, CAST(idx AS BIGINT) AS chunk_idx,
           CAST(LEAST({CHUNK_TOKENS}, len(toks) - idx * {CHUNK_TOKENS})
                AS BIGINT) AS n_tok,
           array_to_string(toks[idx * {CHUNK_TOKENS} + 1 :
                                idx * {CHUNK_TOKENS} + {CHUNK_TOKENS}], ' ')
             AS chunk
    FROM ix
    """,
)
def ds_passage_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A Python UDTF registered into the SQL namespace and applied with
    LATERAL: each document fans out into fixed-{CHUNK_TOKENS}-token
    passages (the chunking step every retrieval/RAG corpus build runs
    before embedding). The UDTF is the one-row-to-many-rows escape
    hatch — the table-valued sibling of sql_pandas_udf — and the
    oracle's pure-SQL slicing proves the Python fan-out exact.

    Scale: the UDTF is a narrow per-row expansion (no shuffle at all);
    output is ~n_tokens/{CHUNK_TOKENS} rows per doc. The declarative
    twin (sequence + explode + slice, see the oracle) keeps codegen
    and is preferred when the chunk rule is expressible — the key
    exists to prove the extension surface works."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx bigint, n_tok bigint, chunk string")
    class ChunkDoc:
        def eval(self, doc_id, text):
            toks = text.strip().split()
            if not toks:
                return
            for idx in range(0, (len(toks) - 1) // CHUNK_TOKENS + 1):
                piece = toks[idx * CHUNK_TOKENS : (idx + 1) * CHUNK_TOKENS]
                yield doc_id, idx, len(piece), " ".join(piece)

    spark.udtf.register("chunk_doc", ChunkDoc)
    cat(spark, sf_dir).register_views()
    return spark.sql(
        "SELECT c.* FROM documents, LATERAL chunk_doc(doc_id, text) AS c"
    )


@query(
    "io_cache_reuse",
    oracle=f"""
    WITH r AS (SELECT o_orderpriority,
                      CAST(COUNT(*) AS BIGINT) AS n,
                      SUM(o_totalprice) AS rev
               FROM orders GROUP BY 1)
    SELECT 'n_priorities' AS metric,
           CAST(COUNT(*) AS DOUBLE) AS value FROM r
    UNION ALL
    SELECT 'total_orders', CAST(SUM(n) AS DOUBLE) FROM r
    UNION ALL
    SELECT 'top_priority_share',
           FLOOR(MAX(rev) / SUM(rev) * 10000 + 0.5) / 10000 FROM r
    """,
)
def io_cache_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cache() reuse: an aggregated intermediate is persisted
    once and read by THREE downstream aggregates — the plan shows
    InMemoryTableScan for every branch (pinned in tests/test_wave35.py)
    instead of three replays of the orders scan. cache() vs
    localCheckpoint: cache keeps lineage (recomputable on eviction)
    and is storage-level tunable; checkpoint truncates lineage. Spark
    dedups the cache entry by plan, so repeated calls reuse one copy.

    Scale: the cached frame is #priorities rows — the pattern matters
    when the shared intermediate is expensive, not large; for large
    shared frames prefer MEMORY_AND_DISK or a staged write."""
    orders = cat(spark, sf_dir)["orders"]
    r = (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("o_totalprice").alias("rev"),
        )
        .cache()
    )
    a = r.agg(F.count(F.lit(1)).cast("double").alias("value")).select(
        F.lit("n_priorities").alias("metric"), "value"
    )
    b = r.agg(F.sum("n").cast("double").alias("value")).select(
        F.lit("total_orders").alias("metric"), "value"
    )
    c = r.agg(
        ratio(F.max("rev") / F.sum("rev")).alias("value")
    ).select(F.lit("top_priority_share").alias("metric"), "value")
    return a.unionByName(b).unionByName(c)
