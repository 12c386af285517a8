"""Wave 122: signed-rank testing, safe SQL templating, and n-gram
coverage curves.

stat_wilcoxon_signed_rank upgrades the sign test with magnitude
information — ranks of |differences| with tie-aware midranks on the
two-phase machinery — the standard paired nonparametric test;
sql_identifier_clause pins IDENTIFIER(): parameterizing table and
column NAMES without string-splicing SQL (the injection-safe
templating Spark 3.4+ added); tx_ngram_coverage draws the coverage
curve — what share of all bigram occurrences the top-10/100/500
bigrams account for — the corpus-redundancy read that sizes
stop-list and cache decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum, global_rank
from mister_spark.functions.text import DUCK_TOKENS, bigrams, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

SPLIT_DATE = "1998-01-01"  # same paired split as stat_paired_ttest
COV_KS = (10, 100, 500)


@query(
    "stat_wilcoxon_signed_rank",
    oracle=f"""
    WITH p AS (SELECT o_custkey,
                 SUM(CASE WHEN o_orderdate < TIMESTAMP '{SPLIT_DATE}'
                          THEN o_totalprice ELSE 0 END) AS a,
                 SUM(CASE WHEN o_orderdate >= TIMESTAMP '{SPLIT_DATE}'
                          THEN o_totalprice ELSE 0 END) AS b,
                 SUM(CASE WHEN o_orderdate < TIMESTAMP '{SPLIT_DATE}'
                          THEN 1 ELSE 0 END) AS n1,
                 SUM(CASE WHEN o_orderdate >= TIMESTAMP '{SPLIT_DATE}'
                          THEN 1 ELSE 0 END) AS n2
          FROM orders GROUP BY 1),
    d AS (SELECT o_custkey,
                 FLOOR((b - a) * 100 + 0.5) AS dc
          FROM p WHERE n1 > 0 AND n2 > 0),
    nz AS (SELECT o_custkey, dc, ABS(dc) AS ad FROM d WHERE dc <> 0),
    rk AS (SELECT dc,
                  RANK() OVER (ORDER BY ad)
                    + (COUNT(*) OVER (PARTITION BY ad) - 1) / 2.0 AS r
           FROM nz),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(CASE WHEN dc > 0 THEN r ELSE 0 END) AS wplus
          FROM rk)
    SELECT CAST(n AS BIGINT) AS n,
           FLOOR(wplus * 100 + 0.5) / 100 AS w_plus,
           FLOOR((wplus - n * (n + 1) / 4)
                 / SQRT(n * (n + 1) * (2 * n + 1) / 24) * 10000 + 0.5)
             / 10000 AS z
    FROM s
    """,
)
def stat_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on the same paired spend changes as
    stat_paired_ttest / stat_sign_test: rank |differences| (integer
    cents — exact midranks), sum the ranks of positive changes, and
    normalize — magnitude-aware where the sign test isn't, robust
    where the paired t isn't. The trio now spans the paired-design
    robustness spectrum.

    Scale: the pair rollup is one shuffle; |d| ranks come from
    `global_rank` with midranks reconstructed by the partitioned
    min/count window (the spearman pattern); the statistic is one
    aggregate."""
    orders = cat(spark, sf_dir)["orders"]
    split = F.lit(SPLIT_DATE).cast("timestamp")
    p = orders.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.col("o_orderdate") < split, F.col("o_totalprice")).otherwise(
                0.0
            )
        ).alias("a"),
        F.sum(
            F.when(
                F.col("o_orderdate") >= split, F.col("o_totalprice")
            ).otherwise(0.0)
        ).alias("b"),
        F.sum(F.when(F.col("o_orderdate") < split, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("o_orderdate") >= split, 1).otherwise(0)).alias(
            "n2"
        ),
    )
    d = (
        p.filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .select(
            "o_custkey",
            F.floor((F.col("b") - F.col("a")) * 100 + F.lit(0.5)).alias("dc"),
        )
        .filter(F.col("dc") != 0)
        .withColumn("ad", F.abs("dc"))
    )
    r1 = global_rank(d, "ad", "o_custkey", rank_col="_rn")
    rk = r1.withColumn(
        "r",
        F.min("_rn").over(W.partitionBy("ad"))
        + (F.count(F.lit(1)).over(W.partitionBy("ad")) - 1) / 2.0,
    )
    s = rk.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("dc") > 0, F.col("r")).otherwise(0.0)).alias(
            "wplus"
        ),
    )
    n = F.col("n")
    z = (F.col("wplus") - n * (n + 1) / 4) / F.sqrt(
        n * (n + 1) * (2 * n + 1) / 24
    )
    return s.select(
        n.cast("bigint").alias("n"),
        (F.floor(F.col("wplus") * 100 + 0.5) / 100).alias("w_plus"),
        ratio(z).alias("z"),
    )


@query(
    "sql_identifier_clause",
    oracle="""
    SELECT 'o_orderpriority' AS grouped_by,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS groups,
           CAST(COUNT(*) AS BIGINT) AS rows_in
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM orders
    """,
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() templating surface: the same parameterized query
    runs against two different COLUMN names passed as values — no
    f-string SQL splicing, no injection surface, full Catalyst
    resolution. The safe way to write 'group by a configurable
    column' jobs.

    Scale: identical plans to the hand-written queries — IDENTIFIER
    resolves at analysis time."""
    c = cat(spark, sf_dir)
    c["orders"].createOrReplaceTempView("_ident_orders")
    out = None
    for colname in ("o_orderpriority", "o_orderstatus"):
        r = spark.sql(
            """
            SELECT :name AS grouped_by,
                   CAST(COUNT(DISTINCT IDENTIFIER(:name)) AS BIGINT)
                     AS groups,
                   CAST(COUNT(*) AS BIGINT) AS rows_in
            FROM _ident_orders
            """,
            args={"name": colname},
        )
        out = r if out is None else out.unionByName(r)
    return out


@query(
    "tx_ngram_coverage",
    oracle=f"""
    WITH t AS (SELECT {DUCK_TOKENS} AS toks FROM documents),
    bg AS (SELECT toks[i] || ' ' || toks[i+1] AS g
           FROM t, generate_series(1, 4096) s(i)
           WHERE i <= len(toks) - 1),
    cnt AS (SELECT g, CAST(COUNT(*) AS DOUBLE) AS c FROM bg GROUP BY 1),
    tot AS (SELECT SUM(c) AS n,
                   CAST(COUNT(*) AS BIGINT) AS vocab FROM cnt),
    rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, g) AS r FROM cnt),
    cum AS (SELECT r, SUM(c) OVER (ORDER BY r) AS cc FROM rk)
    SELECT v.k,
           FLOOR((SELECT cc FROM cum WHERE r = LEAST(v.k, tot.vocab))
                 / tot.n * 10000 + 0.5) / 10000 AS coverage,
           tot.vocab AS bigram_vocab
    FROM (VALUES {", ".join(f"({k})" for k in COV_KS)}) v(k), tot
    """,
)
def tx_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram coverage curve: the share of ALL bigram occurrences
    accounted for by the top-10/100/500 bigrams — steep curves mean a
    tiny cache/stop-list captures most of the mass; flat curves mean
    long-tail processing dominates. The number behind hot-shingle
    caps and phrase-cache sizing.

    Scale: bigram counts are one shuffle; the rank is `global_rank`
    over the |vocab| frame and the running mass is `bucketed_cumsum`
    — no single-task sort; the k probes broadcast."""
    bg = bigrams(tokens())
    cnt = (
        cat(spark, sf_dir)["documents"]
        .select(F.explode(bg).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .localCheckpoint()
    )
    tot = cnt.agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
    )
    rk = global_rank(cnt, F.col("c").desc(), "g", rank_col="r")
    cum = bucketed_cumsum(rk.select("r", "c"), "r", {"cc": F.col("c")})
    ks = spark.createDataFrame([(k,) for k in COV_KS], "k int")
    picks = (
        cum.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("r") == F.least(F.col("k"), F.col("vocab")))
        .select(
            F.col("k").cast("bigint").alias("k"),
            ratio(F.col("cc") / F.col("n")).alias("coverage"),
            F.col("vocab").alias("bigram_vocab"),
        )
    )
    return picks


tx_ngram_coverage.__doc__ = tx_ngram_coverage.__doc__
