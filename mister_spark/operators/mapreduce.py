"""MapReduce core family — the reference (Jaymon/mister) parity surface.

Each operator is the Spark-native form of a mister map/reduce shape;
``mr_class_api`` additionally routes the flagship wordcount through the
3-phase ``mister_spark.mr.MrJob`` compatibility class.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from mister_spark.mr import MrJob
from mister_spark.operators.common import DUCK_TOKENS, cat, money, tokens
from mister_spark.registry import query

WORDCOUNT_ORACLE = f"""
    WITH t AS (SELECT {DUCK_TOKENS} AS toks FROM documents)
    SELECT unnest(toks) AS token FROM t
"""


@query(
    "mr_wordcount",
    oracle=f"""
    SELECT token, COUNT(*) AS n
    FROM ({WORDCOUNT_ORACLE})
    GROUP BY token
    """,
)
def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mister's flagship example (tokenize → count), Spark-native:
    flatMap = explode (JVM), reduceByKey = groupBy.count with automatic
    map-side combine. No Python in the loop."""
    docs = cat(spark, sf_dir)["documents"]
    return (
        docs.select(F.explode(tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "mr_map_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS rev
    FROM lineitem
    """,
)
def mr_map_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure map phase: elementwise derived column, zero shuffles."""
    li = cat(spark, sf_dir)["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        money(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )


@query(
    "mr_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE l_quantity >= 45 AND l_discount > 0.05
    """,
)
def mr_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate filter; both predicates push down into the parquet scan."""
    li = cat(spark, sf_dir)["lineitem"]
    return li.filter((F.col("l_quantity") >= 45) & (F.col("l_discount") > 0.05)).select(
        "l_orderkey", "l_linenumber"
    )


@query(
    "mr_reduce_by_key",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders, FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 AS total
    FROM orders GROUP BY o_custkey
    """,
)
def mr_reduce_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed fold — mister's reduce, but distributed with map-side
    partial aggregation instead of a single driver loop."""
    orders = cat(spark, sf_dir)["orders"]
    return orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"), money(F.sum("o_totalprice")).alias("total")
    )


@query(
    "mr_global_fold",
    oracle="""
    SELECT COUNT(*) AS n, FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 AS total,
           FLOOR((MIN(o_totalprice)) * 100 + 0.5) / 100 AS lo, FLOOR((MAX(o_totalprice)) * 100 + 0.5) / 100 AS hi
    FROM orders
    """,
)
def mr_global_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global fold of all partitions into one row (tree-aggregated)."""
    orders = cat(spark, sf_dir)["orders"]
    return orders.agg(
        F.count(F.lit(1)).alias("n"),
        money(F.sum("o_totalprice")).alias("total"),
        money(F.min("o_totalprice")).alias("lo"),
        money(F.max("o_totalprice")).alias("hi"),
    )


@query(
    "mr_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def mr_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = cat(spark, sf_dir)["lineitem"]
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "mr_sort_top",
    oracle="""
    SELECT o_orderkey, FLOOR((o_totalprice) * 100 + 0.5) / 100 AS total
    FROM orders
    ORDER BY FLOOR((o_totalprice) * 100 + 0.5) / 100 DESC, o_orderkey
    LIMIT 15
    """,
)
def mr_sort_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: sort+limit compiles to TakeOrdered (per-partition
    heaps + driver merge), not a full global sort."""
    orders = cat(spark, sf_dir)["orders"]
    return (
        orders.select("o_orderkey", money(F.col("o_totalprice")).alias("total"))
        .orderBy(F.desc("total"), "o_orderkey")
        .limit(15)
    )


class WordCountJob(MrJob):
    """The canonical mister job through the 3-phase class API: Python
    map (tokenize, via Arrow batches), declarative reduce (count)."""

    map_schema = "token string"
    reduce_keys = ("token",)

    def map(self, batch: pd.DataFrame) -> pd.DataFrame:  # noqa: A003
        toks = batch["text"].str.split(" ").explode()
        toks = toks[toks != ""]
        return pd.DataFrame({"token": toks})

    def reduce_exprs(self) -> list[Column]:
        return [F.count(F.lit(1)).alias("n")]


@query(
    "mr_class_api",
    oracle=f"""
    SELECT token, COUNT(*) AS n
    FROM ({WORDCOUNT_ORACLE})
    GROUP BY token
    """,
)
def mr_class_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wordcount routed through MrJob (mister's prepare/map/reduce
    shape): mapInPandas tokenize + distributed keyed count."""
    docs = cat(spark, sf_dir)["documents"].select("text")
    return WordCountJob().run(spark, docs)
