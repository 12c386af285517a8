"""Fourth wave: profit rollup, excess-supplier semi-join, near-dup
connected components, normalized-text dedup."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, money, revenue, ts
from mister_spark.operators.dedup import DD_NGRAM_ORACLE
from mister_spark.registry import query


@query(
    "q9_profit_proxy",
    oracle="""
    SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           FLOOR((SUM(l_extendedprice * (1 - l_discount)
                      - 0.6 * l_quantity * p_retailprice)) * 100 + 0.5) / 100 AS profit
    FROM lineitem JOIN orders   ON o_orderkey = l_orderkey
                  JOIN part     ON p_partkey  = l_partkey
                  JOIN supplier ON s_suppkey  = l_suppkey
                  JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY 1, 2
    """,
)
def q9_profit_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-adapted (no ps_supplycost column: cost proxied as 60% of
    retail price): profit per supplier nation per order year."""
    c = cat(spark, sf_dir)
    profit = revenue() - 0.6 * F.col("l_quantity") * F.col("p_retailprice")
    return (
        c["lineitem"]
        .join(c["orders"].select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c["part"].select("p_partkey", "p_retailprice")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(c["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(money(F.sum(profit)).alias("profit"))
    )


@query(
    "q20_excess_suppliers",
    oracle="""
    WITH part_qty AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2),
    tot AS (SELECT l_partkey, SUM(sq) AS tq FROM part_qty GROUP BY 1)
    SELECT s_suppkey, s_name, COUNT(*) AS n_dominated_parts
    FROM part_qty JOIN tot USING (l_partkey)
                  JOIN supplier ON s_suppkey = l_suppkey
    WHERE sq > 0.5 * tq
    GROUP BY 1, 2
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-adapted: suppliers who shipped >50% of a part's yearly volume
    (two aggregations over one scan, reusing the first's shuffle)."""
    c = cat(spark, sf_dir)
    pq = (
        c["lineitem"]
        .filter(
            (F.col("l_shipdate") >= ts("1997-01-01"))
            & (F.col("l_shipdate") < ts("1998-01-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
    )
    tot = pq.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    return (
        pq.join(tot, "l_partkey")
        .filter(F.col("sq") > 0.5 * F.col("tq"))
        .join(F.broadcast(c["supplier"].select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
    )


@query(
    "tx_normalized_dedup",
    oracle="""
    WITH norm AS (
      SELECT doc_id,
             regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS ntext
      FROM documents)
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM norm GROUP BY ntext
    """,
)
def tx_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup on NORMALIZED text (lowercase, strip non-alphanumerics) —
    catches trivial near-dups exact hashing misses. Same hash-grouped
    shuffle as dd_exact."""
    docs = cat(spark, sf_dir)["documents"]
    ntext = F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", "")
    return (
        docs.select("doc_id", F.xxhash64(ntext).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
    )


CC_ITERS = 6


@query(
    "dd_clusters",
    # Real oracle: reuse dd_ngram_jaccard's pair SQL as the edge list,
    # then transitive-closure min-label reachability (UNION-distinct
    # recursion) — the fixpoint the Spark loop's min-label propagation
    # reaches (it now stops at convergence, capped at {CC_ITERS}
    # rounds; near-dup components are tiny, so diameter << the cap;
    # pytest pins equality to union-find). Integer output.
    oracle=f"""
    WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ({DD_NGRAM_ORACLE})),
    sym AS (SELECT DISTINCT a, b FROM (
              SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs)),
    reach AS (
      SELECT a AS node, a AS lab FROM sym
      UNION
      SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
    )
    SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node
    """,
)
def dd_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the ≥0.5-Jaccard
    pair graph via label propagation (each node adopts the min label in
    its neighborhood; converges in ≤ graph-diameter iterations). This is
    the step real dedup pipelines need after pair detection — 'keep one
    doc per component', not per pair.

    Scale: each iteration is one join + one min-aggregate over the edge
    list; lineage checkpointed per iteration, and the loop STOPS at its
    fixpoint (no label changed — a limit(1) probe on the materialized
    frame) instead of always running the full round cap. Components
    here are tiny (near-dup groups), so diameter — and the rounds
    actually executed — stays small."""
    from mister_spark.operators.dedup import dd_ngram_jaccard

    pairs = dd_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b").localCheckpoint()
    # undirected edge list, both directions
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("doc_a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(CC_ITERS):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.node)
            .groupBy(F.col("doc_a").alias("n2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(neighbor_min, labels.node == F.col("n2"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
            .localCheckpoint()
        )
        # early termination: once no node adopted a smaller label the
        # fixpoint is reached (min-label propagation is monotone), so
        # the remaining fixed-count rounds would be identity passes —
        # the convergence count scans the just-materialized frame only
        if labels.filter(F.col("changed")).limit(1).count() == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
