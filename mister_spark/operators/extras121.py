"""Wave 121: chunk-boundary overlap dedup, full core decomposition,
and partition-count advising.

dd_boundary_overlap finds document pairs where one document's tail
equals another's head (3-token windows matched by the shared
polynomial fingerprint, then verified exactly) — the overlap mode
sliding-window chunking produces and whole-doc dedup never sees;
graph_core_decomposition peels the co-purchase graph into its full
core-number hierarchy (not just one k) — the standard cohesion
profile; io_partition_advisor turns table bytes into a concrete
shuffle-partition recommendation against the configured target size
— the number everyone sets by folklore, derived from the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.hashing import FP_MOD, FP_MUL, rolling_fingerprint
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import (
    DUCK_COPURCHASE_SYM,
    _copurchase_edges,
)
from mister_spark.registry import query

BO_W = 3  # boundary window (tokens; small vocab => short joins realistic)
TARGET_PART_BYTES = 128 * 1024 * 1024


_DUCK_FP = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform({arr}, x -> CAST(ascii(x) * 131 + len(x) AS BIGINT))),"
    f" (a, b) -> (a * {FP_MUL} + b) % {FP_MOD})"
)


@query(
    "dd_boundary_overlap",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents
               WHERE len({DUCK_TOKENS}) >= {BO_W}),
    ends AS (SELECT doc_id,
                    toks[1 : {BO_W}] AS head,
                    toks[len(toks) - {BO_W} + 1 : len(toks)] AS tail
             FROM t),
    fp AS (SELECT doc_id,
                  {_DUCK_FP.format(arr="head")} AS head_fp,
                  {_DUCK_FP.format(arr="tail")} AS tail_fp,
                  head, tail
           FROM ends),
    cand AS (SELECT a.doc_id AS doc_tail, b.doc_id AS doc_head,
                    a.tail AS wa, b.head AS wb
             FROM fp a JOIN fp b ON a.tail_fp = b.head_fp
                               AND a.doc_id <> b.doc_id),
    ver AS (SELECT doc_tail, doc_head FROM cand WHERE wa = wb)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS candidate_pairs,
           CAST(COUNT(*) AS BIGINT) AS verified_pairs,
           CAST(COUNT(DISTINCT doc_tail) AS BIGINT) AS docs_with_overlap
    FROM ver
    """,
)
def dd_boundary_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-boundary overlap detection: pairs where document A's
    last {w} tokens exactly equal document B's first {w} — the
    signature of sliding-window chunking (or copy-paste continuation)
    that whole-document dedup and shingle Jaccard both under-weight.
    Candidates come from an equi-join on the shared polynomial
    fingerprint of the window; exact token equality verifies.

    Scale: two fingerprints per doc (narrow JVM reduce), one
    fingerprint equi-join — candidate-bounded, never all-pairs;
    verification touches only candidates."""
    toks = tokens()
    t = (
        cat(spark, sf_dir)["documents"]
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= BO_W)
    )
    n = F.size("toks")
    ends = t.select(
        "doc_id",
        F.slice("toks", 1, BO_W).alias("head"),
        F.slice("toks", n - BO_W + 1, BO_W).alias("tail"),
    )
    fp = ends.select(
        "doc_id",
        "head",
        "tail",
        rolling_fingerprint(F.col("head")).alias("head_fp"),
        rolling_fingerprint(F.col("tail")).alias("tail_fp"),
    ).localCheckpoint()
    a = fp.select(
        F.col("doc_id").alias("doc_tail"),
        F.col("tail").alias("wa"),
        F.col("tail_fp").alias("jfp"),
    )
    b = fp.select(
        F.col("doc_id").alias("doc_head"),
        F.col("head").alias("wb"),
        F.col("head_fp").alias("jfp"),
    )
    cand = a.join(b, "jfp").filter(
        F.col("doc_tail") != F.col("doc_head")
    ).localCheckpoint()
    n_cand = cand.count()
    ver = cand.filter(F.col("wa") == F.col("wb"))
    stats = ver.agg(
        F.count(F.lit(1)).cast("bigint").alias("verified_pairs"),
        F.countDistinct("doc_tail").cast("bigint").alias(
            "docs_with_overlap"
        ),
    )
    return stats.select(
        F.lit(n_cand).cast("bigint").alias("candidate_pairs"),
        "verified_pairs",
        "docs_with_overlap",
    )


dd_boundary_overlap.__doc__ = dd_boundary_overlap.__doc__.format(w=BO_W)


@query(
    "graph_core_decomposition",
    # Real oracle: the two nested Spark loops (k levels x inner peel)
    # flatten into ONE stamped recursive CTE: every edge row carries
    # the current level k; an iteration with weak nodes (degree < k
    # via windows) is a removal step (same k, weak endpoints' edges
    # dropped), a stable iteration advances every row to k+1. A node's
    # core number is then max(k over its surviving rows) - 1 — it was
    # removed while the level sat at its max stamp, so it peaked one
    # below, exactly the Spark loop's 'vanished between the (k-1)-core
    # and the k-core' accounting. Terminates because k outgrows the
    # max degree and the last removal empties the working set.
    oracle=f"""
    WITH RECURSIVE {DUCK_COPURCHASE_SYM},
    peel AS (
      SELECT p1 AS u, p2 AS v, 1 AS k FROM csym
      UNION ALL
      SELECT u, v, CASE WHEN aw = 1 THEN k ELSE k + 1 END
      FROM (
        SELECT u, v, k, du, dv,
               MAX(CASE WHEN du < k OR dv < k THEN 1 ELSE 0 END)
                 OVER () AS aw
        FROM (SELECT u, v, k,
                     COUNT(*) OVER (PARTITION BY u) AS du,
                     COUNT(*) OVER (PARTITION BY v) AS dv
              FROM peel) t1) t2
      WHERE aw = 0 OR (du >= k AND dv >= k)
    )
    SELECT core, CAST(COUNT(*) AS BIGINT) AS nodes
    FROM (SELECT u, CAST(MAX(k) - 1 AS BIGINT) AS core
          FROM peel GROUP BY u) c
    GROUP BY core ORDER BY core
    """,
)
def graph_core_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full core decomposition of the co-purchase graph: for k = 1, 2,
    … repeatedly delete nodes of degree < k until stable; a node's
    core number is the largest k at which it survives. Emits the
    core-size histogram and the degeneracy (max core) — the cohesion
    profile whose inner cores are where communities actually live.

    Scale: each peel round is a degree aggregate + an anti-join;
    k levels share the surviving-edge frame with localCheckpoint
    lineage cuts, and the loop runs until the k-core is EMPTY (no
    fixed cap), so rounds are bounded by the true degeneracy. Node
    core assignments never leave the cluster: the nodes peeled away
    between level k-1 and level k are captured as a per-level
    DataFrame (anti-join of the two survivor sets) and the histogram
    is a distributed union + groupBy — driver state is O(degeneracy)
    DataFrame handles, not O(|nodes|)."""
    e = _copurchase_edges(spark, sf_dir).select("p1", "p2")
    sym = e.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionByName(
        e.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    ).localCheckpoint()
    live = sym
    prev_nodes = (
        sym.select(F.col("u").alias("node")).distinct().localCheckpoint()
    )
    levels: list[DataFrame] = []  # (node, core) per peel level
    k = 1
    while True:
        # peel to the k-core
        changed = True
        while changed:
            deg = live.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
            weak = deg.filter(F.col("d") < k).select("u")
            n_weak = weak.count()
            if n_weak == 0:
                changed = False
                break
            live = (
                live.join(weak, "u", "left_anti")
                .join(weak.withColumnRenamed("u", "v"), "v", "left_anti")
                .localCheckpoint()
            )
        surv = (
            live.select(F.col("u").alias("node")).distinct().localCheckpoint()
        )
        # nodes that vanished while peeling to the k-core peaked at k-1
        levels.append(
            prev_nodes.join(surv, "node", "left_anti")
            .withColumn("core", F.lit(k - 1).cast("long"))
        )
        if surv.limit(1).count() == 0:
            break
        prev_nodes = surv
        k += 1
    assigned = levels[0]
    for lvl in levels[1:]:
        assigned = assigned.unionByName(lvl)
    return (
        assigned.groupBy("core")
        .agg(F.count(F.lit(1)).alias("nodes"))
        .orderBy("core")
        .select(F.col("core").cast("long"), F.col("nodes").cast("long"))
    )


@query("io_partition_advisor")  # sizing advisory → rows-only
def io_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-partition advisor: measure each table's on-disk bytes,
    apply a compression-expansion factor for in-memory shuffle size,
    and recommend partitions = ceil(bytes·expansion / target) per
    table plus the whole-pipeline number — replacing the folklore
    constant with arithmetic the data justifies. Compares against the
    session's configured value so drift is visible.

    Scale: file-size metadata only."""
    import math
    import os

    tables = ["lineitem", "orders", "customer", "events", "documents"]
    expansion = 2.0  # parquet → in-memory row expansion heuristic
    configured = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rows = []
    total = 0
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        size = os.path.getsize(p) if os.path.isfile(p) else sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )
        total += size
        rec = max(1, math.ceil(size * expansion / TARGET_PART_BYTES))
        rows.append((t, int(size), int(rec), int(configured)))
    rows.append(
        (
            "_pipeline_total",
            int(total),
            max(1, math.ceil(total * expansion / TARGET_PART_BYTES)),
            int(configured),
        )
    )
    return spark.createDataFrame(
        rows,
        "table string, bytes long, recommended_partitions long, "
        "configured_partitions long",
    )
