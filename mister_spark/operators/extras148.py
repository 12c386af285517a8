"""Wave 148: outer-explode semantics and percolation robustness.

sql_explode_outer pins the explode vs explode_outer distinction —
plain explode silently DROPS rows whose array is empty (the classic
lost-rows bug in token pipelines); the outer form preserves them as
NULLs, and this op proves the row accounting both ways;
graph_percolation_curve removes growing hash-selected fractions of
co-purchase edges and tracks the largest component's share — the
robustness curve that says how much relationship loss the network
absorbs before it shatters.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.hashing import FP_MOD, FP_MUL
from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import DUCK_COPURCHASE_SYM
from mister_spark.registry import query

PERC_LEVELS = (0, 25, 50, 75)
PERC_ROUNDS = 8


@query(
    "sql_explode_outer",
    oracle="""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split(text, 'zzz'), x -> x <> text)
                        AS pieces
               FROM documents),
    inner_rows AS (SELECT t.doc_id FROM t, UNNEST(t.pieces) u(p)),
    outer_docs AS (SELECT doc_id,
                          CASE WHEN len(pieces) = 0 THEN 1 ELSE 0 END
                            AS empty_arr
                   FROM t)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM t) AS docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM inner_rows)
             AS exploded_rows,
           (SELECT CAST(SUM(empty_arr) AS BIGINT) FROM outer_docs)
             AS empty_arrays,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM inner_rows)
             + (SELECT CAST(SUM(empty_arr) AS BIGINT) FROM outer_docs)
             AS outer_exploded_rows
    """,
)
def sql_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode vs explode_outer accounting: split text on a marker
    that (almost) never occurs, so some arrays come back EMPTY —
    plain explode drops those documents entirely (the silent row-loss
    bug every token pipeline hits once), while explode_outer keeps
    them as NULL rows. The op reports both counts and the identity
    outer = inner + empty_arrays, proven on both engines.

    Scale: explode is a generator in the row pipeline — the
    accounting costs one pass."""
    docs = cat(spark, sf_dir)["documents"]
    pieces = F.filter(
        F.split(F.col("text"), "zzz"), lambda x: x != F.col("text")
    )
    t = docs.select("doc_id", pieces.alias("pieces")).localCheckpoint()
    n_docs = t.count()
    inner_rows = t.select(F.explode("pieces").alias("p")).count()
    outer_rows = t.select(F.explode_outer("pieces").alias("p")).count()
    empty_arrays = t.filter(F.size("pieces") == 0).count()
    row = (
        int(n_docs),
        int(inner_rows),
        int(empty_arrays),
        int(outer_rows),
    )
    return spark.createDataFrame(
        [row],
        "docs long, exploded_rows long, empty_arrays long, "
        "outer_exploded_rows long",
    )


@query(
    "graph_percolation_curve",
    # Real oracle: min-label propagation capped at PERC_ROUNDS equals
    # "label(v) = min node id within PERC_ROUNDS hops", so the CTE
    # walks (lvl, node, source, d) tuples with dedup-UNION (bounded by
    # levels x nodes^2 x rounds on this support-thresholded graph) and
    # takes MIN(source) per node — all four percolation levels ride in
    # ONE recursion, keyed by lvl, each over its hash-filtered edge
    # subset (the same unordered-pair hash as the Spark side, pure
    # BIGINT arithmetic).
    oracle=f"""
    WITH RECURSIVE {DUCK_COPURCHASE_SYM},
    lv AS (SELECT UNNEST([{", ".join(str(v) for v in PERC_LEVELS)}]) AS lvl),
    keep AS (SELECT l.lvl, c.p1 AS u, c.p2 AS v
             FROM lv l JOIN csym c
               ON (LEAST(c.p1, c.p2) * {FP_MUL}
                   + GREATEST(c.p1, c.p2)) % {FP_MOD} % 100 >= l.lvl),
    walk AS (
      SELECT lvl, u AS node, u AS src, 0 AS d
      FROM (SELECT DISTINCT lvl, u FROM keep) s
      UNION
      SELECT w.lvl, k.v, w.src, w.d + 1
      FROM walk w JOIN keep k ON w.lvl = k.lvl AND w.node = k.u
      WHERE w.d < {PERC_ROUNDS}
    ),
    lab AS (SELECT lvl, node, MIN(src) AS lab FROM walk GROUP BY 1, 2),
    comp AS (SELECT lvl, lab, COUNT(*) AS sz FROM lab GROUP BY 1, 2),
    big AS (SELECT lvl, MAX(sz) AS big FROM comp GROUP BY lvl),
    tot AS (SELECT CAST(COUNT(DISTINCT p1) AS DOUBLE) AS n FROM csym)
    SELECT CAST(l.lvl AS BIGINT) AS edges_removed_pct,
           CAST(COALESCE(b.big, 0) AS BIGINT) AS largest_component,
           FLOOR(COALESCE(b.big, 0) / tot.n * 10000 + 0.5) / 10000
             AS largest_share
    FROM lv l LEFT JOIN big b ON l.lvl = b.lvl CROSS JOIN tot
    ORDER BY 1
    """,
)
def graph_percolation_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bond-percolation robustness: remove {lv}% of co-purchase edges
    (hash-selected — reproducible) and measure the largest connected
    component's node share at each level via hash-to-min label
    propagation. A slowly-declining curve means redundancy; a cliff
    is the percolation threshold where the market fragments.

    Scale: each level is one components run (pointer-jump label
    propagation with localCheckpoint rounds) on the filtered edge
    set."""
    e0 = _copurchase_symmetric(spark, sf_dir)
    total_nodes = e0.select("u").distinct().count()
    rows = []
    for lvl in PERC_LEVELS:
        # hash the UNORDERED pair so both directions of an edge live
        # or die together
        pair_hash = (
            F.least("u", "v") * FP_MUL + F.greatest("u", "v")
        ) % FP_MOD % 100
        keep = e0.filter(pair_hash >= lvl).localCheckpoint()
        n_nodes = keep.select("u").distinct().count()
        if n_nodes == 0:
            rows.append((lvl, 0, 0.0))
            continue
        lab = keep.select(F.col("u").alias("node")).distinct().withColumn(
            "lab", F.col("node")
        ).localCheckpoint()
        for _ in range(PERC_ROUNDS):
            m = (
                keep.join(
                    lab.withColumnRenamed("node", "u"), "u"
                )
                .groupBy(F.col("v").alias("node"))
                .agg(F.min("lab").alias("nlab"))
            )
            lab = (
                lab.join(m, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("lab"), F.coalesce("nlab", F.col("lab"))
                    ).alias("lab"),
                )
                .localCheckpoint()
            )
        big = (
            lab.groupBy("lab")
            .agg(F.count(F.lit(1)).alias("sz"))
            .agg(F.max("sz"))
            .collect()[0][0]
        )
        rows.append(
            (
                lvl,
                int(big),
                math.floor(big / total_nodes * 10000 + 0.5) / 10000,
            )
        )
    return spark.createDataFrame(
        rows,
        "edges_removed_pct long, largest_component long, "
        "largest_share double",
    )


def _copurchase_symmetric(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mister_spark.operators.extras47 import _copurchase_edges

    e = _copurchase_edges(spark, sf_dir).select("p1", "p2")
    return e.select(
        F.col("p1").alias("u"), F.col("p2").alias("v")
    ).unionByName(
        e.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    ).localCheckpoint()


graph_percolation_curve.__doc__ = graph_percolation_curve.__doc__.format(
    lv=PERC_LEVELS
)
