"""Wave 76: mergeable moments, error-slice analysis, community
detection, and per-document lineage.

sketch_moments_merge demonstrates Chan's parallel moment merge — the
(n, mean, M2) triple every distributed variance rests on — and proves
partition-wise merging equals the global pass; ml_error_slices is the
model-debugging table (which data slices does the classifier fail on,
with significance flags so noise doesn't read as signal);
graph_label_propagation finds communities (not just components) by
iterative min-label majority; ds_lineage_manifest stamps every
document with its filter-pipeline provenance bitmask — the 'why is
this doc in/out' answer auditors ask for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import DUCK_COPURCHASE_SYM
from mister_spark.registry import query

LPA_ITERS = 6
SLICE_Z = 1.96


@query(
    "sketch_moments_merge",
    oracle="""
    WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      FLOOR(AVG(value) * 10000 + 0.5) / 10000 AS mean,
                      FLOOR(((SUM(value * value)
                              - SUM(value) * SUM(value) / COUNT(*))
                             / COUNT(*)) * 10000 + 0.5) / 10000 AS var_pop
               FROM events)
    SELECT n, mean, var_pop, CAST(1 AS BIGINT) AS merge_agrees FROM s
    """,
)
def sketch_moments_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable moment sketch: per-partition (n, mean, M2) partials
    combined with Chan's update — the numerically-stable parallel
    variance that underlies every distributed stddev — computed via
    mapInPandas partials + a driver merge, then PROVEN equal to the
    single-pass global aggregate (merge_agrees). The point: moments
    merge losslessly, so tree-aggregation over 10k partitions gives
    the same answer as one pass.

    Scale: one narrow partial pass; merge state is O(partitions)."""
    import math

    import numpy as np
    import pandas as pd

    ev = cat(spark, sf_dir)["events"].select("value")

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = pdf["value"].to_numpy(dtype=np.float64)
            m = float(x.mean())
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "mean": [m],
                    "m2": [float(((x - m) ** 2).sum())],
                }
            )

    parts = ev.mapInPandas(
        partials, "n long, mean double, m2 double"
    ).collect()
    n, mean, m2 = 0, 0.0, 0.0
    for p in parts:
        nb, mb, m2b = p["n"], p["mean"], p["m2"]
        delta = mb - mean
        tot = n + nb
        m2 = m2 + m2b + delta * delta * n * nb / tot
        mean = mean + delta * nb / tot
        n = tot
    merged = (
        n,
        math.floor(mean * 10000 + 0.5) / 10000,
        math.floor((m2 / n) * 10000 + 0.5) / 10000,
    )
    g = ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("value").alias("mean"),
        (
            (
                F.sum(F.col("value") * F.col("value"))
                - F.sum("value") * F.sum("value") / F.count(F.lit(1))
            )
            / F.count(F.lit(1))
        ).alias("var_pop"),
    ).collect()[0]
    want = (
        g["n"],
        math.floor(g["mean"] * 10000 + 0.5) / 10000,
        math.floor(g["var_pop"] * 10000 + 0.5) / 10000,
    )
    agree = int(
        merged[0] == want[0]
        and abs(merged[1] - want[1]) < 2e-4
        and abs(merged[2] - want[2]) < 2e-4
    )
    return spark.createDataFrame(
        [(want[0], want[1], want[2], agree)],
        "n long, mean double, var_pop double, merge_agrees long",
    )


@query(
    "ml_error_slices",
    oracle=f"""
    WITH s AS (SELECT d.source,
                      CASE WHEN 1.0 / (1.0 + exp(-CAST(e.embedding[1]
                                                       AS DOUBLE))) > 0.5
                           THEN 1 ELSE 0 END AS pred,
                      CASE WHEN e.label < 5 THEN 1 ELSE 0 END AS y
               FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
    g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS gn,
                 AVG(CASE WHEN pred = y THEN 1.0 ELSE 0.0 END) AS gacc
          FROM s),
    sl AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS n,
                  AVG(CASE WHEN pred = y THEN 1.0 ELSE 0.0 END) AS acc
           FROM s GROUP BY 1)
    SELECT sl.source, CAST(sl.n AS BIGINT) AS n,
           FLOOR(sl.acc * 10000 + 0.5) / 10000 AS acc,
           FLOOR((sl.acc - g.gacc) * 10000 + 0.5) / 10000 AS delta,
           CAST(CASE WHEN ABS(sl.acc - g.gacc)
                          / sqrt(g.gacc * (1 - g.gacc) / sl.n) > {SLICE_Z}
                THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM sl CROSS JOIN g
    """,
)
def ml_error_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error analysis by data slice: per-source classifier accuracy vs
    the global rate, with a z-flag (|Δ|/√(p(1−p)/n) > {z}) so the
    debugging session starts at slices that are BAD, not merely small
    — the table every model postmortem opens with.

    Scale: one join to attach slices, two rollups; the significance
    math is arithmetic on the slice aggregates."""
    c = cat(spark, sf_dir)
    s = c["documents"].select("doc_id", "source").join(
        c["embeddings"].select(
            F.col("vec_id").alias("doc_id"),
            (
                (1.0 / (1.0 + F.exp(-F.element_at("embedding", 1).cast("double"))))
                > 0.5
            ).cast("int").alias("pred"),
            (F.col("label") < 5).cast("int").alias("y"),
        ),
        "doc_id",
    ).localCheckpoint()
    acc = F.avg((F.col("pred") == F.col("y")).cast("double"))
    g = s.agg(
        F.count(F.lit(1)).cast("double").alias("gn"), acc.alias("gacc")
    )
    sl = s.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"), acc.alias("acc")
    )
    z = F.abs(F.col("acc") - F.col("gacc")) / F.sqrt(
        F.col("gacc") * (1 - F.col("gacc")) / F.col("n")
    )
    return sl.join(F.broadcast(g)).select(
        "source",
        F.col("n").cast("bigint").alias("n"),
        ratio(F.col("acc")).alias("acc"),
        ratio(F.col("acc") - F.col("gacc")).alias("delta"),
        (z > SLICE_Z).cast("bigint").alias("significant"),
    )


ml_error_slices.__doc__ = ml_error_slices.__doc__.format(z=SLICE_Z)


@query(
    "graph_label_propagation",
    # Real oracle: the synchronous majority-vote rounds are a stamped
    # recursive CTE — per round, count neighbor labels and keep the
    # ROW_NUMBER()=1 row under (count DESC, label ASC), the exact
    # deterministic tiebreak the Spark loop uses. All-integer label
    # state; only the final internal-edge share is a (rounded) ratio.
    oracle=f"""
    WITH RECURSIVE {DUCK_COPURCHASE_SYM},
    lp AS (
      SELECT 0 AS it, p1 AS node, p1 AS lbl FROM (SELECT DISTINCT p1 FROM csym)
      UNION ALL
      SELECT it + 1, node, lbl FROM (
        SELECT l.it, e2.p1 AS node, l.lbl,
               ROW_NUMBER() OVER (PARTITION BY l.it, e2.p1
                                  ORDER BY COUNT(*) DESC, l.lbl) AS rn
        FROM csym e2 JOIN lp l ON l.node = e2.p2
        WHERE l.it < {LPA_ITERS}
        GROUP BY l.it, e2.p1, l.lbl) v
      WHERE rn = 1
    ),
    fin AS (SELECT node, lbl FROM lp WHERE it = {LPA_ITERS}),
    sizes AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS size
              FROM fin GROUP BY lbl),
    internal AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m,
                        CAST(SUM(CASE WHEN la.lbl = lb.lbl THEN 1 ELSE 0 END)
                             AS DOUBLE) AS mi
                 FROM csym s
                 JOIN fin la ON la.node = s.p1
                 JOIN fin lb ON lb.node = s.p2)
    SELECT CAST(s.lbl AS BIGINT) AS community, s.size,
           FLOOR(i.mi / i.m * 10000 + 0.5) / 10000 AS internal_edge_share
    FROM sizes s CROSS JOIN internal i
    ORDER BY s.size DESC, community LIMIT 20
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by label propagation on the co-purchase
    graph: every node starts as its own label; each round it adopts
    its neighbors' most-frequent label (min-label tiebreak — the
    deterministic synchronous variant), {it} rounds. Communities are
    finer than graph_components' connectivity classes — they cut where
    edges are sparse. Reports community sizes and internal-edge share
    (a modularity proxy).

    Scale: each round is one edges⋈labels join + a (node, label)
    majority rollup, checkpointed; labels are node-sized columns,
    never driver state."""
    from pyspark.sql import Window as W

    from mister_spark.operators.extras47 import _copurchase_edges

    e0 = _copurchase_edges(spark, sf_dir).select("p1", "p2")
    e = e0.unionAll(
        e0.select(F.col("p2").alias("p1"), F.col("p1").alias("p2"))
    ).localCheckpoint()
    lab = e.select(F.col("p1").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    for _ in range(LPA_ITERS):
        votes = (
            e.join(lab, e["p2"] == lab["node"])
            .groupBy("p1", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        wv = W.partitionBy("p1").orderBy(F.desc("c"), "lbl")
        lab = (
            votes.withColumn("rn", F.row_number().over(wv))
            .filter(F.col("rn") == 1)
            .select(F.col("p1").alias("node"), "lbl")
            .localCheckpoint()
        )
    # community profile + internal-edge share
    sizes = lab.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("size")
    )
    l1 = lab.select(F.col("node").alias("p1"), F.col("lbl").alias("la"))
    l2 = lab.select(F.col("node").alias("p2"), F.col("lbl").alias("lb"))
    internal = (
        e.join(l1, "p1")
        .join(l2, "p2")
        .agg(
            F.count(F.lit(1)).cast("double").alias("m"),
            F.sum((F.col("la") == F.col("lb")).cast("int"))
            .cast("double")
            .alias("mi"),
        )
    )
    from mister_spark.operators.common import rnd

    return (
        sizes.join(F.broadcast(internal))
        .select(
            F.col("lbl").cast("bigint").alias("community"),
            "size",
            ratio(F.col("mi") / F.col("m")).alias("internal_edge_share"),
        )
        .orderBy(F.desc("size"), "community")
        .limit(20)
    )


graph_label_propagation.__doc__ = graph_label_propagation.__doc__.format(
    it=LPA_ITERS
)


@query(
    "ds_lineage_manifest",
    oracle="""
    WITH t AS (SELECT doc_id, source,
                      len(list_filter(string_split(text, ' '), x -> x <> ''))
                        AS n_tok,
                      n_chars
               FROM documents),
    f AS (SELECT doc_id, source,
                 CASE WHEN n_tok >= 20 THEN 1 ELSE 0 END AS f_len,
                 CASE WHEN n_chars <= 2000 THEN 1 ELSE 0 END AS f_size,
                 CASE WHEN n_tok > 0 AND n_chars / n_tok < 12
                      THEN 1 ELSE 0 END AS f_toklen
          FROM t),
    m AS (SELECT doc_id, source,
                 f_len * 4 + f_size * 2 + f_toklen AS lineage_mask,
                 CASE WHEN f_len + f_size + f_toklen = 3
                      THEN 1 ELSE 0 END AS kept
          FROM f)
    SELECT source, CAST(lineage_mask AS BIGINT) AS lineage_mask,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(kept) AS BIGINT) AS kept
    FROM m GROUP BY 1, 2
    """,
)
def ds_lineage_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document filter-lineage manifest: three quality gates
    (length ≥ 20 tokens, size ≤ 2000 chars, mean token length < 12)
    pack into a bitmask per doc, rolled up per (source, mask) — so
    'why was this cohort dropped' is a lookup, not a re-run. The
    provenance layer ds_quality_filter_funnel's aggregate counts
    can't answer.

    Scale: pure narrow maps + one (source, mask) rollup — ≤ 8 masks
    per source."""
    docs = cat(spark, sf_dir)["documents"]
    from mister_spark.functions.text import tokens

    t = docs.select(
        "doc_id",
        "source",
        F.size(tokens()).alias("n_tok"),
        "n_chars",
    )
    f_len = (F.col("n_tok") >= 20).cast("int")
    f_size = (F.col("n_chars") <= 2000).cast("int")
    f_toklen = (
        (F.col("n_tok") > 0) & (F.col("n_chars") / F.col("n_tok") < 12)
    ).cast("int")
    m = t.select(
        "source",
        (f_len * 4 + f_size * 2 + f_toklen).cast("bigint").alias(
            "lineage_mask"
        ),
        ((f_len + f_size + f_toklen) == 3).cast("bigint").alias("kept"),
    )
    return m.groupBy("source", "lineage_mask").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.max("kept").cast("bigint").alias("kept"),
    )
