"""Wave 17: classifier evaluation, per-node clustering coefficient,
schema-evolution union, and inter-event gap statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query


def _langid_pred_sql() -> str:
    from mister_spark.operators.textstats import _duck_langid_case

    return _duck_langid_case()


@query(
    "tx_lang_confusion",
    oracle=f"""
    WITH pred AS ({_langid_pred_sql()})
    SELECT d.lang AS true_lang, p.pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM documents d JOIN pred p ON d.doc_id = p.doc_id
    GROUP BY 1, 2
    """,
)
def tx_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the tx_langid heuristic against the labeled
    lang column — the evaluation harness a pipeline runs before
    trusting a filter stage. (On this synthetic corpus the text carries
    no real language signal, so the matrix documents the heuristic's
    bias — exactly what an eval table is for.)

    Scale: the scorer is tx_langid's JVM expression pass; the join is
    doc-keyed; the matrix itself is |langs|² rows."""
    from mister_spark.operators.textstats import tx_langid

    pred = tx_langid(spark, sf_dir).select("doc_id", "pred_lang")
    docs = cat(spark, sf_dir)["documents"].select(
        "doc_id", F.col("lang").alias("true_lang")
    )
    return (
        docs.join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_EDGE_SQL = """
      SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE s.s_nationkey <> c.c_nationkey
"""


@query(
    "graph_clustering_coeff",
    oracle=f"""
    WITH e0 AS ({_EDGE_SQL}),
    und AS (SELECT src AS a, dst AS b FROM e0 UNION SELECT dst, src FROM e0),
    deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY 1),
    tri AS (
      SELECT x.a, CAST(COUNT(*) AS BIGINT) AS t
      FROM und x JOIN und y ON x.b = y.a
           JOIN und z ON z.a = x.a AND z.b = y.b
      GROUP BY 1)
    SELECT deg.a AS node, deg.d AS degree,
           CAST(COALESCE(tri.t, 0) / 2 AS BIGINT) AS n_triangles,
           FLOOR(CASE WHEN deg.d < 2 THEN 0.0
                      ELSE CAST(COALESCE(tri.t, 0) AS DOUBLE)
                           / (deg.d * (deg.d - 1)) END * 10000 + 0.5) / 10000
             AS clustering
    FROM deg LEFT JOIN tri ON deg.a = tri.a
    """,
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node clustering coefficient on the undirected trade graph:
    closed wedges at the node over deg·(deg−1) possible — the local
    density signal behind community detection. Triangles are counted by
    the two-hop wedge join closed with an edge-existence join (each
    triangle at a node counted twice — once per wedge orientation —
    then halved).

    Scale: the wedge join is the known graph hotspot; the production
    guard is the degree-cap pre-filter graph_common_neighbors documents.
    All joins are edge-keyed equi-joins."""
    from mister_spark.operators.extras9 import _undirected_edges

    und = _undirected_edges(spark, sf_dir).localCheckpoint()
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    x = und.select(F.col("a").alias("xa"), F.col("b").alias("xb"))
    y = und.select(F.col("a").alias("ya"), F.col("b").alias("yb"))
    z = und.select(F.col("a").alias("za"), F.col("b").alias("zb"))
    tri = (
        x.join(y, F.col("xb") == F.col("ya"))
        .join(z, (F.col("za") == F.col("xa")) & (F.col("zb") == F.col("yb")))
        .groupBy(F.col("xa").alias("a"))
        .agg(F.count(F.lit(1)).alias("t"))
    )
    j = deg.join(tri, "a", "left").withColumn("t", F.coalesce(F.col("t"), F.lit(0)))
    return j.select(
        F.col("a").alias("node"),
        F.col("d").cast("long").alias("degree"),
        (F.col("t") / 2).cast("long").alias("n_triangles"),
        rnd(
            F.when(F.col("d") < 2, 0.0).otherwise(
                F.col("t").cast("double") / (F.col("d") * (F.col("d") - 1))
            ),
            4,
        ).alias("clustering"),
    )


@query(
    "io_schema_evolution",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_totalprice, NULL AS o_channel
      FROM orders WHERE o_orderkey % 2 = 0),
    new AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderkey % 3 = 0 THEN 'web' ELSE 'store' END AS o_channel
      FROM orders WHERE o_orderkey % 2 = 1),
    unioned AS (
      SELECT * FROM old UNION ALL SELECT * FROM new)
    SELECT COALESCE(o_channel, 'unknown') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS total
    FROM unioned GROUP BY 1
    """,
)
def io_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at read time: an 'old epoch' of orders lacks the
    o_channel column a 'new epoch' carries; unionByName with
    allowMissingColumns NULL-fills the gap and the rollup treats
    missing as 'unknown' — the append-only lakehouse pattern for adding
    columns without rewriting history.

    Scale: unionByName is a zero-shuffle plan node; the NULL fill is a
    projection. Epoch scans stay independently prunable."""
    o = cat(spark, sf_dir)["orders"]
    old = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    new = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, "web")
        .otherwise("store")
        .alias("o_channel"),
    )
    u = old.unionByName(new, allowMissingColumns=True)
    return (
        u.groupBy(F.coalesce(F.col("o_channel"), F.lit("unknown")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            money(F.sum("o_totalprice")).alias("total"),
        )
    )


@query(
    "ev_gap_stats",
    oracle="""
    WITH g AS (
      SELECT user_id, epoch_us(ts) AS tus,
             epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS gap_us
      FROM events),
    gaps AS (SELECT gap_us FROM g WHERE gap_us IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
           FLOOR(quantile_cont(gap_us / 1000000.0, 0.5) * 100 + 0.5) / 100
             AS p50_s,
           FLOOR(quantile_cont(gap_us / 1000000.0, 0.9) * 100 + 0.5) / 100
             AS p90_s,
           FLOOR(AVG(gap_us / 1000000.0) * 100 + 0.5) / 100 AS mean_s
    FROM gaps
    """,
)
def ev_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution across users (median / p90 / mean
    seconds between consecutive events of the same user) — the
    empirical basis for the 30-minute session gap every sessionizer
    hardcodes. Gaps are exact integer microseconds until the final
    statistics.

    Scale: one user_id shuffle for the lag window, then a scalar
    percentile fold over the gap stream (percentile_approx at 100 TB)."""
    from mister_spark.operators.events import _ev

    ev = _ev(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    g = ev.select(
        (F.col("tus") - F.lag("tus").over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    sec = F.col("gap_us") / 1_000_000.0
    return g.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        money(F.expr("percentile(gap_us / 1000000.0, 0.5)")).alias("p50_s"),
        money(F.expr("percentile(gap_us / 1000000.0, 0.9)")).alias("p90_s"),
        money(F.avg(sec)).alias("mean_s"),
    )
