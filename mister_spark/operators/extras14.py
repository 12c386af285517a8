"""Wave 14: recursive SQL, jackknife CIs, nearest-event as-of join,
k-NN classification, CSV schema-on-read, and multimodal patch grids.

sql_recursive is the portable-SQL showcase of Spark 4's WITH RECURSIVE:
the IDENTICAL query string runs on Spark and DuckDB (the sql_portable
pattern), computing a genuinely recursive result no finite window
expression can express.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query

NEAR_US = 5 * 60 * 1_000_000  # ±5-min nearest-event horizon
CELL_US = 5 * 60 * 1_000_000
KNN_K = 5

# runs unmodified on Spark SQL (4.x) and DuckDB: 12-month compounding
# schedule per nation seeded from its sales total — every row depends
# on the previous month's row, the textbook recursion windows can't do
RECURSIVE_SQL = """
WITH RECURSIVE sched(n_nationkey, month, balance) AS (
  SELECT s.n_nationkey, 0 AS month,
         FLOOR(s.base / 1000 * 100 + 0.5) / 100 AS balance
  FROM (SELECT n.n_nationkey, SUM(o.o_totalprice) AS base
        FROM nation n
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY n.n_nationkey) s
  UNION ALL
  SELECT n_nationkey, month + 1,
         FLOOR((balance * 1.01 + 100) * 100 + 0.5) / 100
  FROM sched WHERE month < 12
)
SELECT n_nationkey, CAST(month AS BIGINT) AS month, balance
FROM sched
"""


@query("sql_recursive", oracle=RECURSIVE_SQL)
def sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE executed verbatim on both engines: a 12-step
    compounding schedule (1% + 100 per month) seeded from each nation's
    order total. Linear recursion — one row per (nation, month), depth
    bounded by the month guard; every balance is cent-rounded inside
    the recursion so the iterates stay exactly representable and
    cross-engine identical.

    Scale: the anchor is the only data-sized work (fact shuffle + dim
    joins); each recursive step is a 25-row map. Spark 4 evaluates
    recursive CTEs iteratively with the same bounded-depth semantics as
    DuckDB."""
    cat(spark, sf_dir).register_views()
    return spark.sql(RECURSIVE_SQL)


@query(
    "stat_jackknife_ci",
    oracle="""
    WITH d AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(COUNT(*) AS BIGINT) AS nd, SUM(value) AS sd
      FROM events GROUP BY 1, 2),
    t AS (
      SELECT event_type, CAST(SUM(nd) AS BIGINT) AS n, SUM(sd) AS s,
             CAST(COUNT(*) AS BIGINT) AS g
      FROM d GROUP BY 1),
    pv AS (
      SELECT d.event_type, t.n, t.s, t.g,
             (t.s - d.sd) / (t.n - d.nd) AS theta_i
      FROM d JOIN t ON d.event_type = t.event_type),
    jk AS (
      SELECT event_type, ANY_VALUE(n) AS n, ANY_VALUE(s) AS s,
             ANY_VALUE(g) AS g, AVG(theta_i) AS tb,
             SUM(theta_i * theta_i) AS t2
      FROM pv GROUP BY 1)
    SELECT event_type, n,
           FLOOR(s / n * 10000 + 0.5) / 10000 AS mean,
           FLOOR(SQRT((g - 1.0) / g * (t2 - g * tb * tb)) * 10000 + 0.5) / 10000
             AS se_jack,
           FLOOR((s / n - 1.96 * SQRT((g - 1.0) / g * (t2 - g * tb * tb)))
                 * 10000 + 0.5) / 10000 AS ci_lo,
           FLOOR((s / n + 1.96 * SQRT((g - 1.0) / g * (t2 - g * tb * tb)))
                 * 10000 + 0.5) / 10000 AS ci_hi
    FROM jk
    """,
)
def stat_jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-day jackknife standard error and 95% CI for the mean
    event value per type: each pseudo-replicate drops one day's block
    (the right resampling unit for serially-correlated event data —
    row-level bootstrap would understate the error). Closed-form from
    per-day (count, sum) blocks: no replicate materialization, no RNG.

    Scale: one (type, day) rollup, then all jackknife algebra runs on
    the ≤ #days block frame per type — the 100 TB cost is one shuffle."""
    ev = cat(spark, sf_dir)["events"]
    d = (
        ev.repartition("event_type")
        .groupBy("event_type", F.expr("unix_micros(ts) div 86400000000").alias("day"))
        .agg(F.count(F.lit(1)).alias("nd"), F.sum("value").alias("sd"))
    )
    w_all = W.partitionBy("event_type").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    pv = (
        d.withColumn("n", F.sum("nd").over(w_all))
        .withColumn("s", F.sum("sd").over(w_all))
        .withColumn("g", F.count(F.lit(1)).over(w_all))
        .withColumn("theta_i", (F.col("s") - F.col("sd")) / (F.col("n") - F.col("nd")))
    )
    jk = pv.groupBy("event_type").agg(
        F.first("n").cast("long").alias("n"),
        F.first("s").alias("s"),
        F.first("g").alias("g"),
        F.avg("theta_i").alias("tb"),
        F.sum(F.col("theta_i") * F.col("theta_i")).alias("t2"),
    )
    mean = F.col("s") / F.col("n")
    var_j = (F.col("g") - 1.0) / F.col("g") * (
        F.col("t2") - F.col("g") * F.col("tb") * F.col("tb")
    )
    se = F.sqrt(var_j)
    return jk.select(
        "event_type",
        "n",
        ratio(mean).alias("mean"),
        ratio(se).alias("se_jack"),
        ratio(mean - 1.96 * se).alias("ci_lo"),
        ratio(mean + 1.96 * se).alias("ci_hi"),
    )


@query(
    "ev_asof_nearest",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_tus
      FROM events WHERE event_type = 'purchase'),
    e AS (
      SELECT event_id AS e_id, user_id, epoch_us(ts) AS e_tus
      FROM events WHERE event_type = 'error'),
    cand AS (
      SELECT p.p_id, p.user_id, e.e_id,
             ABS(e.e_tus - p.p_tus) AS dist_us, e.e_tus
      FROM p JOIN e ON p.user_id = e.user_id
             AND ABS(e.e_tus - p.p_tus) <= {NEAR_US}),
    rk AS (
      SELECT p_id, user_id, e_id, dist_us,
             ROW_NUMBER() OVER (PARTITION BY p_id
                                ORDER BY dist_us, e_tus, e_id) AS r
      FROM cand)
    SELECT p_id, user_id, e_id, dist_us FROM rk WHERE r = 1
    """,
)
def ev_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event join, both directions: for each purchase, the
    closest error by the same user within ±5 minutes (ties: earlier
    error wins). The symmetric completion of ev_asof_join, which only
    looks backward. The oracle states the |Δt| inequality join; the
    Spark plan joins on 5-minute grid cells (each error lands in its
    cell, each purchase probes cell−1..cell+1) — a bounded equi-join,
    never a cross join.

    Scale: fan-out is exactly 3 cells per purchase; shuffle keys are
    (user, cell). Same decomposition as j_interval_overlap."""
    from mister_spark.operators.events import _ev

    ev = _ev(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("tus").alias("p_tus")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), "user_id", F.col("tus").alias("e_tus")
    )
    e_cells = e.withColumn("cell", F.expr(f"e_tus div {CELL_US}"))
    p_cells = p.withColumn(
        "cell",
        F.explode(
            F.array(
                F.expr(f"p_tus div {CELL_US} - 1"),
                F.expr(f"p_tus div {CELL_US}"),
                F.expr(f"p_tus div {CELL_US} + 1"),
            )
        ),
    )
    cand = (
        p_cells.join(e_cells, ["user_id", "cell"])
        .withColumn("dist_us", F.abs(F.col("e_tus") - F.col("p_tus")))
        .filter(F.col("dist_us") <= NEAR_US)
    )
    w = W.partitionBy("p_id").orderBy("dist_us", "e_tus", "e_id")
    return (
        cand.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("p_id", "user_id", "e_id", "dist_us")
    )


@query(
    "ml_knn_classify",
    oracle=f"""
    WITH te AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
      FROM embeddings WHERE vec_id % 5 = 0),
    tr AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
      FROM embeddings WHERE vec_id % 5 <> 0),
    sc AS (
      SELECT te.vec_id, te.label AS true_label, tr.vec_id AS t_id,
             tr.label AS t_label,
             FLOOR(list_cosine_similarity(te.v, tr.v) * 10000 + 0.5) / 10000
               AS cos
      FROM te, tr),
    nn AS (
      SELECT vec_id, true_label, t_label,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, t_id) AS r
      FROM sc),
    votes AS (
      SELECT vec_id, true_label, t_label,
             CAST(COUNT(*) AS BIGINT) AS n_votes
      FROM nn WHERE r <= {KNN_K} GROUP BY 1, 2, 3),
    win AS (
      SELECT vec_id, true_label, t_label AS pred_label,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY n_votes DESC, t_label) AS r
      FROM votes)
    SELECT vec_id, CAST(true_label AS BIGINT) AS true_label,
           CAST(pred_label AS BIGINT) AS pred_label
    FROM win WHERE r = 1
    """,
)
def ml_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN cosine classification of the vec_id%5 holdout against the
    training rest: per test vector, majority label of the 5 nearest
    train vectors (cosine rounded before ranking; all tiebreaks
    explicit, so the neighbor set and the vote are cross-engine exact).

    Scale: the holdout frame broadcasts (queries are the small side by
    construction); scoring is a narrow map over train partitions;
    per-query neighbor selection would use the _local_topk_per_q
    pre-prune from similarity.py before the window at real query
    volumes. Votes and argmax run on |test|·K rows."""
    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        F.col("label").cast("long").alias("label"),
    )
    from mister_spark.functions.vectors import dot as _dot, norm as _norm

    te = emb.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("label").alias("true_label"),
    )
    tr = emb.filter(F.col("vec_id") % 5 != 0).select(
        F.col("vec_id").alias("t_id"), "v", F.col("label").alias("t_label")
    )
    sc = tr.join(F.broadcast(te)).withColumn(
        "cos", rnd(_dot("v", "qv") / (_norm("v") * _norm("qv")), 4)
    )
    w_nn = W.partitionBy("q_id").orderBy(F.col("cos").desc(), "t_id")
    nn = sc.withColumn("r", F.row_number().over(w_nn)).filter(F.col("r") <= KNN_K)
    votes = nn.groupBy("q_id", "true_label", "t_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    w_v = W.partitionBy("q_id").orderBy(F.col("n_votes").desc(), "t_label")
    return (
        votes.withColumn("r", F.row_number().over(w_v))
        .filter(F.col("r") == 1)
        .select(
            F.col("q_id").alias("vec_id"),
            "true_label",
            F.col("t_label").alias("pred_label"),
        )
    )


@query(
    "io_csv_query",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS total
    FROM orders GROUP BY 1
    """,
)
def io_csv_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over a CSV staging of orders (written once per
    testdata generation, marker-invalidated): explicit schema, header
    row, ISO timestamp parsing — the untyped-ingest entry point every
    lake has. The oracle runs on the typed parquet original, so parity
    proves the CSV round-trip is lossless for this schema.

    Scale: CSV scanning is line-split parallel but row-parse CPU-bound
    and prune/pushdown-free — the docstring-level advice is 'land as
    CSV, convert to parquet once' (sources/compact.py); this query
    keeps the read path honest."""
    from mister_spark.sources.staged import stage_csv_orders

    path = stage_csv_orders(spark, sf_dir)
    o = spark.read.csv(
        path,
        header=True,
        schema=(
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
        ),
    )
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), money(F.sum("o_totalprice")).alias("total")
    )


PATCH_GRID = 4


@query(
    "mm_patch_grid",
    # Real oracle: the stub header decode is integer arithmetic on the
    # byte length (w=32, h=max(4, ceil(n/32))), so the 4x4 patch rows
    # are a pure cross join with offset math.
    oracle=f"""
    WITH d AS (SELECT doc_id,
                      GREATEST({PATCH_GRID},
                               (octet_length(encode(text)) + 31) // 32)
                        AS h
               FROM documents),
    g AS (SELECT unnest(range(0, {PATCH_GRID})) AS r),
    c AS (SELECT unnest(range(0, {PATCH_GRID})) AS c)
    SELECT d.doc_id, CAST(g.r AS INT) AS p_row, CAST(c.c AS INT) AS p_col,
           CAST(c.c * (32 // {PATCH_GRID}) AS INT) AS x0,
           CAST(g.r * (d.h // {PATCH_GRID}) AS INT) AS y0,
           CAST(32 // {PATCH_GRID} AS INT) AS pw,
           CAST(d.h // {PATCH_GRID} AS INT) AS ph
    FROM d, g, c
    """,
)
def mm_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patch-grid metadata for ViT-style preprocessing: each binary
    payload is 'decoded' to (width, height) by the deterministic stub
    (real codecs absent in this container — the dims are derived from
    byte length exactly as PIL would read a header), then tiled into a
    4×4 grid of patch rows with pixel offsets. The Spark side is real:
    Arrow-batched mapInPandas, stable output schema, 16 rows per doc.

    Scale: patch metadata explodes 16× the row count but carries no
    pixels; the actual pixel crop would happen in the same mapInPandas
    pass, consuming the binary column partition-locally — no shuffle
    of image bytes."""
    import pandas as pd

    docs = cat(spark, sf_dir)["documents"].select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def tile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                # stub decode: pretend a 32-px-wide image, header-derived
                w, h = 32, max(PATCH_GRID, (n + 31) // 32)
                pw, ph = w // PATCH_GRID, h // PATCH_GRID
                for r in range(PATCH_GRID):
                    for c in range(PATCH_GRID):
                        out.append(
                            (int(doc_id), r, c, c * pw, r * ph, pw, ph)
                        )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "p_row", "p_col", "x0", "y0", "pw", "ph"],
            )

    return docs.mapInPandas(
        tile,
        "doc_id long, p_row int, p_col int, x0 int, y0 int, pw int, ph int",
    )
