"""Wave 66: technical indicators, coreset selection, table history, and
parametric survival.

ev_macd composes three prefix-sum EMAs into the MACD/signal/histogram
triple (the ev_ewma closed form, reused on a derived series);
ds_coreset_kcenter is greedy k-center data selection over embeddings —
the diversity-first alternative to random sampling for training-set
curation; io_snapshot_history exposes the transactional table's commit
log as a queryable frame (DESCRIBE HISTORY); stat_weibull_fit puts a
parametric distribution on inter-event waiting times via the Weibull
plot linearization (shape≈1 certifies memoryless arrivals — the
modeling step after ev_survival's nonparametric curve).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, money, ratio
from mister_spark.registry import query

MACD_FAST = 2.0 / 13  # alpha for EMA-12
MACD_SLOW = 2.0 / 27  # alpha for EMA-26
MACD_SIG = 2.0 / 10  # alpha for EMA-9 of MACD
CORESET_K = 10
WB_BINS = 20


def _ema_sql(val: str, alpha: float, idx: str) -> str:
    """Closed-form adjust=True EMA over a windowed series (partition-
    free day grid): α-weighted prefix sum with geometric normalizer."""
    return (
        f"({alpha!r} * SUM({val} * POWER(1 - {alpha!r}, -{idx})) OVER "
        f"(ORDER BY {idx} ROWS UNBOUNDED PRECEDING)"
        f" * POWER(1 - {alpha!r}, {idx})"
        f" / (1 - POWER(1 - {alpha!r}, {idx})))"
    )


def _ema_col(val, alpha: float, idx):
    w = W.orderBy(idx).rowsBetween(W.unboundedPreceding, 0)
    acc = F.sum(val * F.pow(F.lit(1 - alpha), -idx)).over(w)
    return alpha * acc * F.pow(F.lit(1 - alpha), idx) / (
        1 - F.pow(F.lit(1 - alpha), idx)
    )


@query(
    "ev_macd",
    oracle=f"""
    WITH b AS (SELECT date_trunc('day', MIN(ts)) AS lo,
                      date_trunc('day', MAX(ts)) AS hi FROM events),
    g AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM b),
    dc AS (SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
    f AS (SELECT g.d, COALESCE(dc.n, 0) AS n,
                 ROW_NUMBER() OVER (ORDER BY g.d) AS i
          FROM g LEFT JOIN dc ON dc.d = g.d),
    e AS (SELECT d, n, i,
                 {_ema_sql("n", MACD_FAST, "i")} AS ef,
                 {_ema_sql("n", MACD_SLOW, "i")} AS es
          FROM f),
    m AS (SELECT d, n, i, ef, es, ef - es AS macd FROM e),
    s AS (SELECT d, n, ef, es, macd,
                 {_ema_sql("macd", MACD_SIG, "i")} AS sig
          FROM m)
    SELECT strftime(d, '%Y-%m-%d') AS day, n,
           FLOOR(ef * 10000 + 0.5) / 10000 AS ema_fast,
           FLOOR(es * 10000 + 0.5) / 10000 AS ema_slow,
           FLOOR(macd * 10000 + 0.5) / 10000 AS macd,
           FLOOR(sig * 10000 + 0.5) / 10000 AS signal,
           FLOOR((macd - sig) * 10000 + 0.5) / 10000 AS histogram
    FROM s
    """,
)
def ev_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD on daily event volume: fast/slow EMAs (α={f:.3f}/{s:.3f}),
    their difference (MACD), a signal EMA of the MACD line, and the
    histogram — three recursions, all expressed as ev_ewma's
    prefix-sum closed form so nothing is row-sequential. The crossover
    read (histogram sign flips) is the standard momentum signal.

    Scale: one day rollup + calendar-bounded windows; the signal EMA
    windows over the DERIVED macd column in the same grid frame."""
    ev = cat(spark, sf_dir)["events"]
    dc = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )
    f = (
        F.broadcast(grid)
        .join(dc, "d", "left")
        .select("d", F.coalesce("n", F.lit(0)).alias("n"))
        .withColumn("i", F.row_number().over(W.orderBy("d")))
    )
    i, n = F.col("i"), F.col("n")
    e = f.select(
        "d",
        "n",
        "i",
        _ema_col(n, MACD_FAST, i).alias("ef"),
        _ema_col(n, MACD_SLOW, i).alias("es"),
    )
    m = e.withColumn("macd", F.col("ef") - F.col("es"))
    s = m.withColumn("sig", _ema_col(F.col("macd"), MACD_SIG, F.col("i")))
    return s.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n",
        ratio(F.col("ef")).alias("ema_fast"),
        ratio(F.col("es")).alias("ema_slow"),
        ratio(F.col("macd")).alias("macd"),
        ratio(F.col("sig")).alias("signal"),
        ratio(F.col("macd") - F.col("sig")).alias("histogram"),
    )


ev_macd.__doc__ = ev_macd.__doc__.format(f=MACD_FAST, s=MACD_SLOW)


@query(
    "ds_coreset_kcenter",
    # Real oracle: the greedy farthest-point loop as a recursive CTE
    # whose working rows carry every point's running nearest-center
    # cosine distance; the next center is the (dmin DESC, vec_id)
    # argmax of the working table and rides in as the step's cid.
    oracle=f"""
    WITH RECURSIVE emb AS (SELECT vec_id,
                                  CAST(embedding AS DOUBLE[]) AS v
                           FROM embeddings),
    kc AS (
      SELECT 0 AS it, e.vec_id,
             1.0 - list_aggregate(list_transform(range(1, len(e.v) + 1),
                                  i -> e.v[i] * c.v[i]), 'sum')
                   / (SQRT(list_aggregate(list_transform(e.v, x -> x * x),
                                          'sum'))
                      * SQRT(list_aggregate(list_transform(c.v, x -> x * x),
                                            'sum'))) AS dmin,
             0 AS cid
      FROM emb e CROSS JOIN (SELECT v FROM emb WHERE vec_id = 0) c
      UNION ALL
      SELECT s.it + 1, s.vec_id,
             LEAST(s.dmin,
                   1.0 - list_aggregate(list_transform(
                             range(1, len(ev.v) + 1),
                             i -> ev.v[i] * cv.v[i]), 'sum')
                         / (SQRT(list_aggregate(
                                list_transform(ev.v, x -> x * x), 'sum'))
                            * SQRT(list_aggregate(
                                list_transform(cv.v, x -> x * x), 'sum')))),
             nx.nid
      FROM kc s
      CROSS JOIN (SELECT vec_id AS nid FROM kc
                  ORDER BY dmin DESC, vec_id LIMIT 1) nx
      JOIN emb cv ON cv.vec_id = nx.nid
      JOIN emb ev ON ev.vec_id = s.vec_id
      WHERE s.it < {CORESET_K} - 1
    )
    SELECT CAST(it AS INT) AS iteration,
           CAST(MAX(cid) AS BIGINT) AS center_vec_id,
           FLOOR(MAX(dmin) * 10000 + 0.5) / 10000 AS coverage_radius
    FROM kc GROUP BY it
    """,
)
def ds_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection over the embedding corpus
    (k={k}, cosine distance): start from vec 0, repeatedly add the
    point FARTHEST from its nearest chosen center, reporting the
    coverage radius after each pick — the 2-approximation to optimal
    k-center, and the diversity-first alternative to random sampling
    when curating a small high-coverage training subset.

    Scale: each round is one corpus scan with the current centers as a
    broadcast array (k ≤ {k} vectors), keeping a running min-distance
    column; the argmax is a 1-row aggregation (max_by), never a sort.
    O(k) rounds, O(k·d) broadcast state."""
    import math

    from mister_spark.functions.vectors import dot as vdot, norm as vnorm

    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).localCheckpoint()
    first = emb.filter(F.col("vec_id") == 0).collect()[0]
    centers = [(0, list(first["v"]))]
    # running nearest-center distance, updated incrementally per round
    cur = emb.withColumn("dmin", F.lit(float("inf")))
    rows_out = []
    for it in range(CORESET_K):
        cid, cvec = centers[-1]
        cv = F.array(*[F.lit(float(x)) for x in cvec])
        d_new = 1.0 - vdot("v", cv) / (vnorm("v") * vnorm(cv))
        cur = cur.withColumn("dmin", F.least(F.col("dmin"), d_new)).localCheckpoint()
        far = cur.agg(
            F.max_by("vec_id", F.struct(F.col("dmin"), -F.col("vec_id"))).alias(
                "vid"
            ),
            F.max("dmin").alias("radius"),
        ).collect()[0]
        rows_out.append(
            (
                it,
                int(cid),
                float(math.floor(far["radius"] * 10000 + 0.5) / 10000),
            )
        )
        nxt = emb.filter(F.col("vec_id") == far["vid"]).collect()[0]
        centers.append((int(far["vid"]), list(nxt["v"])))
    return spark.createDataFrame(
        rows_out, "iteration int, center_vec_id long, coverage_radius double"
    ).orderBy("iteration")


ds_coreset_kcenter.__doc__ = ds_coreset_kcenter.__doc__.format(k=CORESET_K)


@query(
    "io_snapshot_history",
    # Real oracle: the 4-commit structure is fixed (create evens = 1
    # dir, append odds = 2, the 0-99 delete touches both dirs, the %7
    # merge rewrites both + adds one) and every version's live rows
    # reduce to relational counts: the merge re-inserts exactly the
    # %7 keys the delete removed.
    oracle="""
    WITH c AS (SELECT
      CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS evens,
      CAST(COUNT(*) AS BIGINT) AS n_all,
      CAST(SUM(CASE WHEN o_orderkey BETWEEN 0 AND 99 THEN 1 ELSE 0 END)
           AS BIGINT) AS d99,
      CAST(SUM(CASE WHEN o_orderkey % 7 = 0
                     AND o_orderkey BETWEEN 0 AND 99
                    THEN 1 ELSE 0 END) AS BIGINT) AS r799
     FROM orders)
    SELECT CAST(0 AS INT) AS version, 'create' AS op,
           CAST(1 AS INT) AS n_dirs, evens AS live_rows FROM c
    UNION ALL SELECT 1, 'append', 2, n_all FROM c
    UNION ALL SELECT 2, 'delete_range', 2, n_all - d99 FROM c
    UNION ALL SELECT 3, 'merge', 3, n_all - d99 + r799 FROM c
    """,
)
def io_snapshot_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY for the transactional snapshot table: build a
    4-commit table (create → append → delete_range → merge) and expose
    the commit log — version, operation, live data dirs, live rows —
    as a queryable frame. The audit surface every table format ships;
    io_snapshot_changes is the row-level CDC complement.

    Scale: pure manifest metadata, O(#versions · #dirs) driver work."""
    import os
    import uuid

    from mister_spark.sources.snapshots import SnapshotTable
    from mister_spark.sources.staged import REPO_TMP

    path = os.path.join(REPO_TMP, f"snap_hist_{uuid.uuid4().hex[:8]}")
    t = SnapshotTable(spark, path, stats_cols=["o_orderkey"])
    orders = cat(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t.create(orders.filter(F.col("o_orderkey") % 2 == 0))
    t.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    t.delete_range("o_orderkey", 0, 99)
    t.merge(
        orders.filter(F.col("o_orderkey") % 7 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 1.05
        ),
        "o_orderkey",
    )
    out = []
    for man in t.history():
        rows = sum(e["rows"] for e in man["entries"])
        out.append(
            (man["version"], man["op"], len(man["entries"]), int(rows))
        )
    return spark.createDataFrame(
        out, "version int, op string, n_dirs int, live_rows long"
    ).orderBy("version")


@query(
    "stat_weibull_fit",
    oracle=f"""
    WITH o AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
               FROM events),
    s AS (SELECT CAST(t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                      AS DOUBLE) AS dur
          FROM o),
    pos AS (SELECT dur FROM s WHERE dur > 0),
    mx AS (SELECT MAX(dur) AS m, CAST(COUNT(*) AS DOUBLE) AS n FROM pos),
    b AS (SELECT LEAST(CAST(FLOOR(pos.dur / mx.m * {WB_BINS}) AS BIGINT),
                       {WB_BINS - 1}) AS bin,
                 CAST(COUNT(*) AS DOUBLE) AS c
          FROM pos CROSS JOIN mx GROUP BY 1),
    cf AS (SELECT b.bin, SUM(b2.c) AS cum
           FROM b JOIN b b2 ON b2.bin <= b.bin GROUP BY 1),
    pt AS (SELECT cf.bin,
                  ln(CAST(cf.bin + 1 AS DOUBLE) / {WB_BINS} * mx.m) AS x,
                  ln(-ln(1.0 - cf.cum / mx.n)) AS y
           FROM cf CROSS JOIN mx
           WHERE cf.cum / mx.n < 1.0 AND cf.cum / mx.n > 0.0),
    r AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
          FROM pt)
    SELECT CAST((SELECT n FROM mx) AS BIGINT) AS n_gaps,
           FLOOR((k * sxy - sx * sy) / (k * sxx - sx * sx) * 10000 + 0.5)
             / 10000 AS shape,
           FLOOR(EXP(-((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx)
                       / k)
                     / ((k * sxy - sx * sy) / (k * sxx - sx * sx)))
                 * 100 + 0.5) / 100 AS scale_s,
           FLOOR((k * sxy - sx * sy) * (k * sxy - sx * sy)
                 / ((k * sxx - sx * sx) * (k * syy - sy * sy))
                 * 10000 + 0.5) / 10000 AS r2
    FROM r
    """,
)
def stat_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull fit of inter-event waiting times via the Weibull-plot
    linearization: binned empirical CDF → regress ln(−ln(1−F)) on
    ln(t) — slope is the shape k (k≈1 means memoryless/Poisson
    arrivals, k<1 bursty, k>1 regular), scale λ from the intercept.
    The parametric model on top of ev_survival's nonparametric curve
    (activity SPANS are degenerate here — every synthetic user spans
    the whole month — so the op models the gaps, where the shape
    question is real).

    Scale: the gap lag partitions by user; then a {b}-bin histogram
    and one regression row."""
    ev = cat(spark, sf_dir)["events"]
    wu = W.partitionBy("user_id").orderBy("t")
    o = ev.select("user_id", F.unix_timestamp("ts").alias("t"))
    s = (
        o.withColumn("dur", (F.col("t") - F.lag("t").over(wu)).cast("double"))
        .filter(F.col("dur") > 0)
        .select("dur")
    )
    mx = s.agg(
        F.max("dur").alias("m"), F.count(F.lit(1)).cast("double").alias("n")
    )
    b = (
        s.join(F.broadcast(mx))
        .groupBy(
            F.least(
                F.floor(F.col("dur") / F.col("m") * WB_BINS).cast("bigint"),
                F.lit(WB_BINS - 1),
            ).alias("bin")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    wcum = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    cf = b.withColumn("cum", F.sum("c").over(wcum))
    pt = (
        cf.join(F.broadcast(mx))
        .filter((F.col("cum") / F.col("n") < 1.0) & (F.col("cum") / F.col("n") > 0.0))
        .select(
            F.log((F.col("bin") + 1).cast("double") / WB_BINS * F.col("m")).alias("x"),
            F.log(-F.log(1.0 - F.col("cum") / F.col("n"))).alias("y"),
        )
    )
    x, y = F.col("x"), F.col("y")
    r = pt.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    k, sx, sy = F.col("k"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    shape = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    icept = (sy - shape * sx) / k
    return r.join(F.broadcast(mx.select(F.col("n").alias("nn")))).select(
        F.col("nn").cast("bigint").alias("n_gaps"),
        ratio(shape).alias("shape"),
        money(F.exp(-icept / shape)).alias("scale_s"),
        ratio(
            (k * sxy - sx * sy)
            * (k * sxy - sx * sy)
            / ((k * sxx - sx * sx) * (k * syy - sy * sy))
        ).alias("r2"),
    )


stat_weibull_fit.__doc__ = stat_weibull_fit.__doc__.format(b=WB_BINS)
