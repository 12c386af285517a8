"""Wave 107: retention curve fitting, parquet row-group tuning, and
degree power-law testing.

ev_retention_decay_fit fits the power-law retention curve
r(t) = c·t^(−β) to the pooled day-offset retention (log-log OLS) and
projects the horizon rates — the 'what will D30 look like' answer a
raw retention triangle can't give; io_rowgroup_tuning writes the
same data with small vs large parquet row groups and counts, from
footer min/max stats alone, how many groups a selective predicate
could skip under each — the knob that trades open() overhead against
skip granularity; graph_degree_powerlaw tests whether the
co-purchase degree distribution is scale-free (Hill tail index on
degrees + the share a log-log line explains).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras47 import _copurchase_edges
from mister_spark.registry import query

RET_MAX_OFFSET = 21
RG_PROBE_KEY = 42  # selective predicate: o_custkey = this
DEG_TAIL_K = 30


@query(
    "ev_retention_decay_fit",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events),
    cohorts AS (
      SELECT user_id, day,
             MIN(day) OVER (PARTITION BY user_id) AS cohort
      FROM days),
    off AS (SELECT date_diff('day', cohort, day) AS t,
                   user_id
            FROM cohorts),
    base AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n0 FROM off),
    r AS (SELECT t, COUNT(DISTINCT user_id) / base.n0 AS rate
          FROM off, base
          WHERE t BETWEEN 1 AND {RET_MAX_OFFSET}
          GROUP BY t, base.n0),
    fit AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   SUM(LN(CAST(t AS DOUBLE))) AS sx,
                   SUM(LN(rate)) AS sy,
                   SUM(LN(CAST(t AS DOUBLE)) * LN(rate)) AS sxy,
                   SUM(LN(CAST(t AS DOUBLE)) * LN(CAST(t AS DOUBLE))) AS sxx
            FROM r WHERE rate > 0)
    SELECT FLOOR(-((n * sxy - sx * sy) / (n * sxx - sx * sx))
                 * 10000 + 0.5) / 10000 AS beta,
           FLOOR(EXP((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                     / n) * 10000 + 0.5) / 10000 AS c,
           FLOOR(EXP((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                     / n)
                 * POW(30.0, (n * sxy - sx * sy) / (n * sxx - sx * sx))
                 * 10000 + 0.5) / 10000 AS projected_d30
    FROM fit
    """,
)
def ev_retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law retention fit r(t) = c·t^(−β) on pooled day-offset
    retention rates (offsets 1..{m}, log-log OLS): β is the decay
    shape — the single number that compares products — and the
    extrapolated D30 turns a 3-week window into a horizon estimate.
    (Power-law, not exponential: empirical retention curves flatten,
    and the log-log line captures that.)

    Scale: retention offsets come from the distinct (user, day) frame
    (one shuffle); the fit is a 21-row OLS — the projection is
    closed-form arithmetic."""
    ev = cat(spark, sf_dir)["events"]
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    w = W.partitionBy("user_id")
    off = days.select(
        "user_id",
        F.datediff("day", F.min("day").over(w)).alias("t"),
    )
    n0 = off.select("user_id").distinct().count()
    r = (
        off.filter((F.col("t") >= 1) & (F.col("t") <= RET_MAX_OFFSET))
        .groupBy("t")
        .agg(
            (F.countDistinct("user_id") / F.lit(float(n0))).alias("rate")
        )
        .filter(F.col("rate") > 0)
    )
    lx = F.log(F.col("t").cast("double"))
    ly = F.log("rate")
    fit = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * ly).alias("sxy"),
        F.sum(lx * lx).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    icept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return fit.select(
        ratio(-slope).alias("beta"),
        ratio(F.exp(icept)).alias("c"),
        ratio(F.exp(icept) * F.pow(F.lit(30.0), slope)).alias(
            "projected_d30"
        ),
    )


ev_retention_decay_fit.__doc__ = ev_retention_decay_fit.__doc__.format(
    m=RET_MAX_OFFSET
)


@query("io_rowgroup_tuning")  # layout experiment → rows-only
def io_rowgroup_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-group size tuning: write orders sorted by custkey once with
    tiny (64 KB) and once with default (128 MB) parquet row groups,
    then — from footer min/max stats alone — count how many row groups
    a selective `o_custkey = {k}` probe could SKIP under each layout.
    Small groups skip surgically but multiply open/seek overhead and
    footer size; large groups amortize I/O but drag whole groups in
    for one row. The report makes the trade a number instead of a
    vibe.

    Scale: two writes + metadata-only probes; the skip counting reads
    zero data pages."""
    import pyarrow.parquet as pq

    repo_tmp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp"
    )
    base = os.path.join(repo_tmp, "rg_tuning")
    shutil.rmtree(base, ignore_errors=True)
    orders = cat(spark, sf_dir)["orders"].orderBy("o_custkey")
    layouts = {"small": 64 * 1024, "large": 128 * 1024 * 1024}
    rows = []
    for name, blk in layouts.items():
        d = os.path.join(base, name)
        (
            orders.coalesce(1)
            .write.mode("overwrite")
            .option("parquet.block.size", str(blk))
            .parquet(d)
        )
        groups = 0
        skippable = 0
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                groups += 1
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if col.path_in_schema == "o_custkey":
                        st = col.statistics
                        if st is not None and (
                            st.min > RG_PROBE_KEY or st.max < RG_PROBE_KEY
                        ):
                            skippable += 1
        rows.append(
            (
                name,
                groups,
                skippable,
                round(skippable / groups, 4) if groups else 0.0,
            )
        )
    return spark.createDataFrame(
        rows,
        "layout string, row_groups long, skippable_groups long, "
        "skip_fraction double",
    )


io_rowgroup_tuning.__doc__ = io_rowgroup_tuning.__doc__.format(
    k=RG_PROBE_KEY
)


@query(
    "graph_degree_powerlaw",
    oracle=f"""
    WITH e AS (SELECT p1, p2 FROM (
      SELECT x.l_orderkey, x.l_partkey AS p1, y.l_partkey AS p2
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) x
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey)
      GROUP BY p1, p2 HAVING COUNT(*) >= 3),
    sym AS (SELECT p1 AS u FROM e UNION ALL SELECT p2 FROM e),
    deg AS (SELECT u, CAST(COUNT(*) AS DOUBLE) AS d FROM sym GROUP BY 1),
    top AS (SELECT d FROM deg ORDER BY d DESC, u LIMIT {DEG_TAIL_K + 1}),
    xm AS (SELECT MIN(d) AS dmin FROM top),
    hill AS (SELECT SUM(LN(d / xm.dmin)) AS slog FROM top, xm)
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS nodes,
           CAST(FLOOR((SELECT MAX(d) FROM deg) + 0.5) AS BIGINT)
             AS max_degree,
           FLOOR({DEG_TAIL_K} / hill.slog * 10000 + 0.5) / 10000
             AS hill_alpha
    FROM hill
    """,
)
def graph_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-free test for the co-purchase graph: Hill tail index on
    the top-{k} node degrees — α around 2–3 is the scale-free
    signature (hubs dominate; mean degree misleads), larger α means a
    homogeneous graph where per-node averages are meaningful. The
    basket-capped builder bounds the max degree, so this also audits
    how much the cap truncates the natural tail. (Uncapped pair
    counts here — the cap audit needs the raw tail.)

    Scale: degrees are one rollup; the tail is a distributed
    TakeOrdered of {k}+1 rows; Hill is (k+1)-row arithmetic."""
    li = cat(spark, sf_dir)["lineitem"]
    b = li.select("l_orderkey", "l_partkey").distinct()
    x = b.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1"))
    y = b.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2"))
    e = (
        x.join(y, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 3)
    )
    sym = e.select(F.col("p1").alias("u")).unionByName(
        e.select(F.col("p2").alias("u"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("double").alias("d"))
    top = deg.orderBy(F.col("d").desc(), "u").limit(DEG_TAIL_K + 1)
    xm = top.agg(F.min("d").alias("dmin"))
    hill = top.crossJoin(F.broadcast(xm)).agg(
        F.sum(F.log(F.col("d") / F.col("dmin"))).alias("slog")
    )
    stats = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("nodes"),
        F.floor(F.max("d") + 0.5).alias("max_degree"),
    )
    return stats.crossJoin(F.broadcast(hill)).select(
        "nodes",
        "max_degree",
        ratio(DEG_TAIL_K / F.col("slog")).alias("hill_alpha"),
    )


graph_degree_powerlaw.__doc__ = graph_degree_powerlaw.__doc__.format(
    k=DEG_TAIL_K
)
