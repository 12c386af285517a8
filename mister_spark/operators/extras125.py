"""Wave 125: queueing what-ifs, quality-length dependence, and nested
schema pruning.

ev_erlang_c turns measured arrival rates into staffing math: the
Erlang-C waiting probability and expected wait for 1..8 servers at
an assumed service rate (via the engine-shared ln-factorial) — the
closed-form answer to 'how many workers until the queue melts';
ds_quality_length_mi measures the mutual information between
document length and quality buckets — if the two are dependent, a
length cap IS a quality intervention and should be tuned as one;
io_nested_pruning writes a struct-nested table and proves the scan
reads ONLY the requested subfield (schema pruning), the nested
cousin of column pruning.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.special import ln_fact, ln_fact_sql
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

EC_SERVERS = (1, 2, 3, 4, 6, 8)
EC_SERVICE_PER_HOUR = 30.0  # assumed per-server service rate
MI_BINS = 4


def _erlang_terms_sql() -> str:
    # sum_{k=0}^{c-1} a^k / k! with a = offered load, via EXP(k ln a - ln k!)
    terms = []
    for k in range(8):
        terms.append(
            f"CASE WHEN {k} < c THEN EXP({k} * LN(a) - {ln_fact_sql(str(k))})"
            " ELSE 0 END"
        )
    return " + ".join(terms)


@query(
    "ev_erlang_c",
    oracle=f"""
    WITH lam AS (SELECT CAST(COUNT(*) AS DOUBLE)
                        / NULLIF(CAST(FLOOR((epoch_us(MAX(ts))
                                             - epoch_us(MIN(ts)))
                                            / 3600000000) AS DOUBLE), 0)
                   AS arrivals_per_hour
                 FROM events),
    grid AS (SELECT v.c, lam.arrivals_per_hour,
                    lam.arrivals_per_hour / {EC_SERVICE_PER_HOUR} AS a
             FROM (VALUES {", ".join(f"({c})" for c in EC_SERVERS)}) v(c),
                  lam),
    f AS (SELECT c, arrivals_per_hour, a,
                 a / c AS rho,
                 EXP(c * LN(a) - {ln_fact_sql("c")}) AS top,
                 {_erlang_terms_sql()} AS s
          FROM grid),
    ec AS (SELECT c, arrivals_per_hour, rho,
                  CASE WHEN rho >= 1 THEN 1.0
                       ELSE (top / (1 - rho))
                            / (s + top / (1 - rho)) END AS p_wait
           FROM f)
    SELECT CAST(c AS BIGINT) AS servers,
           FLOOR(arrivals_per_hour * 10000 + 0.5) / 10000
             AS arrivals_per_hour,
           FLOOR(rho * 10000 + 0.5) / 10000 AS utilization,
           FLOOR(p_wait * 10000 + 0.5) / 10000 AS p_wait,
           FLOOR(CASE WHEN rho >= 1 THEN 9999.0
                 ELSE p_wait / (c * {EC_SERVICE_PER_HOUR} * (1 - rho)) * 60
                 END * 10000 + 0.5) / 10000 AS avg_wait_minutes
    FROM ec
    """,
)
def ev_erlang_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erlang-C staffing curve: measured event arrival rate against
    an assumed {mu}/hour per-server service rate; for each staffing
    level, the utilization, probability an arrival waits, and the
    expected wait — computed with the engine-shared Stirling
    ln-factorial so both engines agree bit-for-bit. The closed-form
    queueing what-if that takes a meeting's worth of argument off the
    table (ρ ≥ 1 rows report saturation explicitly).

    Scale: the rate is one aggregate; the staffing grid is a 6-row
    broadcast of pure arithmetic."""
    ev = cat(spark, sf_dir)["events"]
    lam = ev.agg(
        (
            F.count(F.lit(1)).cast("double")
            / F.nullif(
                (
                    F.floor(
                        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                        / 3600000000
                    )
                ).cast("double"),
                F.lit(0.0),
            )
        ).alias("arrivals_per_hour")
    )
    grid = spark.createDataFrame(
        [(c,) for c in EC_SERVERS], "c int"
    )
    g = grid.crossJoin(F.broadcast(lam)).withColumn(
        "a", F.col("arrivals_per_hour") / EC_SERVICE_PER_HOUR
    )
    rho = F.col("a") / F.col("c")
    top = F.exp(F.col("c") * F.log("a") - ln_fact(F.col("c")))
    s = None
    for k in range(8):
        term = F.when(
            F.lit(k) < F.col("c"),
            F.exp(F.lit(k) * F.log("a") - ln_fact(F.lit(k))),
        ).otherwise(0.0)
        s = term if s is None else s + term
    p_wait = F.when(rho >= 1, 1.0).otherwise(
        (top / (1 - rho)) / (s + top / (1 - rho))
    )
    wait_min = F.when(rho >= 1, 9999.0).otherwise(
        p_wait / (F.col("c") * EC_SERVICE_PER_HOUR * (1 - rho)) * 60
    )
    return g.select(
        F.col("c").cast("bigint").alias("servers"),
        ratio(F.col("arrivals_per_hour")).alias("arrivals_per_hour"),
        ratio(rho).alias("utilization"),
        ratio(p_wait).alias("p_wait"),
        ratio(wait_min).alias("avg_wait_minutes"),
    )


ev_erlang_c.__doc__ = ev_erlang_c.__doc__.format(mu=EC_SERVICE_PER_HOUR)


@query(
    "ds_quality_length_mi",
    oracle=f"""
    WITH t AS (SELECT CAST(len({DUCK_TOKENS}) AS DOUBLE) AS tok,
                      CAST(len(list_distinct({DUCK_TOKENS})) AS DOUBLE)
                        / len({DUCK_TOKENS}) AS q
               FROM documents WHERE len({DUCK_TOKENS}) > 0),
    rng AS (SELECT MIN(tok) AS tlo, MAX(tok) AS thi,
                   MIN(q) AS qlo, MAX(q) AS qhi FROM t),
    b AS (SELECT LEAST(CAST(FLOOR((tok - rng.tlo)
                       / ((rng.thi - rng.tlo) / {MI_BINS} + 1e-9))
                       AS BIGINT), {MI_BINS} - 1) AS tb,
                 LEAST(CAST(FLOOR((q - rng.qlo)
                       / ((rng.qhi - rng.qlo) / {MI_BINS} + 1e-9))
                       AS BIGINT), {MI_BINS} - 1) AS qb
          FROM t, rng),
    j AS (SELECT tb, qb, CAST(COUNT(*) AS DOUBLE) AS c FROM b GROUP BY 1, 2),
    n AS (SELECT SUM(c) AS n FROM j),
    mt AS (SELECT tb, SUM(c) AS ct FROM j GROUP BY 1),
    mq AS (SELECT qb, SUM(c) AS cq FROM j GROUP BY 1)
    SELECT CAST(n.n AS BIGINT) AS docs,
           FLOOR(SUM(j.c / n.n * LN(j.c * n.n / (mt.ct * mq.cq)))
                 * 10000 + 0.5) / 10000 AS mutual_information
    FROM j JOIN mt ON j.tb = mt.tb JOIN mq ON j.qb = mq.qb, n
    GROUP BY n.n
    """,
)
def ds_quality_length_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between document length and quality
    (distinct-token ratio), each cut into {b} equal-range bins: MI ≈ 0
    means length caps and quality filters act independently; large MI
    means a length policy silently IS a quality policy and the two
    thresholds must be tuned jointly.

    Scale: binning is map-side against a broadcast range row; the
    joint histogram is a {b}×{b} aggregate and MI is arithmetic on
    it."""
    toks = tokens()
    t = (
        cat(spark, sf_dir)["documents"]
        .select(
            F.size(toks).cast("double").alias("tok"),
            (
                F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
            ).alias("q"),
        )
        .filter(F.col("tok") > 0)
    )
    rng = t.agg(
        F.min("tok").alias("tlo"),
        F.max("tok").alias("thi"),
        F.min("q").alias("qlo"),
        F.max("q").alias("qhi"),
    )
    b = t.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.floor(
                (F.col("tok") - F.col("tlo"))
                / ((F.col("thi") - F.col("tlo")) / MI_BINS + 1e-9)
            ).cast("bigint"),
            F.lit(MI_BINS - 1),
        ).alias("tb"),
        F.least(
            F.floor(
                (F.col("q") - F.col("qlo"))
                / ((F.col("qhi") - F.col("qlo")) / MI_BINS + 1e-9)
            ).cast("bigint"),
            F.lit(MI_BINS - 1),
        ).alias("qb"),
    )
    j = b.groupBy("tb", "qb").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    ).localCheckpoint()
    n = j.agg(F.sum("c").alias("n"))
    mt = j.groupBy("tb").agg(F.sum("c").alias("ct"))
    mq = j.groupBy("qb").agg(F.sum("c").alias("cq"))
    return (
        j.join(F.broadcast(mt), "tb")
        .join(F.broadcast(mq), "qb")
        .crossJoin(F.broadcast(n))
        .groupBy("n")
        .agg(
            ratio(
                F.sum(
                    F.col("c")
                    / F.col("n")
                    * F.log(
                        F.col("c") * F.col("n") / (F.col("ct") * F.col("cq"))
                    )
                )
            ).alias("mutual_information")
        )
        .select(
            F.col("n").cast("bigint").alias("docs"), "mutual_information"
        )
    )


ds_quality_length_mi.__doc__ = ds_quality_length_mi.__doc__.format(b=MI_BINS)


@query(
    "io_nested_pruning",
    # Real oracle: the struct rollup is a priority count and the scan
    # must prune to the one subfield (flag pinned 1).
    oracle="""
    SELECT o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(1 AS BIGINT) AS schema_pruned
    FROM orders GROUP BY 1
    """,
)
def io_nested_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested schema pruning: write orders with the payload folded
    into a STRUCT (meta.priority, meta.price, meta.status), then read
    only meta.priority — the physical scan's ReadSchema must contain
    just that subfield, not the whole struct (pinned in pytest). The
    nested cousin of column pruning, and the reason struct-typed
    tables don't pay for fields they don't read.

    Scale: pruning is the point — the scan reads one subfield's
    pages."""
    repo_tmp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp"
    )
    loc = os.path.join(repo_tmp, "nested_demo")
    shutil.rmtree(loc, ignore_errors=True)
    orders = cat(spark, sf_dir)["orders"]
    nested = orders.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderstatus").alias("status"),
        ).alias("meta"),
    )
    nested.write.mode("overwrite").parquet(loc)
    rd = spark.read.parquet(loc)
    out = rd.groupBy(F.col("meta.priority").alias("priority")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    pruned = int(
        "priority" in plan and "price" not in plan.split("ReadSchema")[-1]
    )
    rows = out.collect()
    return spark.createDataFrame(
        [(r["priority"], r["n"], pruned) for r in rows],
        "priority string, n long, schema_pruned long",
    )
