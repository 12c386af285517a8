"""Wave 132: instrumental variables, scan-cost modeling, and review
sampling.

stat_iv_wald runs the Wald/2SLS instrumental-variable estimator on a
synthesized z→x→y chain, with the FIRST-STAGE F statistic that
separates usable instruments from weak-instrument fiction;
io_scan_cost_model prices every table scan in $ terms (bytes ×
rate) and shows what column pruning saves — the FinOps row for a
query review; ds_review_sample emits a deterministic stratified
human-review manifest (per source × length bucket) — the QA sample
that is reproducible across reruns because it is hash-ranked, not
random.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.hashing import FP_MOD, FP_MUL
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

SCAN_PRICE_PER_TB = 5.0  # $/TB scanned (BigQuery-style pricing)
REVIEW_PER_STRATUM = 2


@query(
    "stat_iv_wald",
    oracle=f"""
    WITH d0 AS (SELECT o_orderkey,
                       CAST((o_orderkey * {FP_MUL} + 11) % {FP_MOD} % 2
                            AS DOUBLE) AS z,
                       o_totalprice
                FROM orders),
    d AS (SELECT z,
                 z * 5
                   + CAST((o_orderkey * {FP_MUL} + 13) % {FP_MOD} % 100
                          AS DOUBLE) / 10 AS x,
                 (z * 5
                  + CAST((o_orderkey * {FP_MUL} + 13) % {FP_MOD} % 100
                         AS DOUBLE) / 10) * 2
                   + CAST((o_orderkey * {FP_MUL} + 17) % {FP_MOD} % 100
                          AS DOUBLE) / 10 AS y
          FROM d0),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 AVG(z) AS mz, AVG(x) AS mx, AVG(y) AS my,
                 SUM(z * x) AS szx, SUM(z * y) AS szy,
                 SUM(z * z) AS szz, SUM(x * x) AS sxx
          FROM d),
    c AS (SELECT n,
                 szx - n * mz * mx AS czx,
                 szy - n * mz * my AS czy,
                 szz - n * mz * mz AS czz,
                 sxx - n * mx * mx AS cxx
          FROM m),
    f AS (SELECT n, czy / czx AS beta_iv,
                 czx / czz AS pi1,
                 (czx * czx / czz) / ((cxx - czx * czx / czz) / (n - 2))
                   AS f_first
          FROM c)
    SELECT CAST(n AS BIGINT) AS n,
           FLOOR(beta_iv * 10000 + 0.5) / 10000 AS beta_iv,
           FLOOR(pi1 * 10000 + 0.5) / 10000 AS first_stage_coef,
           FLOOR(f_first * 10000 + 0.5) / 10000 AS first_stage_f
    FROM f
    """,
)
def stat_iv_wald(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumental-variable (Wald/2SLS) estimation on a synthesized
    causal chain: binary instrument z shifts x (plus hash noise), x
    drives y with TRUE effect 2 (plus independent noise) — β_IV =
    cov(z,y)/cov(z,x) must recover ≈2, and the first-stage F (rule of
    thumb: > 10 or the instrument is too weak to trust) ships
    alongside. The whole estimator is moment arithmetic, which is why
    IV scales to any data size trivially — finding a valid z is the
    hard part, and no query solves that.

    Scale: one moments pass; closed-form algebra after."""
    okey = F.col("o_orderkey")
    z = ((okey * FP_MUL + 11) % FP_MOD % 2).cast("double")
    noise_x = ((okey * FP_MUL + 13) % FP_MOD % 100).cast("double") / 10
    x = z * 5 + noise_x
    noise_y = ((okey * FP_MUL + 17) % FP_MOD % 100).cast("double") / 10
    y = x * 2 + noise_y
    d = cat(spark, sf_dir)["orders"].select(
        z.alias("z"), x.alias("x"), y.alias("y")
    )
    m = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("z").alias("mz"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.sum(F.col("z") * F.col("x")).alias("szx"),
        F.sum(F.col("z") * F.col("y")).alias("szy"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n")
    czx = F.col("szx") - n * F.col("mz") * F.col("mx")
    czy = F.col("szy") - n * F.col("mz") * F.col("my")
    czz = F.col("szz") - n * F.col("mz") * F.col("mz")
    cxx = F.col("sxx") - n * F.col("mx") * F.col("mx")
    beta = czy / czx
    pi1 = czx / czz
    f_first = (czx * czx / czz) / ((cxx - czx * czx / czz) / (n - 2))
    return m.select(
        n.cast("bigint").alias("n"),
        ratio(beta).alias("beta_iv"),
        ratio(pi1).alias("first_stage_coef"),
        ratio(f_first).alias("first_stage_f"),
    )


@query("io_scan_cost_model")  # FinOps pricing → rows-only
def io_scan_cost_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-cost model at ${p}/TB (columnar, BigQuery-style pricing):
    per table, the full-scan cost and the cost of a typical pruned
    scan (the 2 hottest columns, priced from actual per-column footer
    bytes) — the FinOps row showing what column pruning is worth in
    currency, which lands harder than 'bytes' in a query review.

    Scale: footer metadata only."""
    import os

    import pyarrow.parquet as pq

    tables = {
        "lineitem": ["l_orderkey", "l_extendedprice"],
        "orders": ["o_orderkey", "o_totalprice"],
        "events": ["user_id", "ts"],
    }
    rows = []
    for t, hot in tables.items():
        p = os.path.join(sf_dir, f"{t}.parquet")
        files = (
            [p]
            if os.path.isfile(p)
            else [
                os.path.join(p, f)
                for f in os.listdir(p)
                if f.endswith(".parquet")
            ]
        )
        total = 0
        hot_bytes = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    total += col.total_compressed_size
                    if col.path_in_schema in hot:
                        hot_bytes += col.total_compressed_size
        tb = 1024**4
        rows.append(
            (
                t,
                int(total),
                round(total / tb * SCAN_PRICE_PER_TB * 1e6, 4),
                int(hot_bytes),
                round(hot_bytes / tb * SCAN_PRICE_PER_TB * 1e6, 4),
                round(1 - hot_bytes / total, 4) if total else 0.0,
            )
        )
    return spark.createDataFrame(
        rows,
        "table string, full_bytes long, full_cost_microdollars double, "
        "pruned_bytes long, pruned_cost_microdollars double, "
        "savings_share double",
    )


io_scan_cost_model.__doc__ = io_scan_cost_model.__doc__.format(
    p=SCAN_PRICE_PER_TB
)


@query(
    "ds_review_sample",
    oracle=f"""
    WITH t AS (SELECT doc_id, source,
                      CASE WHEN len({DUCK_TOKENS}) < 40 THEN 'short'
                           ELSE 'long' END AS bucket,
                      (doc_id * {FP_MUL} + 23) % {FP_MOD} AS hk
               FROM documents),
    r AS (SELECT doc_id, source, bucket,
                 ROW_NUMBER() OVER (PARTITION BY source, bucket
                                    ORDER BY hk, doc_id) AS rn
          FROM t)
    SELECT source, bucket, doc_id
    FROM r WHERE rn <= {REVIEW_PER_STRATUM}
    """,
)
def ds_review_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified review manifest: {k} documents per
    (source × short/long) stratum, selected by HASH rank — the same
    manifest on every rerun, so two reviewers at two sites audit the
    same documents without coordination (random sampling can't
    promise that). The human-QA front door of a corpus pipeline.

    Scale: the rank window partitions by stratum (bounded groups);
    the selection is a filter."""
    toks = tokens()
    t = cat(spark, sf_dir)["documents"].select(
        "doc_id",
        "source",
        F.when(F.size(toks) < 40, "short").otherwise("long").alias(
            "bucket"
        ),
        ((F.col("doc_id") * FP_MUL + 23) % FP_MOD).alias("hk"),
    )
    w = W.partitionBy("source", "bucket").orderBy("hk", "doc_id")
    return (
        t.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= REVIEW_PER_STRATUM)
        .select("source", "bucket", "doc_id")
    )


ds_review_sample.__doc__ = ds_review_sample.__doc__.format(
    k=REVIEW_PER_STRATUM
)
