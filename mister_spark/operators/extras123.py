"""Wave 123: covariate-shift weighting, storage-encoding audits, and
stratified odds ratios.

ml_covariate_shift_weights estimates density-ratio importance
weights between a 'training' and 'serving' slice from binned
marginals — plus the effective sample size that says how much the
shift actually costs; io_encoding_audit reads per-column parquet
ENCODINGS from the footers (dictionary vs plain) — the storage-level
fact behind 'why did this column get so big'; stat_mantel_haenszel
is the stratified 2×2 odds ratio — the confounder-adjusted
association for binary outcomes, pooled across strata the classic
Cochran–Mantel–Haenszel way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

SHIFT_BINS = 10


@query(
    "ml_covariate_shift_weights",
    oracle=f"""
    WITH d AS (SELECT c_acctbal AS x,
                      CASE WHEN c_custkey % 3 = 0 THEN 1 ELSE 0 END AS srv
               FROM customer),
    rng AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM d),
    b AS (SELECT LEAST(CAST(FLOOR((x - rng.lo) / ((rng.hi - rng.lo)
                                  / {SHIFT_BINS} + 1e-9)) AS BIGINT),
                       {SHIFT_BINS} - 1) AS bin,
                 srv
          FROM d, rng),
    g AS (SELECT bin,
                 CAST(SUM(1 - srv) AS DOUBLE) AS n_train,
                 CAST(SUM(srv) AS DOUBLE) AS n_serve
          FROM b GROUP BY 1),
    t AS (SELECT SUM(n_train) AS nt, SUM(n_serve) AS ns FROM g),
    w AS (SELECT g.bin, g.n_train, g.n_serve,
                 (g.n_serve / t.ns) / ((g.n_train + 1) / (t.nt + {SHIFT_BINS}))
                   AS wt
          FROM g, t),
    ess AS (SELECT SUM(n_train * wt) * SUM(n_train * wt)
                   / SUM(n_train * wt * wt) AS ess,
                   SUM(n_train) AS nt2
            FROM w)
    SELECT w.bin,
           CAST(w.n_train AS BIGINT) AS n_train,
           CAST(w.n_serve AS BIGINT) AS n_serve,
           FLOOR(w.wt * 10000 + 0.5) / 10000 AS weight,
           FLOOR(ess.ess / ess.nt2 * 10000 + 0.5) / 10000
             AS ess_fraction
    FROM w, ess
    """,
)
def ml_covariate_shift_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate-shift importance weights: a deterministic 'serving'
    slice (custkey % 3 == 0) against the training remainder, binned on
    account balance; weight(b) = p_serve(b)/p_train(b) (add-one
    smoothed) and the effective-sample-size fraction
    ESS = (Σw)²/(Σw²·n) tells you how much reweighting shrinks your
    usable data. The shift is synthetic-uniform so weights ≈ 1 and
    ESS ≈ 1 — asserted; on real drift this row is the damage report.

    Scale: binning is map-side against a broadcast range; everything
    after is a {b}-row frame."""
    d = cat(spark, sf_dir)["customer"].select(
        F.col("c_acctbal").alias("x"),
        F.when(F.col("c_custkey") % 3 == 0, 1).otherwise(0).alias("srv"),
    )
    rng = d.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    b = d.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.floor(
                (F.col("x") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / SHIFT_BINS + 1e-9)
            ).cast("bigint"),
            F.lit(SHIFT_BINS - 1),
        ).alias("bin"),
        "srv",
    )
    g = b.groupBy("bin").agg(
        F.sum(1 - F.col("srv")).cast("double").alias("n_train"),
        F.sum("srv").cast("double").alias("n_serve"),
    )
    t = g.agg(F.sum("n_train").alias("nt"), F.sum("n_serve").alias("ns"))
    w = g.crossJoin(F.broadcast(t)).withColumn(
        "wt",
        (F.col("n_serve") / F.col("ns"))
        / ((F.col("n_train") + 1) / (F.col("nt") + SHIFT_BINS)),
    ).localCheckpoint()
    ess = w.agg(
        (
            F.sum(F.col("n_train") * F.col("wt"))
            * F.sum(F.col("n_train") * F.col("wt"))
            / F.sum(F.col("n_train") * F.col("wt") * F.col("wt"))
        ).alias("ess"),
        F.sum("n_train").alias("nt2"),
    )
    return w.crossJoin(F.broadcast(ess)).select(
        "bin",
        F.col("n_train").cast("bigint").alias("n_train"),
        F.col("n_serve").cast("bigint").alias("n_serve"),
        ratio(F.col("wt")).alias("weight"),
        ratio(F.col("ess") / F.col("nt2")).alias("ess_fraction"),
    )


ml_covariate_shift_weights.__doc__ = (
    ml_covariate_shift_weights.__doc__.format(b=SHIFT_BINS)
)


@query("io_encoding_audit")  # parquet footer encodings → rows-only
def io_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet encoding audit from footers: per column of the orders
    table, the encodings actually used (dictionary vs plain), total
    compressed/uncompressed bytes, and the compression ratio — the
    storage-level explanation for fat columns (a high-cardinality
    string falling out of dictionary encoding doubles silently).

    Scale: metadata-only; no data pages are read."""
    import pyarrow.parquet as pq

    import os

    p = os.path.join(sf_dir, "orders.parquet")
    files = (
        [p]
        if os.path.isfile(p)
        else [
            os.path.join(p, f)
            for f in os.listdir(p)
            if f.endswith(".parquet")
        ]
    )
    agg: dict[str, list] = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                cur = agg.setdefault(name, [set(), 0, 0])
                cur[0].update(str(e) for e in col.encodings)
                cur[1] += col.total_compressed_size
                cur[2] += col.total_uncompressed_size
    rows = [
        (
            name,
            ",".join(sorted(encs)),
            int("PLAIN_DICTIONARY" in encs or "RLE_DICTIONARY" in encs),
            int(comp),
            int(uncomp),
            round(uncomp / comp, 4) if comp else 0.0,
        )
        for name, (encs, comp, uncomp) in sorted(agg.items())
    ]
    return spark.createDataFrame(
        rows,
        "column string, encodings string, dictionary long, "
        "compressed_bytes long, uncompressed_bytes long, ratio double",
    )


@query(
    "stat_mantel_haenszel",
    oracle="""
    WITH d AS (SELECT CAST(isodow(o_orderdate) AS BIGINT) AS stratum,
                      CASE WHEN o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END AS e,
                      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
               FROM orders),
    s AS (SELECT stratum,
                 CAST(SUM(e * y) AS DOUBLE) AS a,
                 CAST(SUM(e * (1 - y)) AS DOUBLE) AS b,
                 CAST(SUM((1 - e) * y) AS DOUBLE) AS c,
                 CAST(SUM((1 - e) * (1 - y)) AS DOUBLE) AS dd,
                 CAST(COUNT(*) AS DOUBLE) AS n
          FROM d GROUP BY 1),
    mh AS (SELECT SUM(a * dd / n) AS num, SUM(b * c / n) AS den,
                 CAST(COUNT(*) AS BIGINT) AS strata
          FROM s)
    SELECT strata,
           FLOOR(num / den * 10000 + 0.5) / 10000 AS mh_odds_ratio,
           FLOOR(num * 10000 + 0.5) / 10000 AS mh_numerator,
           FLOOR(den * 10000 + 0.5) / 10000 AS mh_denominator
    FROM mh
    """,
)
def stat_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Mantel–Haenszel pooled odds ratio: does URGENT priority
    associate with fulfilled status, ADJUSTED for weekday strata?
    OR_MH = Σ(aᵢdᵢ/nᵢ)/Σ(bᵢcᵢ/nᵢ) — the stratified 2×2 estimator that
    doesn't collapse strata (and therefore doesn't Simpson itself).
    Priority and status are independent in the synthetic data, so
    OR ≈ 1 — asserted; with real confounding the crude and MH ORs
    diverge and MH is the one to report.

    Scale: one rollup to 7 stratum rows; the estimator is 7-row
    arithmetic."""
    d = cat(spark, sf_dir)["orders"].select(
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).alias("stratum"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("e"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    s = d.groupBy("stratum").agg(
        F.sum(F.col("e") * F.col("y")).cast("double").alias("a"),
        F.sum(F.col("e") * (1 - F.col("y"))).cast("double").alias("b"),
        F.sum((1 - F.col("e")) * F.col("y")).cast("double").alias("c"),
        F.sum((1 - F.col("e")) * (1 - F.col("y")))
        .cast("double")
        .alias("dd"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    return s.agg(
        F.count(F.lit(1)).cast("bigint").alias("strata"),
        ratio(
            F.sum(F.col("a") * F.col("dd") / F.col("n"))
            / F.sum(F.col("b") * F.col("c") / F.col("n"))
        ).alias("mh_odds_ratio"),
        ratio(F.sum(F.col("a") * F.col("dd") / F.col("n"))).alias(
            "mh_numerator"
        ),
        ratio(F.sum(F.col("b") * F.col("c") / F.col("n"))).alias(
            "mh_denominator"
        ),
    )
