"""Wave 110: grouped-aggregate pandas UDFs, multivariate normality,
and input-file lineage.

sql_pandas_udaf pins the GROUPED_AGG pandas UDF surface — a custom
Arrow-batched aggregate (geometric mean) usable in groupBy and
windows, the escape hatch when no builtin aggregate fits;
stat_mardia_kurtosis is Mardia's multivariate kurtosis — the
normality check that should run before trusting Hotelling's T² or
Ledoit–Wolf Gaussian reasoning; io_input_file_audit attributes rows
to their physical input files via input_file_name() — the lineage
view that finds the one corrupted/short file in a thousand-file
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.duck_linalg import duck_emb_cov_inverse
from mister_spark.operators.extras84 import _emb_cov_stats
from mister_spark.registry import query


@query(
    "sql_pandas_udaf",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(EXP(AVG(LN(o_totalprice))) * 100 + 0.5) / 100 AS geo_mean,
           FLOOR(AVG(o_totalprice) * 100 + 0.5) / 100 AS arith_mean
    FROM orders WHERE o_totalprice > 0 GROUP BY 1
    """,
)
def sql_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF surface: a custom geometric-mean
    aggregate (Arrow-batched, partial-aggregable by Spark's grouped-
    agg machinery) applied per order priority, with the arithmetic
    mean alongside — geo < arith always (AM–GM), and the gap measures
    skew. The oracle reproduces it relationally as exp(avg(ln)) —
    which is also the JVM form you'd PREFER in production; the UDAF
    exists for aggregates with no such closed form.

    Scale: grouped-agg pandas UDFs receive each group's column as one
    Arrow batch — fine for bounded groups like these; unbounded
    groups would use the two-stage exp(avg(ln)) decomposition
    instead (documented trade-off)."""
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: `from __future__ import annotations` makes
    # hints strings, which defeats the type-hint eval-type inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def geo_mean(v):
        return float(np.exp(np.log(v.to_numpy()).mean()))

    orders = cat(spark, sf_dir)["orders"].filter(F.col("o_totalprice") > 0)
    # a grouped-agg pandas UDF cannot share an agg() with JVM
    # aggregates — compute it in its own aggregation and join the
    # (tiny, broadcast) results
    g1 = orders.groupBy("o_orderpriority").agg(
        geo_mean("o_totalprice").alias("gm")
    )
    g2 = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("o_totalprice").alias("am"),
    )
    return g2.join(F.broadcast(g1), "o_orderpriority").select(
        "o_orderpriority",
        "n",
        (F.floor(F.col("gm") * 100 + F.lit(0.5)) / 100).alias("geo_mean"),
        (F.floor(F.col("am") * 100 + F.lit(0.5)) / 100).alias("arith_mean"),
    )


@query(
    "stat_mardia_kurtosis",
    # Real oracle: (S + 1e-9·I)⁻¹ via the shared Cholesky recursion,
    # then b₂ as the mean squared per-row quadratic form — all plain
    # SQL; the 1e-4 grid absorbs Cholesky-vs-LU float drift.
    oracle=f"""
    WITH RECURSIVE
    {duck_emb_cov_inverse(1e-9)},
    q2 AS (SELECT AVG(q * q) AS b2 FROM (
             SELECT list_aggregate(list_transform(range(1, 65), i ->
                      (e.v[i] - mx.mu[i])
                      * list_aggregate(list_transform(range(1, 65), j ->
                          sol.x[i][j] * (e.v[j] - mx.mu[j])), 'sum')),
                      'sum') AS q
             FROM ex e CROSS JOIN emu mx CROSS JOIN sol) z)
    SELECT CAST(nx.n AS BIGINT) AS n, CAST(64 AS BIGINT) AS dim,
           FLOOR(q2.b2 * 1e4 + 0.5) / 1e4 AS b2,
           CAST(64 * 66 AS DOUBLE) AS expected,
           FLOOR((q2.b2 - 64 * 66) / SQRT(8.0 * 64 * 66 / nx.n) * 1e4 + 0.5)
             / 1e4 AS z
    FROM q2 CROSS JOIN enn nx
    """,
)
def stat_mardia_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mardia's multivariate kurtosis for the embedding corpus:
    b₂ = mean[((x−μ)ᵀS⁻¹(x−μ))²]; under multivariate normality
    E[b₂] = d(d+2) and z = (b₂ − d(d+2))/√(8d(d+2)/n). The normality
    check that gates Hotelling-T²/Gaussian-shrinkage assumptions —
    one number instead of 64 marginal QQ plots (which miss joint
    tail dependence anyway).

    Scale: S comes from the O(d²) sufficient-statistics pass; the
    kurtosis is ONE more narrow Arrow pass emitting scalar partials;
    the d×d solve is driver-side."""
    import numpy as np
    import pandas as pd

    n, mu, S = _emb_cov_stats(spark, sf_dir)
    d = len(mu)
    Si = np.linalg.inv(S + 1e-9 * np.eye(d))

    emb = cat(spark, sf_dir)["embeddings"].select(
        F.col("embedding").cast("array<double>").alias("v")
    )

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["v"]), dtype=np.float64) - mu
            m2 = np.einsum("ij,jk,ik->i", X, Si, X)
            yield pd.DataFrame({"s": [float((m2**2).sum())], "c": [len(X)]})

    rows = emb.mapInPandas(partials, "s double, c long").collect()
    b2 = sum(r["s"] for r in rows) / sum(r["c"] for r in rows)
    expected = d * (d + 2)
    z = (b2 - expected) / (8.0 * d * (d + 2) / n) ** 0.5
    import math

    # floor-grid rounding (common.rnd's form) — identical double
    # arithmetic to the oracle's FLOOR(x*1e4+0.5)/1e4
    row = (
        int(n),
        d,
        math.floor(b2 * 1e4 + 0.5) / 1e4,
        float(expected),
        math.floor(z * 1e4 + 0.5) / 1e4,
    )
    return spark.createDataFrame(
        [row], "n long, dim long, b2 double, expected double, z double"
    )


@query(
    "io_input_file_audit",
    # Real oracle: the single-file lineitem input yields one audit row
    # holding every row (share exactly 1).
    oracle="""
    SELECT 'lineitem.parquet' AS file,
           CAST(COUNT(*) AS BIGINT) AS rows,
           1.0 AS share
    FROM lineitem
    """,
)
def io_input_file_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Input-file lineage: attribute every lineitem row to its
    physical parquet file via input_file_name() and report per-file
    row counts plus each file's share — the debugging view that
    pinpoints a short, duplicated, or corrupted file inside a
    many-file table, and the quickest skew check on file-level
    parallelism.

    Scale: input_file_name() is free metadata per task; the rollup is
    one partial-agg shuffle over |files| keys."""
    li = cat(spark, sf_dir)["lineitem"]
    per = (
        li.withColumn(
            "file",
            F.element_at(F.split(F.input_file_name(), "/"), -1),
        )
        .groupBy("file")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rows"))
    )
    tot = per.agg(F.sum("rows").alias("total"))
    return per.crossJoin(F.broadcast(tot)).select(
        "file",
        "rows",
        ratio(F.col("rows") / F.col("total")).alias("share"),
    )
