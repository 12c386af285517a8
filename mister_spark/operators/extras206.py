"""Wave 206: the XML ingest path and the BDS independence test.

io_xml_query exercises Spark 4's BUILT-IN xml source end to end:
orders staged as rowTag-framed XML, read back with an explicit
schema, aggregated — the document-interchange ingest lane (B2B feeds,
enterprise exports) that joined csv/json/orc/avro as a first-class
format in Spark 4.0; the oracle runs on the typed parquet original,
so parity proves the XML round-trip is lossless for this schema.
stat_bds is the Brock-Dechert-Scheinkman test on daily event volume:
are the OBSERVATIONS i.i.d. at all? Ljung-Box (stat_ljung_box) only
hears linear autocorrelation; BDS compares the 2-dim correlation
integral against the square of the 1-dim one, so ANY dependence
structure — nonlinear, chaotic, regime-switching — shows up. It is
the standard residual diagnostic after a model has supposedly
"explained" a series.

Exactness: the XML op's values ride the shared parquet integers and
money grid; BDS correlation integrals are exact integer pair/triple
counts against a tolerance derived from integer moment sums, and only
the final variance/z arithmetic is float, inside the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
BDS_EPS_FRAC = 1.0  # tolerance as a fraction of the series sd
Z_5PCT = 1.959964


@query(
    "io_xml_query",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100 AS total
    FROM orders GROUP BY 1
    """,
)
def io_xml_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-level order totals read back from an XML staging of
    orders (Spark 4 native xml source, rowTag 'order', explicit
    schema — no external package). The oracle computes the same
    aggregate from the typed parquet original, so a parity pass
    certifies the XML write/read round-trip preserved every key,
    price, and enum.

    Scale: XML is the most parse-expensive ingest lane (tag framing,
    no column pruning, no predicate pushdown) — the op exists so the
    advice 'land XML once, convert to parquet' is demonstrated
    against a real read, like io_csv_query for CSV. Totals are summed
    in integer cents, so parity is exact regardless of row order."""
    from mister_spark.sources.staged import stage_xml_orders

    path = stage_xml_orders(spark, sf_dir)
    o = (
        spark.read.format("xml")
        .option("rowTag", "order")
        .schema(
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderpriority string"
        )
        .load(path)
    )
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(cents).cast("double") / 100).alias("total"),
    )


@query(
    "stat_bds",
    # Real oracle: templates come from an integer lag equi-join; the
    # tolerance eps = sd from integer moment sums is the same double
    # in both engines, so every pair/triple count is an exact integer
    # and C1/C2/k divide identical BIGINTs; only the closed-form
    # variance/z and the shared A&S tail polynomial are float, inside
    # the grid.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t, CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy,
                 SUM(y * y) AS syy
          FROM d),
    eps AS (SELECT {BDS_EPS_FRAC} * SQRT(
                CAST(n * syy - sy * sy AS DOUBLE) / (n * (n - 1))) AS e
            FROM m WHERE n > 1),
    w2 AS (SELECT d0.t, d0.y AS a, d1.y AS b
           FROM d d0 JOIN d d1 ON d1.t = d0.t + 1),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM w2),
    p1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS c1n
           FROM w2 i JOIN w2 j ON i.t < j.t, eps
           WHERE ABS(i.a - j.a) <= eps.e),
    p2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS c2n
           FROM w2 i JOIN w2 j ON i.t < j.t, eps
           WHERE GREATEST(ABS(i.a - j.a), ABS(i.b - j.b)) <= eps.e),
    deg AS (SELECT i.t, CAST(COUNT(*) AS BIGINT) AS h
            FROM w2 i JOIN w2 j ON i.t <> j.t, eps
            WHERE ABS(i.a - j.a) <= eps.e
            GROUP BY 1),
    kk AS (SELECT SUM((h + 1) * h) AS trip FROM deg),
    st AS (SELECT nn.nt,
                  2.0 * p1.c1n / (nn.nt * (nn.nt - 1.0)) AS c1,
                  2.0 * p2.c2n / (nn.nt * (nn.nt - 1.0)) AS c2,
                  COALESCE(kk.trip, 0)
                    / (CAST(nn.nt AS DOUBLE) * (nn.nt - 1)
                       * (nn.nt - 2)) AS k
           FROM nn, p1, p2, kk),
    z AS (SELECT nt, c1, c2, k,
                 CASE WHEN k - c1 * c1 > 0
                      THEN SQRT(CAST(nt AS DOUBLE))
                           * (c2 - c1 * c1) / (2.0 * (k - c1 * c1))
                      ELSE 0.0 END AS bds
          FROM st)
    SELECT CAST(nt AS BIGINT) AS n_templates,
           (SELECT FLOOR(e * 1e4 + 0.5) / 1e4 FROM eps) AS eps,
           FLOOR(c1 * 1e6 + 0.5) / 1e6 AS c1,
           FLOOR(c2 * 1e6 + 0.5) / 1e6 AS c2,
           FLOOR(k * 1e6 + 0.5) / 1e6 AS k,
           FLOOR(bds * 1e4 + 0.5) / 1e4 AS bds_z,
           CASE WHEN ABS(FLOOR(bds * 1e4 + 0.5) / 1e4) > {Z_5PCT}
                THEN 1 ELSE 0 END AS iid_rejected,
           FLOOR(2.0 * {normal_sf_sql("ABS(bds)")} * 1e6 + 0.5) / 1e6
             AS p_value
    FROM z
    """,
)
def stat_bds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BDS independence test (m=2, eps = 1 sd) on daily event volume:
    C1 = share of day pairs within eps, C2 = share of consecutive-day
    PAIRS of pairs jointly within eps; under i.i.d. C2 -> C1^2, and
    the studentized gap (with the closed-form m=2 variance
    4(k - C1^2)^2 built from the triple statistic k) is asymptotically
    N(0,1). Any dependence — linear, nonlinear, chaotic — inflates
    C2 above C1^2: the all-purpose residual alarm where Ljung-Box
    only hears autocorrelation.

    Scale: ONE day-grain count, an integer lag equi-join, then the
    documented model-sized day-pair stage (pair counts + per-point
    neighbor degrees for k). Map-side combinable up to the
    calendar-bounded pair frame."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint()  # feeds moments + both lag aliases
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    eps = m.filter(F.col("n") > 1).select(
        (
            BDS_EPS_FRAC
            * F.sqrt(
                (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
                / (F.col("n") * (F.col("n") - 1))
            )
        ).alias("e")
    )
    d1 = d.select((F.col("t") - 1).alias("t"), F.col("y").alias("b"))
    w2 = d.select("t", F.col("y").alias("a")).join(d1, "t").localCheckpoint()
    i = w2.select(
        F.col("t").alias("ti"), F.col("a").alias("ai"), F.col("b").alias("bi")
    )
    j = w2.select(
        F.col("t").alias("tj"), F.col("a").alias("aj"), F.col("b").alias("bj")
    )
    nn = w2.agg(F.count(F.lit(1)).alias("nt"))
    pairs = i.join(j, F.col("ti") < F.col("tj")).crossJoin(F.broadcast(eps))
    p1 = pairs.filter(F.abs(F.col("ai") - F.col("aj")) <= F.col("e")).agg(
        F.count(F.lit(1)).alias("c1n")
    )
    p2 = pairs.filter(
        F.greatest(
            F.abs(F.col("ai") - F.col("aj")),
            F.abs(F.col("bi") - F.col("bj")),
        )
        <= F.col("e")
    ).agg(F.count(F.lit(1)).alias("c2n"))
    deg = (
        i.join(j, F.col("ti") != F.col("tj"))
        .crossJoin(F.broadcast(eps))
        .filter(F.abs(F.col("ai") - F.col("aj")) <= F.col("e"))
        .groupBy("ti")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    # k's triple statistic uses the SELF-INCLUSIVE neighbor count
    # (h+1): the indicator of a point against itself is 1 in the
    # published estimator — dropping it shrinks k and halves the
    # variance, inflating |z| ~2.5x on iid data (checked by
    # simulation against the N(0,1) null)
    kk = deg.agg(F.sum((F.col("h") + 1) * F.col("h")).alias("trip"))
    st = (
        nn.crossJoin(F.broadcast(p1))
        .crossJoin(F.broadcast(p2))
        .crossJoin(F.broadcast(kk))
        .crossJoin(F.broadcast(eps))
    )
    nt = F.col("nt").cast("double")
    c1 = 2.0 * F.col("c1n") / (nt * (nt - 1.0))
    c2 = 2.0 * F.col("c2n") / (nt * (nt - 1.0))
    k = F.coalesce(F.col("trip"), F.lit(0)).cast("double") / (
        nt * (nt - 1) * (nt - 2)
    )
    bds = F.when(
        k - c1 * c1 > 0,
        F.sqrt(nt) * (c2 - c1 * c1) / (2.0 * (k - c1 * c1)),
    ).otherwise(0.0)
    return st.select(
        F.col("nt").cast("bigint").alias("n_templates"),
        rnd(F.col("e"), 4).alias("eps"),
        rnd(c1, 6).alias("c1"),
        rnd(c2, 6).alias("c2"),
        rnd(k, 6).alias("k"),
        rnd(bds, 4).alias("bds_z"),
        F.when(F.abs(rnd(bds, 4)) > Z_5PCT, 1)
        .otherwise(0)
        .alias("iid_rejected"),
        rnd(2.0 * normal_sf(F.abs(bds)), 6).alias("p_value"),
    )
