"""Wave 256: three-valued logic, struct algebra, interval-range frames.

sql_null_semantics pins the NULL algebra a migrating user trips on
first: null-safe equality (Spark `<=>` / portable CASE), NULLIF,
COALESCE chains, boolean three-valued logic under NOT/AND, and
NULL-vs-empty-string counting — one row per customer segment of the
nullable-acctbal view, every count asserting a rule of the standard.
sql_struct_ops exercises the struct surface the same way: named_struct
construction, dotted field access, struct comparison as a sort key,
and star-expansion counts — the nested-row algebra that makes
DataFrames composable. w_range_interval_frame is the window surface
w_rows_vs_range leaves uncovered: a RANGE BETWEEN INTERVAL frame over
event TIME (a 3-day trailing revenue sum per customer ordered by
order date), where ROWS frames count neighbors and value-RANGE frames
need numeric keys — interval frames are how you say 'trailing week'
when days are missing.

Exactness: all three are count/sum surfaces over exact integers and
cents; the interval frame anchors on date arithmetic both engines
evaluate identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, money, rnd
from mister_spark.registry import query


@query(
    "sql_null_semantics",
    # Real oracle: the identical nullable projection (acctbal nulled
    # where negative, name emptied on a deterministic key rule) and
    # the same three-valued-logic counts spelled portably.
    oracle="""
    WITH v AS (SELECT c_mktsegment AS seg,
                      CASE WHEN c_acctbal < 0 THEN NULL
                           ELSE c_acctbal END AS bal,
                      CASE WHEN c_custkey % 7 = 0 THEN ''
                           ELSE c_name END AS name,
                      c_custkey AS k
               FROM customer)
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN bal IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_bal,
           CAST(SUM(CASE WHEN name = '' THEN 1 ELSE 0 END) AS BIGINT)
             AS empty_name,
           -- null-safe equality: NULL <=> NULL is TRUE
           CAST(SUM(CASE WHEN (bal IS NULL AND bal IS NULL)
                              OR bal = bal THEN 1 ELSE 0 END) AS BIGINT)
             AS nullsafe_self_eq,
           -- NULLIF collapses sentinel to NULL; COALESCE restores
           CAST(SUM(CASE WHEN COALESCE(NULLIF(name, ''), 'missing')
                              = 'missing' THEN 1 ELSE 0 END) AS BIGINT)
             AS coalesced_missing,
           -- 3VL: (bal > 0) is UNKNOWN for NULL, so NOT(...) stays
           -- UNKNOWN and the row is NOT counted by either branch
           CAST(SUM(CASE WHEN bal > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS pos_bal,
           CAST(SUM(CASE WHEN NOT (bal > 0) THEN 1 ELSE 0 END) AS BIGINT)
             AS not_pos_bal,
           FLOOR(SUM(COALESCE(bal, 0.0)) * 100 + 0.5) / 100
             AS coalesced_sum
    FROM v GROUP BY seg ORDER BY seg
    """,
)
def sql_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-algebra audit per customer segment on a deliberately
    nullable view (negative balances nulled, every 7th name emptied):
    counts that pin null-safe equality (`<=>`), NULLIF/COALESCE
    round-trips, three-valued logic under NOT (a NULL comparison
    escapes BOTH branches — the classic double-count bug in reverse),
    and the NULL-vs-empty-string distinction. Each column is an
    assertion of the standard that a migration smoke-tests in one
    query.

    Scale: one map-side projection + a 5-key grouped pass — nothing
    but the aggregate shuffle."""
    v = cat(spark, sf_dir)["customer"].select(
        F.col("c_mktsegment").alias("seg"),
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
        F.when(F.col("c_custkey") % 7 == 0, "")
        .otherwise(F.col("c_name"))
        .alias("name"),
    )
    return (
        v.groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("bal").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("null_bal"),
            F.sum(F.when(F.col("name") == "", 1).otherwise(0))
            .cast("bigint")
            .alias("empty_name"),
            # Spark's native null-safe equality operator
            F.sum(F.when(F.col("bal").eqNullSafe(F.col("bal")), 1).otherwise(0))
            .cast("bigint")
            .alias("nullsafe_self_eq"),
            F.sum(
                F.when(
                    F.coalesce(
                        F.nullif(F.col("name"), F.lit("")), F.lit("missing")
                    )
                    == "missing",
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("coalesced_missing"),
            F.sum(F.when(F.col("bal") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("pos_bal"),
            F.sum(F.when(~(F.col("bal") > 0), 1).otherwise(0))
            .cast("bigint")
            .alias("not_pos_bal"),
            money(F.sum(F.coalesce(F.col("bal"), F.lit(0.0)))).alias(
                "coalesced_sum"
            ),
        )
        .orderBy("seg")
    )


@query(
    "sql_struct_ops",
    # Real oracle: the same struct constructions spelled with DuckDB's
    # struct_pack / dotted access; struct ORDER is field-wise
    # lexicographic in both engines, pinned by the min/max picks.
    oracle="""
    WITH s AS (SELECT o_orderpriority AS prio,
                      {'d': o_orderdate, 'k': o_orderkey} AS ordst,
                      {'price': o_totalprice,
                       'year': CAST(EXTRACT(year FROM o_orderdate)
                                    AS BIGINT)} AS pst
               FROM orders)
    SELECT prio,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(ordst).k AS BIGINT) AS first_orderkey,
           CAST(MAX(ordst).k AS BIGINT) AS last_orderkey,
           CAST(SUM(CASE WHEN pst.year >= 1995 THEN 1 ELSE 0 END)
                AS BIGINT) AS since_95,
           FLOOR(SUM(pst.price) * 100 + 0.5) / 100 AS total_price
    FROM s GROUP BY prio ORDER BY prio
    """,
)
def sql_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-surface audit per order priority: named_struct
    construction, dotted field access, and struct MIN/MAX as a
    field-wise lexicographic sort key — picking each priority's
    earliest/latest order WITHOUT a window, because the (date, key)
    struct's natural order IS the tiebroken total order. The nested-
    row algebra that lets one column carry a compound key through any
    aggregate.

    Scale: map-side struct construction + one 5-key grouped pass;
    struct min/max are ordinary partial aggregates (no window, no
    second shuffle)."""
    o = cat(spark, sf_dir)["orders"].select(
        F.col("o_orderpriority").alias("prio"),
        F.struct(
            F.col("o_orderdate").alias("d"), F.col("o_orderkey").alias("k")
        ).alias("ordst"),
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.year("o_orderdate").cast("bigint").alias("year"),
        ).alias("pst"),
    )
    return (
        o.groupBy("prio")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("ordst").getField("k").cast("bigint").alias(
                "first_orderkey"
            ),
            F.max("ordst").getField("k").cast("bigint").alias(
                "last_orderkey"
            ),
            F.sum(
                F.when(F.col("pst").getField("year") >= 1995, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("since_95"),
            money(F.sum(F.col("pst").getField("price"))).alias(
                "total_price"
            ),
        )
        .orderBy("prio")
    )


@query(
    "w_range_interval_frame",
    # Real oracle: the identical INTERVAL-range frame — DuckDB and
    # Spark both define RANGE BETWEEN INTERVAL frames over an ordered
    # date key as value-range inclusion.
    oracle="""
    WITH o AS (SELECT o_custkey, o_orderdate, o_totalprice,
                      o_orderkey
               FROM orders),
    w AS (SELECT o_custkey, o_orderkey,
                 CAST(COUNT(*) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate
                        RANGE BETWEEN INTERVAL 3 DAY PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS n_3d,
                 SUM(o_totalprice) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate
                        RANGE BETWEEN INTERVAL 3 DAY PRECEDING
                          AND CURRENT ROW) AS rev_3d
          FROM o)
    SELECT o_custkey AS custkey,
           CAST(MAX(n_3d) AS BIGINT) AS max_orders_3d,
           FLOOR(MAX(rev_3d) * 100 + 0.5) / 100 AS max_rev_3d
    FROM w GROUP BY 1 HAVING MAX(n_3d) > 1 ORDER BY custkey
    """,
)
def w_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-range window frames — the surface w_rows_vs_range
    leaves uncovered: per customer, the trailing-3-day order count and
    revenue at every order (RANGE BETWEEN INTERVAL 3 DAY PRECEDING),
    reduced to each customer's burstiest window; only customers who
    ever placed 2+ orders within 3 days survive. ROWS frames count
    neighbors and numeric RANGE needs a number — the interval frame is
    how SQL says 'trailing week' when days are missing, and both
    engines define it as value-range inclusion over the date key.

    Scale: one customer-partitioned window (parallel, data-sized) +
    one grouped reduction; no global sort anywhere."""
    o = cat(spark, sf_dir)["orders"].select(
        "o_custkey", "o_orderdate", "o_totalprice", "o_orderkey"
    )
    o.createOrReplaceTempView("w256_orders")
    return spark.sql(
        """
        WITH w AS (SELECT o_custkey, o_orderkey,
                     CAST(COUNT(*) OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate
                            RANGE BETWEEN INTERVAL 3 DAY PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS n_3d,
                     SUM(o_totalprice) OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate
                            RANGE BETWEEN INTERVAL 3 DAY PRECEDING
                              AND CURRENT ROW) AS rev_3d
                   FROM w256_orders)
        SELECT o_custkey AS custkey,
               CAST(MAX(n_3d) AS BIGINT) AS max_orders_3d,
               FLOOR(MAX(rev_3d) * 100 + 0.5) / 100 AS max_rev_3d
        FROM w GROUP BY 1 HAVING MAX(n_3d) > 1 ORDER BY custkey
        """
    )
