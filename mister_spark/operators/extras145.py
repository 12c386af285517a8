"""Wave 145: the records test and column-role advising.

stat_records_test counts record-high days in the daily revenue
series against the exchangeability expectation Σ1/k ≈ ln n — records
arrive that slowly ONLY if there is no trend, so an excess of
records is one of the cleanest trend detections there is (and needs
no distributional assumptions at all); io_column_type_advisor
profiles every column of the events table (distinct ratio, null
rate, monotonicity) into a suggested semantic role — the
data-catalog bootstrap that usually gets hand-maintained into
staleness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query


@query(
    "stat_records_test",
    oracle="""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS day,
                      FLOOR(SUM(value) * 100 + 0.5) AS vc
               FROM events GROUP BY 1),
    r AS (SELECT day, vc,
                 MAX(vc) OVER (ORDER BY day
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prev_max,
                 ROW_NUMBER() OVER (ORDER BY day) AS k
          FROM d),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CASE WHEN prev_max IS NULL OR vc > prev_max
                          THEN 1 ELSE 0 END) AS DOUBLE) AS records,
                 SUM(1.0 / k) AS expected
          FROM r)
    SELECT CAST(n AS BIGINT) AS days,
           CAST(records AS BIGINT) AS record_days,
           FLOOR(expected * 10000 + 0.5) / 10000 AS expected_records,
           FLOOR((records - expected)
                 / SQRT(expected - 1.6449) * 10000 + 0.5) / 10000
             AS z_approx
    FROM s
    """,
)
def stat_records_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Records test for trend: count record-high days in daily
    revenue (integer cents — exact comparisons) against the
    exchangeability expectation Σₖ1/k; under no trend, records arrive
    logarithmically slowly, and Var ≈ Σ(1/k − 1/k²) ≈ E − π²/6 gives
    the z approximation. Entirely distribution-free — a trend test
    you can run before assuming anything else about the series.

    Scale: the rollup is one shuffle; the record scan rides the
    calendar-bounded day frame (control-chart precedent)."""
    ev = cat(spark, sf_dir)["events"]
    d = (
        ev.groupBy(
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias(
                "day"
            )
        )
        .agg(
            F.floor(F.sum("value") * 100 + F.lit(0.5)).alias("vc")
        )
        .localCheckpoint()
    )
    w_prev = W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
    w_k = W.orderBy("day")
    r = d.select(
        "vc",
        F.max("vc").over(w_prev).alias("prev_max"),
        F.row_number().over(w_k).alias("k"),
    )
    s = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(
            F.when(
                F.col("prev_max").isNull()
                | (F.col("vc") > F.col("prev_max")),
                1,
            ).otherwise(0)
        )
        .cast("double")
        .alias("records"),
        F.sum(1.0 / F.col("k")).alias("expected"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("days"),
        F.col("records").cast("bigint").alias("record_days"),
        ratio(F.col("expected")).alias("expected_records"),
        ratio(
            (F.col("records") - F.col("expected"))
            / F.sqrt(F.col("expected") - 1.6449)
        ).alias("z_approx"),
    )


@query("io_column_type_advisor")  # column profiling → rows-only
def io_column_type_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-role advisor for the events table: per column, the
    distinct ratio, null rate, and physical type, folded into a
    suggested semantic role — near-unique integers are IDs,
    low-cardinality strings are categoricals, doubles are measures,
    timestamps are event time. The automated first draft of a data
    catalog entry, refreshed by query instead of by wiki decay.

    Scale: one pass computes approximate distincts for every column
    simultaneously (HLL aggregates, mergeable)."""
    ev = cat(spark, sf_dir)["events"]
    n = ev.count()
    aggs = []
    for f_ in ev.schema.fields:
        c = f_.name
        aggs.append(F.approx_count_distinct(c).alias(f"d_{c}"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_{c}")
        )
    row = ev.agg(*aggs).collect()[0]
    out = []
    for f_ in ev.schema.fields:
        c = f_.name
        t = f_.dataType.simpleString()
        dr = row[f"d_{c}"] / n
        nr = row[f"n_{c}"] / n
        if t in ("timestamp", "timestamp_ntz", "date"):
            role = "event_time"
        elif t in ("bigint", "int") and dr > 0.9:
            role = "id"
        elif t == "string" and dr < 0.01:
            role = "categorical"
        elif t == "double":
            role = "measure"
        elif t == "string":
            role = "text_payload"
        else:
            role = "dimension"
        out.append((c, t, round(dr, 4), round(nr, 4), role))
    return spark.createDataFrame(
        out,
        "column string, dtype string, distinct_ratio double, "
        "null_rate double, suggested_role string",
    )
