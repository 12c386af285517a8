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


# events-schema canonicalization for the portable-HLL advisor: each
# column maps to a STRING both engines render identically (timestamps
# via epoch-micros, doubles via integer cents, integers/strings as-is)
# so the md5-60 registers — and therefore the distinct estimates and
# the roles derived from them — replay exactly in the oracle.
_ADV_COLS = [
    ("event_id", "bigint", "CAST(event_id AS VARCHAR)"),
    ("ts", "timestamp", "CAST(epoch_us(ts) AS VARCHAR)"),
    ("user_id", "bigint", "CAST(user_id AS VARCHAR)"),
    ("event_type", "string", "event_type"),
    ("value", "double",
     "CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS VARCHAR)"),
    ("props", "string", "props"),
]

_ADV_ROLE_SQL = """
    CASE WHEN dtype IN ('timestamp', 'timestamp_ntz', 'date')
           THEN 'event_time'
         WHEN dtype IN ('bigint', 'int') AND dr > 0.9 THEN 'id'
         WHEN dtype = 'string' AND dr < 0.01 THEN 'categorical'
         WHEN dtype = 'double' THEN 'measure'
         WHEN dtype = 'string' THEN 'text_payload'
         ELSE 'dimension' END
"""


def _advisor_oracle() -> str:
    from mister_spark.functions.hll import (
        HLL_R,
        hll_oracle_estimate,
        hll_oracle_registers,
    )

    blocks, rows = [], []
    for name, dtype, canon in _ADV_COLS:
        reg = hll_oracle_registers(
            f"(SELECT {canon} AS s FROM events WHERE {canon} IS NOT NULL)",
            "", "s",
        )
        blocks.append(f"""
    reg_{name} AS ({reg}),
    agg_{name} AS (SELECT SUM(CAST(POWER(2, {HLL_R} - rho) AS BIGINT))
                          AS sp,
                          CAST(COUNT(*) AS BIGINT) AS np
                   FROM reg_{name}),
    nu_{name} AS (SELECT CAST(SUM(CASE WHEN {canon} IS NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS nulls
                  FROM events)""")
        rows.append(f"""
    SELECT '{name}' AS "column", '{dtype}' AS dtype,
           {hll_oracle_estimate(f"agg_{name}.sp", f"agg_{name}.np")} / nn.n
             AS dr,
           CAST(nu_{name}.nulls AS DOUBLE) / nn.n AS nr
    FROM agg_{name}, nu_{name}, nn""")
    unions = "\n    UNION ALL\n".join(rows)
    return f"""
    WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
    {",".join(blocks)},
    prof AS ({unions})
    SELECT "column", dtype,
           FLOOR(dr * 10000 + 0.5) / 10000 AS distinct_ratio,
           FLOOR(nr * 10000 + 0.5) / 10000 AS null_rate,
           {_ADV_ROLE_SQL} AS suggested_role
    FROM prof
    """


@query("io_column_type_advisor", oracle=_advisor_oracle())
def io_column_type_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-role advisor for the events table: per column, the
    distinct ratio, null rate, and physical type, folded into a
    suggested semantic role — near-unique integers are IDs,
    low-cardinality strings are categoricals, doubles are measures,
    timestamps are event time. The automated first draft of a data
    catalog entry, refreshed by query instead of by wiki decay.

    Round-9 conversion: distinct counting moved from the engine-local
    `approx_count_distinct` onto the portable md5-60 HLL
    (functions/hll.py) over per-column CANONICAL strings (epoch-micros
    for timestamps, integer cents for doubles), so the estimates —
    and the roles derived from them — replay exactly in the oracle.

    Scale: one melt pass feeds ALL columns' registers through a
    single (column, bucket) grouped aggregate (map-side combinable,
    O(m) state per column); null counts ride one more narrow
    aggregate; the role fold is a 6-row frame."""
    from mister_spark.functions.hll import (
        hll_estimate,
        hll_register_term,
        hll_registers,
    )

    ev = cat(spark, sf_dir)["events"]
    canon = {
        "event_id": F.col("event_id").cast("string"),
        "ts": F.expr("CAST(unix_micros(ts) AS STRING)"),
        "user_id": F.col("user_id").cast("string"),
        "event_type": F.col("event_type"),
        "value": F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .cast("string"),
        "props": F.col("props"),
    }
    pairs = (
        ev.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("c"), canon[name].alias("v")
                        )
                        for name, _, _ in _ADV_COLS
                    ]
                )
            ).alias("kv")
        )
        .select(F.col("kv.c").alias("c"), F.col("kv.v").alias("v"))
        .localCheckpoint()  # feeds registers AND non-null counts
    )
    nonnull = pairs.filter(F.col("v").isNotNull())
    reg = hll_registers(nonnull, ["c"], "v")
    est = reg.groupBy("c").agg(
        F.sum(hll_register_term()).alias("sp"),
        F.count(F.lit(1)).alias("np"),
    )
    cnt = pairs.groupBy("c").agg(
        F.sum(F.col("v").isNotNull().cast("long")).alias("nn_c")
    )
    nn = ev.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    meta = spark.createDataFrame(
        [(name, dtype) for name, dtype, _ in _ADV_COLS],
        "c string, dtype string",
    )
    prof = (
        est.join(cnt, "c")
        .join(F.broadcast(meta), "c")
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("c").alias("column"),
            "dtype",
            (hll_estimate(F.col("sp"), F.col("np")) / F.col("n")).alias("dr"),
            ((F.col("n") - F.col("nn_c")).cast("double") / F.col("n")).alias(
                "nr"
            ),
        )
    )
    return prof.select(
        "column",
        "dtype",
        (F.floor(F.col("dr") * 10000 + F.lit(0.5)) / 10000).alias(
            "distinct_ratio"
        ),
        (F.floor(F.col("nr") * 10000 + F.lit(0.5)) / 10000).alias(
            "null_rate"
        ),
        F.expr(_ADV_ROLE_SQL).alias("suggested_role"),
    )
