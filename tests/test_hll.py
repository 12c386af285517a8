"""functions/hll.py unit gates: the portable HLL must be partition-
invariant (register max is associative), estimate within the textbook
error envelope across three decades of cardinality, and its integer-
grid register sum must stay inside BIGINT by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mister_spark.functions.hll import (
    HLL_M,
    HLL_R,
    hll_estimate,
    hll_register_term,
    hll_registers,
)


def _estimate(spark, df, value_col):
    reg = hll_registers(df, [], value_col)
    agg = reg.agg(
        F.sum(hll_register_term()).alias("sp"),
        F.count(F.lit(1)).alias("np"),
    )
    return agg.select(hll_estimate(F.col("sp"), F.col("np")).alias("e")).collect()[
        0
    ]["e"]


def test_estimate_tracks_exact_across_decades(spark):
    for n in (100, 3000, 100_000):
        df = spark.range(n).select(F.col("id").cast("string").alias("v"))
        est = _estimate(spark, df, "v")
        # linear counting is tighter than 1.04/sqrt(m); allow the
        # standard envelope plus small-n slack
        tol = max(0.05, 3 * 1.04 / math.sqrt(HLL_M))
        assert abs(est - n) / n < tol, (n, est)


def test_register_merge_is_partition_invariant(spark):
    """Union of per-part register tables max-merged == one-shot
    registers, bit for bit — the property the daily rollup relies on."""
    df = spark.range(20_000).select(
        (F.col("id") % 7).alias("part"),
        F.col("id").cast("string").alias("v"),
    )
    oneshot = hll_registers(df, [], "v")
    parts = hll_registers(df, ["part"], "v")
    merged = parts.groupBy("bucket").agg(F.max("rho").alias("rho"))
    assert merged.exceptAll(oneshot).count() == 0
    assert oneshot.exceptAll(merged).count() == 0


def test_register_sum_is_bigint_safe(spark):
    """S = sum 2^(R - rho) <= m * 2^R = 2^61 by construction: verify
    the bound arithmetic and that rho never leaves [1, R]."""
    assert HLL_M * (1 << HLL_R) == 1 << 61
    df = spark.range(50_000).select(F.col("id").cast("string").alias("v"))
    reg = hll_registers(df, [], "v")
    mm = reg.agg(F.min("rho").alias("lo"), F.max("rho").alias("hi")).collect()[0]
    assert 1 <= mm["lo"] and mm["hi"] <= HLL_R, mm
