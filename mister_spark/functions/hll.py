"""Engine-portable HyperLogLog: the md5-60 register construction.

Spark's `hll_sketch_agg` (Datasketches) is engine-local — its register
bytes have no DuckDB equivalent, so ops built on it can only ever get a
rows-only correctness check. This module is the portable alternative
(the sketch_hll_error_curve pattern, generalized): hash = the first 60
bits of md5 (identical in any engine with md5 + string slicing), bucket
= h mod m, register rho = leading-rank of the remaining 60-b bits.
Register MERGE is max() — associative and partition/order-invariant —
so daily→total rollups replay exactly in SQL.

Cross-engine exactness of the ESTIMATE: the harmonic sum Σ 2^-rho is
kept on an integer grid — S = Σ 2^(R - rho) with R = 60 - b + 1 the max
rho, so every term is an exact BIGINT and S <= m * 2^R = 2^61 (never
overflows, any b). Then Σ 2^-rho = S / 2^R exactly, and
est_raw = (alpha_m * m^2 * 2^R) / S is one double division of
identically-rounded operands in both engines. The small-range branch
(linear counting, est_raw <= 2.5 m with empty registers) is
m * ln(m / v) with v an exact integer — ln may differ by 1 ulp across
engines, which sits far inside the FLOOR output grid for any
non-adversarial input.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

HLL_B = 12  # register-index bits: m = 4096, RSE 1.04/sqrt(m) = 1.6%
HLL_M = 1 << HLL_B
HLL_R = 60 - HLL_B + 1  # max rho == the integer-grid scale exponent


def hll_alpha(m: int) -> float:
    """Flajolet's bias-correction constant (public HLL literature)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_hash(col: Column) -> Column:
    """60-bit md5 hash of the stringified key — identical in DuckDB as
    CAST('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15) AS BIGINT)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("bigint")
    )


def hll_bucket(h: Column) -> Column:
    return (h % HLL_M).alias("bucket")


def hll_registers(df, keys: list[str], value_col: str):
    """Per-(keys, bucket) max-rho register frame — the mergeable sketch
    table (merge across any partitioning of `keys` = groupBy + max).
    One map-side-combinable grouped pass over the input."""
    h = hll_hash(F.col(value_col)).alias("h")
    base = df.select(*keys, h)
    hdiv = F.expr(f"h div {HLL_M}")  # INTEGER division: h has 60 bits
    rho = (
        F.when(hdiv == 0, F.lit(HLL_R))
        .otherwise(F.lit(HLL_R) - F.length(F.bin(hdiv)))
        .alias("rho")
    )
    return base.select(*keys, (F.col("h") % HLL_M).alias("bucket"), rho).groupBy(
        *keys, "bucket"
    ).agg(F.max("rho").alias("rho"))


def hll_estimate(sp: Column, np: Column) -> Column:
    """Estimate column from per-key register aggregates: sp = Σ over
    PRESENT buckets of 2^(R - rho) (exact BIGINT), np = # present
    buckets. Absent buckets contribute 2^R each; v = m - np empties
    drive the linear-counting branch."""
    m = HLL_M
    s = sp + (F.lit(m) - np) * F.lit(1 << HLL_R)
    v = (F.lit(m) - np).cast("double")
    est_raw = F.lit(hll_alpha(m) * m * m * float(1 << HLL_R)) / s
    return F.when(
        (est_raw <= 2.5 * m) & (v > 0), m * F.log(F.lit(float(m)) / v)
    ).otherwise(est_raw)


def hll_register_term() -> Column:
    """The integer-grid register term 2^(R - rho) as an exact BIGINT
    (2^(R-rho) <= 2^48 < 2^53, so the pow round-trip is exact)."""
    return F.pow(F.lit(2.0), F.lit(HLL_R) - F.col("rho")).cast("bigint")


def hll_oracle_registers(
    source_sql: str,
    key_exprs: str,
    value_expr: str,
    key_names: str | None = None,
) -> str:
    """DuckDB CTE body mirroring hll_registers: SELECT keys, bucket,
    MAX(rho) AS rho FROM hashed GROUP BY keys, bucket. ``key_exprs``
    (with aliases) is evaluated in the inner hash projection;
    ``key_names`` (bare alias names, defaults to key_exprs) is what the
    outer grouped select references. Callers embed the result in a
    WITH chain."""
    inner = f"{key_exprs}, " if key_exprs else ""
    outer = f"{key_names or key_exprs}, " if key_exprs else ""
    return f"""
    SELECT {outer}hh.h % {HLL_M} AS bucket,
           MAX(CASE WHEN (hh.h // {HLL_M}) = 0 THEN {HLL_R}
               ELSE {HLL_R} - LENGTH(bin(hh.h // {HLL_M})) END) AS rho
    FROM (SELECT {inner}CAST('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15)
                 AS BIGINT) AS h
          FROM {source_sql}) hh
    GROUP BY ALL
    """


def hll_oracle_estimate(sp: str = "sp", np: str = "np") -> str:
    """DuckDB expression mirroring hll_estimate over aggregates named
    {sp} (Σ 2^(R-rho) across present buckets) and {np} (# present)."""
    m = HLL_M
    scale = 1 << HLL_R
    alpha_num = repr(hll_alpha(m) * m * m * float(scale))
    # the register sum stays on the INTEGER grid until one final double
    # conversion — the same rounding point as the Spark side (a
    # CAST(sp AS DOUBLE) before the addition would round sp > 2^53
    # separately and could diverge by an ulp)
    s = f"CAST(({sp} + ({m} - {np}) * {scale}) AS DOUBLE)"
    v = f"CAST({m} - {np} AS DOUBLE)"
    est_raw = f"(CAST({alpha_num} AS DOUBLE) / {s})"
    return (
        f"CASE WHEN {est_raw} <= 2.5 * {m} AND {v} > 0 "
        f"THEN {m} * LN({m} / {v}) ELSE {est_raw} END"
    )
