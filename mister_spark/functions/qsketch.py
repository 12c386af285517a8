"""Engine-portable approximate quantiles: the md5-60 hash-threshold
sample.

Spark's ``percentile_approx`` (t-digest) is engine-local — digest
internals are partition-order-sensitive and have no DuckDB equivalent,
so ops built on it could only ever get a rows-only correctness check.
This module is the portable alternative (the functions/hll.py md5-60
pattern, applied to quantiles): a DETERMINISTIC uniform sample by hash
threshold, then EXACT quantiles of the sample.

Construction, identical in both engines:

- h = first 60 bits of md5('q:' || key) — uniform on [0, 2^60), the
  'q:' domain tag decorrelates from the HLL's hash of the same keys;
- per group, keep rows with h < T_g where
  T_g = (2^60 // n_g) * K (pure BIGINT arithmetic; when n_g > K the
  product is < 2^60 so it cannot overflow, and the n_g <= K keep-all
  branch is guarded with CASE/WHEN in BOTH engines — plain `OR` has no
  evaluation-order guarantee, and for n_g <= 128 the unguarded product
  (2^60 // n_g) * K would exceed BIGINT). E[sample size] ~ K,
  spread ~ sqrt(K);
- quantile q of a group's m sampled rows = the value at
  ROW_NUMBER = GREATEST(1, CEIL(q * m)) under ORDER BY (value, h) —
  the type-1 inverse-CDF pick, a total order, so both engines pick the
  same row.

Why this is the honest 100 TB shape: the sample filter is map-side
(one grouped count broadcast back), the only sort is a window over the
~K-row-per-group SAMPLE, and the sample itself is a mergeable sketch —
the union of two hash-threshold samples re-thresholded is the sample
of the union (the KMV/bottom-k property), so day-level samples roll up
exactly like the HLL registers do. Rank error ~ sqrt(q(1-q)/K): 1.6%
at the median for the default K=1024 — the same accuracy class as the
t-digest it replaces, with a bit-replayable oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

QS_K = 1024  # target sample size per group (rank SE ~1.6% at q=0.5)
QS_SCALE = 1 << 60


def qs_hash(id_col: Column) -> Column:
    """60-bit md5 hash of 'q:' || key — DuckDB twin:
    CAST('0x' || substr(md5('q:' || CAST(x AS VARCHAR)), 1, 15) AS
    BIGINT). Keys must stringify identically in both engines (use
    integer keys or ':'-joined integer composites, never doubles)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("q:"), id_col.cast("string"))), 1, 15
            ),
            16,
            10,
        )
        .cast("bigint")
    )


def qs_sample(
    df: DataFrame, keys: list[str], id_col: Column, k: int = QS_K
) -> DataFrame:
    """Deterministic ~k-row-per-group hash sample of ``df``. Adds
    ``_qh`` (the hash) and ``_qn`` (the group's true row count); the
    filter is map-side after one grouped-count broadcast."""
    h = qs_hash(id_col).alias("_qh")
    df2 = df.select("*", h)
    if keys:
        cnt = df2.groupBy(*keys).agg(F.count(F.lit(1)).alias("_qn"))
        df2 = df2.join(F.broadcast(cnt), keys)
    else:
        cnt = df2.agg(F.count(F.lit(1)).alias("_qn"))
        df2 = df2.crossJoin(F.broadcast(cnt))
    # INTEGER division — a double-precision / would round 2^60 and
    # could disagree with DuckDB's // by whole units of k.  The
    # small-group branch must be a CASE (F.when), not an OR: with
    # _qn <= 128, (2^60 div _qn) * k overflows BIGINT, and OR operands
    # carry no evaluation-order guarantee.
    keep = F.when(F.col("_qn") <= k, F.lit(True)).otherwise(
        F.col("_qh") < F.expr(f"({QS_SCALE}L div _qn) * {k}")
    )
    return df2.filter(keep)


def qs_quantiles(
    sample: DataFrame,
    keys: list[str],
    value_col: str,
    quantiles: dict[str, float],
    extras: dict[str, Column] | None = None,
) -> DataFrame:
    """Exact type-1 quantiles of a qs_sample frame: one window rank
    over the ~k-row-per-group sample, one grouped pick per requested
    quantile. Returns keys + one column per ``quantiles`` name (+ any
    ``extras`` aggregate columns, e.g. the group's true count
    F.max('_qn'))."""
    part = W.partitionBy(*keys) if keys else W.partitionBy(F.lit(1))
    w = part.orderBy(value_col, "_qh")
    r = sample.withColumn("_qrn", F.row_number().over(w)).withColumn(
        "_qm", F.count(F.lit(1)).over(part)
    )
    picks = [
        F.max(
            F.when(
                F.col("_qrn")
                == F.greatest(
                    F.lit(1).cast("bigint"),
                    F.ceil(F.lit(q) * F.col("_qm")).cast("bigint"),
                ),
                F.col(value_col),
            )
        ).alias(name)
        for name, q in quantiles.items()
    ]
    for name, col in (extras or {}).items():
        picks.append(col.alias(name))
    if keys:
        return r.groupBy(*keys).agg(*picks)
    return r.groupBy().agg(*picks)


def qs_oracle_sample(
    source_sql: str, key_cols: str, id_expr: str, k: int = QS_K
) -> str:
    """DuckDB CTE chain mirroring qs_sample. Embed as
    ``WITH {qs_oracle_sample(...)}, ...``; the final CTE is ``qs_s``
    with all source columns plus _qh and _qn."""
    keysel = f"{key_cols}, " if key_cols else ""
    grp = f"GROUP BY {key_cols}" if key_cols else ""
    using = f"USING ({key_cols})" if key_cols else "ON TRUE"
    return f"""
    qs_h AS (SELECT *, CAST('0x' || substr(md5('q:' ||
                    CAST({id_expr} AS VARCHAR)), 1, 15) AS BIGINT) AS _qh
             FROM {source_sql}),
    qs_n AS (SELECT {keysel}CAST(COUNT(*) AS BIGINT) AS _qn
             FROM qs_h {grp}),
    qs_s AS (SELECT qs_h.*, qs_n._qn FROM qs_h JOIN qs_n {using}
             WHERE CASE WHEN qs_n._qn <= {k} THEN TRUE
                        ELSE qs_h._qh < (({QS_SCALE} // qs_n._qn) * {k})
                   END)
    """


def qs_oracle_rank(key_cols: str, value_expr: str) -> str:
    """DuckDB CTE mirroring qs_quantiles' rank frame over qs_s: emits
    qs_r with _qrn (row number by value, _qh) and _qm (sample size)."""
    part = f"PARTITION BY {key_cols} " if key_cols else ""
    return f"""
    qs_r AS (SELECT *, ROW_NUMBER() OVER ({part}ORDER BY {value_expr}, _qh)
                    AS _qrn,
                    CAST(COUNT(*) OVER ({part.strip() or "PARTITION BY 1"})
                         AS BIGINT) AS _qm
             FROM qs_s)
    """


def qs_oracle_pick(q: float, value_expr: str) -> str:
    """DuckDB aggregate expression: the type-1 quantile pick over qs_r
    rows (use inside GROUP BY key_cols)."""
    return (
        f"MAX(CASE WHEN _qrn = GREATEST(1, "
        f"CAST(CEIL({q!r} * _qm) AS BIGINT)) THEN {value_expr} END)"
    )
