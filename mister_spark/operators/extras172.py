"""Wave 172: always-valid sequential inference and Iceberg expiry.

ev_msprt runs the mixture sequential probability ratio test (mSPRT,
the always-valid p-value construction of Robbins' power-one tests as
productized by Johari et al., public literature) over the same
user-parity A/A stream and interim looks as stat_group_sequential:
where OBF boundaries discretize peeking into k looks, the mSPRT's
p-value is valid at EVERY sample size — monitor continuously, stop
whenever. io_iceberg_expire audits Iceberg snapshot expiry: metadata
evolves to a new version, expired snapshots' manifests are deleted,
time travel to them fails loudly, the current read is untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

MSPRT_LOOKS = 20
MSPRT_MIX = 0.01  # mixture variance as a fraction of the pooled variance
MSPRT_ALPHA = 0.05

_MSPRT_LAM = """
    SQRT(1 / (1 + r)) * EXP(z * z * r / (2 * (1 + r)))
"""


@query(
    "ev_msprt",
    oracle=f"""
    WITH mm AS (SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
                FROM events),
    b AS (SELECT user_id % 2 AS g, value,
                 LEAST(CAST(FLOOR((epoch_us(ts) - mm.mn)
                                  / ((mm.mx - mm.mn + 1) / {MSPRT_LOOKS}.0))
                            AS BIGINT) + 1, {MSPRT_LOOKS}) AS look
          FROM events, mm),
    l AS (SELECT look,
                 SUM(CASE WHEN g = 0 THEN value END) AS sa,
                 SUM(CASE WHEN g = 0 THEN value * value END) AS ssa,
                 CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                   AS na,
                 SUM(CASE WHEN g = 1 THEN value END) AS sb,
                 SUM(CASE WHEN g = 1 THEN value * value END) AS ssb,
                 CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   AS nb
          FROM b GROUP BY 1),
    c AS (SELECT look,
                 SUM(sa) OVER w AS sa, SUM(ssa) OVER w AS ssa,
                 SUM(na) OVER w AS na,
                 SUM(sb) OVER w AS sb, SUM(ssb) OVER w AS ssb,
                 SUM(nb) OVER w AS nb
          FROM l WINDOW w AS (ORDER BY look)),
    s AS (SELECT look, na, nb,
                 (sa / na - sb / nb) AS d,
                 ((ssa - sa * sa / na) + (ssb - sb * sb / nb))
                   / (na + nb - 2) AS s2,
                 na * nb / (na + nb) AS neff
          FROM c),
    z AS (SELECT look, na, nb,
                 d / SQRT(s2 / neff) AS z, neff * {MSPRT_MIX} AS r
          FROM s),
    lam AS (SELECT look, na, nb, z, {_MSPRT_LAM} AS lam FROM z),
    p AS (SELECT look, na, nb, z, lam,
                 LEAST(1.0, MIN(1 / lam)
                             OVER (ORDER BY look
                                   ROWS UNBOUNDED PRECEDING)) AS pav
          FROM lam)
    SELECT look, CAST(na + nb AS BIGINT) AS n,
           FLOOR(z * 10000 + 0.5) / 10000 AS z,
           FLOOR(lam * 10000 + 0.5) / 10000 AS lam,
           FLOOR(pav * 10000 + 0.5) / 10000 AS p_always_valid,
           CASE WHEN lam > 1 / {MSPRT_ALPHA} THEN 1 ELSE 0 END AS crossed
    FROM p ORDER BY look
    """,
)
def ev_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid A/A monitor: at each of {k} interim looks over the
    user-parity arms, the mixture likelihood ratio
    Lambda = sqrt(1/(1+r)) * exp(z^2 r / (2(1+r))), r = n_eff*{mix}
    (a normal mixture over effect sizes with variance {mix}x the
    pooled variance), and the always-valid p-value = running
    min(1/Lambda) — valid at every n by Ville's inequality, so
    continuous peeking cannot manufacture a winner. On A/A the
    boundary Lambda > 1/alpha must never fire (pytest-asserted); the
    same query on a real treatment column is the ship/no-ship monitor.

    Scale: per-look moments are one shuffle on the look bucket; every
    window rides the {k}-row look frame; z and Lambda are identical
    closed-form arithmetic on both engines."""
    ev = cat(spark, sf_dir)["events"].select(
        "user_id", "value", F.unix_micros("ts").alias("tus")
    )
    mm = ev.agg(
        F.min("tus").alias("mn"), F.max("tus").alias("mx")
    )
    b = ev.crossJoin(F.broadcast(mm)).select(
        (F.col("user_id") % 2).alias("g"),
        "value",
        F.least(
            F.floor(
                (F.col("tus") - F.col("mn"))
                / ((F.col("mx") - F.col("mn") + 1) / float(MSPRT_LOOKS))
            ).cast("bigint")
            + 1,
            F.lit(MSPRT_LOOKS).cast("bigint"),
        ).alias("look"),
    )
    l = b.groupBy("look").agg(
        F.sum(F.when(F.col("g") == 0, F.col("value"))).alias("sa"),
        F.sum(F.when(F.col("g") == 0, F.col("value") * F.col("value"))).alias(
            "ssa"
        ),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
        .cast("double")
        .alias("na"),
        F.sum(F.when(F.col("g") == 1, F.col("value"))).alias("sb"),
        F.sum(F.when(F.col("g") == 1, F.col("value") * F.col("value"))).alias(
            "ssb"
        ),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("double")
        .alias("nb"),
    )
    w = W.orderBy("look").rowsBetween(W.unboundedPreceding, 0)
    c = l.select(  # {k}-row frame: the unpartitioned window is bounded
        "look",
        F.sum("sa").over(w).alias("sa"),
        F.sum("ssa").over(w).alias("ssa"),
        F.sum("na").over(w).alias("na"),
        F.sum("sb").over(w).alias("sb"),
        F.sum("ssb").over(w).alias("ssb"),
        F.sum("nb").over(w).alias("nb"),
    )
    s = c.select(
        "look",
        "na",
        "nb",
        (F.col("sa") / F.col("na") - F.col("sb") / F.col("nb")).alias("d"),
        (
            (
                (F.col("ssa") - F.col("sa") * F.col("sa") / F.col("na"))
                + (F.col("ssb") - F.col("sb") * F.col("sb") / F.col("nb"))
            )
            / (F.col("na") + F.col("nb") - 2)
        ).alias("s2"),
        (F.col("na") * F.col("nb") / (F.col("na") + F.col("nb"))).alias(
            "neff"
        ),
    )
    z = s.select(
        "look",
        "na",
        "nb",
        (F.col("d") / F.sqrt(F.col("s2") / F.col("neff"))).alias("z"),
        (F.col("neff") * MSPRT_MIX).alias("r"),
    )
    lam = z.withColumn("lam", F.expr(_MSPRT_LAM))
    p = lam.withColumn(
        "pav",
        F.least(F.lit(1.0), F.min(1 / F.col("lam")).over(w)),
    )
    return p.select(
        "look",
        (F.col("na") + F.col("nb")).cast("bigint").alias("n"),
        ratio(F.col("z")).alias("z"),
        ratio(F.col("lam")).alias("lam"),
        ratio(F.col("pav")).alias("p_always_valid"),
        F.when(F.col("lam") > 1 / MSPRT_ALPHA, 1).otherwise(0).alias(
            "crossed"
        ),
    ).orderBy("look")


ev_msprt.__doc__ = ev_msprt.__doc__.format(k=MSPRT_LOOKS, mix=MSPRT_MIX)


@query(
    "io_iceberg_expire",
    # Real oracle: the expiry script is structural — 3 snapshots keep
    # 2, one manifest list deletes, the head stays put, reads are
    # unchanged; the only data-dependent number is the %2 overwrite's
    # row count.
    oracle="""
    WITH c AS (SELECT CAST(SUM(CASE WHEN o_orderkey % 2 = 0
                              THEN 1 ELSE 0 END) AS BIGINT) AS evens
               FROM orders)
    SELECT CAST(1 AS INT) AS expired, CAST(2 AS INT) AS kept,
           CAST(1 AS INT) AS deleted_files,
           evens AS rows_before, evens AS rows_after,
           CAST(1 AS INT) AS current_unchanged,
           CAST(1 AS INT) AS head_stable,
           CAST(1 AS INT) AS expired_unreadable,
           CAST(1 AS INT) AS kept_readable,
           CAST(1 AS INT) AS metadata_log_len
    FROM c
    """,
)
def io_iceberg_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg snapshot-expiry audit: export a 3-version snapshot
    table to an Iceberg metadata tree, expire all but the newest 2
    snapshots, and verify the spec-mandated behavior — metadata
    evolves to a NEW version file (the old one is logged in
    metadata-log, version-hint advances), expired snapshots' manifest
    lists are deleted, time travel to an expired snapshot raises, and
    the current read returns the exact same rows as before expiry.

    Scale: metadata-only maintenance — O(#snapshots + #manifests)
    file operations, zero data reads."""
    import os
    import shutil
    import tempfile

    from mister_spark.sources.iceberg import (
        current_metadata,
        expire_snapshots,
        export_iceberg,
        read_iceberg,
    )
    from mister_spark.sources.snapshots import SnapshotTable

    orders = cat(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="iceberg_exp_")
    try:
        t = SnapshotTable(
            spark, os.path.join(root, "t"), stats_cols=["o_orderkey"]
        )
        t.create(orders.filter(F.col("o_orderkey") < 1000))
        t.append(orders.filter(F.col("o_orderkey") >= 1000))
        t.overwrite(orders.filter(F.col("o_orderkey") % 2 == 0))
        dest = os.path.join(root, "ice")
        export_iceberg(t, dest)
        rows_before = read_iceberg(spark, dest).count()
        hint_before = current_metadata(dest)["current-snapshot-id"]
        report = expire_snapshots(dest, retain_last=2)
        md = current_metadata(dest)
        rows_after = read_iceberg(spark, dest).count()
        expired_unreadable = 0
        try:
            read_iceberg(spark, dest, snapshot_id=report["expired"][0])
        except ValueError:
            expired_unreadable = 1
        kept_readable = int(
            read_iceberg(spark, dest, snapshot_id=report["kept"][0]).count()
            > 0
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                len(report["expired"]),
                len(report["kept"]),
                len(report["deleted_files"]),
                int(rows_before),
                int(rows_after),
                int(rows_before == rows_after),
                int(md["current-snapshot-id"] == hint_before),
                expired_unreadable,
                kept_readable,
                len(md.get("metadata-log", [])),
            )
        ],
        "expired int, kept int, deleted_files int, rows_before long, "
        "rows_after long, current_unchanged int, head_stable int, "
        "expired_unreadable int, kept_readable int, metadata_log_len int",
    )
