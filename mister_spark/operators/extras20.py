"""Wave 20: right-to-be-forgotten propagation, Brown-Forsythe variance
homogeneity, and snapshot reconciliation diffs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, money, ratio, rnd
from mister_spark.registry import query

FORGET_MOD = 97  # users with user_id % 97 == 0 request erasure


@query(
    "ds_forget_users",
    oracle=f"""
    WITH f AS (SELECT DISTINCT user_id FROM events WHERE user_id % {FORGET_MOD} = 0),
    ev AS (
      SELECT 'events' AS table_name,
             CAST(COUNT(*) AS BIGINT) AS n_before,
             CAST(SUM(CASE WHEN user_id % {FORGET_MOD} = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_deleted
      FROM events),
    us AS (
      SELECT 'user_profiles' AS table_name,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_before,
             CAST((SELECT COUNT(*) FROM f) AS BIGINT) AS n_deleted
      FROM events)
    SELECT table_name, n_before, n_deleted,
           n_before - n_deleted AS n_after
    FROM ev
    UNION ALL
    SELECT table_name, n_before, n_deleted, n_before - n_deleted FROM us
    """,
)
def ds_forget_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation report: a forget set (users
    with user_id ≡ 0 mod 97 stand in for erasure requests) anti-joined
    through every user-keyed table, reporting before/deleted/after
    counts per table — the audit artifact a GDPR deletion job must
    produce. The actual rewrite is the same anti-join feeding a
    partition-overwrite writer (sources/compact.py's atomic-swap
    pattern); the report is what gets archived.

    Scale: the forget set broadcasts (erasure batches are small); each
    table pass is one scan + broadcast anti-join — no shuffle of the
    fact data."""
    ev = cat(spark, sf_dir)["events"]
    forget = (
        ev.filter(F.col("user_id") % FORGET_MOD == 0).select("user_id").distinct()
    )
    ev_row = ev.agg(
        F.lit("events").alias("table_name"),
        F.count(F.lit(1)).alias("n_before"),
        F.sum(F.when(F.col("user_id") % FORGET_MOD == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_deleted"),
    )
    users_row = ev.agg(
        F.lit("user_profiles").alias("table_name"),
        F.countDistinct("user_id").alias("n_before"),
    ).join(F.broadcast(forget.agg(F.count(F.lit(1)).alias("n_deleted"))))
    out = ev_row.unionByName(users_row)
    return out.select(
        "table_name",
        "n_before",
        "n_deleted",
        (F.col("n_before") - F.col("n_deleted")).alias("n_after"),
    )


@query(
    "stat_levene",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1),
    z AS (
      SELECT e.event_type, ABS(e.value - m.med) AS z
      FROM events e JOIN med m ON e.event_type = m.event_type),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             AVG(z) AS zb, SUM(z * z) AS z2
      FROM z GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(COUNT(*) AS BIGINT) AS k,
             SUM(n * zb) / SUM(n) AS zg,
             SUM(n * zb * zb) AS nzb2,
             SUM(z2) AS z2t,
             SUM(n * zb * zb) - 2 * (SUM(n * zb) / SUM(n)) * SUM(n * zb)
               + (SUM(n * zb) / SUM(n)) * (SUM(n * zb) / SUM(n)) * SUM(n)
               AS ss_between_raw
      FROM g)
    SELECT k, nt,
           FLOOR((CAST(nt - k AS DOUBLE) / (k - 1))
                 * (nzb2 - zg * zg * nt) / (z2t - nzb2)
                 * 10000 + 0.5) / 10000 AS levene_w
    FROM tot
    """,
)
def stat_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test statistic (Levene with median centers) for
    variance homogeneity across event types — the check that decides
    whether stat_anova_f's equal-variance assumption holds, robust to
    the value column's skew because centers are medians. W =
    ((N−k)/(k−1)) · Σnⱼ(z̄ⱼ−z̄)² / ΣΣ(zᵢⱼ−z̄ⱼ)², all from one deviation
    pass via the algebraic identities (Σnz̄² − Nz̄², Σz² − Σnz̄²).

    Scale: one percentile aggregate, one broadcast recount of absolute
    deviations, scalar algebra on the 5-row group frame."""
    ev = cat(spark, sf_dir)["events"].select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    z = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("z").alias("zb"),
        F.sum(F.col("z") * F.col("z")).alias("z2"),
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("nt"),
        F.count(F.lit(1)).alias("k"),
        (F.sum(F.col("n") * F.col("zb")) / F.sum("n")).alias("zg"),
        F.sum(F.col("n") * F.col("zb") * F.col("zb")).alias("nzb2"),
        F.sum("z2").alias("z2t"),
    )
    ss_between = F.col("nzb2") - F.col("zg") * F.col("zg") * F.col("nt")
    ss_within = F.col("z2t") - F.col("nzb2")
    w = (
        (F.col("nt") - F.col("k")).cast("double") / (F.col("k") - 1)
    ) * ss_between / ss_within
    return tot.select("k", "nt", rnd(w, 4).alias("levene_w"))


DIFF_MISSING_MOD = 11
DIFF_CHANGED_MOD = 13


@query(
    "ds_table_diff",
    oracle=f"""
    WITH old AS (
      SELECT o_orderkey AS k, o_totalprice AS v FROM orders
      WHERE o_orderkey % {DIFF_MISSING_MOD} <> 0),
    new AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % {DIFF_CHANGED_MOD} = 0
                  THEN o_totalprice + 10 ELSE o_totalprice END AS v
      FROM orders),
    d AS (
      SELECT COALESCE(old.k, new.k) AS k,
             CASE WHEN old.k IS NULL THEN 'added'
                  WHEN new.k IS NULL THEN 'removed'
                  WHEN old.v <> new.v THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM old FULL OUTER JOIN new ON old.k = new.k)
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1
    """,
)
def ds_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: classify every key across two table
    versions as added / removed / changed / unchanged via a full-outer
    join — the data-diff every migration sign-off and CDC validation
    runs. (Old snapshot: orders missing keys ≡ 0 mod 11; new snapshot:
    prices bumped for keys ≡ 0 mod 13 — deterministic synthetic drift.)

    Scale: one co-partitioned full-outer join on the key (bucketing
    both snapshots makes it exchange-free, io_bucketed_join's trick);
    the classification is a projection, the rollup 4 keys."""
    o = cat(spark, sf_dir)["orders"]
    old = o.filter(F.col("o_orderkey") % DIFF_MISSING_MOD != 0).select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("v_old")
    )
    new = o.select(
        F.col("o_orderkey").alias("k"),
        F.when(
            F.col("o_orderkey") % DIFF_CHANGED_MOD == 0, F.col("o_totalprice") + 10
        )
        .otherwise(F.col("o_totalprice"))
        .alias("v_new"),
    )
    d = old.join(new, "k", "full_outer").select(
        F.when(F.col("v_old").isNull(), "added")
        .when(F.col("v_new").isNull(), "removed")
        .when(F.col("v_old") != F.col("v_new"), "changed")
        .otherwise("unchanged")
        .alias("status")
    )
    return d.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
