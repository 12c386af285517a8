"""Wave 168: AQE skew-join stress fixture.

j_skew_aqe generates a Zipf-style hot-key join (one key holding ~45%
of the fact side) and demonstrates Spark's OTHER answer to skew beside
the manual salting of `j_skew_salted`: adaptive-query-execution skew
splitting, where the runtime observes the actual shuffle-partition
sizes after the map stage and splits the oversized partition into
advisory-sized chunks, replicating the matching build-side rows — the
same result as salting, decided by measurement instead of by hand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.registry import query

SKEW_N = 400_000
SKEW_DIM = 100_000
SKEW_HOT_PCT = 45  # percent of fact rows landing on the single hot key


@query(
    "j_skew_aqe",
    # Mostly-computed oracle: the skew fixture is a deterministic
    # range() construction (same Knuth-hash spread arithmetic, exact
    # BIGINT), so fact/join/hot cardinalities are RECOMPUTED
    # relationally in DuckDB rather than pinned. Only the two
    # plan-audit cells (did AQE's skew split fire; how many skewed
    # shuffle reads) stay literal 1s — they are physical-plan facts no
    # SQL engine can derive, and the pytest gate beside this op
    # asserts them by reading Spark's executed adaptive plan.
    oracle=f"""
    WITH fact AS (SELECT CASE WHEN id % 100 < {SKEW_HOT_PCT} THEN 1
                              ELSE (id * 2654435761) % {SKEW_DIM} END AS k
                  FROM (SELECT unnest(range(0, {SKEW_N})) AS id)),
    dim AS (SELECT unnest(range(0, {SKEW_DIM})) AS k),
    hot AS (SELECT COUNT(*) AS h
            FROM (SELECT unnest(range(0, {SKEW_N})) AS id)
            WHERE id % 100 < {SKEW_HOT_PCT})
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fact) AS fact_rows,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM fact JOIN dim USING (k)) AS join_rows,
           CAST(hot.h AS BIGINT) AS hot_key_rows,
           CAST(1 AS BIGINT) AS skew_split_applied,
           CAST(1 AS BIGINT) AS skewed_shuffle_reads
    FROM hot
    """,
)
def j_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated hot-key stress join under AQE skew splitting.

    The fact side is a deterministic 400k-row frame where 45% of rows
    carry key 1 and the rest spread uniformly over 100k keys — the
    shape of a production join where one tenant/null-bucket dwarfs the
    median partition. With production-default semantics but
    test-scaled thresholds (skewedPartitionThresholdInBytes lowered so
    a megabyte-scale partition trips the same factor-over-median test
    a 256 MB partition trips on a cluster), the final adaptive plan
    must contain SortMergeJoin(skew=true) over an `AQEShuffleRead
    skewed` — pinned here by EXECUTING the join and reading back its
    final adaptive plan, then returned as an audit row beside the
    exact join cardinality.

    Scale: this is the no-manual-intervention twin of j_skew_salted —
    at 100 TB the defaults (256 MB threshold, 5x median factor) fire
    on real skew with zero query changes; the salted form remains for
    hot keys so extreme a single split set still can't balance them.
    The generated fixture is the stress input, deliberately not a
    testdata table, so the hot share is exact and version-stable."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved: dict[str, str | None] = {}
    for k in confs:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset conf
            saved[k] = None
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(SKEW_N).select(
            F.when(F.col("id") % 100 < SKEW_HOT_PCT, F.lit(1))
            .otherwise((F.col("id") * 2654435761) % SKEW_DIM)
            .alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        dim = spark.range(SKEW_DIM).select(
            F.col("id").alias("k"), (F.col("id") % 13).alias("w")
        )
        j = fact.join(dim, "k")
        qe = j._jdf.queryExecution()  # type: ignore[attr-defined]
        join_rows = qe.toRdd().count()  # executes THIS frame's plan
        plan = qe.executedPlan().toString()
        skew_applied = int("skew=true" in plan)
        skewed_reads = plan.count("AQEShuffleRead skewed")
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    hot_rows = sum(
        1 for i in range(100) if i < SKEW_HOT_PCT
    ) * (SKEW_N // 100)
    return spark.createDataFrame(
        [
            (
                SKEW_N,
                int(join_rows),
                hot_rows,
                skew_applied,
                skewed_reads,
            )
        ],
        "fact_rows long, join_rows long, hot_key_rows long, "
        "skew_split_applied int, skewed_shuffle_reads int",
    )
