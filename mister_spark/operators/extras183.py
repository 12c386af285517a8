"""Wave 183: custom Python DataSource audit.

io_python_datasource productizes the Spark 4 `pyspark.sql.datasource`
connector surface (sources/pyds.py): a partitioned Python source with
genuine filter pushdown — the API a user reaches for when the data
lives behind a REST endpoint, a bespoke file format, or an internal
service with no JVM connector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.registry import query

PYDS_ROWS = 20_000
PYDS_PARTS = 8
PYDS_CUT = 50.0


@query(
    "io_python_datasource",
    # Mostly-computed oracle: the ledger source's rows are a pure
    # function of the row index (amount = (k·7919 mod 10000)/100,
    # shard = k div rows-per-part), so every cardinality — total,
    # pushed, mixed, their expectations, parts_seen — is RECOMPUTED
    # relationally from the same range() construction. Only
    # pushdown_applied stays a literal 1: whether the predicate was
    # consumed INSIDE the source (srv_filtered flag) is a connector
    # runtime fact the pytest gate asserts, not a relation.
    oracle=f"""
    WITH led AS (SELECT id,
                        CAST(id // {PYDS_ROWS // PYDS_PARTS} AS INT)
                          AS shard,
                        ((id * 7919) % 10000) / 100.0 AS amount
                 FROM (SELECT unnest(range(0, {PYDS_ROWS})) AS id)),
    agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
                   CAST(COUNT(DISTINCT shard) AS INT) AS parts_seen,
                   CAST(SUM(CASE WHEN amount > {PYDS_CUT} THEN 1
                            ELSE 0 END) AS BIGINT) AS pushed,
                   CAST(SUM(CASE WHEN amount > {PYDS_CUT} AND shard = 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS mixed,
                   -- independent derivation of the mixed count from
                   -- raw id arithmetic (no shard column): mirrors the
                   -- Spark side's observed-vs-pure-Python cross-check
                   CAST(SUM(CASE WHEN amount > {PYDS_CUT}
                            AND id >= {PYDS_ROWS // PYDS_PARTS}
                            AND id < {2 * (PYDS_ROWS // PYDS_PARTS)}
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS mixed_by_range
            FROM led)
    SELECT total_rows, CAST({PYDS_PARTS} AS INT) AS parts_declared,
           parts_seen, pushed AS pushed_rows, pushed AS pushed_expected,
           CAST(1 AS INT) AS pushdown_applied,
           mixed AS mixed_rows, mixed AS mixed_expected,
           CAST(CASE WHEN mixed = mixed_by_range THEN 1 ELSE 0 END AS INT)
             AS residual_correct
    FROM agg
    """,
)
def io_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python DataSource contract audit over the deterministic ledger
    source: (1) an unfiltered read returns every generated row across
    all partitions; (2) `amount > cut` is CONSUMED by pushFilters —
    every surviving row carries srv_filtered=1, proving rows were
    dropped inside the source, not by Spark; (3) a predicate the
    source declines (shard = 1) stays a residual Spark filter and the
    combined result still matches the pure-Python expectation exactly;
    (4) the scan parallelizes across the declared partitions.

    Scale: the source plans one InputPartition per shard, so a
    1000-executor cluster fans the read out exactly like a file scan;
    pushdown means a selective predicate ships no dead rows from the
    remote system — the property that makes a Python connector viable
    at all."""
    from mister_spark.sources.pyds import (
        LEDGER_FORMAT,
        register_ledger_source,
    )

    conf_key = "spark.sql.python.filterPushdown.enabled"
    saved = spark.conf.get(conf_key, None)
    try:
        spark.conf.set(conf_key, "true")
        register_ledger_source(spark)
        base = (
            spark.read.format(LEDGER_FORMAT)
            .option("rows", PYDS_ROWS)
            .option("parts", PYDS_PARTS)
            .load()
        )
        total = base.count()
        parts_seen = base.select("shard").distinct().count()
        pushed = base.filter(F.col("amount") > PYDS_CUT).localCheckpoint()
        n_pushed = pushed.count()
        srv_min = pushed.agg(F.min("srv_filtered")).collect()[0][0]
        mixed = base.filter(
            (F.col("amount") > PYDS_CUT) & (F.col("shard") == 1)
        )
        n_mixed = mixed.count()
        # pure-Python ground truth for the mixed predicate
        per = PYDS_ROWS // PYDS_PARTS
        want_mixed = sum(
            1
            for k in range(1 * per, 2 * per)
            if ((k * 7919) % 10000) / 100.0 > PYDS_CUT
        )
        want_pushed = sum(
            1
            for k in range(PYDS_ROWS)
            if ((k * 7919) % 10000) / 100.0 > PYDS_CUT
        )
    finally:
        if saved is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, saved)
    return spark.createDataFrame(
        [
            (
                int(total),
                PYDS_PARTS,
                int(parts_seen),
                int(n_pushed),
                int(want_pushed),
                int(srv_min == 1),
                int(n_mixed),
                int(want_mixed),
                int(n_mixed == want_mixed),
            )
        ],
        "total_rows long, parts_declared int, parts_seen int, "
        "pushed_rows long, pushed_expected long, pushdown_applied int, "
        "mixed_rows long, mixed_expected long, residual_correct int",
    )


@query(
    "io_python_datasink",
    # Real oracle: the sink contract is a relational count of the
    # <2000-key slice plus structural constants (4 committed files,
    # no tmp residue, exact round trip).
    oracle="""
    WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders
               WHERE o_orderkey < 2000)
    SELECT n AS rows_in, n AS success_total, n AS rows_read_back,
           CAST(4 AS INT) AS committed_files, CAST(0 AS INT) AS tmp_residue,
           CAST(1 AS INT) AS round_trip_exact
    FROM c
    """,
)
def io_python_datasink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python DataSource WRITER contract audit (sources/pyds.py): a
    two-phase-commit JSONL sink — tasks write _tmp_ files and return
    commit messages, the driver's commit() renames them into place and
    publishes _SUCCESS with the total — so readers never observe a
    half-written output. The audit writes a 4-partition slice of
    orders through the sink and verifies: _SUCCESS total equals the
    input count, a JSON read of the committed files round-trips every
    row exactly, no _tmp_ residue remains, and one committed file per
    task partition exists.

    Scale: tasks stream rows to their own file (no driver data); the
    commit is O(#tasks) renames — the same protocol Spark's file sinks
    run, here expressed through the Python writer API for systems with
    no JVM connector."""
    import os
    import shutil
    import tempfile

    from mister_spark.operators.common import cat
    from mister_spark.sources.pyds import (
        JSONL_SINK_FORMAT,
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    src = (
        cat(spark, sf_dir)["orders"]
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .filter(F.col("o_orderkey") < 2000)
    )
    n_in = src.count()
    dest = tempfile.mkdtemp(prefix="pyds_sink_")
    try:
        src.repartition(4).write.format(JSONL_SINK_FORMAT).option(
            "path", dest
        ).mode("append").save()
        files = sorted(os.listdir(dest))
        committed = [f for f in files if f.endswith(".jsonl") and not f.startswith("_tmp_")]
        tmp_residue = [f for f in files if f.startswith("_tmp_")]
        success_total = int(open(os.path.join(dest, "_SUCCESS")).read())
        back = spark.read.json(
            [os.path.join(dest, f) for f in committed]
        ).select("o_orderkey", "o_custkey", "o_totalprice")
        n_back = back.count()
        row_parity = int(
            back.exceptAll(src).count() == 0
            and src.exceptAll(back).count() == 0
        )
    finally:
        shutil.rmtree(dest, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                int(n_in),
                int(success_total),
                int(n_back),
                len(committed),
                len(tmp_residue),
                row_parity,
            )
        ],
        "rows_in long, success_total long, rows_read_back long, "
        "committed_files int, tmp_residue int, round_trip_exact int",
    )


@query(
    "stream_python_source",
    # Real oracle: the synthetic streaming-source resume audit is
    # data-independent — a fixed relation.
    oracle="""
    SELECT CAST(40 AS INT) AS run1_rows, CAST(10 AS INT) AS run2_rows,
           CAST(1 AS INT) AS run1_complete,
           CAST(1 AS INT) AS run2_delta_only,
           CAST(1 AS INT) AS resume_exactly_once
    """,
)
def stream_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python STREAMING DataSource contract audit (sources/pyds.py):
    an offset-tracked tick source is drained by a first query (polled
    until its bounded domain is exhausted — multiple real
    micro-batches), then a SECOND query restarts from the SAME
    checkpoint with a larger domain and must emit ONLY the new ticks:
    offsets recovered from the checkpoint, `readBetweenOffsets`
    replaying any uncommitted range — the exactly-once resume
    contract. The audit pins: run-1 rows and multi-batch execution,
    run-2 emitting exactly the delta, and every tick id observed
    exactly once across both runs.

    Scale: the source hands Spark one offset range per micro-batch;
    the range->rows expansion runs on executors, and checkpointed
    offsets bound recovery work to the uncommitted tail."""
    import os
    import tempfile
    import time as _time

    from mister_spark.sources.pyds import TICK_FORMAT, register_tick_stream

    register_tick_stream(spark)
    work = tempfile.mkdtemp(prefix="pyds_stream_")
    ckpt = os.path.join(work, "ckpt")
    out = os.path.join(work, "out")

    def run(total: int) -> int:
        before = _count_out()
        q = (
            spark.readStream.format(TICK_FORMAT)
            .option("total", total)
            .option("step", 15)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        deadline = _time.time() + 120
        try:
            while _time.time() < deadline:
                if _count_out() >= total:
                    _time.sleep(1.0)  # let the final commit land
                    break
                _time.sleep(0.3)
        finally:
            q.stop()
            q.awaitTermination()
        return int(_count_out() - before)

    def _count_out() -> int:
        try:
            return spark.read.parquet(out).count()
        except Exception:  # noqa: BLE001 — sink dir not created yet
            return 0

    rows1 = run(40)
    rows2 = run(50)
    ids = [r["id"] for r in spark.read.parquet(out).select("id").collect()]
    exactly_once = int(sorted(ids) == list(range(50)))
    import shutil as _sh

    _sh.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                rows1,
                rows2,
                int(rows1 == 40),
                int(rows2 == 10),
                exactly_once,
            )
        ],
        "run1_rows int, run2_rows int, run1_complete int, "
        "run2_delta_only int, resume_exactly_once int",
    )
