"""Wave 43: the transactional snapshot table as a driver-visible op.

io_snapshot_table exercises sources/snapshots.py (the lightweight
Delta/Iceberg-style manifest format: atomic commits, time travel,
stats-pruned copy-on-write deletes) end-to-end on a scratch dir and
emits the audit report a table-maintenance job would log.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat
from mister_spark.registry import query

@query(
    "io_snapshot_table",
    # Real oracle: the commit structure is fixed (create=1 dir,
    # append=+1, the [60%,70%] band lives strictly inside the second
    # commit's dir so the stats-pruned delete rewrites exactly one dir
    # and reuses one), so every version's rows reduce to relational
    # counts over orders with the same integer split arithmetic.
    oracle="""
    WITH b AS (SELECT MIN(o_orderkey) AS mn, MAX(o_orderkey) AS mx
               FROM orders),
    c AS (SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM orders, b
             WHERE o_orderkey < (mn + mx) // 2) AS n1,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n2,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM orders, b
             WHERE o_orderkey BETWEEN mn + (mx - mn) * 6 // 10
                                  AND mn + (mx - mn) * 7 // 10) AS nd)
    SELECT CAST(0 AS BIGINT) AS version, 'create' AS op,
           n1 AS live_rows, CAST(1 AS BIGINT) AS n_dirs,
           CAST(NULL AS BIGINT) AS dirs_reused, n1 AS readable_rows
    FROM c
    UNION ALL SELECT 1, 'append', n2, 2, NULL, n2 FROM c
    UNION ALL SELECT 2, 'delete_range', n2 - nd, 2, 1, n2 - nd FROM c
    """,
)
def io_snapshot_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional snapshot-table audit: create a versioned table
    from orders (two commits split at the orderkey midpoint), run a
    stats-pruned copy-on-write delete of the [60%, 70%] key band
    (inside the second commit's dir, so the first dir is provably
    prunable), and report one row per snapshot VERSION — operation,
    live rows, live data dirs, and how many dirs the delete left
    untouched (the pruning that makes copy-on-write affordable). Time
    travel is demonstrated by the fact every version's row count is
    still readable after the delete.

    Scale: manifests are O(#commits + #files) driver-side JSON — the
    same metadata shape Delta/Iceberg keep; data moves only through
    Spark jobs, and the delete rewrites ONLY dirs whose min/max stats
    intersect the predicate. See sources/snapshots.py.
    """
    from mister_spark.sources.snapshots import SnapshotTable

    orders = cat(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    mn, mx = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    split = (mn + mx) // 2
    dlo, dhi = mn + (mx - mn) * 6 // 10, mn + (mx - mn) * 7 // 10
    with tempfile.TemporaryDirectory(prefix="snap_") as tmp:
        t = SnapshotTable(
            spark, os.path.join(tmp, "orders_t"), stats_cols=["o_orderkey"]
        )
        t.create(orders.filter(F.col("o_orderkey") < split))
        t.append(orders.filter(F.col("o_orderkey") >= split))
        pre_dirs = {e["dir"] for e in t.history()[-1]["entries"]}
        t.delete_range("o_orderkey", dlo, dhi)
        rows = []
        for m in t.history():
            dirs = {e["dir"] for e in m["entries"]}
            rows.append(
                {
                    "version": m["version"],
                    "op": m["op"],
                    "live_rows": int(sum(e["rows"] for e in m["entries"])),
                    "n_dirs": len(dirs),
                    "dirs_reused": len(dirs & pre_dirs)
                    if m["op"] == "delete_range"
                    else None,
                    "readable_rows": int(t.read(m["version"]).count()),
                }
            )
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows),
        "version bigint, op string, live_rows bigint, n_dirs bigint, "
        "dirs_reused bigint, readable_rows bigint",
    )
