"""Wave 181: Iceberg schema evolution audit.

io_iceberg_schema_evolution exercises the add-column evolution flow —
the Iceberg capability that makes long-lived tables survivable: field
IDs, not names or positions, bind readers to columns, so an added
column never reshuffles existing bindings and old snapshots keep
reading with their own schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat
from mister_spark.registry import query


@query(
    "io_iceberg_schema_evolution",
    # Real oracle: every audited property of the two-schema export is
    # a structural constant of the script (field-id stability,
    # appended id, null backfill, time-travel shape).
    oracle="""
    SELECT CAST(2 AS INT) AS schemas,
           CAST(1 AS INT) AS snapshot_schema_ids_differ,
           CAST(1 AS INT) AS old_field_ids_stable,
           CAST(1 AS INT) AS new_id_appended,
           CAST(4 AS INT) AS current_cols,
           CAST(1 AS INT) AS nulls_backfill_old_rows,
           CAST(1 AS INT) AS time_travel_old_shape
    """,
)
def io_iceberg_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-column evolution audit: create a 3-column snapshot table,
    append a batch carrying a NEW 4th column (o_orderpriority), export
    the Iceberg tree, and verify the spec's evolution contract —
    (1) two schemas in the metadata, the snapshots pointing at their
    own schema-id; (2) the original columns keep their field-ids in
    BOTH schemas (ids bind, names don't); (3) the new column's id
    extends past the original last-column-id; (4) the current read
    surfaces all 4 columns with nulls where the old files lack the
    new one; (5) time travel to the pre-evolution snapshot reads the
    original 3-column shape.

    Scale: metadata-only — the audit costs two metadata walks and two
    bounded reads; no data is rewritten to add the column, which is
    the entire point of id-based schema evolution."""
    import os
    import shutil
    import tempfile

    from mister_spark.sources.iceberg import (
        current_metadata,
        export_iceberg,
        read_iceberg,
    )
    from mister_spark.sources.snapshots import SnapshotTable

    orders = cat(spark, sf_dir)["orders"]
    old_cols = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    new_cols = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    root = tempfile.mkdtemp(prefix="iceberg_evo_")
    try:
        t = SnapshotTable(
            spark, os.path.join(root, "t"), stats_cols=["o_orderkey"]
        )
        t.create(old_cols.filter(F.col("o_orderkey") < 1000))
        t.append(new_cols.filter(F.col("o_orderkey") >= 1000))
        dest = os.path.join(root, "ice")
        export_iceberg(t, dest)
        md = current_metadata(dest)
        schemas = {s["schema-id"]: s for s in md["schemas"]}
        snap_sids = [s["schema-id"] for s in md["snapshots"]]
        ids_v0 = {
            f["name"]: f["id"] for f in schemas[snap_sids[0]]["fields"]
        }
        ids_v1 = {
            f["name"]: f["id"] for f in schemas[snap_sids[1]]["fields"]
        }
        stable = int(
            all(ids_v1[n] == i for n, i in ids_v0.items())
        )
        new_id_appended = int(
            ids_v1["o_orderpriority"] == max(ids_v0.values()) + 1
            and md["last-column-id"] == ids_v1["o_orderpriority"]
        )
        cur = read_iceberg(spark, dest)
        n_null = cur.filter(F.col("o_orderpriority").isNull()).count()
        n_old = cur.filter(F.col("o_orderkey") < 1000).count()
        tt = read_iceberg(spark, dest, snapshot_id=1)
        old_shape = int(sorted(tt.columns) == sorted(old_cols.columns))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                len(schemas),
                int(snap_sids[0] != snap_sids[1]),
                stable,
                new_id_appended,
                len(cur.columns),
                int(n_null == n_old and n_null > 0),
                old_shape,
            )
        ],
        "schemas int, snapshot_schema_ids_differ int, "
        "old_field_ids_stable int, new_id_appended int, current_cols int, "
        "nulls_backfill_old_rows int, time_travel_old_shape int",
    )
