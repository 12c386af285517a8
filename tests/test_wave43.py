"""Wave 43 behavior gates (snapshot-table op; format gates are in
test_snapshots.py)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_snapshot_table_audit_row_invariants(spark):
    rows = sorted(
        registry.QUERIES["io_snapshot_table"](spark, SF).collect(),
        key=lambda r: r["version"],
    )
    assert [r["op"] for r in rows] == ["create", "append", "delete_range"]
    # manifest row counts agree with actual reads at every version
    for r in rows:
        assert r["live_rows"] == r["readable_rows"]
    # append sees strictly more rows than create; delete strictly fewer
    assert rows[1]["live_rows"] > rows[0]["live_rows"]
    assert rows[2]["live_rows"] < rows[1]["live_rows"]
    # the delete reused (did not rewrite) at least one pre-existing dir
    assert rows[2]["dirs_reused"] >= 1
