"""Wave 181 behavior gates: Iceberg add-column schema evolution."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_iceberg_schema_evolution_contract(spark):
    r = registry.QUERIES["io_iceberg_schema_evolution"](spark, SF).collect()[0]
    assert r["schemas"] == 2
    assert r["snapshot_schema_ids_differ"] == 1
    assert r["old_field_ids_stable"] == 1
    assert r["new_id_appended"] == 1
    assert r["current_cols"] == 4
    assert r["nulls_backfill_old_rows"] == 1
    assert r["time_travel_old_shape"] == 1
