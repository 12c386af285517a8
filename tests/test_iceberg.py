"""Iceberg-spec metadata interop gates: snapshot table -> Iceberg v2
metadata tree -> re-read row-identical, with time travel preserved."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mister_spark.sources.iceberg import (
    current_metadata,
    export_iceberg,
    read_iceberg,
)
from mister_spark.sources.snapshots import SnapshotTable

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_cols=["o_orderkey"])
    orders = _orders(spark)
    t.create(orders.filter(F.col("o_orderkey") < 1000))
    t.append(orders.filter(F.col("o_orderkey") >= 1000))
    t.delete_range("o_orderkey", 500, 600)
    return t


def test_round_trip_current_snapshot(spark, tmp_path, table):
    dest = str(tmp_path / "ice")
    export_iceberg(table, dest)
    assert _rows(read_iceberg(spark, dest)) == _rows(table.read())


def test_time_travel_preserved(spark, tmp_path, table):
    dest = str(tmp_path / "ice")
    export_iceberg(table, dest)
    # snapshot-id = version + 1: every historical version reads
    # identically through the Iceberg tree
    for v in table.versions():
        assert _rows(read_iceberg(spark, dest, snapshot_id=v + 1)) == _rows(
            table.read(version=v)
        ), v
    with pytest.raises(ValueError, match="not found"):
        read_iceberg(spark, dest, snapshot_id=9999)


def test_metadata_tree_is_spec_shaped(spark, tmp_path, table):
    dest = str(tmp_path / "ice")
    meta_path = export_iceberg(table, dest)
    md = current_metadata(dest)
    # required v2 table-metadata fields (public Iceberg table spec)
    for field in (
        "format-version", "table-uuid", "location", "last-sequence-number",
        "last-updated-ms", "last-column-id", "current-schema-id", "schemas",
        "default-spec-id", "partition-specs", "default-sort-order-id",
        "sort-orders", "current-snapshot-id", "snapshots", "snapshot-log",
    ):
        assert field in md, field
    assert md["format-version"] == 2
    assert len(md["snapshots"]) == len(table.versions())
    # snapshot parent chain mirrors the manifest parent chain
    by_id = {s["snapshot-id"]: s for s in md["snapshots"]}
    for s in md["snapshots"][1:]:
        assert s["parent-snapshot-id"] in by_id
    # schema: field-ids assigned 1..N in column order
    ids = [f["id"] for f in md["schemas"][0]["fields"]]
    assert ids == list(range(1, len(ids) + 1))
    # manifest lists / manifests carry the spec's field names; data
    # files resolve and record_count sums to the table row count
    snap = by_id[md["current-snapshot-id"]]
    with open(snap["manifest-list"]) as f:
        mlist = json.load(f)
    total = 0
    for rec in mlist:
        for field in (
            "manifest_path", "manifest_length", "added_snapshot_id",
            "added_files_count", "added_rows_count", "content",
        ):
            assert field in rec, field
        with open(rec["manifest_path"]) as f:
            for entry in json.load(f)["entries"]:
                dfile = entry["data_file"]
                assert dfile["file_format"] == "PARQUET"
                assert os.path.exists(dfile["file_path"])
                total += dfile["record_count"]
    assert total == table.read().count()
    # the Avro-substitution is impossible to miss
    assert meta_path.endswith(".metadata.json")
    assert all(r["manifest_path"].endswith(".avro.json") for r in mlist)


def test_list_typed_columns_export(spark, tmp_path):
    """documents/embeddings-style array<float> columns map to the
    Iceberg list type with element-ids past the top-level range."""
    t = SnapshotTable(spark, str(tmp_path / "e"), stats_cols=["vec_id"])
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    t.create(emb)
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)
    md = current_metadata(dest)
    fields = md["schemas"][0]["fields"]
    list_fields = [f for f in fields if isinstance(f["type"], dict)]
    assert list_fields, fields
    lf = list_fields[0]
    assert lf["type"]["type"] == "list"
    assert lf["type"]["element-id"] > len(fields)
    assert md["last-column-id"] >= lf["type"]["element-id"]
    assert _rows(read_iceberg(spark, dest)) == _rows(t.read())
