"""Iceberg-spec metadata interop gates: snapshot table -> Iceberg v2
metadata tree -> re-read row-identical, with time travel preserved."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mister_spark.sources.iceberg import (
    current_metadata,
    delete_where,
    expire_snapshots,
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
    # manifest lists / manifests are REAL Avro object container files
    # carrying the spec's v2 field names and field-ids; data files
    # resolve and record_count sums to the table row count
    from mister_spark.sources.avro import MAGIC, read_container

    snap = by_id[md["current-snapshot-id"]]
    with open(snap["manifest-list"], "rb") as f:
        assert f.read(4) == MAGIC  # Avro object container magic
    mlist_schema, mlist = read_container(snap["manifest-list"])
    by_name = {f["name"]: f for f in mlist_schema["fields"]}
    assert by_name["manifest_path"]["field-id"] == 500
    assert by_name["added_data_files_count"]["field-id"] == 504
    total = 0
    for rec in mlist:
        for field in (
            "manifest_path", "manifest_length", "added_snapshot_id",
            "added_data_files_count", "added_rows_count", "content",
        ):
            assert field in rec, field
        entry_schema, entries = read_container(rec["manifest_path"])
        dfs = next(
            f for f in entry_schema["fields"] if f["name"] == "data_file"
        )
        df_ids = {f["name"]: f["field-id"] for f in dfs["type"]["fields"]}
        assert df_ids["file_path"] == 100 and df_ids["record_count"] == 103
        for entry in entries:
            dfile = entry["data_file"]
            assert dfile["file_format"] == "PARQUET"
            assert os.path.exists(dfile["file_path"])
            total += dfile["record_count"]
    assert total == table.read().count()
    assert meta_path.endswith(".metadata.json")
    assert all(r["manifest_path"].endswith(".avro") for r in mlist)


def test_manifest_avro_key_value_metadata(spark, tmp_path, table):
    """Real Iceberg readers require Avro file key-value metadata —
    Java's ManifestReader calls getMetaString("schema") / "content" /
    "partition-spec-id"; ManifestLists checks "snapshot-id" /
    "sequence-number" / "format-version". Assert both file kinds carry
    them and that the manifest's embedded schema matches the table's."""
    import json

    from mister_spark.sources.avro import read_container_meta

    dest = str(tmp_path / "ice")
    export_iceberg(table, dest)
    md = current_metadata(dest)
    by_id = {s["snapshot-id"]: s for s in md["snapshots"]}
    snap = by_id[md["current-snapshot-id"]]
    ml_meta = read_container_meta(snap["manifest-list"])
    assert ml_meta["format-version"] == b"2"
    assert ml_meta["snapshot-id"] == str(md["current-snapshot-id"]).encode()
    assert int(ml_meta["sequence-number"]) == md["current-snapshot-id"]
    parent = snap.get("parent-snapshot-id")
    assert ml_meta["parent-snapshot-id"] == (
        b"null" if parent is None else str(parent).encode()
    )
    from mister_spark.sources.iceberg import _read_manifest_list

    for rec in _read_manifest_list(snap["manifest-list"]):
        m_meta = read_container_meta(rec["manifest_path"])
        for key in (
            "schema", "partition-spec", "partition-spec-id",
            "format-version", "content",
        ):
            assert key in m_meta, key
        assert m_meta["content"] == b"data"
        assert m_meta["partition-spec-id"] == b"0"
        assert json.loads(m_meta["partition-spec"]) == []
        emb = json.loads(m_meta["schema"].decode())
        assert emb["type"] == "struct" and emb["fields"]
        assert any(
            s["fields"] == emb["fields"] for s in md["schemas"]
        )


def test_stacked_overlapping_deletes_reconcile(spark, tmp_path, table):
    """Two deletes whose predicates overlap: the second must only
    remove rows still live after the first — deleted_rows never
    double-counts, no (file_path, pos) pair repeats, the summary's
    total-records tracks the live row count, and snapshot timestamps
    advance monotonically."""
    dest = str(tmp_path / "ice")
    export_iceberg(table, dest)
    before = read_iceberg(spark, dest).count()
    r1 = delete_where(spark, dest, "o_totalprice > 200000")
    live = read_iceberg(spark, dest)
    expect2 = live.filter("o_totalprice > 150000").count()
    r2 = delete_where(spark, dest, "o_totalprice > 150000")  # superset
    after = read_iceberg(spark, dest).count()
    assert r1["deleted_rows"] > 0 and r2["deleted_rows"] == expect2 > 0
    assert before - after == r1["deleted_rows"] + r2["deleted_rows"]
    md = current_metadata(dest)
    snap = next(
        s for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    from mister_spark.sources.iceberg import _snapshot_files

    _, delete_paths = _snapshot_files(snap)
    pairs = spark.read.parquet(*delete_paths).collect()
    assert len(pairs) == len({(p["file_path"], p["pos"]) for p in pairs})
    # spec summary semantics: total-records = live rows after commit
    assert int(snap["summary"]["total-records"]) == after
    assert int(snap["summary"]["deleted-records"]) == r2["deleted_rows"]
    ts = [s["timestamp-ms"] for s in md["snapshots"]]
    assert all(a < b for a, b in zip(ts[-3:], ts[-2:]))


def test_expire_removes_orphaned_delete_files(spark, tmp_path, table):
    """Expiring past a delete snapshot must also remove the position
    delete parquet (and its metadata/delete-<sid> dir) once no kept
    snapshot references it — no orphans left behind. A delete file
    becomes unreferenced when a later REWRITE/compaction commit drops
    the delete manifest from its manifest list (real Iceberg's
    rewrite_data_files), so the test appends such a commit by hand."""
    dest = str(tmp_path / "ice")
    export_iceberg(table, dest)
    delete_where(spark, dest, "o_totalprice > 200000")
    meta_dir = os.path.join(dest, "metadata")
    assert [d for d in os.listdir(meta_dir) if d.startswith("delete-")]
    # expire keeps the delete snapshot -> its file stays referenced
    expire_snapshots(dest, retain_last=1)
    assert [d for d in os.listdir(meta_dir) if d.startswith("delete-")]
    # hand-craft a rewrite commit: same data manifests, delete
    # manifests dropped (as a compaction that applied them would do)
    md = current_metadata(dest)
    cur = next(
        s for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    from mister_spark.sources.iceberg import (
        _read_manifest_list,
        _write_manifest_list,
    )

    mlist = _read_manifest_list(cur["manifest-list"])
    data_only = [rec for rec in mlist if rec.get("content") != 1]
    assert len(data_only) < len(mlist)  # a delete manifest existed
    new_sid = cur["snapshot-id"] + 1
    new_mlist_path = os.path.join(
        meta_dir, f"snap-{new_sid}-manifest-list.avro"
    )
    _write_manifest_list(new_mlist_path, data_only)
    md["snapshots"].append(
        {
            "snapshot-id": new_sid,
            "parent-snapshot-id": cur["snapshot-id"],
            "sequence-number": new_sid,
            "timestamp-ms": cur["timestamp-ms"] + 1,
            "manifest-list": os.path.abspath(new_mlist_path),
            "summary": {"operation": "replace"},
            "schema-id": md["current-schema-id"],
        }
    )
    md["snapshot-log"].append(
        {"timestamp-ms": cur["timestamp-ms"] + 1, "snapshot-id": new_sid}
    )
    md["current-snapshot-id"] = new_sid
    md["last-sequence-number"] = new_sid
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        hint = int(f.read().strip())
    with open(os.path.join(meta_dir, f"v{hint + 1}.metadata.json"), "w") as f:
        json.dump(md, f)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(hint + 1))
    # expiring down to the rewrite commit orphans the delete manifest:
    # its parquet and delete-<sid> dir must be cleaned with it
    rep = expire_snapshots(dest, retain_last=1)
    assert any(n.startswith("manifest-delete-") for n in rep["deleted_files"])
    remaining = [d for d in os.listdir(meta_dir) if d.startswith("delete-")]
    assert remaining == [], (remaining, rep)
    assert read_iceberg(spark, dest).count() > 0


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
