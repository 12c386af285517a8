"""Iceberg-spec metadata export/read for SnapshotTable.

Makes the home-grown snapshot table portable: `export_iceberg` walks a
`SnapshotTable`'s version history and writes an Apache Iceberg table
metadata tree (format-version 2, per the public Iceberg table spec at
https://iceberg.apache.org/spec/) next to the existing parquet data —
no data is copied, the Iceberg tree references the snapshot table's
immutable data files in place. `read_iceberg` then resolves any
snapshot through that tree (current or by snapshot-id = time travel)
back to a DataFrame.

Spec-conformance notes, stated loudly:

- ``metadata/v{N}.metadata.json`` and ``metadata/version-hint.text``
  follow the spec's real JSON layout (table metadata IS JSON in
  Iceberg; the version-hint file is the HadoopTables convention):
  schemas with field-ids, partition-specs, sort-orders, the snapshot
  list with parent links / sequence numbers / operation summaries, and
  the snapshot-log.
- Manifest lists and manifest files are REAL Avro object container
  files (``.avro``), written by the pure-Python codec in
  ``mister_spark.sources.avro`` with the spec's v2 field names and
  field-ids (``manifest_path``/500, ``added_data_files_count``/504,
  ``data_file.record_count``/103, …) embedded in the Avro schema —
  the layout a real Iceberg reader expects. Each file also carries the
  spec's required Avro key-value metadata (manifests: ``schema``,
  ``partition-spec``, ``partition-spec-id``, ``format-version``,
  ``content``; manifest lists: ``snapshot-id``, ``parent-snapshot-id``,
  ``sequence-number``, ``format-version``) — the header map Java's
  ManifestReader/ManifestLists consult before decoding records.

Schema field-ids are assigned in column order (1..N, nested element
ids after all top-level ids) — the initial-assignment rule the spec
prescribes for fresh tables.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from mister_spark.sources.avro import read_container, write_container
from mister_spark.sources.snapshots import SnapshotTable

_PRIMITIVES: dict[Any, str] = {}


def _af(name: str, typ: Any, fid: int) -> dict:
    """Avro record field carrying Iceberg's field-id attribute (rides
    through the codec verbatim — real Iceberg readers map by id)."""
    f = {"name": name, "type": typ, "field-id": fid}
    if isinstance(typ, list) and "null" in typ:
        f["default"] = None
    return f


# manifest_file — the manifest-list entry record (spec v2 names + ids)
MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        _af("manifest_path", "string", 500),
        _af("manifest_length", "long", 501),
        _af("partition_spec_id", "int", 502),
        _af("content", "int", 517),
        _af("sequence_number", "long", 515),
        _af("min_sequence_number", "long", 516),
        _af("added_snapshot_id", "long", 503),
        _af("added_data_files_count", "int", 504),
        _af("existing_data_files_count", "int", 505),
        _af("deleted_data_files_count", "int", 506),
        _af("added_rows_count", "long", 512),
        _af("existing_rows_count", "long", 513),
        _af("deleted_rows_count", "long", 514),
    ],
}

# manifest_entry — one data/delete file per record (spec v2 names+ids);
# partition is the unpartitioned spec's empty struct r102
MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        _af("status", "int", 0),
        _af("snapshot_id", ["null", "long"], 1),
        _af("sequence_number", ["null", "long"], 3),
        _af("file_sequence_number", ["null", "long"], 4),
        _af(
            "data_file",
            {
                "type": "record",
                "name": "r2",
                "fields": [
                    _af("content", "int", 134),
                    _af("file_path", "string", 100),
                    _af("file_format", "string", 101),
                    _af(
                        "partition",
                        {"type": "record", "name": "r102", "fields": []},
                        102,
                    ),
                    _af("record_count", "long", 103),
                    _af("file_size_in_bytes", "long", 104),
                ],
            },
            2,
        ),
    ],
}


def _write_manifest(
    path: str,
    entries: list[dict],
    table_schema: dict | None = None,
    content: str = "data",
) -> None:
    """Write a manifest with the Avro key-value metadata real Iceberg
    readers require (Java's ManifestReader calls getMetaString("schema")
    etc.): table schema JSON, partition spec (fields list + id), format
    version and manifest content kind."""
    meta = {
        "format-version": b"2",
        "content": content.encode(),
        "partition-spec": b"[]",  # unpartitioned spec's fields
        "partition-spec-id": b"0",
    }
    if table_schema is not None:
        meta["schema"] = json.dumps(table_schema).encode()
        if "schema-id" in table_schema:
            meta["schema-id"] = str(table_schema["schema-id"]).encode()
    write_container(path, MANIFEST_ENTRY_SCHEMA, entries, metadata=meta)


def _read_manifest(path: str) -> list[dict]:
    return read_container(path)[1]


def _write_manifest_list(
    path: str,
    recs: list[dict],
    snapshot_id: int | None = None,
    parent_snapshot_id: int | None = None,
    sequence_number: int | None = None,
) -> None:
    """Manifest lists carry their own required key-value metadata
    (snapshot-id, sequence-number, format-version; parent-snapshot-id
    is 'null' for the first snapshot, matching Java's writer)."""
    meta: dict[str, bytes] = {"format-version": b"2"}
    if snapshot_id is not None:
        meta["snapshot-id"] = str(snapshot_id).encode()
        meta["parent-snapshot-id"] = (
            b"null"
            if parent_snapshot_id is None
            else str(parent_snapshot_id).encode()
        )
        meta["sequence-number"] = str(
            snapshot_id if sequence_number is None else sequence_number
        ).encode()
    write_container(path, MANIFEST_FILE_SCHEMA, recs, metadata=meta)


def _read_manifest_list(path: str) -> list[dict]:
    return read_container(path)[1]


def _arrow_to_iceberg(t: pa.DataType, next_id: list[int]) -> Any:
    """Map an Arrow type to the Iceberg JSON type representation."""
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_int8(t) or pa.types.is_int16(t) or pa.types.is_int32(t):
        return "int"
    if pa.types.is_int64(t):
        return "long"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision}, {t.scale})"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamptz" if t.tz else "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        eid = next_id[0]
        next_id[0] += 1
        return {
            "type": "list",
            "element-id": eid,
            "element": _arrow_to_iceberg(t.value_type, next_id),
            "element-required": False,
        }
    if pa.types.is_struct(t):
        fields = []
        for i in range(t.num_fields):
            f = t.field(i)
            fid = next_id[0]
            next_id[0] += 1
            fields.append(
                {
                    "id": fid,
                    "name": f.name,
                    "required": False,
                    "type": _arrow_to_iceberg(f.type, next_id),
                }
            )
        return {"type": "struct", "fields": fields}
    raise TypeError(f"no Iceberg mapping for Arrow type {t}")


def _parquet_files(dir_path: str) -> list[str]:
    return sorted(
        os.path.join(dir_path, f)
        for f in os.listdir(dir_path)
        if f.endswith(".parquet")
    )


def export_iceberg(table: SnapshotTable, dest: str) -> str:
    """Write an Iceberg v2 metadata tree for every version of `table`
    under ``dest/metadata`` (data files referenced in place, absolute
    paths — the spec permits fully-qualified file_path values).
    Returns the path of the newest metadata.json.

    One Iceberg snapshot per SnapshotTable version; snapshot-id =
    version + 1 (ids must be non-zero-ish distinct int64s; the +1
    keeps id 0 out of circulation), parent links follow the manifest
    `parent` chain, sequence-number = version + 1 as the spec's
    monotonic commit ordering.
    """
    meta_dir = os.path.join(dest, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    versions = table.versions()
    if not versions:
        raise ValueError("empty table: nothing to export")

    # Schema per version with STABLE field-ids across evolution: the
    # first version assigns ids by the spec's fresh-table rule (1..N
    # top-level, nested after); columns first appearing in a LATER
    # version append ids past the current last-column-id — the spec's
    # add-column evolution rule, so a reader can map columns by id
    # across every snapshot.
    assigned: dict[str, dict] = {}  # name -> {"id", "type"}
    next_id = [1]
    schemas: list[dict] = []
    sig_to_schema_id: dict[tuple, int] = {}
    version_schema_id: dict[int, int] = {}

    def _version_arrow_fields(v: int) -> list:
        fields: dict[str, Any] = {}
        for e in table._load(v)["entries"]:
            d = os.path.join(table.path, e["dir"])
            sch = pq.read_schema(_parquet_files(d)[0])
            for fld in sch:
                fields.setdefault(fld.name, fld.type)
        return list(fields.items())

    for vi, v in enumerate(versions):
        vfields = _version_arrow_fields(v)
        if vi == 0:
            # fresh-table rule: top-level 1..N first, nested after
            for name, _t in vfields:
                assigned[name] = {"id": next_id[0], "type": None}
                next_id[0] += 1
            for name, t in vfields:
                assigned[name]["type"] = _arrow_to_iceberg(t, next_id)
        else:
            for name, t in vfields:
                if name not in assigned:
                    fid = next_id[0]
                    next_id[0] += 1
                    assigned[name] = {
                        "id": fid,
                        "type": _arrow_to_iceberg(t, next_id),
                    }
        fields = sorted(
            (
                {
                    "id": assigned[name]["id"],
                    "name": name,
                    "required": False,
                    "type": assigned[name]["type"],
                }
                for name, _t in vfields
            ),
            key=lambda f: f["id"],
        )
        sig = tuple(f["id"] for f in fields)
        if sig not in sig_to_schema_id:
            sig_to_schema_id[sig] = len(schemas)
            schemas.append(
                {
                    "type": "struct",
                    "schema-id": len(schemas),
                    "fields": fields,
                }
            )
        version_schema_id[v] = sig_to_schema_id[sig]
    last_column_id = next_id[0] - 1

    # one manifest file per distinct data dir (shared across snapshots,
    # exactly how Iceberg reuses manifests between commits)
    manifest_for_dir: dict[str, dict] = {}

    def manifest(
        rel_dir: str, abs_dir: str, snapshot_id: int, table_schema: dict
    ) -> dict:
        if rel_dir in manifest_for_dir:
            return manifest_for_dir[rel_dir]
        entries = []
        n_rows = 0
        for fp in _parquet_files(abs_dir):
            md = pq.read_metadata(fp)
            n_rows += md.num_rows
            entries.append(
                {
                    "status": 1,  # ADDED
                    "snapshot_id": snapshot_id,
                    "sequence_number": snapshot_id,
                    "data_file": {
                        "content": 0,  # DATA
                        "file_path": os.path.abspath(fp),
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": md.num_rows,
                        "file_size_in_bytes": os.path.getsize(fp),
                    },
                }
            )
        name = f"manifest-{rel_dir.replace('/', '-')}.avro"
        path = os.path.join(meta_dir, name)
        _write_manifest(path, entries, table_schema=table_schema)
        rec = {
            "manifest_path": os.path.abspath(path),
            "manifest_length": os.path.getsize(path),
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": snapshot_id,
            "min_sequence_number": snapshot_id,
            "added_snapshot_id": snapshot_id,
            "added_data_files_count": len(entries),
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
            "added_rows_count": n_rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }
        manifest_for_dir[rel_dir] = rec
        return rec

    table_uuid = str(uuid.uuid4())
    snapshots = []
    snapshot_log = []
    _OPS = {
        "create": "append",
        "append": "append",
        "overwrite": "overwrite",
        "merge": "overwrite",
        "delete_range": "delete",
        "clone": "replace",
    }
    for v in versions:
        m = table._load(v)
        sid = v + 1
        ts_ms = int(os.path.getmtime(table._manifest_path(v)) * 1000)
        mlist = []
        total_rows = 0
        total_files = 0
        for e in m["entries"]:
            abs_dir = os.path.join(table.path, e["dir"])
            rec = manifest(
                e["dir"], abs_dir, sid, schemas[version_schema_id[v]]
            )
            mlist.append(rec)
            total_rows += rec["added_rows_count"]
            total_files += rec["added_data_files_count"]
        mlist_name = f"snap-{sid}-manifest-list.avro"
        mlist_path = os.path.join(meta_dir, mlist_name)
        parent = m.get("parent")
        _write_manifest_list(
            mlist_path,
            mlist,
            snapshot_id=sid,
            parent_snapshot_id=None if parent is None else parent + 1,
        )
        snapshots.append(
            {
                "snapshot-id": sid,
                **(
                    {"parent-snapshot-id": parent + 1}
                    if parent is not None
                    else {}
                ),
                "sequence-number": sid,
                "timestamp-ms": ts_ms,
                "manifest-list": os.path.abspath(mlist_path),
                "summary": {
                    "operation": _OPS.get(m.get("op", "append"), "overwrite"),
                    "total-records": str(total_rows),
                    "total-data-files": str(total_files),
                },
                "schema-id": version_schema_id[v],
            }
        )
        snapshot_log.append({"timestamp-ms": ts_ms, "snapshot-id": sid})

    metadata = {
        "format-version": 2,
        "table-uuid": table_uuid,
        "location": os.path.abspath(dest),
        "last-sequence-number": versions[-1] + 1,
        "last-updated-ms": snapshot_log[-1]["timestamp-ms"],
        "last-column-id": last_column_id,
        "current-schema-id": version_schema_id[versions[-1]],
        "schemas": schemas,
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.format.default": "parquet"},
        "current-snapshot-id": versions[-1] + 1,
        "snapshots": snapshots,
        "snapshot-log": snapshot_log,
        "metadata-log": [],
    }
    meta_version = 1
    meta_path = os.path.join(meta_dir, f"v{meta_version}.metadata.json")
    while os.path.exists(meta_path):
        meta_version += 1
        meta_path = os.path.join(meta_dir, f"v{meta_version}.metadata.json")
    with open(meta_path, "w") as f:
        json.dump(metadata, f, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(meta_version))
    return meta_path


def expire_snapshots(dest: str, retain_last: int = 1) -> dict:
    """Iceberg 'expire snapshots' maintenance: write a NEW metadata
    version (the spec's immutable-metadata evolution — old
    metadata.json files stay on disk, version-hint moves forward)
    whose snapshot list keeps only the newest ``retain_last``
    snapshots, and delete manifest lists / manifests no retained
    snapshot references. Data files are NOT touched here (that is
    orphan-file cleanup, a separate maintenance action in real
    Iceberg too) — but POSITION-DELETE files are: they live inside
    ``metadata/delete-<sid>`` directories this module wrote, so a
    delete file (and its directory, once empty of parquet) is removed
    together with the last manifest that references it. Returns
    {"expired", "kept", "deleted_files"}."""
    import shutil

    meta_dir = os.path.join(dest, "metadata")
    md = current_metadata(dest)
    if retain_last < 1:
        raise ValueError("retain_last must be >= 1")
    snaps = sorted(md["snapshots"], key=lambda s: s["sequence-number"])
    kept, expired = snaps[-retain_last:], snaps[:-retain_last]
    keep_mlists = {s["manifest-list"] for s in kept}
    keep_manifests = set()
    keep_delete_files = set()
    for s in kept:
        for rec in _read_manifest_list(s["manifest-list"]):
            keep_manifests.add(rec["manifest_path"])
            for e in _read_manifest(rec["manifest_path"]):
                if e["data_file"].get("content") == 1:
                    keep_delete_files.add(e["data_file"]["file_path"])
    deleted = []
    abs_meta = os.path.abspath(meta_dir)
    for s in expired:
        mlist_path = s["manifest-list"]
        if mlist_path in keep_mlists:
            continue
        if os.path.exists(mlist_path):
            for rec in _read_manifest_list(mlist_path):
                mp = rec["manifest_path"]
                if mp in keep_manifests or not os.path.exists(mp):
                    continue
                entries = _read_manifest(mp)
                for e in entries:
                    d = e["data_file"]
                    fp = d["file_path"]
                    if (
                        d.get("content") == 1
                        and fp not in keep_delete_files
                        and os.path.abspath(fp).startswith(abs_meta + os.sep)
                        and os.path.exists(fp)
                    ):
                        os.remove(fp)
                        deleted.append(os.path.basename(fp))
                        pd_ = os.path.dirname(fp)
                        if not _parquet_files(pd_):
                            shutil.rmtree(pd_, ignore_errors=True)
                os.remove(mp)
                deleted.append(os.path.basename(mp))
            os.remove(mlist_path)
            deleted.append(os.path.basename(mlist_path))
    kept_ids = {s["snapshot-id"] for s in kept}
    md["snapshots"] = [s for s in snaps if s["snapshot-id"] in kept_ids]
    # parent links to expired snapshots are dropped, as the spec allows
    for s in md["snapshots"]:
        if s.get("parent-snapshot-id") not in kept_ids:
            s.pop("parent-snapshot-id", None)
    md["snapshot-log"] = [
        e for e in md["snapshot-log"] if e["snapshot-id"] in kept_ids
    ]
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        hint = int(f.read().strip())
    md["metadata-log"] = md.get("metadata-log", []) + [
        {
            "timestamp-ms": md["last-updated-ms"],
            "metadata-file": os.path.join(
                meta_dir, f"v{hint}.metadata.json"
            ),
        }
    ]
    new_version = hint + 1
    with open(
        os.path.join(meta_dir, f"v{new_version}.metadata.json"), "w"
    ) as f:
        json.dump(md, f, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(new_version))
    return {
        "expired": [s["snapshot-id"] for s in expired],
        "kept": sorted(kept_ids),
        "deleted_files": sorted(set(deleted)),
    }


def _mlist_total_records(mlist: list[dict]) -> int:
    """Live table row count implied by a manifest list: data-file rows
    (content=0) minus position-delete rows (content=1). Exact as long
    as delete files never repeat a (file_path, pos) pair — which
    `delete_where` guarantees by matching against the delete-applied
    view."""
    total = 0
    for rec in mlist:
        for e in _read_manifest(rec["manifest_path"]):
            if e["status"] == 2:  # DELETED
                continue
            d = e["data_file"]
            rc = int(d["record_count"])
            total += -rc if d.get("content") == 1 else rc
    return total


def current_metadata(dest: str) -> dict:
    meta_dir = os.path.join(dest, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        hint = int(f.read().strip())
    with open(os.path.join(meta_dir, f"v{hint}.metadata.json")) as f:
        return json.load(f)


def delete_where(spark: SparkSession, dest: str, condition: str) -> dict:
    """Iceberg v2 MERGE-ON-READ row-level delete: rows of the CURRENT
    snapshot matching ``condition`` (a SQL boolean expression over the
    table columns) are recorded in a POSITION DELETE file — a parquet
    file of (file_path, pos) pairs, the spec's position-delete layout —
    and a new snapshot commits referencing the existing data files
    UNTOUCHED plus a content=1 delete manifest. No data file is
    rewritten; readers subtract the deleted positions at scan time
    (`read_iceberg` does). Returns {"snapshot_id", "deleted_rows"}.

    Stacked deletes are handled the way the spec's sequence numbers
    imply: the match scan runs against the DELETE-APPLIED view (prior
    content=1 files are anti-joined out first), so a second delete
    whose condition overlaps an earlier one can neither re-count nor
    re-write already-deleted positions — (file_path, pos) pairs stay
    unique across the whole delete set and
    rows_before - rows_after == sum(deleted_rows) holds for any
    sequence of deletes. Helper columns use the reserved ``__ice_``
    prefix so a table column literally named ``file_path``/``pos``
    cannot collide with the scan's bookkeeping.

    Scale: the matching positions are computed and written by a Spark
    job over `_metadata.row_index` (never collected); commit cost is
    O(metadata)."""
    md = current_metadata(dest)
    sid = md["current-snapshot-id"]
    snap = next(s for s in md["snapshots"] if s["snapshot-id"] == sid)
    data_paths, delete_paths = _snapshot_files(snap)
    if not data_paths:
        return {"snapshot_id": sid, "deleted_rows": 0}
    from pyspark.sql import functions as F

    scan = (
        spark.read.option("mergeSchema", "true").parquet(*data_paths)
        .select(
            F.regexp_replace("_metadata.file_path", "^file:", "").alias(
                "__ice_fp"
            ),
            F.col("_metadata.row_index").alias("__ice_pos"),
            "*",
        )
    )
    if delete_paths:
        # subtract rows earlier deletes already removed: a stacked
        # delete must only match LIVE rows
        prior = spark.read.parquet(*delete_paths).select(
            F.col("file_path").alias("__ice_del_fp"),
            F.col("pos").alias("__ice_del_pos"),
        )
        scan = scan.join(
            F.broadcast(prior),
            (F.col("__ice_fp") == F.col("__ice_del_fp"))
            & (F.col("__ice_pos") == F.col("__ice_del_pos")),
            "left_anti",
        )
    matches = scan.filter(condition).select(
        F.col("__ice_fp").alias("file_path"),
        F.col("__ice_pos").alias("pos"),
    )
    meta_dir = os.path.join(dest, "metadata")
    new_sid = max(s["snapshot-id"] for s in md["snapshots"]) + 1
    del_dir = os.path.join(meta_dir, f"delete-{new_sid}")
    matches.write.parquet(del_dir)
    n_deleted = spark.read.parquet(del_dir).count()
    del_files = _parquet_files(del_dir)
    entries = [
        {
            "status": 1,
            "snapshot_id": new_sid,
            "sequence_number": new_sid,
            "data_file": {
                "content": 1,  # POSITION_DELETES
                "file_path": os.path.abspath(fp),
                "file_format": "PARQUET",
                "partition": {},
                "record_count": pq.read_metadata(fp).num_rows,
                "file_size_in_bytes": os.path.getsize(fp),
            },
        }
        for fp in del_files
    ]
    dm_path = os.path.join(meta_dir, f"manifest-delete-{new_sid}.avro")
    cur_schema = next(
        s
        for s in md["schemas"]
        if s["schema-id"] == md["current-schema-id"]
    )
    _write_manifest(dm_path, entries, table_schema=cur_schema, content="deletes")
    prev_mlist = _read_manifest_list(snap["manifest-list"])
    new_mlist = prev_mlist + [
        {
            "manifest_path": os.path.abspath(dm_path),
            "manifest_length": os.path.getsize(dm_path),
            "partition_spec_id": 0,
            "content": 1,
            "sequence_number": new_sid,
            "min_sequence_number": new_sid,
            "added_snapshot_id": new_sid,
            "added_data_files_count": len(entries),
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
            "added_rows_count": int(n_deleted),
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }
    ]
    mlist_path = os.path.join(meta_dir, f"snap-{new_sid}-manifest-list.avro")
    _write_manifest_list(
        mlist_path, new_mlist, snapshot_id=new_sid, parent_snapshot_id=sid
    )
    # summary total-records is the TABLE total after the commit (the
    # spec's semantics), i.e. live data rows minus every position
    # delete — exact because stacked deletes never duplicate a
    # (file_path, pos) pair; the commit timestamp advances
    # monotonically even when the wall clock stalls within one ms
    total_records = _mlist_total_records(new_mlist)
    import time

    ts_ms = max(int(time.time() * 1000), md["last-updated-ms"] + 1)
    md["snapshots"].append(
        {
            "snapshot-id": new_sid,
            "parent-snapshot-id": sid,
            "sequence-number": new_sid,
            "timestamp-ms": ts_ms,
            "manifest-list": os.path.abspath(mlist_path),
            "summary": {
                "operation": "delete",
                "deleted-records": str(int(n_deleted)),
                "total-records": str(int(total_records)),
            },
            "schema-id": md["current-schema-id"],
        }
    )
    md["snapshot-log"].append(
        {"timestamp-ms": ts_ms, "snapshot-id": new_sid}
    )
    md["current-snapshot-id"] = new_sid
    md["last-sequence-number"] = new_sid
    md["last-updated-ms"] = ts_ms
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        hint = int(f.read().strip())
    with open(
        os.path.join(meta_dir, f"v{hint + 1}.metadata.json"), "w"
    ) as f:
        json.dump(md, f, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(hint + 1))
    return {"snapshot_id": new_sid, "deleted_rows": int(n_deleted)}


def _iceberg_type_to_spark(t: Any) -> str:
    if isinstance(t, dict):
        if t.get("type") == "list":
            return f"array<{_iceberg_type_to_spark(t['element'])}>"
        if t.get("type") == "struct":
            inner = ", ".join(
                f"{f['name']}: {_iceberg_type_to_spark(f['type'])}"
                for f in t["fields"]
            )
            return f"struct<{inner}>"
    return {
        "long": "bigint",
        "int": "int",
        "double": "double",
        "float": "float",
        "string": "string",
        "boolean": "boolean",
        "date": "date",
        "timestamp": "timestamp",
        "timestamptz": "timestamp",
        "binary": "binary",
    }.get(t, str(t))


def _empty_frame(spark: SparkSession, md: dict, snap: dict) -> DataFrame:
    schema = next(
        s for s in md["schemas"] if s["schema-id"] == snap.get("schema-id", 0)
    )
    ddl = ", ".join(
        f"{f['name']} {_iceberg_type_to_spark(f['type'])}"
        for f in schema["fields"]
    ) or "k bigint"
    return spark.createDataFrame([], schema=ddl)


def _snapshot_files(snap: dict) -> tuple[list[str], list[str]]:
    """(data files, position-delete files) for a snapshot."""
    data, deletes = [], []
    for rec in _read_manifest_list(snap["manifest-list"]):
        for entry in _read_manifest(rec["manifest_path"]):
            if entry["status"] == 2:  # DELETED
                continue
            dfile = entry["data_file"]
            (deletes if dfile.get("content") == 1 else data).append(
                dfile["file_path"]
            )
    return data, deletes


def read_iceberg(
    spark: SparkSession, dest: str, snapshot_id: int | None = None
) -> DataFrame:
    """Resolve a snapshot through the Iceberg metadata tree — current
    by default, or any historical ``snapshot_id`` (time travel) — down
    to its data files and return them as a DataFrame. Position-delete
    files (v2 merge-on-read) are applied at scan time: the data scan
    carries `_metadata.row_index` and anti-joins the (file_path, pos)
    delete set — the delete frame is tiny relative to data, so the
    anti-join broadcasts. Raises on an unknown snapshot-id, mirroring
    Iceberg's behavior for expired snapshots."""
    md = current_metadata(dest)
    sid = snapshot_id if snapshot_id is not None else md["current-snapshot-id"]
    snap = next(
        (s for s in md["snapshots"] if s["snapshot-id"] == sid), None
    )
    if snap is None:
        raise ValueError(f"snapshot {sid} not found (expired or never committed)")
    data_paths, delete_paths = _snapshot_files(snap)
    if not data_paths:
        # an empty snapshot (e.g. a delete wiped every file): surface
        # its schema, zero rows — never a scan error
        return _empty_frame(spark, md, snap)
    df = spark.read.option("mergeSchema", "true").parquet(*data_paths)
    if not delete_paths:
        return df
    from pyspark.sql import functions as F

    dels = spark.read.parquet(*delete_paths).select(
        F.col("file_path").alias("__ice_del_fp"),
        F.col("pos").alias("__ice_del_pos"),
    )
    cols = df.columns
    return (
        df.select(
            F.regexp_replace("_metadata.file_path", "^file:", "").alias(
                "__ice_fp"
            ),
            F.col("_metadata.row_index").alias("__ice_pos"),
            "*",
        )
        .join(
            F.broadcast(dels),
            (F.col("__ice_fp") == F.col("__ice_del_fp"))
            & (F.col("__ice_pos") == F.col("__ice_del_pos")),
            "left_anti",
        )
        .select(*cols)
    )
