"""Minimal pure-Python Apache Avro object-container-file codec.

Implements the subset of the public Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/) that the Iceberg
metadata tree needs — the sandbox has neither the spark-avro jar nor
fastavro, and Iceberg manifests/manifest lists MUST be Avro object
container files to be readable by real Iceberg readers:

- object container file framing: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker, data
  blocks of (record count, byte length, records, sync);
- binary encoding for: null, boolean, int, long (zigzag varints),
  float, double, bytes, string, fixed, records, arrays, maps, and
  unions (written as the zigzag branch index + the branch's value);
- the ``null`` codec (no compression — spec-valid and what Iceberg's
  own writers default to for manifest lists).

Schema resolution is writer-schema-only (the reader decodes with the
schema embedded in the file), which is exactly how Iceberg manifests
are consumed. Extra schema attributes like Iceberg's ``field-id`` ride
through untouched because the schema is stored verbatim as JSON.
"""

from __future__ import annotations

import io
import json
import os
import struct
from typing import Any

MAGIC = b"Obj\x01"


def _write_long(buf: io.BytesIO, n: int) -> None:
    """Zigzag + base-128 varint (the Avro int/long wire format)."""
    n = (n << 1) ^ (n >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    b = buf.read(n)
    if len(b) != n:
        raise EOFError("truncated bytes")
    return b


def _union_branch(schema: list, datum: Any) -> int:
    """Pick the union branch: None -> the null branch, anything else ->
    the first non-null branch (the only union shape manifests use)."""
    if datum is None:
        return schema.index("null")
    return next(i for i, s in enumerate(schema) if s != "null")


def _write_datum(buf: io.BytesIO, schema: Any, datum: Any) -> None:
    if isinstance(schema, list):  # union
        idx = _union_branch(schema, datum)
        _write_long(buf, idx)
        _write_datum(buf, schema[idx], datum)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if datum else b"\x00")
    elif t in ("int", "long"):
        _write_long(buf, int(datum))
    elif t == "float":
        buf.write(struct.pack("<f", float(datum)))
    elif t == "double":
        buf.write(struct.pack("<d", float(datum)))
    elif t == "bytes":
        _write_bytes(buf, bytes(datum))
    elif t == "string":
        _write_bytes(buf, str(datum).encode("utf-8"))
    elif t == "fixed":
        b = bytes(datum)
        if len(b) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(b)} != {schema['size']}")
        buf.write(b)
    elif t == "record":
        for f in schema["fields"]:
            _write_datum(buf, f["type"], (datum or {}).get(f["name"]))
    elif t == "array":
        items = list(datum or [])
        if items:
            _write_long(buf, len(items))
            for it in items:
                _write_datum(buf, schema["items"], it)
        _write_long(buf, 0)
    elif t == "map":
        entries = dict(datum or {})
        if entries:
            _write_long(buf, len(entries))
            for k, v in entries.items():
                _write_bytes(buf, str(k).encode("utf-8"))
                _write_datum(buf, schema["values"], v)
        _write_long(buf, 0)
    else:
        raise TypeError(f"unsupported Avro type: {t!r}")


def _read_datum(buf: io.BytesIO, schema: Any) -> Any:
    if isinstance(schema, list):  # union
        return _read_datum(buf, schema[_read_long(buf)])
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "record":
        return {f["name"]: _read_datum(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with explicit byte size (spec-permitted)
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_read_datum(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _read_datum(buf, schema["values"])
    raise TypeError(f"unsupported Avro type: {t!r}")


def write_container(
    path: str,
    schema: dict,
    records: list[dict],
    metadata: dict[str, bytes] | None = None,
) -> None:
    """Write `records` as one Avro object container file (null codec,
    single data block — manifests are metadata-sized). The write is
    atomic: staged to a sibling temp file, then renamed."""
    sync = os.urandom(16)
    header = io.BytesIO()
    header.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": b"null",
        **(metadata or {}),
    }
    _write_datum(
        header, {"type": "map", "values": "bytes"}, meta
    )
    header.write(sync)
    block = io.BytesIO()
    for rec in records:
        _write_datum(block, schema, rec)
    payload = block.getvalue()
    body = io.BytesIO()
    if records:
        _write_long(body, len(records))
        _write_long(body, len(payload))
        body.write(payload)
        body.write(sync)
    tmp = f"{path}.inprogress"
    with open(tmp, "wb") as f:
        f.write(header.getvalue())
        f.write(body.getvalue())
    os.replace(tmp, path)


def read_container_meta(path: str) -> dict[str, bytes]:
    """Return an Avro object container file's key-value metadata map
    (the header map real Iceberg readers consult for 'schema',
    'partition-spec-id', 'snapshot-id', ... before decoding records)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read(1 << 20))
    if buf.read(4) != MAGIC:
        raise ValueError(f"not an Avro object container file: {path}")
    return _read_datum(buf, {"type": "map", "values": "bytes"})


def read_container(path: str) -> tuple[dict, list[dict]]:
    """Read an Avro object container file written with the null codec.
    Returns (writer schema, records)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"not an Avro object container file: {path}")
    meta = _read_datum(buf, {"type": "map", "values": "bytes"})
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise ValueError(f"unsupported Avro codec {codec!r} in {path}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = buf.read(16)
    records: list[dict] = []
    while True:
        try:
            n = _read_long(buf)
        except EOFError:
            break
        _read_long(buf)  # block byte length (unused with null codec)
        for _ in range(n):
            records.append(_read_datum(buf, schema))
        if buf.read(16) != sync:
            raise ValueError(f"sync marker mismatch in {path}")
    return schema, records
