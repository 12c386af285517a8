"""Gates for the pure-Python Avro object-container codec that backs
the Iceberg manifest tree (no Spark needed)."""

from __future__ import annotations

import io
import json

import pytest

from mister_spark.sources.avro import (
    MAGIC,
    _read_datum,
    _read_long,
    _write_datum,
    _write_long,
    read_container,
    write_container,
)

SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "o", "type": ["null", "long"], "default": None},
        {"name": "b", "type": "boolean"},
        {"name": "d", "type": "double"},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "inner",
                "fields": [{"name": "x", "type": "long", "field-id": 7}],
            },
        },
    ],
}

ROWS = [
    {
        "s": "héllo ☃",
        "n": -(2**62),
        "o": None,
        "b": True,
        "d": 3.5,
        "arr": [1, -2, 3],
        "m": {"k": "v", "": ""},
        "nested": {"x": 0},
    },
    {
        "s": "",
        "n": 2**62,
        "o": 42,
        "b": False,
        "d": -0.0,
        "arr": [],
        "m": {},
        "nested": {"x": -1},
    },
]


def test_container_round_trip(tmp_path):
    p = str(tmp_path / "t.avro")
    write_container(p, SCHEMA, ROWS)
    schema, out = read_container(p)
    assert schema == SCHEMA  # field-id attributes survive verbatim
    assert out == ROWS


def test_container_framing_is_spec_shaped(tmp_path):
    """Hand-parse the header with an INDEPENDENT decoder: magic,
    metadata map holding the schema as JSON, codec null, 16-byte sync
    marker repeated after the data block."""
    p = str(tmp_path / "t.avro")
    write_container(p, SCHEMA, ROWS)
    with open(p, "rb") as f:
        raw = f.read()
    buf = io.BytesIO(raw)
    assert buf.read(4) == MAGIC == b"Obj\x01"

    def read_varint():
        acc, shift = 0, 0
        while True:
            b = buf.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    meta = {}
    while True:
        cnt = read_varint()
        if cnt == 0:
            break
        for _ in range(abs(cnt)):
            k = buf.read(read_varint()).decode()
            meta[k] = buf.read(read_varint())
    assert json.loads(meta["avro.schema"]) == SCHEMA
    assert meta["avro.codec"] == b"null"
    sync = buf.read(16)
    assert len(sync) == 16
    assert read_varint() == len(ROWS)  # block record count
    blen = read_varint()
    buf.read(blen)
    assert buf.read(16) == sync  # block closes with the same marker
    assert buf.read() == b""


def test_empty_container(tmp_path):
    p = str(tmp_path / "e.avro")
    write_container(p, SCHEMA, [])
    assert read_container(p) == (SCHEMA, [])


def test_long_zigzag_edge_values():
    for v in (0, -1, 1, 63, -64, 64, 2**31, -(2**31), 2**63 - 1, -(2**63)):
        buf = io.BytesIO()
        _write_long(buf, v)
        buf.seek(0)
        assert _read_long(buf) == v, v


def test_union_null_branch_order_respected():
    # [long, null] puts null at index 1 — the writer must follow the
    # schema's branch order, not assume null-first
    schema = ["long", "null"]
    buf = io.BytesIO()
    _write_datum(buf, schema, None)
    _write_datum(buf, schema, 5)
    buf.seek(0)
    assert _read_datum(buf, schema) is None
    assert _read_datum(buf, schema) == 5


def test_rejects_non_avro_and_bad_codec(tmp_path):
    p = tmp_path / "bad.avro"
    p.write_bytes(b"PAR1not-avro")
    with pytest.raises(ValueError, match="not an Avro"):
        read_container(str(p))


def test_hypothesis_round_trip(tmp_path):
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rows_strategy = st.lists(
        st.fixed_dictionaries(
            {
                "s": st.text(max_size=40),
                "n": st.integers(min_value=-(2**63), max_value=2**63 - 1),
                "o": st.none() | st.integers(min_value=-(2**31), max_value=2**31),
                "b": st.booleans(),
                "d": st.floats(allow_nan=False, allow_infinity=False),
                "arr": st.lists(
                    st.integers(min_value=-(2**31), max_value=2**31 - 1),
                    max_size=5,
                ),
                "m": st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=4),
                "nested": st.fixed_dictionaries(
                    {"x": st.integers(min_value=-(2**63), max_value=2**63 - 1)}
                ),
            }
        ),
        max_size=8,
    )

    @settings(max_examples=40, deadline=None)
    @given(rows=rows_strategy)
    def run(rows):
        p = str(tmp_path / "h.avro")
        write_container(p, SCHEMA, rows)
        assert read_container(p) == (SCHEMA, rows)

    run()
