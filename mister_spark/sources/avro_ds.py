"""DataFrame-level Avro read/write WITHOUT the spark-avro jar.

Backed by the pure-Python object-container codec
(``mister_spark.sources.avro``) through the Spark 4 Python DataSource
API: the writer emits one container file per task with the same
two-phase commit the JSONL sink uses (stage ``_tmp_`` files, driver
commit renames + ``_SUCCESS``), the reader plans one InputPartition
per ``.avro`` file so Spark schedules the scan in parallel, and the
schema is inferred from the first file's embedded writer schema.

Supported types are the codec's subset — boolean / int / long / float
/ double / string / binary, nullable fields (``[null, T]`` unions),
arrays, string-keyed maps, and nested structs. Avro logical types
(date/timestamp/decimal) are intentionally out of scope: use
parquet/ORC for those, or cast to epoch micros first (the same
discipline the oracle contract uses).

At 100 TB this is the wrong data plane — a JVM connector keeps the
decode off Python — but the format on disk is identical, so data
written here reads back under spark-avro unchanged, and vice versa
for files within the type subset.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StructType,
)

from mister_spark.sources.avro import read_container, write_container

AVRO_FORMAT = "ms_avro"

_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "byte": "int",
    "short": "int",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
}
_AVRO_TO_DDL = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
}


def _spark_type_to_avro(dt, counter: list[int]):
    name = dt.typeName()
    if isinstance(dt, StructType):
        counter[0] += 1
        return {
            "type": "record",
            "name": f"r{counter[0]}",
            "fields": [
                {
                    "name": f.name,
                    "type": _nullable(
                        _spark_type_to_avro(f.dataType, counter), f.nullable
                    ),
                }
                for f in dt.fields
            ],
        }
    if isinstance(dt, ArrayType):
        return {
            "type": "array",
            "items": _nullable(
                _spark_type_to_avro(dt.elementType, counter), dt.containsNull
            ),
        }
    if isinstance(dt, MapType):
        if dt.keyType.typeName() != "string":
            raise TypeError("Avro maps require string keys")
        return {
            "type": "map",
            "values": _nullable(
                _spark_type_to_avro(dt.valueType, counter),
                dt.valueContainsNull,
            ),
        }
    if name in _SPARK_TO_AVRO:
        return _SPARK_TO_AVRO[name]
    raise TypeError(
        f"no Avro mapping for Spark type {name!r} — supported: "
        f"{sorted(_SPARK_TO_AVRO)}, arrays, string-keyed maps, structs "
        "(cast dates/timestamps to epoch micros first)"
    )


def _nullable(avro_type, nullable: bool):
    return ["null", avro_type] if nullable else avro_type


def spark_schema_to_avro(schema: StructType) -> dict:
    """Top-level record schema for a DataFrame's rows."""
    counter = [0]
    return {
        "type": "record",
        "name": "spark_row",
        "fields": [
            {
                "name": f.name,
                "type": _nullable(
                    _spark_type_to_avro(f.dataType, counter), f.nullable
                ),
            }
            for f in schema.fields
        ],
    }


def _strip_union(t):
    if isinstance(t, list):
        non_null = [b for b in t if b != "null"]
        return non_null[0] if non_null else "null"
    return t


def _avro_type_to_ddl(t) -> str:
    t = _strip_union(t)
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "array":
            return f"array<{_avro_type_to_ddl(t['items'])}>"
        if kind == "map":
            return f"map<string, {_avro_type_to_ddl(t['values'])}>"
        if kind == "record":
            inner = ", ".join(
                f"{f['name']}: {_avro_type_to_ddl(f['type'])}"
                for f in t["fields"]
            )
            return f"struct<{inner}>"
        t = kind
    if t in _AVRO_TO_DDL:
        return _AVRO_TO_DDL[t]
    raise TypeError(f"no Spark mapping for Avro type {t!r}")


def avro_schema_to_ddl(schema: dict) -> str:
    return ", ".join(
        f"{f['name']} {_avro_type_to_ddl(f['type'])}"
        for f in schema["fields"]
    )


def _avro_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".avro") and not f.startswith("_tmp_")
    )


def _datum_to_row(value, dt):
    """Codec output -> Python-DataSource row values: struct dicts become
    tuples in field order (recursively); everything else passes through."""
    if value is None:
        return None
    if isinstance(dt, StructType):
        return tuple(
            _datum_to_row(value.get(f.name), f.dataType) for f in dt.fields
        )
    if isinstance(dt, ArrayType):
        return [_datum_to_row(v, dt.elementType) for v in value]
    if isinstance(dt, MapType):
        return {k: _datum_to_row(v, dt.valueType) for k, v in value.items()}
    return value


class AvroReader(DataSourceReader):
    def __init__(self, options, schema: StructType) -> None:
        self.files = _avro_files(options["path"])
        self.schema = schema

    def partitions(self):
        return [InputPartition(p) for p in self.files]

    def read(self, partition):
        _, records = read_container(partition.value)
        fields = self.schema.fields
        for rec in records:
            yield tuple(
                _datum_to_row(rec.get(f.name), f.dataType) for f in fields
            )


@dataclass
class _AvroCommit(WriterCommitMessage):
    path: str
    rows: int


class AvroWriter(DataSourceWriter):
    """Two-phase-commit Avro sink (same protocol as the JSONL sink):
    tasks stage ``_tmp_part-N.avro``; the driver's commit() optionally
    clears the previous output (overwrite mode), renames every staged
    file into place, and writes ``_SUCCESS`` — a failed job leaves only
    ``_tmp_`` files for abort() to delete."""

    def __init__(self, options, schema: StructType, overwrite: bool) -> None:
        self.dir = options["path"]
        self.avro_schema = spark_schema_to_avro(schema)
        self.overwrite = overwrite

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.dir, exist_ok=True)
        tmp = os.path.join(self.dir, f"_tmp_part-{pid:05d}.avro")
        records = [row.asDict(recursive=True) for row in iterator]
        write_container(tmp, self.avro_schema, records)
        return _AvroCommit(path=tmp, rows=len(records))

    def commit(self, messages):
        if self.overwrite:
            for f in os.listdir(self.dir):
                if f.endswith(".avro") and not f.startswith("_tmp_"):
                    os.remove(os.path.join(self.dir, f))
        total = 0
        for m in messages:
            d, b = os.path.split(m.path)
            os.rename(m.path, os.path.join(d, b.replace("_tmp_", "", 1)))
            total += m.rows
        with open(os.path.join(self.dir, "_SUCCESS"), "w") as f:
            f.write(str(total))

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class AvroDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return AVRO_FORMAT

    def schema(self) -> str:
        files = _avro_files(self.options["path"])
        if not files:
            raise FileNotFoundError(
                f"no .avro files under {self.options['path']!r}"
            )
        return avro_schema_to_ddl(read_container(files[0])[0])

    def reader(self, schema):
        return AvroReader(self.options, schema)

    def writer(self, schema, overwrite: bool):
        return AvroWriter(self.options, schema, overwrite)


def register_avro_source(spark) -> None:
    """Idempotent registration (re-registering replaces the format)."""
    spark.dataSource.register(AvroDataSource)
