"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

A deterministic partitioned "ledger" source demonstrating the three
contract points a real connector needs: partition planning (one
InputPartition per shard, so Spark schedules the read in parallel),
FILTER PUSHDOWN through `pushFilters` (supported predicates are
consumed server-side and never ship rows; unsupported ones are
returned to Spark, which keeps them as a residual filter), and plain
row iteration per partition. The same class shape backs a REST/JDBC/
object-store connector — swap the generator for client calls.

Rows are a pure function of (row index): id, shard, amount =
(id * 7919 mod 10000)/100, plus `srv_filtered`, which partitions set
to 1 iff a pushed filter was active — the observable that lets tests
distinguish source-side filtering from Spark-side filtering.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    GreaterThan,
    InputPartition,
)

LEDGER_FORMAT = "ms_ledger"


class LedgerReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("rows", 1000))
        self.parts = int(options.get("parts", 4))
        self.min_amount: float | None = None

    def pushFilters(self, filters):
        """Accept `amount > x` (consumed here, rows never generated);
        everything else is yielded back for Spark to apply."""
        for f in filters:
            if isinstance(f, GreaterThan) and f.attribute == ("amount",):
                self.min_amount = float(f.value)
            else:
                yield f

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        i = partition.value
        per = self.n // self.parts
        lo = i * per
        hi = (i + 1) * per if i < self.parts - 1 else self.n
        flagged = 1 if self.min_amount is not None else 0
        for k in range(lo, hi):
            amount = float((k * 7919) % 10000) / 100.0
            if self.min_amount is not None and not (amount > self.min_amount):
                continue
            yield (k, i, amount, flagged)


class LedgerSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return LEDGER_FORMAT

    def schema(self) -> str:
        return "id long, shard int, amount double, srv_filtered int"

    def reader(self, schema):
        return LedgerReader(self.options)


def register_ledger_source(spark) -> None:
    """Idempotent registration (re-registering replaces the format)."""
    spark.dataSource.register(LedgerSource)


from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)

JSONL_SINK_FORMAT = "ms_jsonl_sink"


@dataclass
class _JsonlCommit(WriterCommitMessage):
    path: str
    rows: int


class JsonlSinkWriter(DataSourceWriter):
    """Two-phase-commit JSONL sink: each task writes a _tmp_ file and
    returns a commit message; the DRIVER's commit() renames every task
    file into place and writes _SUCCESS with the total row count —
    a failed job leaves only _tmp_ files for abort() to delete, so a
    reader never observes a half-written output. This is the same
    commit protocol Spark's file sinks implement, expressed through
    the Python writer API."""

    def __init__(self, options) -> None:
        self.dir = options["path"]

    def write(self, iterator):
        import json as _json
        import os as _os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        _os.makedirs(self.dir, exist_ok=True)
        tmp = _os.path.join(self.dir, f"_tmp_part-{pid:05d}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(path=tmp, rows=n)

    def commit(self, messages):
        import os as _os

        total = 0
        for m in messages:
            # strip the staging prefix from the BASENAME only — a
            # destination directory whose own name contains "_tmp_"
            # must not be rewritten by the rename
            d, b = _os.path.split(m.path)
            _os.rename(m.path, _os.path.join(d, b.replace("_tmp_", "", 1)))
            total += m.rows
        with open(_os.path.join(self.dir, "_SUCCESS"), "w") as f:
            f.write(str(total))

    def abort(self, messages):
        import os as _os

        for m in messages:
            if m is not None and _os.path.exists(m.path):
                _os.remove(m.path)


class JsonlSinkSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return JSONL_SINK_FORMAT

    def writer(self, schema, overwrite):
        return JsonlSinkWriter(self.options)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkSource)


from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402

TICK_FORMAT = "ms_ticks"


class TickStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked Python STREAMING source: `read(start)` returns
    (rows, nextOffset) for one micro-batch of at most `step` ticks up
    to `total`; `readBetweenOffsets` deterministically replays any
    committed range, which is what makes recovery after a restart
    exactly-once — the offsets live in the query checkpoint, not in
    this object."""

    def __init__(self, options) -> None:
        self.total = int(options.get("total", 50))
        self.step = int(options.get("step", 20))

    def initialOffset(self):
        return {"pos": 0}

    def _rows(self, lo: int, hi: int):
        return iter(
            [(i, float((i * 7919) % 100) / 10.0) for i in range(lo, hi)]
        )

    def read(self, start):
        pos = start["pos"]
        end = min(pos + self.step, self.total)
        return self._rows(pos, end), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return self._rows(start["pos"], end["pos"])


class TickStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return TICK_FORMAT

    def schema(self) -> str:
        return "id long, v double"

    def simpleStreamReader(self, schema):
        return TickStreamReader(self.options)


def register_tick_stream(spark) -> None:
    spark.dataSource.register(TickStreamSource)
