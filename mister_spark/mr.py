"""mister-parity MapReduce layer, compiled onto Spark DataFrames.

The public ``Jaymon/mister`` library (reference surface; /root/reference
was empty at build time, see SURVEY.md §1) runs jobs shaped as:

    prepare(count, ...) -> split input into chunks
    map(chunk)          -> partial result per chunk
    reduce(acc, value)  -> fold partials into the final result

Spark already owns each phase: ``prepare`` is input-split planning,
``map`` is a narrow transformation over partitions, ``reduce`` is a
keyed aggregate with map-side partial aggregation. This module keeps the
3-phase *class* API for users migrating imperative mister jobs, while
compiling to DataFrame ops so Catalyst/AQE still optimize the plan:

- ``map``   → ``mapInPandas`` (Arrow batches — the fast Python path)
- ``reduce``→ ``groupBy().agg(...)`` (declarative, JVM-side) or
              ``applyInPandas`` when genuinely imperative
- no driver-side folding: mister reduces on one process; here the
  combine runs distributed and map-side.

Prefer the declarative operators in ``mister_spark.operators`` — the
class API is the compatibility path, and its map phase costs an Arrow
round-trip that pure-column jobs don't need.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession


class MrJob:
    """Subclass and override; then ``MrJob().run(spark, df)``.

    Attributes:
        map_schema: DDL schema of ``map``'s output batches.
        reduce_keys: grouping keys; empty → no reduce phase.
        reduce_schema: DDL schema of ``reduce``'s output (imperative mode).
    """

    map_schema: str | None = None
    reduce_keys: tuple[str, ...] = ()
    reduce_schema: str | None = None
    #: classic MR knobs — None keeps Spark/AQE defaults
    map_partitions: int | None = None  #: prepare(): input-split count
    reduce_partitions: int | None = None  #: numReduceTasks equivalent

    # -- map phase -------------------------------------------------------
    def map(self, batch: pd.DataFrame) -> pd.DataFrame:  # noqa: A003
        """Transform one Arrow batch; default identity."""
        return batch

    # -- combine phase ---------------------------------------------------
    def combine(self, group: pd.DataFrame) -> pd.DataFrame:
        """Optional map-side combiner: partial-reduce one key group
        WITHIN a map batch before the shuffle (same contract as
        ``reduce``). Spark's declarative aggregates combine
        automatically; this hook restores that for imperative reduces,
        shrinking shuffle volume from rows to keys-per-batch."""
        raise NotImplementedError

    # -- reduce phase ----------------------------------------------------
    def reduce_exprs(self) -> list[Column] | None:
        """Declarative reduce: aggregate expressions (fast path)."""
        return None

    def reduce(self, group: pd.DataFrame) -> pd.DataFrame:
        """Imperative reduce over one key group (needs reduce_schema)."""
        raise NotImplementedError

    # -- driver ----------------------------------------------------------
    def _has_combiner(self) -> bool:
        return type(self).combine is not MrJob.combine

    def run(self, spark: SparkSession, source: DataFrame) -> DataFrame:
        df = source
        if self.map_partitions:
            # mister's prepare(count): control the input-split count
            df = df.repartition(self.map_partitions)
        if self.map_schema is not None or self._has_combiner():
            job = self
            keys = list(self.reduce_keys)

            def _map_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for batch in it:
                    out = job.map(batch)
                    if job._has_combiner() and keys and len(out):
                        parts = [
                            job.combine(g.reset_index(drop=True))
                            for _, g in out.groupby(keys, sort=False)
                        ]
                        out = pd.concat(parts, ignore_index=True)
                    yield out

            schema = self.map_schema or self.reduce_schema
            if schema is None:
                raise ValueError("combiner needs map_schema or reduce_schema")
            df = df.mapInPandas(_map_batches, schema=schema)
        if not self.reduce_keys:
            return df
        if self.reduce_partitions:
            df = df.repartition(self.reduce_partitions, *self.reduce_keys)
        grouped = df.groupBy(*self.reduce_keys)
        exprs = self.reduce_exprs()
        if exprs is not None:
            return grouped.agg(*exprs)
        if self.reduce_schema is None:
            raise ValueError("imperative reduce needs reduce_schema")
        job = self

        def _reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
            return job.reduce(pdf)

        return grouped.applyInPandas(_reduce_group, schema=self.reduce_schema)
