"""The cluster-safety checkpoint switch (round-11 verdict item 5).

localCheckpoint blocks are non-replicated executor state: fine on
local[N], lineage-fatal on a real cluster when an executor dies. With
MISTER_SPARK_RELIABLE_CHECKPOINT=1 every localCheckpoint() in the
engine routes to reliable .checkpoint() into a fault-tolerant dir.
Both modes must produce identical results through the shared
checkpoint_partitioned helper and a raw localCheckpoint call.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _frame(spark):
    return spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 3).alias("v")
    )


def _run(spark):
    from mister_spark.operators.common import checkpoint_partitioned

    base = checkpoint_partitioned(_frame(spark), "k")
    agg = base.groupBy("k").agg(F.sum("v").alias("s"))
    raw = _frame(spark).localCheckpoint()
    return sorted(agg.collect()), raw.count()


def test_local_and_reliable_checkpoint_agree(spark):
    import mister_spark.session as sess

    local_rows, local_n = _run(spark)

    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    saved_method = ClassicDF.localCheckpoint
    saved_patched = sess._RELIABLE_PATCHED
    os.environ["MISTER_SPARK_RELIABLE_CHECKPOINT"] = "1"
    try:
        sess.install_reliable_checkpoint(spark)
        assert getattr(
            ClassicDF.localCheckpoint, "_mister_spark_reliable", False
        )
        # the context now has a fault-tolerant checkpoint dir
        assert spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()
        reliable_rows, reliable_n = _run(spark)
    finally:
        os.environ.pop("MISTER_SPARK_RELIABLE_CHECKPOINT", None)
        ClassicDF.localCheckpoint = saved_method
        sess._RELIABLE_PATCHED = saved_patched

    assert reliable_rows == local_rows
    assert reliable_n == local_n


def test_reliable_mode_off_by_default():
    import mister_spark.session as sess

    assert not sess.reliable_checkpoint_requested()
