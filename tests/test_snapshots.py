"""Snapshot-table (lightweight transactional format) behavior gates."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from mister_spark.sources.snapshots import ConcurrentCommitError, SnapshotTable

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _dir_digest(root: str) -> dict[str, str]:
    out = {}
    for dirpath, _, files in os.walk(root):
        for name in files:
            p = os.path.join(dirpath, name)
            with open(p, "rb") as f:
                out[os.path.relpath(p, root)] = hashlib.md5(f.read()).hexdigest()
    return out


def test_create_append_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_cols=["o_orderkey"])
    orders = _orders(spark)
    first = orders.filter(F.col("o_orderkey") < 1000)
    rest = orders.filter(F.col("o_orderkey") >= 1000)
    v1 = t.create(first)
    v2 = t.append(rest)
    assert (v1, v2) == (0, 1)
    # latest sees everything; time travel sees the old snapshot
    assert t.read().count() == orders.count()
    assert t.read(version=0).count() == first.count()
    assert t.row_count() == orders.count()
    ops = [m["op"] for m in t.history()]
    assert ops == ["create", "append"]


def test_overwrite_replaces_but_keeps_old_versions(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_cols=["o_orderkey"])
    orders = _orders(spark)
    t.create(orders)
    t.overwrite(orders.limit(10))
    assert t.read().count() == 10
    assert t.read(version=0).count() == orders.count()


def test_delete_range_prunes_untouched_files(spark, tmp_path):
    """Dirs whose stats exclude the delete range must survive
    byte-identical (stats pruning, not rewrite)."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_cols=["o_orderkey"])
    orders = _orders(spark)
    lo_half = orders.filter(F.col("o_orderkey") < 2000)
    hi_half = orders.filter(F.col("o_orderkey") >= 2000)
    t.create(lo_half)
    t.append(hi_half)
    lo_dir = os.path.join(str(tmp_path / "t"), t.history()[0]["entries"][0]["dir"])
    before = _dir_digest(lo_dir)
    # delete a range entirely inside the high dir
    t.delete_range("o_orderkey", 3000, 4000)
    after = _dir_digest(lo_dir)
    assert before == after  # untouched dir never rewritten
    got = t.read()
    assert got.filter(F.col("o_orderkey").between(3000, 4000)).count() == 0
    expect = orders.filter(~F.col("o_orderkey").between(3000, 4000)).count()
    assert got.count() == expect
    # the low dir is still referenced verbatim in the new manifest
    assert t.history()[-1]["entries"][0]["dir"] == t.history()[0]["entries"][0]["dir"]


def test_concurrent_commit_loses_cleanly(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_cols=["o_orderkey"])
    orders = _orders(spark)
    t.create(orders.limit(5))
    # another writer steals the next version
    other = SnapshotTable(spark, str(tmp_path / "t"), stats_cols=["o_orderkey"])
    other.append(orders.limit(3))
    # simulate a stale writer: it read head=1 but head moves to 2 first
    stolen = t._manifest_path(2)
    os.makedirs(os.path.dirname(stolen), exist_ok=True)
    with open(stolen, "x") as f:
        f.write("{}")
    with pytest.raises(ConcurrentCommitError):
        t._commit({"op": "append", "parent": 1, "entries": []})


def test_stale_parent_rejected(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_cols=["o_orderkey"])
    t.create(_orders(spark).limit(5))
    with pytest.raises(ConcurrentCommitError):
        t._commit({"op": "append", "parent": 99, "entries": []})
