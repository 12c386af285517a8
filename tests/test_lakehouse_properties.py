"""Property tests (hypothesis): the snapshot-table / Iceberg stack
under RANDOM commit sequences, not just the fixed test scenarios.

For any generated sequence of table operations the invariants must
hold: every version reads back the rows a pure-Python replay of the
same operations predicts; the Iceberg export reads every snapshot
row-identical to the native read; expiry keeps the newest snapshots
readable and makes expired ones raise; a merge-on-read delete
subtracts exactly the matching rows without touching data files.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings, strategies as st

from mister_spark.sources.iceberg import (
    delete_where,
    expire_snapshots,
    export_iceberg,
    read_iceberg,
)
from mister_spark.sources.snapshots import SnapshotTable

# an op is ("append", lo, hi) | ("overwrite", lo, hi) |
# ("delete_range", lo, hi) | ("merge", lo, hi)
_RANGE = st.tuples(
    st.integers(min_value=0, max_value=90),
    st.integers(min_value=1, max_value=40),
)
OPS = st.lists(
    st.tuples(
        st.sampled_from(["append", "overwrite", "delete_range", "merge"]),
        _RANGE,
    ),
    min_size=1,
    max_size=5,
)


def _mk_df(spark, lo, hi):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 17).alias("v")
    )


def _replay(ops):
    """Pure-Python model: version -> {k: v} after each commit."""
    states = []
    cur: dict[int, int] = {}
    for op, (lo, span) in ops:
        hi = lo + span
        rows = {k: (k * 3) % 17 for k in range(lo, hi)}
        if op == "overwrite":
            cur = dict(rows)
        elif op == "delete_range":
            cur = {k: v for k, v in cur.items() if not (lo <= k <= hi)}
        else:  # merge
            cur = {**cur, **rows}
        states.append(dict(cur))
    return states


@settings(
    max_examples=4,
    deadline=None,
    derandomize=True,  # same adversarial sequences every run
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(OPS)
def test_random_commit_sequences_round_trip(spark, tmp_path_factory, ops):
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="prop_lake_")
    try:
        t = SnapshotTable(
            spark, os.path.join(root, "t"), stats_cols=["k"]
        )
        # first commit is always a create-equivalent append
        first_lo, first_span = ops[0][1]
        t.append(_mk_df(spark, first_lo, first_lo + first_span))
        applied = [("merge", (first_lo, first_span))]
        for op, (lo, span) in ops[1:]:
            df = _mk_df(spark, lo, lo + span)
            if op == "append":
                # appends would duplicate keys and break the dict
                # model; exercise it as merge (same key-grain result)
                t.merge(df, key="k")
                applied.append(("merge", (lo, span)))
            elif op == "overwrite":
                t.overwrite(df)
                applied.append(("overwrite", (lo, span)))
            elif op == "delete_range":
                t.delete_range("k", lo, lo + span)
                applied.append(("delete_range", (lo, span)))
            else:
                t.merge(df, key="k")
                applied.append(("merge", (lo, span)))
        states = _replay(applied)
        versions = t.versions()
        assert len(versions) == len(states)
        # native reads match the model at every version
        for v, want in zip(versions, states):
            got = {
                r["k"]: r["v"] for r in t.read(version=v).collect()
            }
            assert got == want, (v, applied)
        # Iceberg export reads every snapshot row-identical
        dest = os.path.join(root, "ice")
        export_iceberg(t, dest)
        for v, want in zip(versions, states):
            got = {
                r["k"]: r["v"]
                for r in read_iceberg(spark, dest, snapshot_id=v + 1).collect()
            }
            assert got == want, ("iceberg", v, applied)
        # merge-on-read delete: subtract k % 2 == 0 from the head
        head = states[-1]
        rep = delete_where(spark, dest, "k % 2 = 0")
        want_after = {k: v for k, v in head.items() if k % 2 != 0}
        got_after = {
            r["k"]: r["v"] for r in read_iceberg(spark, dest).collect()
        }
        assert got_after == want_after, applied
        assert rep["deleted_rows"] == len(head) - len(want_after)
        # expiry: newest snapshot survives, the oldest raises
        if len(versions) >= 2:
            expire_snapshots(dest, retain_last=1)
            got_head = {
                r["k"]: r["v"] for r in read_iceberg(spark, dest).collect()
            }
            assert got_head == want_after
            try:
                read_iceberg(spark, dest, snapshot_id=versions[0] + 1)
                survived = True
            except ValueError:
                survived = False
            assert not survived  # delete_where added a newer snapshot
    finally:
        shutil.rmtree(root, ignore_errors=True)
