"""Discover every EAGER registry op and measure its collected-row volume.

The round-9 verdict found two ops whose scale bug was invisible to the
plan pins: they collected data-sized row sets to the driver, and the
(shuffles, unpartitioned windows) pin on a collected frame reads (0,0)
because a collect is neither. This tool closes the measurement gap: it
intercepts EVERY materialization point (collect / count /
localCheckpoint / toPandas on the concrete classic DataFrame) while
each registered op constructs at sf0.001, and records

  - whether the op materialized at all during construction (eager),
  - max shuffles / unpartitioned windows over materialized frames
    (the existing pin axes), and
  - MAX ROWS PULLED TO THE DRIVER per collect()/toPandas() call — the
    new axis. count() returns a scalar and localCheckpoint stays
    executor-resident, so both record rows=0.

Output: a JSON dict {key: {"collects": n, "max_rows": r, "sh": s,
"uw": w}} for every eager op, written to the path in argv[1] (default
tools/collect_ceilings.json) — consumed by
tests/test_plans.py::test_eager_op_materialized_frames_are_plan_pinned.

Usage: python tools/gen_collect_ceilings.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mister_spark import get_session, registry
from mister_spark.plans import count_shuffles, count_unpartitioned_windows

SF = "/root/testdata/sf0.001"


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "tools/collect_ceilings.json"
    registry.load_all()
    spark = get_session("gen_collect_ceilings")
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    records: list[tuple[str, int, int, int]] = []
    orig = {
        m: getattr(CDF, m)
        for m in ("collect", "count", "localCheckpoint", "toPandas")
    }

    def wrap(name):
        o = orig[name]

        def f(self, *a, **k):
            sh = count_shuffles(self)
            uw = count_unpartitioned_windows(self)
            res = o(self, *a, **k)
            rows = 0
            if name == "collect":
                rows = len(res)
            elif name == "toPandas":
                rows = len(res.index)
            records.append((name, sh, uw, rows))
            return res

        return f

    out: dict[str, dict] = {}
    try:
        for m in orig:
            setattr(CDF, m, wrap(m))
        for name in sorted(registry.QUERIES):
            records.clear()
            try:
                registry.QUERIES[name](spark, SF)
            except Exception as e:  # noqa: BLE001
                out[name] = {"error": f"{type(e).__name__}: {e}"}
                print(f"{name}: FAILED {type(e).__name__}", flush=True)
                continue
            if not records:
                continue  # fully lazy — covered by the plan pins
            pulls = [r for r in records if r[0] in ("collect", "toPandas")]
            out[name] = {
                "collects": len(pulls),
                "max_rows": max((r[3] for r in pulls), default=0),
                "sh": max(r[1] for r in records),
                "uw": max(r[2] for r in records),
            }
            print(f"{name}: {out[name]}", flush=True)
    finally:
        for m, o in orig.items():
            setattr(CDF, m, o)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}: {len(out)} eager ops")


if __name__ == "__main__":
    main()
