"""Isolated per-query profiler (guide §1): noop-sink timing + plan capture.

Times each named query solo — warm run, then median of N noop-sink runs
(`df.write.format("noop")` computes every column of every row, unlike the
bench's count() which can prune) — and optionally writes
`.explain("formatted")` to plans/r11/<name>_<tag>.txt.

Usage:
  python tools/profile_queries.py q1,q2[,q3...] [--n=3] [--plans=<tag>]
        [--count] [--sf=/root/testdata/sf0.1]

--count times fn().count() instead of the noop sink (the bench's timed
action) for apples-to-apples comparison with BENCH_detail.json.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mister_spark import get_session, registry


def main() -> None:
    names = sys.argv[1].split(",")
    n = 3
    plans_tag = None
    use_count = "--count" in sys.argv
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[2:]:
        if a.startswith("--n="):
            n = int(a.split("=")[1])
        elif a.startswith("--plans="):
            plans_tag = a.split("=")[1]
        elif a.startswith("--sf="):
            sf_dir = a.split("=")[1]
    registry.load_all()
    spark = get_session("mister_spark_profile")
    out: dict[str, dict] = {}
    for name in names:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")

        def act():
            df = fn(spark, sf_dir)
            if use_count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()

        act()  # warm: plan + IO + page cache
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            act()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        out[name] = {
            "median": round(runs[len(runs) // 2], 3),
            "runs": [round(r, 3) for r in runs],
        }
        if plans_tag:
            # Capture the plan with localCheckpoint patched to identity
            # so the dump shows the FULL pre-materialization pipeline
            # instead of `Scan ExistingRDD` stubs (r11 verdict item 6:
            # post-checkpoint dumps have zero evidentiary value).
            # Timing above always uses the real checkpoints.
            try:
                from pyspark.sql.classic.dataframe import DataFrame as _DF
            except ImportError:  # pre-4.0
                from pyspark.sql import DataFrame as _DF

            _real = _DF.localCheckpoint
            _DF.localCheckpoint = lambda self, eager=True: self
            try:
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    fn(spark, sf_dir).explain("formatted")
            finally:
                _DF.localCheckpoint = _real
            dest = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans",
                "r12",
                f"{name}_{plans_tag}.txt",
            )
            with open(dest, "w") as f:
                f.write(buf.getvalue())
            out[name]["plan"] = dest
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
