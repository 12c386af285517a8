"""Publish CORRECTNESS_local.json: the full-registry twin of the
driver's CORRECTNESS_r{N}.json artifact.

The driver's per-round artifact has sampled the same fixed 50 keys every
round, leaving the other ~195 keys with no hard correctness record. This
script runs EVERY registered query at sf0.01 (the driver's compare
scale) against its DuckDB oracle with the same exact-equality contract
(tests/oracle_util.compare — sorted columns, sorted rows, exact values)
and writes the results in the driver's record format, so the full
coverage is auditable alongside the sampled artifact.

Usage: python tools/correctness_local.py [out_path] (env ORACLE_SF to
override the scale dir). With --only=key1,key2 only those keys are
re-run and their records merged into the existing artifact (for
appending a new wave without a full 686-key sweep); the _meta block is
recomputed over the merged set.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mister_spark import get_session, registry
from tests.oracle_util import compare, run_oracle


def main() -> None:
    sf_dir = os.environ.get("ORACLE_SF", "/root/testdata/sf0.01")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    out_path = args[0] if args else "CORRECTNESS_local.json"
    registry.load_all()
    spark = get_session("correctness_local")
    results: dict[str, dict] = {}
    if only is not None and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        prior.pop("_meta", None)
        # keep only records for keys still in the registry
        results = {k: v for k, v in prior.items() if k in registry.QUERIES}
    t0 = time.time()
    # Sweep provenance: every record produced by THIS run carries the
    # commit it was swept at and a wall-clock timestamp.
    # tests/test_artifact_sync.py::test_records_not_stale_vs_source_commits
    # fails any record whose commit predates the last commit touching
    # the key's source file (records without a commit fail outright),
    # so a sweep that trails a code change can no longer sit unnoticed.
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def _git(*a: str) -> str:
        return subprocess.run(
            ["git", *a], cwd=root, capture_output=True, text=True
        ).stdout.strip()

    commit = _git("rev-parse", "--short", "HEAD") or "unknown"
    dirty = bool(_git("status", "--porcelain", "--untracked-files=no"))
    swept_at = int(t0)
    todo = sorted(registry.QUERIES) if only is None else sorted(only)
    # Round-10 collected-rows gate: intercept every driver pull
    # (collect / toPandas) DURING each op's construction and record the
    # max row count pulled — the axis the (shuffles, windows) plan pins
    # are structurally blind to (the round-9 verdict's two findings both
    # escaped on it). tests/test_artifact_sync.py pins these against
    # tools/collect_ceilings.json.
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    pulled: list[int] = []
    _orig = {m: getattr(CDF, m) for m in ("collect", "toPandas")}

    def _wrap(mname):
        o = _orig[mname]

        def f(self, *a, **k):
            res = o(self, *a, **k)
            pulled.append(
                len(res) if mname == "collect" else len(res.index)
            )
            return res

        return f

    for name in todo:
        fn = registry.QUERIES[name]
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
            "commit": commit + ("+dirty" if dirty else ""),
            "swept_at": swept_at,
        }
        try:
            pulled.clear()
            for m in _orig:
                setattr(CDF, m, _wrap(m))
            try:
                df = fn(spark, sf_dir)
            finally:
                for m, o in _orig.items():
                    setattr(CDF, m, o)
            if pulled:
                rec["max_collect_rows"] = max(pulled)
            if name in registry.ORACLES:
                ok, detail = compare(df, registry.ORACLES[name], sf_dir)
                rec["spark_rows"] = df.count()
                rec["oracle_rows"] = len(run_oracle(registry.ORACLES[name], sf_dir))
                rec["rows_match"] = rec["spark_rows"] == rec["oracle_rows"]
                rec["schema_match"] = ok or not detail.startswith("columns differ")
                rec["hash_match"] = ok
                if not ok:
                    rec["err"] = detail[:200]
            else:
                rec["spark_rows"] = df.count()
                rec["err"] = "no_oracle"
        except Exception as e:  # noqa: BLE001 — record, don't abort the sweep
            rec["err"] = f"exception: {e}"[:200]
        results[name] = rec
        print(f"  {name}: {'ok' if rec['err'] in (None, 'no_oracle') else rec['err']}", file=sys.stderr)
    meta = {
        "_meta": {
            "sf_dir": sf_dir,
            "keys": len(results),
            "oracle_keys": len(registry.ORACLES),
            "green": sum(
                1
                for r in results.values()
                if r["hash_match"] is True
                or (r["err"] == "no_oracle" and r["spark_rows"] is not None)
            ),
            "elapsed_sec": round(time.time() - t0, 1),
            "commit": commit + ("+dirty" if dirty else ""),
            "swept_at": swept_at,
            "swept_keys": len(todo),
            "contract": "tests/oracle_util.compare — sorted columns, sorted rows, exact values (the driver's hash-equality twin)",
        }
    }
    with open(out_path, "w") as f:
        json.dump({**meta, **results}, f, indent=0)
    print(f"wrote {out_path}: {meta['_meta']}", file=sys.stderr)


if __name__ == "__main__":
    main()
