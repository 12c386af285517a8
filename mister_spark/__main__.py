"""Command-line runner: `python -m mister_spark <cmd>`.

A user of the reference ran jobs from the shell; this is the Spark
equivalent over the same registry the driver uses:

    python -m mister_spark list [--family tx_]
    python -m mister_spark run q1_pricing_summary [--sf DIR] [--limit N]
    python -m mister_spark explain sim_bm25 [--sf DIR]
    python -m mister_spark check ml_mrr [--sf DIR]   # vs DuckDB oracle

`run` prints the result as a table, `explain` prints the formatted
physical plan (the 100 TB sanity check), `check` executes the query AND
its DuckDB oracle side-by-side with the driver's exact-equality compare.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m mister_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registered query keys")
    lp.add_argument("--family", default="", help="prefix filter, e.g. tx_")

    for name, hlp in [
        ("run", "execute a query and print rows"),
        ("explain", "print the formatted physical plan"),
        ("check", "run the query and its DuckDB oracle, compare exactly"),
    ]:
        rp = sub.add_parser(name, help=hlp)
        rp.add_argument("key")
        rp.add_argument("--sf", default="/root/testdata/sf0.001")
        if name == "run":
            rp.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    from mister_spark import registry

    registry.load_all()

    if args.cmd == "list":
        for k in sorted(registry.QUERIES):
            if k.startswith(args.family):
                kind = "sql-oracle" if k in registry.ORACLES else "rows-only"
                print(f"{k}\t{kind}")
        return 0

    if args.key not in registry.QUERIES:
        print(f"unknown key {args.key!r}; try `list`", file=sys.stderr)
        return 2

    from mister_spark import get_session

    spark = get_session(f"cli-{args.cmd}")
    df = registry.QUERIES[args.key](spark, args.sf)

    if args.cmd == "run":
        df.show(args.limit, truncate=False)
        return 0
    if args.cmd == "explain":
        df.explain("formatted")
        return 0
    # check
    if args.key not in registry.ORACLES:
        print(f"{args.key} is rows-only (no SQL oracle); ran "
              f"{df.count()} rows OK")
        return 0
    from tests.oracle_util import compare

    ok, detail = compare(df, registry.ORACLES[args.key], args.sf)
    print(f"{args.key}: {'PASS' if ok else 'FAIL'} ({detail})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
