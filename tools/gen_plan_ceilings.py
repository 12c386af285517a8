"""Measure plan-shape pins for late-wave keys and print a ceilings dict.

For every registry key defined in `operators/extras{N}.py` with N in the
requested range, build the DataFrame at sf0.001 and record:
  - shuffle count (Exchange hash/range partitioning nodes, pre-AQE)
  - unpartitioned-window count (the single-task global-sort shape)

Output is a Python dict literal to paste into tests/test_plans.py — the
values become regression ceilings: a refactor that adds an exchange or
introduces an unpartitioned data-sized window fails the pin.

Usage: python tools/gen_plan_ceilings.py [lo] [hi]   (default 118 167)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mister_spark import get_session, registry
from mister_spark.plans import count_shuffles, count_unpartitioned_windows

SF = "/root/testdata/sf0.001"


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 118
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 167
    registry.load_all()
    spark = get_session("gen_plan_ceilings")
    by_wave: dict[int, list[str]] = {}
    for name, fn in registry.QUERIES.items():
        m = re.search(r"\.extras(\d+)$", fn.__module__)
        if m and lo <= int(m.group(1)) <= hi:
            by_wave.setdefault(int(m.group(1)), []).append(name)
    print("{")
    for wave in sorted(by_wave):
        print(f"    # wave {wave}")
        for name in sorted(by_wave[wave]):
            try:
                df = registry.QUERIES[name](spark, SF)
                sh = count_shuffles(df)
                uw = count_unpartitioned_windows(df)
                print(f'    "{name}": ({sh}, {uw}),')
            except Exception as e:  # noqa: BLE001
                print(f'    # "{name}": FAILED {type(e).__name__}: {e}')
    print("}")


if __name__ == "__main__":
    main()
