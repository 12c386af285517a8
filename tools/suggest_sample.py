"""Suggest a rotated 50-key driver sample for a given round.

The driver's CORRECTNESS_r{N}.json has sampled the SAME fixed 50 keys
every round, so most registry keys never get a driver-hash record.
This tool derives a deterministic sample the driver can adopt with
zero effort, NEVER-DRIVER-CHECKED KEYS FIRST (round-11 verdict item
5): keys are split into (never checked in any CORRECTNESS_r*.json,
already checked), each bucket ordered by md5("r{N}:" + key), and the
sample takes from the never-checked bucket first. Any party can
reproduce the sample from the round number + the committed
CORRECTNESS_r*.json artifacts alone.

Also writes DRIVER_COVERAGE.md — the union table of every key the
driver has ever hash-checked, so the blind spot is a visible artifact
rather than a narrated number.

Usage: python tools/suggest_sample.py [round] [k]   (defaults: 11, 50)
Writes SAMPLE_r{N}.json + DRIVER_COVERAGE.md at the repo root.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mister_spark import registry

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_checked_union() -> dict[str, list[int]]:
    """key -> sorted list of round numbers with a driver record."""
    seen: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        base = os.path.basename(path)
        try:
            rno = int(base[len("CORRECTNESS_r") : -len(".json")])
        except ValueError:
            continue
        with open(path) as f:
            doc = json.load(f)
        if not isinstance(doc, dict):
            continue
        for key in doc:
            seen.setdefault(key, []).append(rno)
    return seen


def suggest(round_no: int, k: int = 50) -> tuple[list[str], list[str]]:
    registry.load_all()
    seen = driver_checked_union()

    def h(q: str) -> str:
        return hashlib.md5(f"r{round_no}:{q}".encode()).hexdigest()

    never = sorted((q for q in registry.QUERIES if q not in seen), key=h)
    checked = sorted((q for q in registry.QUERIES if q in seen), key=h)
    return (never + checked)[:k], never


def write_coverage(seen: dict[str, list[int]]) -> None:
    registry.load_all()
    total = len(registry.QUERIES)
    live = {k: v for k, v in seen.items() if k in registry.QUERIES}
    lines = [
        "# Driver hash-check coverage",
        "",
        "Union of all keys ever checked by the driver's per-round "
        "CORRECTNESS_r{N}.json sample, against the live registry. "
        "Everything NOT in this table has only the builder's local "
        "sweep (CORRECTNESS_local.json) as its correctness record — "
        "the per-round SAMPLE_r{N}.json file lists the "
        "never-checked-first rotation that closes this gap fastest.",
        "",
        f"**Driver-checked: {len(live)} / {total} registry keys "
        f"({100.0 * len(live) / total:.1f}%). "
        f"Blind spot: {total - len(live)} keys.**",
        "",
        "| key | driver rounds |",
        "| --- | --- |",
    ]
    for key in sorted(live):
        rounds = ", ".join(f"r{r}" for r in sorted(set(live[key])))
        lines.append(f"| {key} | {rounds} |")
    stale = sorted(set(seen) - set(live))
    if stale:
        lines += [
            "",
            f"Keys checked in past rounds but no longer in the "
            f"registry: {', '.join(stale)}.",
        ]
    with open(os.path.join(ROOT, "DRIVER_COVERAGE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    round_no = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    sample, never = suggest(round_no, k)
    seen = driver_checked_union()
    doc = {
        "round": round_no,
        "k": k,
        "rule": (
            'never-driver-checked keys first (vs the union of all '
            'committed CORRECTNESS_r*.json), each bucket ordered by '
            'md5("r{N}:" + key), take first k'
        ),
        "never_driver_checked_total": len(never),
        "keys": sample,
    }
    with open(os.path.join(ROOT, f"SAMPLE_r{round_no:02d}.json"), "w") as f:
        json.dump(doc, f, indent=1)
    write_coverage(seen)
    print(
        json.dumps(
            {
                "round": round_no,
                "sample": len(sample),
                "never_checked_in_sample": len([q for q in sample if q in never]),
                "never_checked_total": len(never),
            }
        )
    )


if __name__ == "__main__":
    main()
