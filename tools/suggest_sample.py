"""Suggest a rotated 50-key driver sample for a given round.

The driver's CORRECTNESS_r{N}.json has sampled the SAME fixed 50 keys
every round, so most registry keys never get a driver-hash record. This
tool derives a deterministic, round-seeded 50-key sample (sort keys by
md5("r{N}:" + key), take the first 50) so the driver can rotate with
zero effort: every key gets driver-verified within ~17 rounds, and any
party can reproduce the sample from the round number alone.

Usage: python tools/suggest_sample.py [round] [k]   (defaults: 9, 50)
Writes SAMPLE_r{N}.json at the repo root and prints the JSON.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mister_spark import registry


def suggest(round_no: int, k: int = 50) -> list[str]:
    registry.load_all()
    return sorted(
        registry.QUERIES,
        key=lambda q: hashlib.md5(f"r{round_no}:{q}".encode()).hexdigest(),
    )[:k]


def main() -> None:
    round_no = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    sample = suggest(round_no, k)
    doc = {
        "round": round_no,
        "k": k,
        "rule": 'sort registry keys by md5("r{N}:" + key), take first k',
        "keys": sample,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, f"SAMPLE_r{round_no:02d}.json"), "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
