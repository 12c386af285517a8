"""The local mirror of the driver's correctness gate: every registered
query with an oracle must match DuckDB exactly at sf0.001 (fast) — and
the same harness is reusable at sf0.01 via ORACLE_SF env."""

from __future__ import annotations

import os

import pytest

from mister_spark import registry
from tests.oracle_util import compare

registry.load_all()

SF = os.environ.get("ORACLE_SF", "/root/testdata/sf0.001")

ORACLE_KEYS = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(spark, name):
    df = registry.QUERIES[name](spark, SF)
    ok, detail = compare(df, registry.ORACLES[name], SF)
    assert ok, f"{name}: {detail}"


def test_rows_only_queries_run(spark):
    for name, fn in registry.QUERIES.items():
        if name in registry.ORACLES:
            continue
        n = fn(spark, SF).count()
        assert n >= 0, name
