"""Wave 102 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.operators.extras102 import MG_K

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_misra_gries_guarantee(spark):
    """r11: the op output is now the verified exact heavy-hitter set
    (oracle-checked); this gate pins the two things the oracle can't —
    the output matches the exact computation done independently here,
    and the mg_count_floor column is the valid MG undercount bound."""
    rows = registry.QUERIES["sketch_misra_gries"](spark, SF).collect()
    assert 0 < len(rows) <= MG_K
    n = rows[0]["n_total"]
    exact = {
        row["event_type"]: row["n"]
        for row in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert n == sum(exact.values())
    want = {
        item: cnt
        for item, cnt in exact.items()
        if cnt * (MG_K + 1) > n
    }
    got = {r["item"]: r["exact_count"] for r in rows}
    assert got == want, (got, want)
    for r in rows:
        # the floor is the worst-case merged-MG count: within (0, exact]
        assert r["mg_count_floor"] == r["exact_count"] - n // (MG_K + 1)
        assert 0 < r["mg_count_floor"] <= r["exact_count"]


def test_schema_compat_classes(spark):
    rows = registry.QUERIES["io_schema_compat_audit"](spark, SF).collect()
    by = {r["column"]: r for r in rows}
    assert by["o_orderpriority"]["compat"] == "forward_breaking"
    assert by["o_channel"]["compat"] == "backward_compatible"
    assert by["o_custkey"]["change"] == "type_changed"
    assert by["o_custkey"]["compat"] == "breaking"
    assert by["o_orderkey"]["compat"] == "compatible"


def test_procrustes_residual_drops(spark):
    r = registry.QUERIES["ml_procrustes_align"](spark, SF).collect()[0]
    assert r["pairs"] == 250 and r["dim"] == 64
    # alignment can only reduce the residual (optimal rotation)
    assert r["resid_share_after"] <= r["resid_share_before"] + 1e-9
    assert 0.0 <= r["resid_share_after"] <= 1.5
    # unrelated random vectors: even the best rotation leaves most of
    # the residual (sanity that we're not hallucinating structure)
    assert r["resid_share_after"] > 0.2


def test_peak_to_mean_bounds(spark):
    rows = registry.QUERIES["ev_peak_to_mean"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["peak_to_mean"] >= 1.0
        assert r["peak_hour_events"] >= r["mean_hour_events"]
