"""Wave 117 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.operators.extras117 import DD_GAMMA

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_ddsketch_guarantee(spark):
    rows = registry.QUERIES["sketch_ddsketch"](spark, SF).collect()
    assert len(rows) == 3
    alpha = (DD_GAMMA - 1) / (DD_GAMMA + 1)
    for r in rows:
        assert r["exact"] > 0
        # the whole point: measured relative error inside the guarantee
        assert r["rel_error"] <= alpha * 1.05 + 1e-6, r


def test_position_attribution_conserves(spark):
    rows = registry.QUERIES["ev_position_attribution"](spark, SF).collect()
    total_credit = sum(r["credit"] for r in rows)
    # credit sums to one per converting user (users with pre-purchase
    # touches); reconstruct that count
    from pyspark.sql import functions as F

    from mister_spark.operators.common import cat

    ev = cat(spark, SF)["events"]  # normalizes ts to a plain timestamp

    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("ct"))
    )
    n_users = (
        ev.filter(F.col("event_type") != "purchase")
        .join(conv, "user_id")
        .filter(F.unix_micros("ts") < F.col("ct"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(total_credit - n_users) < 0.05 * n_users + 1


def test_read_options_surface(spark):
    r = registry.QUERIES["io_read_options_surface"](spark, SF).collect()[0]
    # recursive lookup must see the nested copy too
    assert r["rows_recursive"] == 2 * r["rows_plain"]
    assert r["rows_glob"] == r["rows_recursive"]
