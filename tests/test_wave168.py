"""Wave 168 behavior gates: AQE skew splitting must actually fire."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_skew_aqe_fires_and_join_is_exact(spark):
    r = registry.QUERIES["j_skew_aqe"](spark, SF).collect()[0]
    # every fact row matches exactly one dim key -> join preserves rows
    assert r["join_rows"] == r["fact_rows"] == 400_000
    assert r["hot_key_rows"] == 180_000
    # the plan gate: the final adaptive plan split the hot partition
    assert r["skew_split_applied"] == 1
    assert r["skewed_shuffle_reads"] >= 1


def test_skew_aqe_restores_session_confs(spark):
    before = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    registry.QUERIES["j_skew_aqe"](spark, SF).collect()
    after = {k: spark.conf.get(k) for k in before}
    assert after == before
