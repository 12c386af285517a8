"""Wave 19 gates: streaming anomaly parity vs the batch filter,
modality routing exactness, lateness invariants, and epoch-permutation
independence."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_stream_anomaly_matches_batch_filter(spark):
    from pyspark.sql import functions as F

    from mister_spark.operators.common import cat, rnd

    got = {
        (r.event_id, r.rz)
        for r in registry.QUERIES["stream_anomaly"](spark, SF).collect()
    }
    ev = cat(spark, SF)["events"].select("event_id", "event_type", "value")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dv", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(dv, 0.5)").alias("mad"))
    batch = (
        dev.join(F.broadcast(mad), "event_type")
        .withColumn("rz", rnd(F.lit(0.6745) * F.col("dv") / F.col("mad"), 4))
        .filter((F.col("mad") > 0) & (F.col("rz") > 3.5))
    )
    want = {(r.event_id, r.rz) for r in batch.collect()}
    assert got == want, (len(got), len(want))


def test_modality_router_counts(spark):
    from mister_spark.operators.common import cat
    from pyspark.sql import functions as F

    docs = cat(spark, SF)["documents"]
    by_mod = {
        r.modality: r.n_docs
        for r in registry.QUERIES["mm_modality_router"](spark, SF).collect()
    }
    want = {
        {0: "image", 1: "audio", 2: "text"}[m]: n
        for m, n in (
            (r.m, r["count"])
            for r in docs.groupBy((F.col("doc_id") % 3).alias("m")).count().collect()
        )
    }
    assert by_mod == want, (by_mod, want)


def test_lateness_report_invariants(spark):
    rows = registry.QUERIES["ev_lateness_report"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_late <= r.n
        assert 0.0 <= r.late_share <= 1.0
        assert r.max_lateness_us >= 0


def test_epoch_plans_are_distinct_permutations(spark):
    rows = registry.QUERIES["ds_epoch_plan"](spark, SF).collect()
    assert {r.epoch for r in rows} == {0, 1, 2}
    n = {r.n_docs for r in rows}
    assert len(n) == 1, "every epoch covers the whole corpus"
    checksums = [r.order_checksum for r in rows]
    assert len(set(checksums)) == 3, "epochs must be different permutations"
