"""Wave 11 gates: single-exchange plan pins for the window ops,
containment-vs-Jaccard semantics, and quota-cap invariants."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.plans import count_shuffles, physical_plan

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_wave11_single_shuffle_ops(spark):
    for name in ("ev_change_points", "ev_rolling_median", "w_streak", "ds_quota_sample"):
        df = registry.QUERIES[name](spark, SF)
        assert count_shuffles(df) == 1, (name, physical_plan(df))


def test_quota_sample_caps_every_source(spark):
    from pyspark.sql import functions as F

    s = registry.QUERIES["ds_quota_sample"](spark, SF)
    per = s.groupBy("source").count().collect()
    assert per and all(r["count"] <= 10 for r in per)
    # no duplicate docs
    assert s.count() == s.select("doc_id").distinct().count()


def test_containment_catches_asymmetric_pairs(spark):
    """Containment is directional: src's shingles inside dst. Every
    emitted ratio must be within (0, 1] and ≥ the same pair's Jaccard
    (containment denominator is a subset of the union)."""
    cont = {
        (r.src_doc, r.dst_doc): r.containment
        for r in registry.QUERIES["dd_containment"](spark, SF).collect()
    }
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in registry.QUERIES["dd_ngram_jaccard"](spark, SF).collect()
    }
    assert all(0 < c <= 1.0 for c in cont.values())
    for (a, b), c in cont.items():
        j = jac.get((min(a, b), max(a, b)))
        if j is not None:
            assert c >= j - 1e-9, (a, b, c, j)


def test_bigram_nll_bounds(spark):
    """NLL is non-negative, and docs with all-unique bigrams score the
    corpus-level rarity, never negative infinity."""
    rows = registry.QUERIES["tx_bigram_nll"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.nll >= 0.0, r
        assert r.n_bigrams >= 1
