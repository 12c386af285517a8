"""Wave 31 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_auc_agrees_with_direct_pair_count(spark):
    """AUC must equal the directly-counted P(score_pos > score_neg)
    + 0.5·P(tie) on the raw rows (the definition, O(n²) — test-scale
    only)."""
    from pyspark.sql import functions as F

    from mister_spark.catalog import Catalog
    from mister_spark.operators.extras31 import AUC_POS_LABEL_LT

    rows = (
        Catalog(spark, SF)["embeddings"]
        .select(
            F.element_at("embedding", 1).cast("double").alias("s"),
            (F.col("label") < AUC_POS_LABEL_LT).alias("pos"),
        )
        .collect()
    )
    pos = [r["s"] for r in rows if r["pos"]]
    neg = [r["s"] for r in rows if not r["pos"]]
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    got = registry.QUERIES["ml_auc"](spark, SF).collect()[0]
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    import math

    assert abs(got["auc"] - math.floor(want * 10000 + 0.5) / 10000) <= 1e-9


def test_drawdown_nonnegative_and_day_in_range(spark):
    rows = registry.QUERIES["ev_drawdown"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["max_drawdown"] >= 0.0
        assert r["trough_day"] > 0


def test_tfidf_cosine_finds_planted_near_dups(spark):
    """The weighted-cosine dedup must be non-vacuous on the planted
    near-dup corpus, report only ordered unique pairs in [tau, 1], and
    substantially overlap the exact-Jaccard near-dup pairs."""
    from mister_spark.operators.extras31 import TFIDF_TAU

    rows = registry.QUERIES["dd_tfidf_cosine"](spark, SF).collect()
    assert rows, "expected planted near-dup pairs to clear the cosine threshold"
    seen = set()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert (r["doc_a"], r["doc_b"]) not in seen
        seen.add((r["doc_a"], r["doc_b"]))
        assert TFIDF_TAU <= r["cosine"] <= 1.0
    jacc = {
        (r["doc_a"], r["doc_b"])
        for r in registry.QUERIES["dd_ngram_jaccard"](spark, SF)
        .filter("jaccard >= 0.8")
        .collect()
    }
    assert jacc
    recall = len(jacc & seen) / len(jacc)
    assert recall >= 0.9, f"weighted-cosine recall {recall:.2f} of jaccard>=0.8 pairs"
