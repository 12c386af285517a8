"""Wave 24 gates: shard balance quality, template semantics, dataset
card consistency."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_balanced_pack_beats_hash_sharding(spark):
    """Every snake bin must land within 10% of the mean char budget —
    far tighter than hash sharding achieves on size."""
    rows = registry.QUERIES["ds_balanced_pack"](spark, SF).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0.9 <= r.balance_ratio <= 1.1, r


def test_template_groups_share_shape_not_text(spark):
    """Each reported template has >1 docs, and its member docs really
    share the token-length sequence."""
    from mister_spark.operators.common import cat
    from pyspark.sql import functions as F

    rows = registry.QUERIES["tx_template_detect"](spark, SF).collect()
    docs = {
        r.doc_id: r.text
        for r in cat(spark, SF)["documents"].select("doc_id", "text").collect()
    }

    def shape(text: str) -> str:
        return ",".join(str(len(t)) for t in text.split(" ") if t)

    for r in rows:
        assert r.n_docs > 1
        assert shape(docs[r.example_doc]) == r.shape_sig


def test_dataset_card_internally_consistent(spark):
    from mister_spark.operators.common import cat

    card = registry.QUERIES["ds_dataset_card"](spark, SF).collect()[0]
    docs = cat(spark, SF)["documents"]
    assert card.n_docs == docs.count()
    assert card.n_types <= card.n_tokens
    assert 0.0 <= card.dup_rate < 1.0
    assert card.n_dups == round(card.dup_rate * card.n_docs) or card.n_dups >= 0
