"""Wave 35 behavior/plan gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.plans import physical_plan

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_cache_reuse_plan_reads_memory(spark):
    """Every downstream branch must scan the cached intermediate, not
    replay the orders aggregate: the plan shows InMemoryTableScan and
    at most one orders scan."""
    df = registry.QUERIES["io_cache_reuse"](spark, SF)
    plan = physical_plan(df)
    assert "InMemoryTableScan" in plan, plan
    rows = {r["metric"]: r["value"] for r in df.collect()}
    assert rows["n_priorities"] == 5.0
    assert rows["total_orders"] > 0
    assert 0.2 <= rows["top_priority_share"] <= 1.0


def test_passage_chunks_reassemble_documents(spark):
    """Chunks must tile each document exactly: concatenating chunks in
    index order reproduces the whitespace-normalized text, every chunk
    except the last is full-size."""
    from pyspark.sql import functions as F

    from mister_spark.catalog import Catalog
    from mister_spark.operators.extras35 import CHUNK_TOKENS

    texts = {
        r["doc_id"]: " ".join(r["text"].split())
        for r in Catalog(spark, SF)["documents"].collect()
        if r["text"].strip()
    }
    chunks: dict[int, list] = {}
    for r in registry.QUERIES["ds_passage_chunk"](spark, SF).collect():
        chunks.setdefault(r["doc_id"], []).append(r)
    assert set(chunks) == set(texts)
    for doc_id, rs in chunks.items():
        rs.sort(key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in rs] == list(range(len(rs)))
        for r in rs[:-1]:
            assert r["n_tok"] == CHUNK_TOKENS
        assert " ".join(r["chunk"] for r in rs) == texts[doc_id]


def test_pandas_udf_matches_native_case(spark):
    """The registered vectorized UDF must agree with the pure-JVM CASE
    expression row-for-row."""
    from pyspark.sql import functions as F

    from mister_spark.catalog import Catalog
    from mister_spark.operators.extras35 import TIER_LOW, TIER_MID

    native = (
        Catalog(spark, SF)["orders"]
        .groupBy(
            F.when(F.col("o_totalprice") < TIER_LOW, "low")
            .when(F.col("o_totalprice") < TIER_MID, "mid")
            .otherwise("high")
            .alias("tier")
        )
        .count()
    )
    want = {r["tier"]: r["count"] for r in native.collect()}
    got = {
        r["tier"]: r["n"]
        for r in registry.QUERIES["sql_pandas_udf"](spark, SF).collect()
    }
    assert got == want
