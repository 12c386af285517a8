"""Wave 51 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mister_spark import registry
from mister_spark.operators.extras51 import BM25_QMOD, BM25_TOPK, CR_LO, CR_HI

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_bm25_self_retrieval_and_shape(spark):
    rows = registry.QUERIES["sim_bm25"](spark, SF).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert 1 <= r["rn"] <= BM25_TOPK
        assert r["bm25"] > 0
        by_q.setdefault(r["q_id"], []).append(r)
    for q_id, lst in by_q.items():
        assert q_id % BM25_QMOD == 0
        assert len(lst) == BM25_TOPK
        # scores are non-increasing in rank
        lst.sort(key=lambda r: r["rn"])
        for a, b in zip(lst, lst[1:]):
            assert a["bm25"] >= b["bm25"]


def test_mrr_bounds(spark):
    r = registry.QUERIES["ml_mrr"](spark, SF).collect()[0]
    assert r["n_queries"] == 8
    assert 0 <= r["n_hit"] <= r["n_queries"]
    assert 0.0 <= r["mrr"] <= 1.0
    if r["n_hit"] == r["n_queries"]:
        assert r["mrr"] > 0


def test_compression_ratio_gates(spark):
    rows = registry.QUERIES["tx_compression_ratio"](spark, SF).collect()
    assert len(rows) == 20  # one per source
    for r in rows:
        assert 0.0 < r["avg_ratio"] <= 1.5
        assert 0.0 <= r["share_repetitive"] <= 1.0
        assert 0.0 <= r["share_random"] <= 1.0
    # invariant: repetitive text compresses harder than varied text —
    # run the same UDF plan over a constructed two-doc frame
    probe = spark.createDataFrame(
        [
            (0, "spam " * 200, "rep", "s0", 1000),
            (1, " ".join(__import__("hashlib").md5(str(i).encode())
                         .hexdigest() for i in range(100)), "var",
             "s1", 1000),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        for t in ["documents"]:
            probe.write.mode("overwrite").parquet(f"{d}/{t}.parquet")
        got = {
            r["source"]: r["avg_ratio"]
            for r in registry.QUERIES["tx_compression_ratio"](spark, d).collect()
        }
    assert got["s0"] < CR_LO < got["s1"]
    assert got["s0"] < got["s1"]


def test_bootstrap_ci_brackets_mean(spark):
    r = registry.QUERIES["ml_bootstrap_ci"](spark, SF).collect()[0]
    assert r["n_orders"] > 0
    assert r["boot_se"] > 0
    assert r["ci_lo"] < r["mean_price"] < r["ci_hi"]
    # CI width is 2*1.96*se around the replicate-mean center; the
    # center may differ from the raw mean by O(se), so just bound width
    assert (r["ci_hi"] - r["ci_lo"]) - 2 * 1.96 * r["boot_se"] < 0.02
