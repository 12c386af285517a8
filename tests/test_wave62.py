"""Wave 62 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mister_spark import registry
from mister_spark.operators.extras62 import BK_K

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_eb_shrinkage_pulls_toward_prior(spark):
    rows = registry.QUERIES["stat_eb_shrinkage"](spark, SF).collect()
    assert rows
    mu = sum(r["rate_raw"] * r["n_users"] for r in rows) / sum(
        r["n_users"] for r in rows
    )
    for r in rows:
        assert 0.0 <= r["rate_shrunk"] <= 1.0
        assert r["prior_strength"] > 0
        # shrunk rate lies between the raw rate and the pooled rate
        lo, hi = sorted((r["rate_raw"], mu))
        assert lo - 0.02 <= r["rate_shrunk"] <= hi + 0.02


def test_phrase_search_exactness(spark):
    rows = registry.QUERIES["tx_phrase_search"](spark, SF).collect()
    assert rows
    hits = {r["doc_id"]: r for r in rows}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    for d in docs:
        toks = [t for t in d["text"].split(" ") if t]
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == "scan" and toks[i + 1] == "key"
        )
        if n:
            assert hits[d["doc_id"]]["n_hits"] == n
        else:
            assert d["doc_id"] not in hits


def test_bottomk_sample_merges_losslessly(spark):
    rows = registry.QUERIES["sketch_bottomk_sample"](spark, SF).collect()
    assert len(rows) == BK_K
    # mergeability: bottom-k of per-half bottom-k's == global bottom-k
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey",
        ((F.col("o_orderkey") * 1000003 + 12345) % 2147483647).alias("pri"),
    )
    halves = []
    for side in (0, 1):
        h = (
            orders.filter(F.col("o_orderkey") % 2 == side)
            .orderBy("pri", "o_orderkey")
            .limit(BK_K)
            .collect()
        )
        halves.extend((r["pri"], r["o_orderkey"]) for r in h)
    merged = sorted(halves)[:BK_K]
    got = sorted((r["pri"], r["o_orderkey"]) for r in rows)
    assert merged == got


def test_incremental_dedup_flags_planted_dup(spark):
    rows = {
        r["verdict"]: r["n_docs"]
        for r in registry.QUERIES["dd_incremental"](spark, SF).collect()
    }
    assert sum(rows.values()) == 50  # 1/10 of 500 docs
    assert rows.get("unique", 0) + rows.get("near_dup", 0) + rows.get(
        "exact_dup", 0
    ) == 50
    # constructed corpus: batch doc 19 is an exact copy of corpus doc 0
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(0)
    probe = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta", "x", "s", 1),
            (10, "totally different words here now ok", "x", "s", 1),
            (19, "alpha beta gamma delta epsilon zeta", "x", "s", 1),
            (29, "unrelated fresh content nothing shared", "x", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        probe.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            r["verdict"]: r["n_docs"]
            for r in registry.QUERIES["dd_incremental"](spark, d).collect()
        }
    # batch = doc_ids 19, 29; 19 is an exact dup, 29 unique
    assert got.get("exact_dup") == 1
    assert got.get("unique") == 1
