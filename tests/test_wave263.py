"""Wave 263 behavior gates beyond oracle parity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mister_spark import registry
from mister_spark.operators.extras263 import HUB_K, PANEL_K, THETA_K

registry.load_all()

SF = "/root/testdata/sf0.01"


def test_prefix_dup_pairs_are_real_prefixes(spark):
    rows = registry.QUERIES["dd_prefix_dup"](spark, SF).collect()
    assert len(rows) > 0  # the generator plants truncation dups
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    for r in rows:
        short, wit = docs[r["doc_id"]], docs[r["witness_doc"]]
        assert wit.startswith(short), (r["doc_id"], r["witness_doc"])
        assert r["doc_chars"] == len(short)
        assert r["exact_dup"] == int(short == wit)
    # completeness: every doc that is a prefix of ANY other doc is out
    ids = sorted(docs)
    expected = set()
    for i in ids:
        for j in ids:
            if i != j and docs[j].startswith(docs[i]):
                expected.add(i)
                break
    assert {r["doc_id"] for r in rows} == expected


def test_theta_estimates_track_exact(spark):
    rows = registry.QUERIES["sketch_theta_setops"](spark, SF).collect()
    assert len(rows) == 3
    tol = 5.0 / math.sqrt(THETA_K - 2)  # generous multiple of 1/sqrt(K-2)
    for r in rows:
        for est, ex in (
            ("est_a", "exact_a"),
            ("est_b", "exact_b"),
            ("est_union", "exact_union"),
            ("est_inter", "exact_inter"),
        ):
            if r[ex] == 0:
                continue
            rel = abs(r[est] - r[ex]) / r[ex]
            assert rel <= tol, (r["type_a"], r["type_b"], est, r[est], r[ex])
        # exact-mode sets must be estimated exactly
        if r["exact_a"] < THETA_K:
            assert r["est_a"] == float(r["exact_a"])
        # set algebra sanity on the exact side
        assert (
            r["exact_inter"]
            == r["exact_a"] + r["exact_b"] - r["exact_union"]
        )


def test_intrinsic_dim_in_ambient_range(spark):
    r = registry.QUERIES["emb_intrinsic_dim"](spark, SF).collect()[0]
    assert 0 < r["n_queries"] <= PANEL_K
    # a 64-dim synthetic embedding space: the estimate must be
    # positive and cannot exceed a loose multiple of the ambient dim
    assert 0.5 < r["intrinsic_dim"] < 64 * 2
    assert r["sum_log_mu"] > 0


def test_hubness_moment_accounting(spark):
    r = registry.QUERIES["emb_hubness"](spark, SF).collect()[0]
    assert r["k"] == HUB_K and r["n_queries"] == PANEL_K
    assert 0 < r["n_retrieved"] <= r["n_corpus"]
    assert 1 <= r["max_occ"] <= PANEL_K
    assert 0.0 <= r["antihub_share"] < 1.0
    # zero-inclusive skew must reproduce from an explicit occurrence
    # histogram computed independently here
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_corpus = emb.count()
    assert r["n_corpus"] == n_corpus
