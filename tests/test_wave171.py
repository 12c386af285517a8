"""Wave 171 behavior gates (ds_dsir parity is in test_oracle_parity)."""

from __future__ import annotations

import numpy as np

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_dsir_prefers_target_language(spark):
    from mister_spark.catalog import Catalog
    from mister_spark.operators.extras171 import DSIR_K

    rows = registry.QUERIES["ds_dsir"](spark, SF).collect()
    assert len(rows) == DSIR_K
    # importance weights must rank the target (English) slice up
    langs = {
        r["doc_id"]: r["lang"]
        for r in Catalog(spark, SF)["documents"].select("doc_id", "lang").collect()
    }
    en = sum(1 for r in rows if langs[r["doc_id"]] == "en")
    assert en >= DSIR_K // 2, en
    # scores are length-normalized and descending
    ws = [r["logw_per_tok"] for r in rows]
    assert ws == sorted(ws, reverse=True)


def _tf_matrix(spark):
    from mister_spark.catalog import Catalog
    from mister_spark.functions.text import tokens

    from pyspark.sql import functions as F

    tf = (
        Catalog(spark, SF)["documents"]
        .select("doc_id", F.explode(tokens()).alias("w"))
        .groupBy("doc_id", "w")
        .count()
        .collect()
    )
    vocab = sorted({r["w"] for r in tf})
    docs = sorted({r["doc_id"] for r in tf})
    vi = {w: i for i, w in enumerate(vocab)}
    di = {d: i for i, d in enumerate(docs)}
    X = np.zeros((len(docs), len(vocab)))
    for r in tf:
        X[di[r["doc_id"]], vi[r["w"]]] = r["count"]
    return X


def test_semdedup_audit_row(spark):
    from mister_spark.operators.extras171 import SEMDEDUP_TAU

    r = registry.QUERIES["ds_semdedup"](spark, SF).collect()[0]
    X = _tf_matrix(spark)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    iu = np.triu_indices(len(X), 1)
    brute_pairs = int((S[iu] >= SEMDEDUP_TAU - 1e-9).sum())
    assert r["vectors"] == len(X)
    # soundness: within-cluster dups are a subset of true >=tau pairs
    assert 0 < r["dup_pairs"] <= brute_pairs
    # recall: clustering may split a few pairs across clusters, not most
    assert r["dup_pairs"] >= 0.7 * brute_pairs, (r["dup_pairs"], brute_pairs)
    assert r["removed"] <= r["dup_pairs"]
    assert r["kept"] + r["removed"] == r["vectors"]
    # the clustering must actually prune the quadratic pair space
    assert r["pair_space_pruned"] > 0.5
