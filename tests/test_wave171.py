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
    from mister_spark.operators.extras171 import (
        SEMDEDUP_K_MAX,
        SEMDEDUP_K_MIN,
        SEMDEDUP_TAU,
    )

    r = registry.QUERIES["ds_semdedup"](spark, SF).collect()[0]
    X = _tf_matrix(spark)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    iu = np.triu_indices(len(X), 1)
    brute_pairs = int((S[iu] >= SEMDEDUP_TAU - 1e-9).sum())
    assert r["vectors"] == len(X)
    # k grows SUBLINEARLY (ceil(sqrt(n)), capped): the audit reports
    # surviving clusters, which can only be <= the k formula
    k_formula = max(
        SEMDEDUP_K_MIN, min(-(-int(np.ceil(np.sqrt(len(X))))), SEMDEDUP_K_MAX)
    )
    assert SEMDEDUP_K_MIN < r["clusters"] <= k_formula
    # soundness: within-cluster dups are a subset of true >=tau pairs
    # (the kernel cosine is EXACT — sparse 64-bit-token-hash vectors,
    # not the hashed clustering features)
    assert 0 < r["dup_pairs"] <= brute_pairs
    # recall: clustering may split a few pairs across clusters, not most
    assert r["dup_pairs"] >= 0.7 * brute_pairs, (r["dup_pairs"], brute_pairs)
    assert r["removed"] <= r["dup_pairs"]
    assert r["kept"] + r["removed"] == r["vectors"]
    # the clustering must actually prune the quadratic pair space
    assert r["pair_space_pruned"] > 0.5
    # no cluster may dominate the corpus (the GEMM-skew signal)
    assert 0.0 < r["max_cluster_share"] <= 0.6, r["max_cluster_share"]


def test_semdedup_kernel_bisects_oversized_clusters():
    """The pair kernel must cap its GEMM block: clusters above `cap`
    rows are recursively bisected, so compared pairs < full quadratic
    while every found pair is still a true >=tau pair and near-exact
    duplicates sitting in the same half are still found."""
    import pandas as pd

    from mister_spark.operators.extras171 import _semdedup_pair_kernel

    rng = np.random.default_rng(171)
    n, d, cap, tau = 300, 16, 64, 0.95
    base = rng.integers(1, 5, size=(n, d)).astype(float)
    # plant exact duplicates at adjacent ids: (10,11), (200,201)
    base[11] = base[10]
    base[201] = base[200]
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "tids": [np.arange(d, dtype=np.int64)] * n,
            "tvals": list(base),
        }
    )
    out = _semdedup_pair_kernel(pdf, tau, cap)
    compared = int(out.loc[out["cluster_pairs"] >= 0, "cluster_pairs"].sum())
    assert 0 < compared < n * (n - 1) // 2  # bisection pruned the block
    found = {
        (int(r["i"]), int(r["j"]))
        for _, r in out[out["i"] >= 0].iterrows()
    }
    Xn = base / np.linalg.norm(base, axis=1, keepdims=True)
    S = Xn @ Xn.T
    for i, j in found:  # soundness under bisection
        assert S[i, j] >= tau - 1e-9
    # exact duplicates are cosine-identical, so 2-means puts them in
    # the same half every split — they must survive the bisection
    assert (10, 11) in found and (200, 201) in found
    # uncapped run finds a superset of the capped run's pairs
    full = _semdedup_pair_kernel(pdf, tau, n + 1)
    full_found = {
        (int(r["i"]), int(r["j"]))
        for _, r in full[full["i"] >= 0].iterrows()
    }
    assert found <= full_found


def test_semdedup_kernel_cell_cap_bounds_dense_memory(monkeypatch):
    """The kernel must bisect a block whose DENSE local-vocab matrix
    would exceed SEMDEDUP_CELL_CAP cells even when the row count is
    under the GEMM cap — the memory bound is by construction, not by
    hoping clusters have small vocabularies. Planted exact duplicates
    must still be found (identical rows land on the same side of every
    2-means split), and every emitted pair is a true >=tau pair."""
    import pandas as pd

    from mister_spark.operators import extras171
    from mister_spark.operators.extras171 import _semdedup_pair_kernel

    rng = np.random.default_rng(172)
    n, d, tau = 200, 32, 0.95
    base = rng.integers(1, 5, size=(n, d)).astype(float)
    base[51] = base[50]
    # mostly-disjoint vocabularies: row r's token ids live in its own
    # 32-id band, so the union vocab is n*d — the dense-densify trap
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "tids": [np.arange(r * d, (r + 1) * d, dtype=np.int64) for r in range(n)],
            "tvals": list(base),
        }
    )
    pdf.at[51, "tids"] = pdf.at[50, "tids"]  # duplicates share tokens
    # force the cell cap below n * nnz so the guard must bisect
    monkeypatch.setattr(extras171, "SEMDEDUP_CELL_CAP", 64 * n)
    out = _semdedup_pair_kernel(pdf, tau, cap=n + 1)
    compared = int(out.loc[out["cluster_pairs"] >= 0, "cluster_pairs"].sum())
    assert 0 < compared < n * (n - 1) // 2  # the cap pruned the block
    found = {
        (int(r["i"]), int(r["j"])) for _, r in out[out["i"] >= 0].iterrows()
    }
    assert (50, 51) in found
    # soundness: disjoint-vocab rows have cosine 0, so only the
    # planted duplicate pair may ever be emitted
    assert found == {(50, 51)}


def test_semdedup_oracle_parity_on_tiny_corpus(spark, tmp_path):
    """n < SEMDEDUP_K_MIN exercises the clamp corner the review found:
    k clamps UP to K_MIN=8 while only n fine centroids can be seeded,
    so the coarse cell count must derive from the REALIZED centroid
    count in BOTH engines (the oracle once used ceil(sqrt(k)) and
    diverged here). Full Spark-vs-DuckDB compare on a 4-doc corpus,
    duplicates planted."""
    import os

    import duckdb

    import __spark_entry__ as e
    from mister_spark.operators.extras171 import ds_semdedup

    docs = [
        (0, "alpha beta gamma delta epsilon zeta", "en", "s0", 35),
        (1, "alpha beta gamma delta epsilon zeta", "en", "s0", 35),  # dup of 0
        (2, "one two three four five six seven", "en", "s1", 33),
        (3, "completely different tokens here now", "en", "s1", 36),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    got = tuple(ds_semdedup(spark, str(tmp_path)).collect()[0])

    con = duckdb.connect()
    con.execute(
        "create table documents(doc_id bigint, text varchar, lang varchar,"
        " source varchar, n_chars bigint)"
    )
    con.executemany("insert into documents values (?, ?, ?, ?, ?)", docs)
    want = con.execute(e.oracle_sql()["ds_semdedup"]).fetchall()[0]
    assert got == tuple(want), (got, want)
    # the planted duplicate must be found and removed
    assert got[4] == 1 and got[5] == 3  # removed=1, kept=3
