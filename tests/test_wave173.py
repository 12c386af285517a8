"""Wave 173 behavior gates (ds_perplexity_filter parity is in
test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_perplexity_filter_report(spark):
    rows = registry.QUERIES["ds_perplexity_filter"](spark, SF).collect()
    assert len(rows) == 20  # one row per source
    total_flagged = sum(r["flagged"] for r in rows)
    total_docs = sum(r["docs"] for r in rows)
    # the relative gate flags a real but minority tail
    assert 0 < total_flagged < 0.2 * total_docs
    for r in rows:
        assert 0 <= r["flagged"] <= r["docs"]
        assert 0.0 <= r["flagged_share"] <= 1.0
        assert r["avg_nll_per_tok"] > 0


def test_nmf_vocab_cap_is_model_sized():
    """W's driver footprint is bounded by an explicit constant, not by
    the corpus vocabulary (the 100x-scale contract)."""
    from mister_spark.operators.extras173 import NMF_K, NMF_VOCAB_CAP

    assert NMF_VOCAB_CAP * NMF_K <= 1 << 20  # O(model), never O(data)


def test_nmf_topics(spark):
    from mister_spark.operators.extras173 import NMF_K

    rows = registry.QUERIES["tx_topic_nmf"](spark, SF).collect()
    assert len(rows) == NMF_K
    # masses form a distribution and no topic collapsed
    masses = [r["mass_share"] for r in rows]
    assert abs(sum(masses) - 1.0) < 0.01
    assert all(m > 0.05 for m in masses)
    # top words are distinct within each topic
    for r in rows:
        tops = {r["top_word_1"], r["top_word_2"], r["top_word_3"]}
        assert len(tops) == 3


def test_nmf_reduces_reconstruction_error(spark):
    """Multiplicative updates must not increase squared error: compare
    a 1-iteration run against the shipped {it}-iteration run via a
    numpy replay of the same deterministic algorithm."""
    import numpy as np

    from pyspark.sql import functions as F

    from mister_spark.catalog import Catalog
    from mister_spark.functions.text import tokens
    from mister_spark.operators.extras173 import NMF_ITERS, NMF_K

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
    V = np.zeros((len(docs), len(vocab)))
    for r in tf:
        V[di[r["doc_id"]], vi[r["w"]]] = r["count"]
    k = NMF_K
    W = np.array(
        [
            [1.0 + 0.1 * ((wi * 7 + j * 3) % 5) for j in range(k)]
            for wi in range(len(vocab))
        ]
    )
    H = np.array(
        [
            [1.0 + 0.1 * ((d * 5 + j * 7) % 4) for j in range(k)]
            for d in docs
        ]
    )
    eps = 1e-9
    errs = [np.linalg.norm(V - H @ W.T)]
    for _ in range(NMF_ITERS):
        H = H * (V @ W) / (H @ (W.T @ W) + eps)
        W = W * (V.T @ H) / (W @ (H.T @ H) + eps)
        errs.append(np.linalg.norm(V - H @ W.T))
    assert all(b <= a + 1e-6 for a, b in zip(errs, errs[1:])), errs
    # replayed top words match the Spark op's output
    got = {
        r["topic"]: (r["top_word_1"], r["top_word_2"], r["top_word_3"])
        for r in registry.QUERIES["tx_topic_nmf"](spark, SF).collect()
    }
    for j in range(k):
        order = sorted(range(len(vocab)), key=lambda wi: (-W[wi, j], wi))[:3]
        want = tuple(vocab[i] for i in order)
        # float summation order differs between engines; the leader
        # must match and at least 2 of the top-3 must agree
        assert got[j][0] == want[0], (j, got[j], want)
        assert len(set(got[j]) & set(want)) >= 2, (j, got[j], want)
