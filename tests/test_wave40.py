"""Wave 40 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

import numpy as np

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_lift_table_shape_and_monotone_gain(spark):
    """10 deciles covering the whole population; cumulative gain is
    nondecreasing and ends at 1; decile sizes differ by at most 1."""
    import duckdb

    rows = sorted(
        registry.QUERIES["ml_lift_table"](spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    total = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/embeddings.parquet'"
    ).fetchone()[0]
    assert sum(r["n"] for r in rows) == total
    assert max(r["n"] for r in rows) - min(r["n"] for r in rows) <= 1
    gains = [r["cum_gain"] for r in rows]
    assert all(a <= b for a, b in zip(gains, gains[1:]))
    assert gains[-1] == 1.0


def test_pvm_identity(spark):
    """volume_effect + rate_effect reproduces delta up to the two
    independent cent roundings (≤ 2 cents)."""
    rows = registry.QUERIES["ev_pvm_decomposition"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r["volume_effect"] + r["rate_effect"] - r["delta"]) <= 0.02


def test_mmr_matches_numpy_replay(spark):
    """The distributed shortlist + driver greedy must equal a pure
    numpy replay of Carbonell–Goldstein MMR from the raw parquet."""
    import duckdb

    from mister_spark.operators.extras40 import MMR_K, MMR_LAMBDA, MMR_SHORTLIST

    raw = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in raw])
    X = np.array([r[1] for r in raw], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    q = X[ids == 0][0]
    mask = ids != 0
    ids, X = ids[mask], X[mask]
    rel = X @ q
    order = np.lexsort((ids, -rel))[:MMR_SHORTLIST]
    ids, X, rel = ids[order], X[order], rel[order]
    sims = X @ X.T
    chosen, remaining = [], list(range(len(ids)))
    expect = []
    for rank in range(1, MMR_K + 1):
        best_i, best_s = None, None
        for i in remaining:
            pen = max(sims[i][j] for j in chosen) if chosen else 0.0
            s = MMR_LAMBDA * rel[i] - (1 - MMR_LAMBDA) * pen
            if best_s is None or s > best_s or (s == best_s and ids[i] < ids[best_i]):
                best_i, best_s = i, s
        chosen.append(best_i)
        remaining.remove(best_i)
        expect.append((rank, int(ids[best_i])))
    got = [
        (r["rank"], r["vec_id"])
        for r in sorted(
            registry.QUERIES["sim_mmr"](spark, SF).collect(),
            key=lambda r: r["rank"],
        )
    ]
    assert got == expect


def test_mmr_is_diverse_vs_plain_topk(spark):
    """MMR must deviate from plain top-k relevance order OR (if the
    shortlist is already diverse) at minimum produce nonincreasing
    mmr scores with penalty applied after rank 1."""
    rows = sorted(
        registry.QUERIES["sim_mmr"](spark, SF).collect(), key=lambda r: r["rank"]
    )
    assert rows[0]["mmr_score"] <= rows[0]["relevance"] + 1e-9
    for r in rows[1:]:
        assert r["mmr_score"] <= r["relevance"] * 0.7 + 1e-4 + 0.3


def test_lsh_eval_precision_one_recall_high(spark):
    """Both sides verify exact Jaccard, so precision is exactly 1;
    recall on this corpus' near-dup pairs must clear the 0.9 gate the
    pytest recall test uses."""
    r = registry.QUERIES["dd_lsh_eval"](spark, SF).collect()[0]
    assert r["n_exact_pairs"] > 0
    assert r["precision"] == 1.0
    assert r["recall"] >= 0.9
    assert r["missed"] == r["n_exact_pairs"] - r["true_positives"]
