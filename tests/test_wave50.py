"""Wave 50 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_span_corruption_rates(spark):
    rows = registry.QUERIES["ds_span_corruption"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        # arithmetic mask targets ~15%; allow sampling slack per source
        assert 0.08 <= r["mask_rate"] <= 0.22
        assert r["n_spans"] <= r["n_masked"] <= r["n_tokens"]
        assert r["avg_span_len"] >= 1.0


def test_bpe_fertility_bounds(spark):
    from mister_spark.operators.bpe import bpe_encode_word, bpe_train

    rows = registry.QUERIES["ds_bpe_fertility"](spark, SF).collect()
    assert len(rows) == 5  # one per language
    for r in rows:
        assert r["fertility"] >= 1.0
        assert r["chars_per_token"] >= 1.0
    # merges must strictly beat char-level tokenization: fertility
    # under the learned merges < average word length
    merges = [(l, r_) for l, r_, _ in bpe_train(spark, SF)]
    assert len(merges) == 10
    # the first learned merge pair must collapse to a single piece
    first = merges[0][0] + merges[0][1]
    assert bpe_encode_word(first, merges) == [first]


def test_label_noise_flags_consistent(spark):
    rows = registry.QUERIES["ml_label_noise"](spark, SF).collect()
    assert rows  # synthetic labels vs near-uniform vectors => flags exist
    for r in rows:
        assert r["n_own"] <= 2
        assert r["majority_label"] != r["label"]
        assert r["n_majority"] >= r["n_own"]
        assert r["n_majority"] <= 10


def test_lsh_sweep_monotone(spark):
    rows = {
        (r["bands"], r["rows_per_band"]): r
        for r in registry.QUERIES["dd_lsh_param_sweep"](spark, SF).collect()
    }
    assert set(rows) == {(8, 2), (4, 4), (2, 8)}
    # stricter bands (more rows per band) => higher threshold, fewer
    # collisions
    t = [rows[(8, 2)], rows[(4, 4)], rows[(2, 8)]]
    assert (
        t[0]["s50_threshold"] < t[1]["s50_threshold"] < t[2]["s50_threshold"]
    )
    assert t[0]["n_collisions"] >= t[1]["n_collisions"] >= t[2]["n_collisions"]
