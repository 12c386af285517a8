"""Wave 253 behavior gates beyond the registry oracle parity.

Flesch counts on hand-written sentences, Hurst sanity on the synthetic
series (estimates within the meaningful band, all types fitted), and
Mood's median invariants (above+below reconcile, chi2 >= 0, the grand
median actually splits the pooled values ~evenly).
"""

from __future__ import annotations

import os

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_flesch_hand_computed(spark, tmp_path):
    from mister_spark.operators.extras253 import tx_flesch

    docs = [
        # 4 words, 2 sentences, syllables: the=1 cat=1 sat=1 down=1 -> 4
        (1, "The cat sat. Down!"),
        # 'beautiful' -> eau+i+u = 3 vowel groups; 'sky' -> floor 1
        (2, "beautiful sky"),
    ]
    base = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "documents.parquet"))
    out = {r["doc_id"]: r for r in tx_flesch(spark, base).collect()}
    assert out[1]["n_words"] == 4
    assert out[1]["n_sentences"] == 2
    assert out[1]["n_syllables"] == 4
    assert out[2]["n_words"] == 2
    assert out[2]["n_sentences"] == 1
    assert out[2]["n_syllables"] == 4  # 3 + 1 floor
    # closed form check for doc 1: 206.835 - 1.015*2 - 84.6*1
    assert abs(out[1]["flesch_ease"] - (206.835 - 2.03 - 84.6)) < 1e-3


def test_hurst_band_and_coverage(spark):
    rows = registry.QUERIES["ev_hurst"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # sf0.001 spans ~1 month of days, so only the small dyadic
        # sizes produce complete blocks there; sf0.01+ fits all 4
        assert r["n_block_sizes"] >= 2
        # R/S estimates live in (0, 1.2) for any real series; the
        # synthetic Poisson-ish counts should sit near 0.5
        assert 0.0 < r["hurst"] < 1.2, (r["event_type"], r["hurst"])


def test_moods_median_reconciles(spark):
    rows = registry.QUERIES["stat_moods_median"](spark, SF).collect()
    assert len(rows) == 5
    chi2 = rows[0]["chi2"]
    assert all(r["chi2"] == chi2 for r in rows) and chi2 >= 0
    above = sum(r["above"] for r in rows)
    below = sum(r["below"] for r in rows)
    # the exact median splits the pool: at-or-below covers >= half,
    # above strictly less than half
    assert below >= above
    assert above >= 0.4 * (above + below)
