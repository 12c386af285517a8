"""Wave 30 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_hard_negatives_differ_in_label(spark):
    """Every mined negative must carry a label different from its
    query's, and per query exactly HARD_NEG_K ranked survivors."""
    from pyspark.sql import functions as F

    from mister_spark.catalog import Catalog
    from mister_spark.operators.extras30 import HARD_NEG_K

    labels = {
        r["vec_id"]: r["label"]
        for r in Catalog(spark, SF)["embeddings"].select("vec_id", "label").collect()
    }
    rows = registry.QUERIES["sim_hard_negatives"](spark, SF).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        assert labels[r["vec_id"]] != labels[r["q_id"]]
        per_q.setdefault(r["q_id"], []).append(r["rn"])
    assert per_q
    for q, rns in per_q.items():
        assert sorted(rns) == list(range(1, HARD_NEG_K + 1)), q


def test_temperature_mix_flattens_head(spark):
    """α < 1 compresses the mixture: wherever counts differ, the bigger
    source's temp share must be closer to the smaller's than the raw
    shares are (and on the uniform driver testdata, shares are equal);
    shares sum to ~1 and quotas respect the budget. A synthetic skewed
    frame proves the flattening direction regardless of testdata."""
    from mister_spark.operators.extras30 import MIX_ALPHA, MIX_BUDGET

    rows = registry.QUERIES["ds_temperature_mix"](spark, SF).collect()
    assert len(rows) > 1
    rows.sort(key=lambda r: r["n_docs"])
    lo, hi = rows[0], rows[-1]
    if hi["n_docs"] > lo["n_docs"]:
        assert hi["temp_share"] < hi["raw_share"]
        assert lo["temp_share"] > lo["raw_share"]
    else:  # uniform counts → α is a no-op on shares
        assert hi["temp_share"] == hi["raw_share"]
    assert abs(sum(r["raw_share"] for r in rows) - 1.0) < 1e-2
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-2
    assert sum(r["sampled_docs"] for r in rows) <= MIX_BUDGET
    # direction proof on a skewed distribution: 80/15/5 at alpha=0.7
    n = [800.0, 150.0, 50.0]
    w = [x**MIX_ALPHA for x in n]
    raw = [x / sum(n) for x in n]
    temp = [x / sum(w) for x in w]
    assert temp[0] < raw[0] and temp[-1] > raw[-1]


def test_activity_concentration_is_monotone(spark):
    """Concentration curve sanity: shares increase with pct, top-1%
    share ≥ 1% (a whale curve is never below uniform), all in (0, 1]."""
    rows = {
        r["pct"]: r for r in registry.QUERIES["ev_activity_concentration"](spark, SF).collect()
    }
    assert set(rows) == {0.01, 0.1, 0.5}
    assert 0 < rows[0.01]["events_share"] <= rows[0.1]["events_share"] <= rows[0.5]["events_share"] <= 1.0
    assert rows[0.01]["events_share"] >= 0.01
    assert rows[0.5]["n_top_users"] >= rows[0.1]["n_top_users"] >= rows[0.01]["n_top_users"] >= 1
