"""Wave 266 behavior gates beyond oracle parity."""

from __future__ import annotations

from mister_spark import registry
from mister_spark.operators.extras266 import KA_CLASSES, XE_BRANDS

registry.load_all()

SF = "/root/testdata/sf0.01"


def test_krippendorff_alpha_reproduces_reference_formula(spark):
    """Recompute alpha with an independent O(n) python replay of the
    coincidence-matrix definition and compare on the grid."""
    r = registry.QUERIES["ds_krippendorff_alpha"](spark, SF).collect()[0]
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "label"
    ).collect()
    units = {}
    for row in emb:
        vid, lab = int(row["vec_id"]), int(row["label"])
        vals = [lab % KA_CLASSES,
                (lab + (1 if vid % 3 == 0 else 0)) % KA_CLASSES]
        if vid % 7 != 0:
            vals.append((lab + (2 if vid % 5 == 0 else 0)) % KA_CLASSES)
        units[vid] = vals
    import math
    from collections import Counter

    do2 = 0
    n = 0
    marg = Counter()
    for vals in units.values():
        m = len(vals)
        if m < 2:
            continue
        c = Counter(vals)
        agree2 = sum(k * (k - 1) for k in c.values())
        do2 += 2 * (m * (m - 1) - agree2) // (m - 1)
        n += m
        marg.update(vals)
    snc2 = sum(v * v for v in marg.values())
    alpha = 1.0 - ((n - 1) * do2) / (2.0 * (n * n - snc2))
    assert r["n_ratings"] == n
    assert r["n_units"] == len(units)
    assert abs(r["alpha_nominal"] - math.floor(alpha * 1e4 + 0.5) / 1e4) < 1e-9
    # a mostly-agreeing panel must sit well above chance
    assert 0.5 < r["alpha_nominal"] < 1.0


def test_cross_elasticity_matrix_shape(spark):
    rows = registry.QUERIES["ev_cross_elasticity"](spark, SF).collect()
    k = len(XE_BRANDS)
    assert len(rows) == k * (k - 1)
    for r in rows:
        assert r["brand_a"] != r["brand_b"]
        assert r["n_weeks"] > 20
        assert 0.0 <= r["r2"] <= 1.0
