"""Wave 33 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_code_detect_covers_all_docs(spark):
    from mister_spark.catalog import Catalog

    total = Catalog(spark, SF)["documents"].count()
    rows = registry.QUERIES["tx_code_detect"](spark, SF).collect()
    assert len(rows) == total
    for r in rows:
        assert 0.0 <= r["sym_ratio"] <= 1.0
        assert 0.0 <= r["digit_ratio"] <= 1.0
        assert r["is_code"] == (1 if r["sym_ratio"] > 0.05 else 0)


def test_pmi_pairs_symmetry_and_support(spark):
    """Pairs ordered a<b, support respected, PMI consistent with the
    count identity pmi = ln(c_ab·N / (c_a·c_b))."""
    import math

    from mister_spark.operators.extras33 import PMI_MIN_PAIR_DOCS

    rows = registry.QUERIES["tx_pmi_pairs"](spark, SF).collect()
    assert rows
    from mister_spark.catalog import Catalog

    nd = Catalog(spark, SF)["documents"].count()
    for r in rows:
        assert r["tok_a"] < r["tok_b"]
        assert r["c_ab"] >= PMI_MIN_PAIR_DOCS
        assert r["c_ab"] <= min(r["c_a"], r["c_b"])
        want = math.log(r["c_ab"] * nd / (r["c_a"] * r["c_b"]))
        assert abs(r["pmi"] - math.floor(want * 10000 + 0.5) / 10000) <= 1e-9


def test_cramers_v_in_unit_interval(spark):
    row = registry.QUERIES["stat_cramers_v"](spark, SF).collect()[0]
    assert 0.0 <= row["cramers_v"] <= 1.0
    assert row["chi2"] >= 0.0
    assert row["n"] > 0


def test_compaction_is_storage_only(spark):
    """Row counts identical across layouts; file count actually drops
    to the target; compacted bytes not larger than the small layout
    (full row groups compress at least as well)."""
    from pyspark.sql import functions as F

    row = registry.QUERIES["io_small_files_compaction"](spark, SF).collect()[0]
    assert row["files_before"] == 64
    assert row["files_after"] == 4
    assert row["bytes_after"] <= row["bytes_before"]
    from mister_spark.catalog import Catalog

    assert row["n_rows"] == Catalog(spark, SF)["events"].count()
