"""Wave 175 behavior gates (stat_lin_ccc parity is in
test_oracle_parity)."""

from __future__ import annotations

import numpy as np

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_lin_ccc_matches_numpy(spark):
    from mister_spark.catalog import Catalog

    emb = Catalog(spark, SF)["embeddings"].select("embedding").collect()
    x = np.array([float(r["embedding"][0]) for r in emb])
    y = np.array([float(r["embedding"][1]) for r in emb])
    sx, sy = x.var(), y.var()
    sxy = ((x - x.mean()) * (y - y.mean())).mean()
    want = 2 * sxy / (sx + sy + (x.mean() - y.mean()) ** 2)
    r = registry.QUERIES["stat_lin_ccc"](spark, SF).collect()[0]
    assert abs(r["ccc"] - want) < 0.001
    # |ccc| <= |r| always (C_b <= 1)
    assert abs(r["ccc"]) <= abs(r["pearson_r"]) + 1e-9
    assert 0 < r["accuracy_cb"] <= 1.0001


def test_iceberg_mor_delete_contract(spark):
    r = registry.QUERIES["io_iceberg_mor_deletes"](spark, SF).collect()[0]
    # no data file rewritten, counts reconcile exactly
    assert r["data_files_untouched"] == 1
    assert r["counts_reconcile"] == 1
    assert r["deleted_rows"] == r["expected_deleted"] > 0
    # the deleted predicate is fully subtracted at scan time
    assert r["still_matching"] == 0
    # time travel to the pre-delete snapshot still sees every row
    assert r["time_travel_rows"] == r["rows_before"]
    # stacked OVERLAPPING delete: only live rows match the superset
    # predicate, positions never duplicate, and the row arithmetic
    # holds across BOTH deletes
    assert r["deleted_rows_2"] == r["expected_deleted_2"] > 0
    assert r["stacked_counts_reconcile"] == 1
    assert r["dup_delete_pairs"] == 0
