"""Wave 98 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_sql_udf_inlines(spark):
    rows = registry.QUERIES["sql_sql_udf"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n"] > 0
        assert r["charged"] > 0
        assert 0 <= r["deep_discounted"] <= r["n"]
    # the SQL UDF must inline: no Python eval node in the plan
    plan = registry.QUERIES["sql_sql_udf"](
        spark, SF
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_mediation_decomposition(spark):
    r = registry.QUERIES["stat_mediation_sobel"](spark, SF).collect()[0]
    # total = direct + indirect (a*b); a is tiny and b is large, so
    # compare at the scale of the rounded outputs
    indirect = r["a"] * r["b"]
    assert abs(r["c_total"] - (r["c_direct"] + indirect)) < max(
        0.05, abs(r["b"]) * 1e-6 * 2
    )
    # and prop_mediated must agree with the same decomposition
    assert abs(indirect / r["c_total"] - r["prop_mediated"]) < 0.05
    assert 0.0 <= abs(r["prop_mediated"]) <= 5.0
    assert r["sobel_z"] == r["sobel_z"]  # not NaN


def test_cochran_armitage_null(spark):
    r = registry.QUERIES["stat_cochran_armitage"](spark, SF).collect()[0]
    assert r["trend_var"] > 0
    # priority is assigned independently of status in the synthetic
    # data: no real dose-response, z must stay modest
    assert abs(r["z"]) < 3.5
