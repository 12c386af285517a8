"""Wave 183 behavior gates: Python DataSource connector contract."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_python_datasource_contract(spark):
    r = registry.QUERIES["io_python_datasource"](spark, SF).collect()[0]
    assert r["total_rows"] == 20_000
    assert r["parts_seen"] == r["parts_declared"] == 8
    # the pushed predicate dropped rows INSIDE the source
    assert r["pushdown_applied"] == 1
    assert r["pushed_rows"] == r["pushed_expected"]
    # the declined predicate stayed a correct residual Spark filter
    assert r["residual_correct"] == 1
    assert r["mixed_rows"] == r["mixed_expected"] > 0


def test_python_datasource_restores_conf(spark):
    key = "spark.sql.python.filterPushdown.enabled"
    before = spark.conf.get(key, None)
    registry.QUERIES["io_python_datasource"](spark, SF).collect()
    assert spark.conf.get(key, None) == before


def test_python_datasink_two_phase_commit(spark):
    r = registry.QUERIES["io_python_datasink"](spark, SF).collect()[0]
    assert r["success_total"] == r["rows_in"] == r["rows_read_back"]
    assert r["committed_files"] == 4
    assert r["tmp_residue"] == 0
    assert r["round_trip_exact"] == 1


def test_python_stream_source_resumes_exactly_once(spark):
    r = registry.QUERIES["stream_python_source"](spark, SF).collect()[0]
    assert r["run1_complete"] == 1 and r["run1_rows"] == 40
    # the restarted query emitted ONLY the delta — offsets recovered
    assert r["run2_delta_only"] == 1 and r["run2_rows"] == 10
    assert r["resume_exactly_once"] == 1
