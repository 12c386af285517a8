"""Source/sink roundtrips + partition pruning on written layout."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mister_spark.catalog import Catalog
from mister_spark.plans import formatted_plan
from mister_spark.sources import read, write

TMP = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".tmp", "sources")


def test_csv_roundtrip(spark, sf_dir):
    nation = Catalog(spark, sf_dir)["nation"]
    path = f"{TMP}/nation_csv"
    write(nation, "csv", path)
    back = read(spark, "csv", path, schema="n_nationkey int, n_name string, n_regionkey int")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_json_roundtrip(spark, sf_dir):
    region = Catalog(spark, sf_dir)["region"]
    path = f"{TMP}/region_json"
    write(region, "json", path)
    back = read(spark, "json", path, schema="r_regionkey int, r_name string")
    assert sorted(map(tuple, back.select("r_regionkey", "r_name").collect())) == sorted(
        map(tuple, region.collect())
    )


def test_partitioned_parquet_prunes(spark, sf_dir):
    orders = Catalog(spark, sf_dir)["orders"]
    path = f"{TMP}/orders_by_priority"
    write(orders, "parquet", path, partition_by=["o_orderpriority"])
    back = read(spark, "parquet", path).filter(F.col("o_orderpriority") == "1-URGENT")
    want = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert back.count() == want
    # partition pruning: the scan must touch only the matching partition
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan
    assert "o_orderpriority" in plan.split("PartitionFilters", 1)[1][:200]


def test_sorted_write_roundtrip(spark, sf_dir):
    li = Catalog(spark, sf_dir)["lineitem"].select("l_orderkey", "l_shipdate", "l_quantity")
    path = f"{TMP}/lineitem_sorted"
    write(li, "parquet", path, sort_by=["l_shipdate"])
    back = read(spark, "parquet", path)
    assert back.count() == li.count()


def test_orc_roundtrip(spark, sf_dir):
    supplier = Catalog(spark, sf_dir)["supplier"]
    path = f"{TMP}/supplier_orc"
    write(supplier, "orc", path)
    back = read(spark, "orc", path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, supplier.collect()))


def test_orc_partitioned_prunes(spark, sf_dir):
    orders = Catalog(spark, sf_dir)["orders"]
    path = f"{TMP}/orders_orc_by_status"
    write(orders, "orc", path, partition_by=["o_orderstatus"])
    back = read(spark, "orc", path).filter(F.col("o_orderstatus") == "F")
    assert back.count() == orders.filter(F.col("o_orderstatus") == "F").count()
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters", 1)[1][:200]


def test_text_roundtrip(spark, sf_dir):
    docs = Catalog(spark, sf_dir)["documents"].select("text")
    path = f"{TMP}/docs_text"
    write(docs, "text", path)
    back = read(spark, "text", path)
    # line-oriented: one row per line, content preserved (docs are single-line)
    assert sorted(r["value"] for r in back.collect()) == sorted(
        r["text"] for r in docs.collect()
    )


def test_compaction(spark, sf_dir):
    import glob

    from mister_spark.sources import compact

    nation = Catalog(spark, sf_dir)["nation"]
    path = f"{TMP}/nation_fragmented"
    nation.repartition(50).write.mode("overwrite").parquet(path)
    assert len(glob.glob(f"{path}/part-*")) > 10  # genuinely fragmented
    n = compact(spark, path, target_mb=128)
    assert n == 1
    assert len(glob.glob(f"{path}/part-*")) == 1
    back = spark.read.parquet(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_zorder_clusters_both_columns(spark):
    """Z-ordered files must keep BOTH key columns partially clustered,
    beating a single-column sort on the secondary column."""
    import glob

    from mister_spark.sources import write_zordered

    sf = "/root/testdata/sf0.01"  # enough rows for 8 meaningful files
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    path = f"{TMP}/lineitem_zorder"
    write_zordered(li, path, "l_partkey", "l_suppkey", n_files=8)

    g = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).collect()[0]
    tot_p, tot_s = g[1] - g[0], g[3] - g[2]
    files = glob.glob(f"{path}/part-*")
    assert len(files) == 8
    sp_p, sp_s = [], []
    for f in files:
        r = (
            spark.read.parquet(f)
            .agg(
                F.min("l_partkey"),
                F.max("l_partkey"),
                F.min("l_suppkey"),
                F.max("l_suppkey"),
            )
            .collect()[0]
        )
        sp_p.append((r[1] - r[0]) / tot_p)
        sp_s.append((r[3] - r[2]) / tot_s)
    # measured ≈0.36 / 0.57; generous margins against sampling variance
    assert sum(sp_p) / len(sp_p) < 0.8
    assert sum(sp_s) / len(sp_s) < 0.8
    # data intact
    back = spark.read.parquet(path)
    assert back.count() == li.count()


def test_avro_round_trip_via_python_fallback(spark, sf_dir):
    """Without the spark-avro jar the avro surface falls back to the
    pure-Python object-container DataSource: write one container per
    task (two-phase commit, _SUCCESS), read one partition per file,
    rows identical."""
    nation = Catalog(spark, sf_dir)["nation"]
    dest = f"{TMP}/nation_avro"
    write(nation, "avro", dest)
    assert os.path.exists(os.path.join(dest, "_SUCCESS"))
    files = [f for f in os.listdir(dest) if f.endswith(".avro")]
    assert files and not any(f.startswith("_tmp_") for f in files)
    back = read(spark, "avro", dest)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, nation.collect())
    )
    # overwrite replaces, never appends
    write(nation, "avro", dest)
    assert read(spark, "avro", dest).count() == nation.count()


def test_avro_fallback_handles_arrays_and_parallel_read(spark, sf_dir):
    emb = Catalog(spark, sf_dir)["embeddings"].repartition(4)
    dest = f"{TMP}/emb_avro"
    write(emb, "avro", dest)
    # one container per non-empty task partition -> parallel read plan
    files = [f for f in os.listdir(dest) if f.endswith(".avro")]
    assert len(files) >= 2
    back = read(spark, "avro", dest)
    a = {r["vec_id"]: r["embedding"] for r in back.collect()}
    b = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    assert set(a) == set(b)
    k = next(iter(a))
    assert a[k] == pytest.approx(b[k])
    # the embedded writer schema drives inference: array<float> survives
    assert dict(back.dtypes)["embedding"] == "array<float>"


def test_avro_fallback_only_on_connector_absent():
    """The pure-Python fallback must engage ONLY when the spark-avro
    jar is missing; a genuine JVM-path failure (corrupt file, schema
    mismatch, permissions) is re-raised so the root cause isn't masked
    by an unrelated secondary error from the fallback."""
    from mister_spark.sources.io import _avro_connector_absent

    # connector-absent shapes (Spark 3.x and 4.x messages)
    assert _avro_connector_absent(
        Exception("[DATA_SOURCE_NOT_FOUND] Failed to find the data source: avro.")
    )
    assert _avro_connector_absent(
        Exception("Failed to find data source: avro. Avro is built-in...")
    )
    assert _avro_connector_absent(
        Exception("java.lang.ClassNotFoundException: avro.DefaultSource")
    )
    # genuine failures with the jar present must re-raise
    assert not _avro_connector_absent(
        Exception("org.apache.avro.InvalidAvroMagicException: Not an Avro data file")
    )
    assert not _avro_connector_absent(
        Exception("Incompatible schema: field n_name not found")
    )
    assert not _avro_connector_absent(
        Exception("java.io.IOException: Permission denied")
    )
