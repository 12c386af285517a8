"""Wave 69 behavior gates (oracle parity is in test_oracle_parity)."""

from __future__ import annotations

from mister_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_decontam_13gram_flags_planted_copy(spark):
    rows = registry.QUERIES["ds_decontam_13gram"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_13grams"] > 0
        assert 0 <= r["n_flagged"] <= r["n_docs"]
    # planted: a training doc copies 13+ tokens from a benchmark doc
    words = [f"w{i}" for i in range(20)]
    bench_text = " ".join(words)
    copy_text = " ".join(words[:14]) + " extra tail tokens here"
    clean_text = " ".join(f"z{i}" for i in range(20))
    probe = spark.createDataFrame(
        [
            (0, bench_text, "x", "s", 1),  # doc 0 -> benchmark (0 % 97 == 0)
            (1, copy_text, "x", "s", 1),
            (2, clean_text, "x", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        probe.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = registry.QUERIES["ds_decontam_13gram"](spark, d).collect()
    assert len(got) == 1
    assert got[0]["n_docs"] == 2
    assert got[0]["n_flagged"] == 1  # the copier, not the clean doc


def test_two_hop_reach_bounds(spark):
    rows = registry.QUERIES["graph_two_hop_reach"](spark, SF).collect()
    assert rows
    reaches = [r["reach2"] for r in rows]
    assert sorted(reaches, reverse=True) == reaches
    for r in rows:
        assert r["degree"] >= 1
        assert r["reach2"] >= 1


def test_dynamic_overwrite_preserves_partitions(spark):
    rows = {
        r["o_orderstatus"]: r
        for r in registry.QUERIES["io_dynamic_partition_overwrite"](
            spark, SF
        ).collect()
    }
    assert set(rows) == {"F", "O", "P"}
    for st, r in rows.items():
        if st == "F":
            assert r["rewritten"] == 1
            assert r["n_after"] < r["n_before"]  # replaced by half subset
        else:
            assert r["rewritten"] == 0
            assert r["n_after"] == r["n_before"]  # untouched


def test_survival_ci_brackets_curve(spark):
    rows = registry.QUERIES["ev_survival_ci"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ci_lo"] <= r["survival"] <= r["ci_hi"] <= 1.0
