"""The driver-facing bench output contract, pinned.

BENCH_r07.json came back parsed:null because the detailed JSON line
grew past the driver's 2000-char stdout tail capture. The contract
since round 8: the FINAL stdout line is a compact `bench_summary`
object that always fits the tail, carrying the two gating numbers
(value, baseline_subset_total) plus the host-speed canary. This test
runs the real bench main() on a trimmed query set at sf0.001 and
fails if the last line ever stops being small, parseable, and
complete — the exact failure mode that blinded the round-7 gate.
"""

from __future__ import annotations

import contextlib
import io
import json


def test_bench_final_line_is_compact_summary(spark, tmp_path):
    import bench

    saved_headline, saved_subset = bench.HEADLINE, bench.BASELINE_SUBSET
    saved_env = dict(__import__("os").environ)
    try:
        bench.HEADLINE = ["q1_pricing_summary", "mr_wordcount"]
        bench.BASELINE_SUBSET = ["q1_pricing_summary", "mr_wordcount"]
        __import__("os").environ["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
        # keep the trimmed run's detail file OUT of the committed
        # full-run artifact (this test used to clobber it)
        __import__("os").environ["SPARK_GRAFT_DETAIL_PATH"] = str(
            tmp_path / "BENCH_detail.json"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench.main()
    finally:
        bench.HEADLINE, bench.BASELINE_SUBSET = saved_headline, saved_subset
        __import__("os").environ.clear()
        __import__("os").environ.update(saved_env)
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    last = lines[-1]
    # must survive a 2000-char tail capture whole; summary_line() drops
    # the per-query dict rather than overflow (guard tested below)
    assert len(last) <= 1950, len(last)
    doc = json.loads(last)
    assert doc["metric"] == "bench_summary"
    # round-11 verdict item 9: the summary line the driver parses now
    # carries the per-query medians (2-decimal) when they fit
    assert set(doc["queries"]) == {"q1_pricing_summary", "mr_wordcount"}
    for field in (
        "value",
        "baseline_subset_total",
        "canary_sec",
        "subset_over_canary",
        "n_queries",
        "sf",
    ):
        assert field in doc, field
    assert doc["value"] > 0 and doc["baseline_subset_total"] > 0
    assert doc["canary_sec"] > 0
    # the detailed line still prints above it with the per-query map
    detailed = json.loads(lines[-2])
    assert detailed["metric"] == "headline_queries_total_time"
    assert set(detailed["queries"]) == {"q1_pricing_summary", "mr_wordcount"}
    assert detailed["value"] == doc["value"]
    # per-query medians must sit LAST in the detail line (so the
    # driver's tail keeps them) and land whole in the detail artifact
    assert list(detailed)[-1] == "queries"
    on_disk = json.loads((tmp_path / "BENCH_detail.json").read_text())
    assert on_disk["queries"] == detailed["queries"]
    # the big canary ships alongside the r08-pinned small one
    assert doc["canary_big_sec"] > doc["canary_sec"]


def test_summary_line_drops_queries_rather_than_overflow():
    """The driver keeps only the last 2000 stdout chars; an overlong
    final line is unparseable from the tail (round-7 blindness). The
    per-query dict is additive best-effort: at the real 68-query set it
    fits; with an absurd set it must be dropped, never truncated."""
    import bench

    base = {
        "metric": "bench_summary",
        "value": 1.0,
        "unit": "sec",
        "n_queries": 68,
        "baseline_subset_total": 1.0,
        "canary_sec": 0.2,
        "subset_over_canary": 5.0,
        "canary_big_sec": 1.6,
        "subset_over_canary_big": 0.6,
        "detail": "BENCH_detail.json",
        "sf": 0.1,
    }
    small = {f"q{i}": 0.123 for i in range(68)}
    line = bench.summary_line(base, small)
    assert len(line) <= 1950
    assert set(json.loads(line)["queries"]) == set(small)
    huge = {f"very_long_query_name_number_{i:04d}": 1.234 for i in range(200)}
    line = bench.summary_line(base, huge)
    assert len(line) <= 1950
    doc = json.loads(line)
    assert doc["metric"] == "bench_summary" and "queries" not in doc
