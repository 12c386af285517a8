"""Gate: the committed scaling artifact must show near-linear growth.

BENCH_scaling.json (written by `python bench.py --scaling`) records the
scale-representative paths at every available SF plus their log-log
slope over the two largest SFs. Near-linear means slope <= 1.25 (1.0 =
perfectly linear; sublinear is expected while Spark's fixed per-query
overhead dominates at these SFs; super-linear past ~1.25 is the
signature of a quadratic candidate explosion or a single-task sort).
No-Spark test — it audits the committed artifact.
"""

from __future__ import annotations

import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(ROOT, "BENCH_scaling.json")

SLOPE_CEILING = 1.25


def _load():
    if not os.path.exists(ARTIFACT):
        pytest.skip("BENCH_scaling.json not generated yet")
    with open(ARTIFACT) as f:
        return json.load(f)


def test_scaling_artifact_has_two_sfs_per_query():
    doc = _load()
    assert len(doc["_meta"]["sfs"]) >= 2
    for name, rec in doc["queries"].items():
        assert len(rec["times_sec"]) >= 2, name


# Absolute-cost gate (round-11 verdict item 3): the slope gate passed
# linear-but-49-second paths silently, so any path whose sf1 time
# exceeds this budget fails unless it carries a dated, justified
# exception below. Exceptions are a worklist, not a pardon — each must
# name the irreducible cost.
SF1_BUDGET_SEC = 30.0
SF1_BUDGET_EXCEPTIONS: dict[str, str] = {}


def test_scaling_absolute_sf1_budget():
    doc = _load()
    over = {
        name: rec["times_sec"]["sf1"]
        for name, rec in doc["queries"].items()
        if rec["times_sec"].get("sf1", 0.0) > SF1_BUDGET_SEC
        and name not in SF1_BUDGET_EXCEPTIONS
    }
    assert not over, (
        f"sf1 time over the {SF1_BUDGET_SEC:.0f}s budget (fix the plan or "
        f"add a justified exception): {over}"
    )


def test_scaling_slopes_near_linear():
    doc = _load()
    bad = {
        name: rec["loglog_slope_top2"]
        for name, rec in doc["queries"].items()
        if rec["loglog_slope_top2"] > SLOPE_CEILING
    }
    assert not bad, f"super-linear time-vs-SF growth: {bad}"


def test_scaling_covers_the_verdict_paths():
    doc = _load()
    for name in (
        "dd_minhash_lsh",
        "dd_clusters",
        "sim_ivf",
        "ds_curate",
        "stat_kruskal_wallis",
        "ev_concurrency",
        # round-4/6 verdict adds: semantic dedup + the iterative
        # driver-model ops where super-linearity hides
        "ds_semdedup",
        "tx_topic_nmf",
        "ds_quality_classifier",
        # round-7 verdict item 6: the remaining dedup/similarity
        # family members — the 100 TB-critical paths
        "dd_tfidf_cosine",
        "dd_containment",
        "dd_simhash",
        "sim_bm25",
        "sim_pq",
        # round-8: the distributed label-spreading rewrite
        "ml_label_spreading",
        # waves 197-204: new ops with a non-trivial base-table stage
        "graph_squares",
        "ml_lof",
        "stat_ransac",
        "ml_multinomial_nb",
        "ml_cox_ph",
        # waves 205-207
        "ml_sinkhorn_ot",
        "graph_wl_refinement",
        "io_xml_query",
        # waves 210-217: new ops with a non-trivial base-table stage
        "tx_watermark_detect",
        "stat_jonckheere_terpstra",
        "stat_storey_qvalue",
        "stat_brunner_munzel",
        "graph_config_triangles",
        "graph_scc_bowtie",
        "ds_facility_location",
        # waves 228-239: new ops with a non-trivial base-table stage
        "tx_bleu_pairs",
        "ds_knn_shapley",
        "tx_homoglyph_audit",
        "fin_chain_ladder",
        "ml_oof_stacking",
        "sketch_hll_error_curve",
        "tx_ppmi_svd_embedding",
    ):
        assert name in doc["queries"], name
