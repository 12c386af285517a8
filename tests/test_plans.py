"""Plan-shape tests: the scale guarantees, pinned.

These fail when a refactor silently breaks pushdown, broadcasts, or adds
shuffles — the regressions that don't change sf0.01 results but melt a
1000-executor run.
"""

from __future__ import annotations

from mister_spark import registry
from mister_spark.plans import (
    count_shuffles,
    has_broadcast_join,
    physical_plan,
    pushed_filters,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_q1_pushes_shipdate_filter(spark):
    df = registry.QUERIES["q1_pricing_summary"](spark, SF)
    pf = " ".join(pushed_filters(df))
    assert "l_shipdate" in pf, pf


def test_q6_pushes_all_predicates(spark):
    df = registry.QUERIES["q6_forecast_revenue"](spark, SF)
    pf = " ".join(pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pf, (col, pf)


def test_q6_reads_only_needed_columns(spark):
    df = registry.QUERIES["q6_forecast_revenue"](spark, SF)
    plan = physical_plan(df)
    scan_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_extendedprice" in scan_schema
    assert "l_orderkey" not in scan_schema  # pruned
    assert "l_returnflag" not in scan_schema  # pruned


def test_q5_broadcasts_dims(spark):
    df = registry.QUERIES["q5_local_supplier"](spark, SF)
    assert has_broadcast_join(df)


def test_q14_broadcasts_part(spark):
    df = registry.QUERIES["q14_promo_revenue"](spark, SF)
    assert has_broadcast_join(df)


def test_mr_filter_pushdown(spark):
    df = registry.QUERIES["mr_filter"](spark, SF)
    pf = " ".join(pushed_filters(df))
    assert "l_quantity" in pf and "l_discount" in pf


def test_groupby_single_shuffle(spark):
    df = registry.QUERIES["mr_reduce_by_key"](spark, SF)
    assert count_shuffles(df) == 1


def test_sessionize_single_shuffle(spark):
    # lag + cumsum + final agg must reuse ONE user_id exchange
    df = registry.QUERIES["ev_sessionize"](spark, SF)
    assert count_shuffles(df) == 1, physical_plan(df)


def test_asof_single_shuffle(spark):
    df = registry.QUERIES["ev_asof_join"](spark, SF)
    assert count_shuffles(df) == 1, physical_plan(df)


def test_range_join_is_equijoin(spark):
    # banded range join must be a hash join on the bucket, not a
    # nested-loop inequality join
    df = registry.QUERIES["ev_range_join"](spark, SF)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoopJoin", "", 0), plan[:0] or True
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_sim_queries_broadcast_query_side(spark):
    df = registry.QUERIES["sim_topk_join"](spark, SF)
    assert "BroadcastNestedLoopJoin" in physical_plan(df) or has_broadcast_join(df)


def test_tfidf_broadcasts_df_table(spark):
    df = registry.QUERIES["tx_tfidf"](spark, SF)
    assert has_broadcast_join(df)


def test_contamination_broadcasts_bench_set(spark):
    df = registry.QUERIES["ds_contamination"](spark, SF)
    assert has_broadcast_join(df)


def test_gap_fill_broadcasts_grid(spark):
    df = registry.QUERIES["ev_gap_fill"](spark, SF)
    assert has_broadcast_join(df)


def test_freq_items_sketch_verify_equals_exact(spark):
    """The r11 conversion's two contracts: (a) the raw freqItems
    candidate list is a SUPERSET of the strict heavy hitters (the
    sketch guarantee), and (b) the verified op output EQUALS the
    exact strict-heavy-hitter set with exact counts."""
    from pyspark.sql import functions as F

    from mister_spark.catalog import Catalog

    ev = Catalog(spark, SF)["events"]
    total = ev.count()
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * 10 > total)
        .collect()
    }
    raw = set(
        ev.stat.freqItems(["event_type"], support=0.1).collect()[0][
            "event_type_freqItems"
        ]
    )
    assert set(exact) <= raw, (exact, raw)
    got = {
        r["item"]: r["cnt"]
        for r in registry.QUERIES["stat_freq_items"](spark, SF).collect()
    }
    assert got == exact, (got, exact)


def test_single_shuffle_ops(spark):
    """Ops whose scale story is 'ONE shuffle' must keep planning one."""
    for name in (
        "ds_pack",
        "ds_global_shuffle",
        "mr_secondary_sort",
        "ev_heatmap",
        "agg_unpivot",
        "w_rolling_range",
        "stat_regression",
        "tx_inverted_index",
        "ds_length_buckets",
        "w_percent_rank",
        "sql_portable",
        # wave 7/8: twin-window OHLC groups on the raw window key,
        # interleave pre-partitions on shard so both windows share one
        # exchange (subset rule), interval merge shares one user_id
        # exchange across two windows + two aggregations
        "ev_ohlc_resample",
        "ds_interleave",
        "ev_interval_merge",
    ):
        df = registry.QUERIES[name](spark, SF)
        assert count_shuffles(df) == 1, (name, physical_plan(df))


def test_runtime_bloom_filter_injection(spark):
    """The runtime bloom-filter path (session.py enables it) must fire
    once its preconditions hold. Locally it is gated by
    applicationSideScanSizeThreshold (default 10 GB — the right
    production default; a 100 TB fact scan clears it trivially), so
    this test lowers ONLY that gate and a broadcast gate, and asserts
    Spark injects a bloom_filter_agg build on the selective side and a
    might_contain probe into the fact scan side."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        sf = SF
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        o = spark.read.parquet(f"{sf}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = physical_plan(j)
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert "might_contain" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_shared_subtree_shuffle_ceilings(spark):
    """Ops whose shared intermediates are checkpointed must keep their
    exchange counts at the post-fix level — a regression here means a
    plan branch is replaying a data-sized derivation (the round-2
    census caught graph_common_neighbors at 17 exchanges because every
    branch re-ran the 4-table edge join)."""
    ceilings = {
        "graph_common_neighbors": 5,
        "graph_triangles": 5,
        "ev_user_overlap": 3,
        "ev_concurrency": 2,
        "ev_survival": 2,
        "tx_bigram_nll": 3,
        "tx_keyphrase": 5,
        "ev_active_users": 4,
        "stat_chi2": 3,
        "set_ops": 4,
        # round-3 retrofits + wave 28 (post-localCheckpoint stage counts)
        "ev_linear_interp": 1,
        "emb_quantize_int8": 0,
        "stat_weighted_median": 2,
        "mm_shard_manifest": 2,
        "ev_rfm": 3,
        "ev_rfm_approx": 0,
        "stat_ks_test": 3,
        "stat_mannwhitney": 3,
        "stat_gini": 5,
        "stat_spearman": 4,
        "tx_zipf": 1,
        "tx_vocab_growth": 2,
        # waves 29-31
        "sq_not_in_null_trap": 1,
        "ev_rolling_slope": 2,
        "tx_source_vocab_overlap": 3,
        "io_zone_map_prune": 0,
        "sim_hard_negatives": 1,
        "ds_temperature_mix": 2,
        "ev_activity_concentration": 4,
        "ml_auc": 2,
        "ev_drawdown": 2,
        "dd_tfidf_cosine": 4,
        # waves 32-34
        "j_asof_tolerance": 1,
        "ml_calibration_bins": 1,
        "ev_uptime_sla": 1,
        "tx_code_detect": 0,
        "tx_pmi_pairs": 4,
        "stat_cramers_v": 3,
        "ev_session_stats": 1,
        "ev_alert_throttle": 1,
        "w_rows_vs_range": 1,
        # waves 35-36 (io_cache_reuse / ds_pipeline_e2e exchanges are
        # over 5-row cached frames and 1-row stage counters)
        "sql_pandas_udf": 1,
        "ds_passage_chunk": 0,
        "io_cache_reuse": 6,
        "ds_quality_filter_funnel": 2,
        "ds_pipeline_e2e": 9,
        # waves 38-39 (kendall/theil-sen/psi counts are post-
        # localCheckpoint stage counts over collapsed frames)
        "stat_kendall_tau": 0,
        "stat_theil_sen": 1,
        "ml_pr_auc": 2,
        "ev_fsm_match": 1,
        "ds_user_split": 2,
        "ds_pack_efficiency": 1,
        "ml_psi_drift": 2,
        "tx_simpson_diversity": 2,
        "ds_temperature_mix": 2,
        # wave 40
        "ml_lift_table": 4,
        "ev_pvm_decomposition": 1,
        # wave 41 (js/assortativity are post-localCheckpoint counts)
        "stat_runs_test": 1,
        "ml_feature_screen": 1,
        "tx_js_divergence": 3,
        "graph_assortativity": 2,
        # wave 42
        "ml_ndcg": 3,
        "ev_mix_drift": 2,
        "tx_term_burstiness": 2,
        "ev_seasonal_decompose": 1,
        # wave 44 (threshold tuning is a post-localCheckpoint count)
        "stat_wilson_ci": 1,
        "ml_threshold_tuning": 0,
        "w_rolling_corr": 1,
        # wave 45 (fisher's 2nd exchange is the chunk repartition of
        # the exploded hypergeometric support, never data-sized rows)
        "stat_fisher_exact": 3,
        "stat_bh_fdr": 1,
        "stat_durbin_watson": 2,
        "stat_partial_corr": 1,
        # wave 46 (burrows/kmv are post-localCheckpoint counts; kmv's
        # 8 exchanges all move <=2k-row sketch frames)
        "tx_char_entropy": 3,
        "tx_oov_rate": 2,
        "tx_burrows_delta": 3,
        "sketch_kmv_setops": 8,
        # wave 47 (components is the post-iteration count — per-round
        # exchanges are materialized by localCheckpoint; jaccard's 5
        # include the wedge join + model-sized degree broadcasts)
        "graph_copurchase": 5,
        "graph_components": 1,
        "graph_jaccard_neighbors": 5,
        "graph_reciprocity": 2,
        # wave 48 (zorder is a post-localCheckpoint count; column
        # stats' 4 = one expand-shuffle per exact-NDV branch)
        "io_zorder_layout": 2,
        "io_column_stats": 4,
        "io_partition_skew_audit": 1,
        # wave 49 (pacf is post-collect assembly; cusum's 2nd exchange
        # is the day-grid window, calendar-bounded)
        "ev_cusum_detect": 2,
        "ev_did": 1,
        "ev_acceleration": 1,
        "stat_pacf": 0,
        # wave 50 (fertility/noise/sweep are post-train / post-
        # localCheckpoint counts)
        "ds_span_corruption": 2,
        "ds_bpe_fertility": 2,
        "ml_label_noise": 4,
        "dd_lsh_param_sweep": 3,
        # waves 51-52 (bm25's 5 = postings build + df rollup + query
        # join + top-k window + avgdl rollup, all bounded by vocab or
        # candidate counts; the resampling ops are 1-shuffle by design)
        "sim_bm25": 5,
        "ml_mrr": 1,
        "tx_compression_ratio": 2,
        "ml_bootstrap_ci": 1,
        "ml_ab_srm": 1,
        "stat_bayes_ab": 2,
        "stat_permutation_test": 1,
        "ml_bradley_terry": 1,
        # wave 53 (bloom's 7 = trigram dedup + bench/eval distinct +
        # bit-set rollup + doc/source rollups, all vocab- or
        # doc-bounded; hits is a post-localCheckpoint count)
        "sketch_bloom_contamination": 7,
        "graph_hits": 0,
        "ml_lag_features": 2,
        "io_corrupt_records": 1,
        # wave 54
        "ml_target_encoding": 3,
        "ml_hashing_trick": 2,
        "ml_cohens_kappa": 2,
        "stat_breusch_pagan": 2,
        # wave 55 (reweight/sssp/granger are post-localCheckpoint or
        # broadcast-grid counts; isotonic is the 50-bin rollup)
        "stat_granger": 1,
        "ds_domain_reweight": 1,
        "ml_isotonic_calibration": 1,
        "graph_sssp_weighted": 0,
        # wave 56 (att/hurst are post-localCheckpoint counts; purity's
        # 5 move 10-seed-scored slim rows and label cells)
        "ev_stratified_att": 0,
        "stat_hurst": 1,
        "ml_cluster_purity": 5,
        "ev_adstock": 1,
        # wave 57
        "ev_cuped": 1,
        "ml_ipw_estimate": 1,
        "tx_hapax_rate": 2,
        # wave 58 (drift's 6 move (dim, bin) cells — 640 rows max;
        # phash moves slim (chunk, key) rows, never payload bytes)
        "stat_tost_equivalence": 0,
        "ml_feature_drift_screen": 6,
        "mm_phash_dedup": 2,
        "ml_embedding_whitening": 1,
        # wave 59
        "ev_bass_diffusion": 2,
        "stat_overdispersion": 1,
        "ml_recall_at_k": 3,
        # wave 60
        "stat_circular_hour": 1,
        "ev_littles_law": 1,
        "tx_mattr": 3,
        "io_parquet_footer_audit": 1,
        # wave 61 (diagnostics/auc are post-localCheckpoint counts)
        "mr_job_chain": 2,
        "stat_regression_diagnostics": 1,
        "ml_sprt_sequential": 1,
        "ml_macro_auc": 2,
        # wave 62 (shrinkage is a post-localCheckpoint count; bottom-k
        # plans TakeOrdered — zero exchanges by design)
        "stat_eb_shrinkage": 1,
        "tx_phrase_search": 1,
        "sketch_bottomk_sample": 0,
        "dd_incremental": 5,
        # wave 63
        "io_pseudonymize": 1,
        "stat_mcnemar": 0,
        "ml_platt_scaling": 1,
        "ml_absorbing_markov": 1,
        # wave 64 (agreement's 5 move 8-query shortlists post-checkpoint)
        "ev_interrupted_ts": 2,
        "ds_k_anonymity": 2,
        "stat_cronbach_alpha": 0,
        "ml_ranker_agreement": 5,
        # wave 65
        "ml_ensemble_vote": 0,
        "ev_price_elasticity": 0,
        "ds_temporal_split": 4,
        # wave 66 (weibull's 5 move user-gap lags + 20-bin frames)
        "ev_macd": 1,
        "stat_weibull_fit": 5,
        # wave 67
        "mr_broadcast_side_input": 1,
        "ev_shapley_attribution": 1,
        "dd_pair_explain": 1,
        "io_metadata_count": 0,
        # wave 68 (bandit's 5 move (day, arm) cells — calendar-bounded)
        "tx_rouge_l": 1,
        "ml_bandit_replay": 5,
        "ev_segment_migration": 1,
        # wave 69 (reach's 5 move capped-basket edges post-checkpoint)
        "ds_decontam_13gram": 3,
        "graph_two_hop_reach": 5,
        "ev_survival_ci": 1,
        # wave 70
        "ml_bootstrap_diff_ci": 1,
        "ml_conformal_interval": 1,
        # wave 71 (anova's 7 are 4 rollups + 3 single-row branch unions
        # over the checkpointed input; outliers move (source, dim) cells)
        "graph_eigencentrality": 0,
        "stat_two_way_anova": 7,
        "tx_canary_detect": 1,
        "tx_semantic_outliers": 4,
        # wave 72 (haar/bland are post-localCheckpoint counts)
        "ev_haar_energy": 1,
        "ds_uncertainty_sample": 0,
        "stat_bland_altman": 1,
        # wave 73
        "ml_adaboost_stumps": 1,
        "sql_parameterized": 1,
        "ml_feature_shapley": 1,
        # wave 74
        "ml_roc_hull": 1,
        "ev_synthetic_control": 0,
        # wave 75
        "stat_regression_discontinuity": 1,
        "ev_capacity_plan": 1,
        # wave 76 (lpa's 5 move node-label cells post-checkpoint)
        "sketch_moments_merge": 0,
        "ml_error_slices": 1,
        "graph_label_propagation": 5,
        "ds_lineage_manifest": 1,
        # wave 77
        "ml_borda_fusion": 1,
        "stat_deming_regression": 0,
        "ml_fairness_audit": 1,
        # wave 78
        "stat_mann_kendall": 1,
        "ev_markov_attribution": 1,
        "sql_try_cast": 0,
        # wave 79
        "ev_growth_accounting": 1,
        "ml_ks_discrimination": 1,
        # wave 80 (rich-club's 6 move degree/club cells post-checkpoint)
        "graph_rich_club": 6,
        # wave 81
        "sketch_linear_counting": 2,
        "stat_ljung_box": 1,
        # wave 82
        "stat_control_chart": 1,
        "ds_masked_aggregation": 1,
        "stat_pairwise_posthoc": 1,
    }
    for name, ceil in ceilings.items():
        if name == "io_cache_reuse":
            # ceiling was pinned against a cold cache; a warm
            # InMemoryRelation left by earlier tests prints its child
            # plan's exchanges once per branch, inflating the count
            spark.catalog.clearCache()
        df = registry.QUERIES[name](spark, SF)
        got = count_shuffles(df)
        assert got <= ceil, (name, got, ceil)


def test_global_rank_exact_and_no_single_task_sort(spark):
    """functions/ranks.global_rank must equal the window row_number
    exactly AND never plan an unpartitioned data-sized window (the
    single-task-sort scale killer it exists to remove)."""
    from pyspark.sql import Window as W, functions as F

    from mister_spark.functions.ranks import global_rank

    df = spark.range(50000).select((F.col("id") * 48271 % 49999).alias("k"), "id")
    got = global_rank(df, "k", "id")
    want = df.select(
        "k", "id", F.row_number().over(W.orderBy("k", "id")).alias("rk")
    )
    assert got.select("k", "id", "rk").exceptAll(want).count() == 0
    assert want.exceptAll(got.select("k", "id", "rk")).count() == 0
    # the only unpartitioned window is over the #partitions-row size
    # frame (offsets); the data-sized path is rangepartitioned
    plan = physical_plan(got)
    assert "rangepartitioning" in plan, plan


def test_bucketed_cumsum_exact_and_partitioned(spark):
    """functions/ranks.bucketed_cumsum must equal SUM() OVER (ORDER BY)
    exactly AND run its data-sized window partitioned by the broadcast
    range bucket, never as one global sorted task."""
    from pyspark.sql import Window as W, functions as F

    from mister_spark.functions.ranks import bucketed_cumsum

    df = (
        spark.range(20000)
        .select(
            ((F.col("id") * 2654435761) % 1000003).alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        .groupBy("k")
        .agg(F.sum("v").alias("v"))
    )
    got = bucketed_cumsum(df, "k", {"cs": F.col("v")})
    want = df.select(
        "k",
        "v",
        F.sum("v")
        .over(W.orderBy("k").rowsBetween(W.unboundedPreceding, 0))
        .alias("cs"),
    )
    assert got.select("k", "v", "cs").exceptAll(want).count() == 0
    assert want.exceptAll(got.select("k", "v", "cs")).count() == 0
    assert "hashpartitioning(_b" in physical_plan(got)


def test_ntile_from_rank_matches_ntile(spark):
    """functions/ranks.ntile_from_rank must reproduce SQL NTILE(k)
    exactly for n below, at, and above multiples of k."""
    from pyspark.sql import Window as W, functions as F

    from mister_spark.functions.ranks import ntile_from_rank

    for n in (1, 4, 5, 23, 1000):
        df = spark.range(n).withColumn("rk", F.col("id") + 1)
        got = df.select(
            "id",
            ntile_from_rank(
                F.col("rk"), F.lit(n).cast("bigint"), 5
            ).alias("t"),
        )
        want = df.select(
            "id", F.ntile(5).over(W.orderBy("id")).cast("bigint").alias("t")
        )
        assert got.exceptAll(want).count() == 0, n
        assert want.exceptAll(got).count() == 0, n


def test_retrofits_have_no_single_task_sort(spark):
    """The 7 ops the round-2 verdict flagged as correct-but-scale-weak
    (data-sized frames ranked through an unpartitioned window) must now
    show their two-phase form in the final plan stage: rangepartitioning
    for global_rank users, a bucket-partitioned window for
    bucketed_cumsum users, and the local-prune filter for tx_zipf (its
    only unpartitioned window orders ≤ ZIPF_TOP·#partitions rows)."""
    markers = {
        "stat_gini": "rangepartitioning",
        "stat_spearman": "rangepartitioning",
        "ev_rfm": "rangepartitioning",
        "stat_ks_test": "hashpartitioning(_b",
        "stat_mannwhitney": "hashpartitioning(_b",
        "tx_vocab_growth": "hashpartitioning(_b",
        "tx_zipf": "_local",
    }
    for name, marker in markers.items():
        plan = physical_plan(registry.QUERIES[name](spark, SF))
        assert marker in plan, (name, marker)


def test_wave83plus_two_phase_plans(spark):
    """New rank/prefix consumers added in waves 83-90 must carry the
    same two-phase markers: rangepartitioning for global_rank users,
    a bucket-partitioned window for bucketed_cumsum users."""
    markers = {
        "stat_kruskal_wallis": "hashpartitioning(_b",
        "ml_rrf_fusion": "rangepartitioning",
        # its global_rank stage is materialized behind bucketed_cumsum's
        # localCheckpoint; the visible two-phase marker is the bucketed
        # prefix-sum window
        "ds_token_budget_trim": "hashpartitioning(_b",
        "ml_auc_delong_ci": "rangepartitioning",
        "stat_dist_fit_compare": "hashpartitioning(_b",
        "stat_dkw_band": "hashpartitioning(_b",
        "stat_cvm": "hashpartitioning(_b",
    }
    for name, marker in markers.items():
        plan = physical_plan(registry.QUERIES[name](spark, SF))
        assert marker in plan, (name, marker)


def test_late_wave_plan_pins(spark):
    """Waves 118-168, pinned (generated by tools/gen_plan_ceilings.py):
    per key, (max shuffles, max unpartitioned windows) in the final
    physical plan at sf0.001. The window numbers were audited key by
    key: every nonzero entry rides a BOUNDED frame (|vocab|, |days|,
    k interim looks, or the |distinct values| collapse feeding
    global_rank/bucketed_cumsum two-phase machinery — see each op's
    docstring), never a data-sized stream. A refactor that adds an
    exchange or a new single-task window fails the pin."""
    from mister_spark.plans import count_unpartitioned_windows

    pins = {
        # wave 118
        "sql_from_csv_roundtrip": (1, 0),
        "stat_group_sequential": (1, 1),
        "stat_maxstat_cutpoint": (0, 0),
        # wave 119
        "ev_rolling_origin_cv": (0, 0),
        "graph_functional_cycles": (0, 0),
        "tx_intra_doc_drift": (5, 0),
        # wave 120
        "ds_corpus_health_scorecard": (0, 0),
        "ml_gbm_stumps": (0, 0),
        "sql_try_math": (0, 0),
        # wave 121
        "dd_boundary_overlap": (1, 0),
        "graph_core_decomposition": (10, 0),
        "io_partition_advisor": (0, 0),
        # wave 122
        "sql_identifier_clause": (2, 0),
        "stat_wilcoxon_signed_rank": (6, 2),
        "tx_ngram_coverage": (2, 1),
        # wave 123
        "io_encoding_audit": (0, 0),
        "ml_covariate_shift_weights": (0, 0),
        "stat_mantel_haenszel": (1, 0),
        # wave 124
        "graph_link_prediction_eval": (0, 0),
        "sketch_frequent_directions": (0, 0),
        "tx_vocab_stability": (1, 2),
        # wave 125
        "ds_quality_length_mi": (3, 0),
        "ev_erlang_c": (0, 0),
        "io_nested_pruning": (0, 0),
        # wave 126
        "ev_catalog_turnover": (0, 0),
        "ml_c2st": (0, 0),
        "stat_ratio_metric_se": (1, 0),
        # wave 127
        "graph_tie_strength": (6, 0),
        "io_retention_plan": (0, 0),
        "stat_simpson_scan": (0, 0),
        # wave 128
        "ds_loo_ablation_plan": (2, 0),
        "mr_partition_balance": (2, 0),
        "stat_meta_analysis": (0, 0),
        # wave 129
        "dd_minhash_error_curve": (0, 0),
        # now returns a LAZY metrics frame (round-8 distributed
        # rewrite): fin join + final agg = 2 shuffles
        "ml_label_spreading": (2, 0),
        "stat_prediction_interval": (0, 0),
        # wave 130
        "ev_sequential_patterns": (3, 0),
        "stat_fisher_combined": (4, 0),
        "tx_degenerate_docs": (0, 0),
        # wave 131
        "ev_velocity_rule": (3, 0),
        "ml_woe_iv": (0, 0),
        "tx_source_similarity": (1, 0),
        # wave 132
        "ds_review_sample": (1, 0),
        "io_scan_cost_model": (0, 0),
        "stat_iv_wald": (0, 0),
        # wave 133
        "ml_label_model": (0, 0),
        "sql_map_ops": (2, 0),
        "stat_control_variates": (0, 0),
        # wave 134
        "ds_rebalance_plan": (0, 0),
        "ml_embedding_isotropy": (0, 0),
        "stat_variance_components": (1, 0),
        # wave 135
        "ev_ab_duration_plan": (1, 0),
        "graph_edge_turnover": (0, 0),
        "ml_recsys_coverage": (0, 0),
        # wave 136
        "ev_stream_health": (3, 0),
        "io_commit_protocol_audit": (0, 0),
        "ml_cka": (0, 0),
        # wave 137
        "graph_clique_heuristic": (0, 0),
        "io_determinism_audit": (0, 0),
        "stat_growth_slopes": (1, 0),
        # wave 138
        "ds_pack_boundary_waste": (1, 0),
        "stat_bic_bayes_factor": (0, 0),
        # wave 139
        "ds_randomized_response": (0, 0),
        "sql_skyline_2d": (1, 1),
        # wave 140
        "ml_rbo_topk": (0, 0),
        "stat_holm_correction": (0, 2),
        # wave 141
        "ev_time_in_state": (1, 0),
        "ml_importance_weighted_eval": (0, 0),
        # wave 142
        "ev_markov_eval": (2, 0),
        "graph_small_world": (0, 0),
        # wave 143
        "io_cache_storage_audit": (0, 0),
        "sql_regexp_suite": (0, 0),
        # wave 144
        "mr_partition_strategies": (0, 0),
        "sql_datetime_suite": (1, 0),
        # wave 145
        # round-9 portable-HLL conversion made the advisor LAZY: the
        # melt registers + non-null counts + role fold are 3 grouped
        # exchanges, window-free
        "io_column_type_advisor": (3, 0),
        "stat_records_test": (0, 1),
        # wave 146
        "ds_backfill_manifest": (1, 0),
        "stat_pot_gpd": (2, 1),
        # wave 147
        "ev_first_session_retention": (5, 0),
        "tx_coding_efficiency": (2, 0),
        # wave 148
        "graph_percolation_curve": (0, 0),
        "sql_explode_outer": (0, 0),
        # wave 149
        "graph_edge_surprise": (2, 0),
        "stat_multinomial_ci": (2, 0),
        # wave 150
        "ev_quantile_forecast_eval": (0, 0),
        "stat_pit_check": (2, 1),
        # wave 151
        "io_clustered_write_audit": (0, 0),
        "ml_quantization_sweep": (0, 0),
        "stat_kendall_w": (3, 1),
        # wave 152
        "ds_neyman_allocation": (2, 0),
        "graph_neighbor_degree_curve": (4, 0),
        # wave 153
        "ev_forecastability": (0, 0),
        # round-10 distributed rewrite: LAZY now — global_rank
        # (repartitionByRange + sizes agg) + counts/final aggs = 6
        # exchanges; both unpartitioned windows ride model-sized
        # frames (|groups|-row offsets, |partitions|-row rank sizes)
        "ml_fair_thresholds": (6, 2),
        # wave 154
        "ev_revenue_hhi": (2, 0),
        "sql_range_surface": (1, 0),
        # wave 155
        "ev_staffing_schedule": (1, 0),
        "stat_median_ci": (6, 3),
        # wave 156
        "sql_group_by_all": (1, 0),
        "stat_prop_diff_ci": (0, 0),
        # wave 157
        "graph_conductance": (3, 0),
        "io_write_modes": (0, 0),
        # wave 158
        "ev_payback_period": (3, 1),
        "tx_trending_terms": (2, 0),
        # wave 159
        "dd_soft_dedup": (1, 0),
        "tx_heaps_law": (3, 0),
        # wave 160
        "j_interval_union": (1, 0),
        "stat_jarque_bera": (1, 0),
        # wave 161
        "ev_changepoint_binseg": (2, 1),
        "stat_winsorized_mean": (4, 2),
        # wave 162
        "ev_stickiness": (5, 0),
        "stat_chauvenet": (2, 0),
        # wave 163
        "ds_abc_xyz": (8, 1),
        "ds_newsvendor": (4, 1),
        # wave 164
        "ds_eoq": (2, 0),
        "ds_safety_stock": (1, 0),
        # wave 165
        "fin_discount_depth": (1, 0),
        "fin_price_index": (2, 0),
        # wave 166
        "tx_kneser_ney": (7, 0),
        "tx_next_word": (4, 0),
        # wave 167
        "ds_vendor_scorecard": (1, 0),
        "fin_pvm_bridge": (4, 0),
        # wave 168
        "j_skew_aqe": (0, 0),
    }
    for name, (sh_ceil, uw_ceil) in pins.items():
        df = registry.QUERIES[name](spark, SF)
        sh = count_shuffles(df)
        uw = count_unpartitioned_windows(df)
        assert sh <= sh_ceil, (name, "shuffles", sh, sh_ceil)
        assert uw <= uw_ceil, (name, "unpartitioned windows", uw, uw_ceil)


def test_round4_wave_plan_pins(spark):
    """Waves 169-176 pins, same contract as test_late_wave_plan_pins.
    ev_msprt's two unpartitioned ordered windows ride the 20-row look
    frame (bounded by construction, see its docstring); every other
    key is unpartitioned-window-free after the shared LM-count /
    day-frame subtrees were localCheckpointed (tx_jm_interpolation
    15 -> 7 exchanges, ds_perplexity_filter 12 -> 8,
    ev_trading_day_adjust 7 -> 4, stat_hodges_lehmann 4 -> 2)."""
    from mister_spark.plans import count_unpartitioned_windows

    pins = {
        # wave 169
        "io_iceberg_roundtrip": (0, 0),
        "stat_hodges_lehmann": (2, 0),
        # wave 170
        "graph_betweenness_sampled": (1, 0),
        "j_allen_relations": (3, 0),
        # wave 171
        "ds_dsir": (3, 0),
        "ds_semdedup": (0, 0),
        # wave 172
        "ev_msprt": (1, 2),
        "io_iceberg_expire": (0, 0),
        # wave 173
        "ds_perplexity_filter": (8, 0),
        "tx_topic_nmf": (0, 0),
        # wave 174
        "ev_croston": (2, 0),
        "tx_jm_interpolation": (7, 0),
        # wave 175
        "io_iceberg_mor_deletes": (0, 0),
        "stat_lin_ccc": (0, 0),
        # wave 176
        "ev_trading_day_adjust": (4, 0),
        "stat_cochran_q": (1, 0),
        # wave 177
        "ev_nrr": (2, 0),
        "stat_wilks_manova": (1, 0),
        # wave 178
        "ds_quality_classifier": (0, 0),
        # wave 179
        "stat_icc": (1, 0),
        "stat_page_trend": (1, 0),
        # wave 181 (wave 180's stream_cdc_merge executes eagerly and
        # returns an audit frame; streaming plans are gated in
        # tests/test_streaming.py, not here)
        "io_iceberg_schema_evolution": (0, 0),
        # wave 182
        "ev_hts_reconcile": (4, 0),
        # wave 183 (all three return eagerly-computed audit frames)
        "io_python_datasource": (0, 0),
        "io_python_datasink": (0, 0),
        "stream_python_source": (0, 0),
        # wave 184
        "ml_hbos_outliers": (4, 0),
        "sql_pipe_syntax": (2, 0),
        # wave 185
        "stat_capture_recapture": (3, 0),
        "stat_zip_fit": (2, 0),
        # wave 186: stat_wasserstein_1d / stat_energy_distance are
        # deliberately OMITTED — they return eagerly-computed one-row
        # frames, so a (0, 0) pin would assert on the trivial result
        # frame and never see the real distributed work (the bucketed
        # windows / broadcast pair joins run inside internal collect()
        # calls); a vacuous pin reads as coverage it isn't.
        "tx_ngram_novelty": (3, 0),
        # wave 187 (the unpartitioned windows are bounded carries:
        # global_rank's partition-count offsets cumulation and
        # bucketed_cumsum's 64-row totals frame; stat_hoeffding_d's 7
        # exchanges all live on the 550-cell value grid)
        "stat_ansari_bradley": (2, 1),
        "stat_hoeffding_d": (7, 0),
        "stat_mood_median": (0, 0),
        # wave 188 (isotonic's 4 exchanges all live on the 50-point
        # quantity grid)
        "graph_harmonic_centrality": (3, 0),
        "ml_isotonic_regression": (4, 0),
        # wave 189 (cucconi's unpartitioned window is bucketed_cumsum's
        # 64-row totals carry; the kNN eval's 4 exchanges are the LSH
        # edge machinery + vote groupBy, all partitioned)
        "ml_knn_lsh_eval": (4, 0),
        "stat_cucconi": (3, 1),
        # wave 190 (both end on checkpointed model-sized frames: the
        # 1-row threshold frame / the calendar-bounded day frame)
        "stat_arch_lm": (0, 0),
        "stat_tail_dependence": (0, 0),
    }
    for name, (sh_ceil, uw_ceil) in pins.items():
        df = registry.QUERIES[name](spark, SF)
        sh = count_shuffles(df)
        uw = count_unpartitioned_windows(df)
        assert sh <= sh_ceil, (name, "shuffles", sh, sh_ceil)
        assert uw <= uw_ceil, (name, "unpartitioned windows", uw, uw_ceil)


def test_label_spreading_knn_is_distributed(spark):
    """ml_label_spreading's kNN graph must stay distributed (round-7
    verdict item 2): the edge frame is lazy LSH-bucketed work (3
    shuffles: sig join, bucket applyInPandas, pair dedup+window — all
    partitioned), and the op source contains NO .collect() at all —
    the round-7 version collected the whole embeddings table to the
    driver and built a dense n x n numpy kNN, which OOMs at 100 TB."""
    import inspect

    from mister_spark.operators import extras129, extras151
    from mister_spark.plans import count_unpartitioned_windows

    edges = extras129._ls_knn_edges(spark, SF)
    assert count_shuffles(edges) <= 3, physical_plan(edges)
    assert count_unpartitioned_windows(edges) == 0, physical_plan(edges)
    final = registry.QUERIES["ml_label_spreading"](spark, SF)
    assert count_shuffles(final) <= 2
    for fn in (extras129._ls_knn_edges, extras129.ml_label_spreading):
        src = inspect.getsource(fn)
        assert ".collect()" not in src, fn.__name__
    # ml_quantization_sweep keeps only O(1) collects (probe vector,
    # max-abs scalar, per-bit top-10, one 1-row agg) — the full-table
    # `rows = emb.collect()` pattern must not come back
    src = inspect.getsource(extras151.ml_quantization_sweep)
    assert "emb.collect" not in src
    assert src.count(".collect()") <= 4, src.count(".collect()")


def test_wave_199_205_ops_stay_distributed(spark):
    """Scale pins for the round-8 wave ops with a real base-table
    stage: ml_lof must ride the LSH kNN edge frame with no collect
    anywhere (its LOF algebra is three hash joins + two groupBys);
    graph_squares' wedge enumeration must be a partitioned equi-join
    on the customer key, never a nested-loop product; ml_sinkhorn_ot
    may collect nothing — its per-round scaling state stays in
    (localCheckpoint-ed) codebook frames."""
    import inspect

    from mister_spark.operators import extras199, extras201, extras205

    for fn in (extras199.ml_lof, extras205.ml_sinkhorn_ot):
        src = inspect.getsource(fn)
        assert ".collect()" not in src, fn.__name__
        assert ".toPandas()" not in src, fn.__name__
    sq = registry.QUERIES["graph_squares"](spark, SF)
    plan = physical_plan(sq)
    # the c-keyed wedge self-join is the only big join: it must be a
    # real equi-join; the 1-row stat frames may broadcast-nested-loop
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    lof = registry.QUERIES["ml_lof"](spark, SF)
    # TakeOrdered cut, not a global Sort+Limit through one task
    assert "TakeOrderedAndProject" in physical_plan(lof), physical_plan(lof)


def test_wave_211_217_plan_pins(spark):
    """Waves 211-217 pins, same contract as test_late_wave_plan_pins.
    The unpartitioned windows are all documented model-sized carries:
    ev_pettitt_test's running U_t and argmax on the calendar-bounded
    day frame, stat_storey_qvalue's rank/cummin sweep on the 25-brand
    frame, stat_brunner_munzel's cumulative-count windows on the $500
    value grid. graph_scc_bowtie's 7 exchanges are the flow groupBy
    plus the doubling-closure joins, all on the nation-bounded frame
    after the one fact-scan shuffle. ml_lasso_cd and
    ds_facility_location are OMITTED (wave-186 precedent): they
    return eagerly-computed driver frames, so a (0, 0) pin would
    assert on the trivial result and read as coverage it isn't —
    their distributed stages (the sufficient-stats pass / the
    pool x n sim join) run inside the op body."""
    from mister_spark.plans import count_unpartitioned_windows

    pins = {
        # wave 211
        "stat_jonckheere_terpstra": (2, 0),
        "ev_pettitt_test": (2, 2),
        # wave 212
        "stat_chow_test": (1, 0),
        # wave 213 (both collapse to checkpointed bounded frames)
        "ev_dfa": (0, 0),
        "sketch_dgim": (0, 0),
        # wave 214
        "graph_scc_bowtie": (7, 0),
        "graph_config_triangles": (5, 0),
        # wave 215
        "stat_storey_qvalue": (0, 2),
        "stat_gwet_ac1": (0, 0),
        # wave 216
        "stat_brunner_munzel": (6, 2),
        "ml_cluster_validity": (1, 0),
        # wave 217
        "ev_piecewise_trend": (2, 0),
    }
    for name, (sh_ceil, uw_ceil) in pins.items():
        df = registry.QUERIES[name](spark, SF)
        sh = count_shuffles(df)
        uw = count_unpartitioned_windows(df)
        assert sh <= sh_ceil, (name, "shuffles", sh, sh_ceil)
        assert uw <= uw_ceil, (name, "unpartitioned windows", uw, uw_ceil)


def test_wave_218_227_plan_pins(spark):
    """Waves 218-227 pins, same contract as test_late_wave_plan_pins.
    The unpartitioned windows are documented bounded carries:
    ev_backlog_reflection's cumulative/running-min windows on the
    gap-filled hour frame, fin_var_backtest's change/rank/breach
    windows on the day frame, stat_almost_stochastic_order's ECDF
    cumulatives on the $500 cell frame. The eagerly-computed ops
    (ev_bocpd, ev_token_bucket, ml_kneedle_elbow, ml_lasso_cd,
    graph_spectral_bisection, graph_sir_contagion,
    ev_markov_first_passage, ml_partial_dependence,
    io_merkle_manifest, emb_matryoshka_eval, stat_mmd_rbf,
    ds_facility_location) are OMITTED per the wave-186 precedent —
    their distributed stages run inside the op body and a (0, 0) pin
    on the trivial result frame would be vacuous coverage."""
    from mister_spark.plans import count_unpartitioned_windows

    pins = {
        # wave 218
        "ev_backlog_reflection": (0, 1),
        # wave 219
        "stat_newey_west": (4, 0),
        # wave 220
        "stat_kulldorff_scan": (0, 0),
        "stat_cochrane_orcutt": (6, 0),
        # wave 221
        "fin_var_backtest": (0, 3),
        # wave 223
        "stat_spiegelhalter_z": (0, 0),
        # wave 224 (closure loops checkpoint per round; the final
        # frame reads the checkpointed results)
        "graph_temporal_reachability": (0, 0),
        # wave 225
        "stat_van_der_waerden": (1, 0),
        # wave 226
        "ds_confident_learning": (1, 0),
        # wave 227
        "stat_almost_stochastic_order": (1, 1),
    }
    for name, (sh_ceil, uw_ceil) in pins.items():
        df = registry.QUERIES[name](spark, SF)
        sh = count_shuffles(df)
        uw = count_unpartitioned_windows(df)
        assert sh <= sh_ceil, (name, "shuffles", sh, sh_ceil)
        assert uw <= uw_ceil, (name, "unpartitioned windows", uw, uw_ceil)


def test_wave_228_239_plan_pins(spark):
    """Waves 228-239 pins, same contract as test_late_wave_plan_pins.
    Unpartitioned windows are documented bounded carries:
    ev_mean_cumulative_function's running MCF on the day frame,
    ml_qini_auuc's cumulative sweep on the 8-bucket frame,
    ds_knn_shapley's rank + suffix sum run on the two-phase
    global_rank/bucketed_cumsum machinery with TakeOrdered cuts
    (round-9 rewrite, pinned window-free). The eagerly-computed ops
    (ml_friedman_h, sketch_hll_error_curve, tx_ppmi_svd_embedding,
    stat_geometric_median, stat_zero_truncated_poisson,
    graph_trophic_levels) are OMITTED per the wave-186 precedent."""
    from mister_spark.plans import count_unpartitioned_windows

    pins = {
        # wave 228
        "ml_oof_stacking": (6, 0),
        # r11: clip joins -> per-doc count-map folds; two more (cheap,
        # doc-keyed) groupBy exchanges replace the per-(pair, gram)
        # shuffles that dominated sf1 (32.3 -> 25.8 s solo)
        "tx_bleu_pairs": (8, 0),
        # wave 229
        "ev_mean_cumulative_function": (2, 1),
        "stat_betting_martingale": (0, 0),
        # wave 230
        "stat_loo_influence": (7, 0),
        "ml_pu_prior_elkan": (0, 0),
        # wave 231
        "fin_revenue_beta": (2, 0),
        # wave 232
        "ev_harmonic_regression": (0, 0),
        # wave 233
        "tx_homoglyph_audit": (2, 0),
        "stat_poisson_rate_exact": (0, 0),
        # wave 234
        "fin_chain_ladder": (1, 0),
        "ml_qini_auuc": (0, 1),
        # wave 235
        "graph_core_periphery": (2, 0),
        "ds_memorization_risk": (1, 0),
        # wave 236
        "stat_fieller_ci": (1, 0),
        # wave 237
        "stat_breslow_day": (0, 0),
        # wave 238
        # round-9 rewrite: global_rank + bucketed_cumsum + TakeOrdered
        # cuts — no unpartitioned window anywhere in the final stage
        "ds_knn_shapley": (0, 0),
        "ev_fano_factor_curve": (3, 0),
        # wave 251: log-rank's single unpartitioned at-risk window
        # rides the <= 366-row event-day table (bounded by the
        # censoring horizon); nelson-aalen's windows are PARTITIONED
        # by segment over the same bounded day tables
        "stat_log_rank": (2, 1),
        "stat_nelson_aalen": (4, 0),
        "fin_black_scholes": (3, 0),
        # wave 252
        "ev_rebuy_interval": (7, 0),
        "stat_mutual_info": (3, 0),
        "stat_tukey_hsd": (1, 0),
        # wave 253: moods' one unpartitioned window is
        # bucketed_cumsum's O(buckets) carry on the 64-row totals
        # frame; hurst's windows are partitioned per (type, size,
        # block) on the calendar-bounded spine
        "tx_flesch": (1, 0),
        "ev_hurst": (6, 0),
        "stat_moods_median": (4, 1),
        # waves 254-257: the unpartitioned windows ride model-sized
        # frames (bucketed_cumsum carries, global_rank's sizes frame,
        # the 1-row-per-month market LAG)
        "stat_cliff_delta": (2, 1),
        "stat_hosmer_lemeshow": (3, 1),
        "ev_event_study": (5, 0),
        "fin_omega_ratio": (3, 0),
        "fin_information_ratio": (4, 1),
        "sql_null_semantics": (2, 0),
        "sql_struct_ops": (2, 0),
        "w_range_interval_frame": (2, 0),
        "graph_triad_census": (5, 0),
        # wave 258: cuzick's unpartitioned window is bucketed_cumsum's
        # O(buckets) carry
        "ev_lead_lag_matrix": (5, 0),
        "stat_cuzick_trend": (3, 1),
        # wave 259
        "emb_binary_quantize": (6, 0),
        # round-11 waves 263-266. sketch_theta_setops' three
        # unpartitioned windows rank the MERGED bottom-k sketches
        # (<= 2k rows each, documented bounded); the eagerly-computed
        # ops (dd_prefix_dup, graph_ppr_sweep_cut, fin_irr) pin their
        # post-checkpoint residue per the wave-186 precedent.
        "dd_prefix_dup": (1, 0),
        "sketch_theta_setops": (9, 3),
        "emb_intrinsic_dim": (1, 0),
        "emb_hubness": (2, 0),
        "graph_ppr_sweep_cut": (1, 0),
        "fin_irr": (1, 0),
        "tx_langid_eval": (3, 0),
        "io_variant_query": (1, 0),
        "ds_krippendorff_alpha": (2, 0),
        "ev_cross_elasticity": (3, 0),
    }
    for name, (sh_ceil, uw_ceil) in pins.items():
        df = registry.QUERIES[name](spark, SF)
        sh = count_shuffles(df)
        uw = count_unpartitioned_windows(df)
        assert sh <= sh_ceil, (name, "shuffles", sh, sh_ceil)
        assert uw <= uw_ceil, (name, "unpartitioned windows", uw, uw_ceil)


def test_eager_op_materialized_frames_are_plan_pinned(spark):
    """Round-9 closure of the eager-op pin gap, extended in round 10
    with the COLLECTED-ROWS axis: ops that return eagerly-computed
    driver frames were OMITTED from the window-ceiling pins (wave-186
    precedent) because their final frame is trivial — which is exactly
    how tx_ppmi_svd_embedding's full-vocab row_number window escaped
    until the round-8 verdict, and how ml_fair_thresholds' raw-score
    collect and graph_clique_heuristic's edge-list collect escaped
    until round 9 (a collect is neither a shuffle nor a window, so
    their pins read (0,0)). This test intercepts EVERY materialization
    point (collect / count / localCheckpoint / toPandas on the
    concrete classic DataFrame) while each eager op runs end-to-end,
    and pins (max shuffles, max unpartitioned windows, MAX ROWS PULLED
    to the driver per collect/toPandas) over all frames the op
    actually executes. Row ceilings are the sf0.001 measurements from
    tools/gen_collect_ceilings.py — each is model-sized by
    construction (vocab caps, k, seed neighborhoods, calendar spines,
    query samples), so re-adding a data-sized collect fails here
    before the full-sweep artifact gate even runs. The per-round
    sf0.01 sweep gates ALL 848 keys on the same axis
    (tests/test_artifact_sync.py::test_collected_rows_stay_model_sized).
    stat_wasserstein_1d's 2 windows are its documented O(buckets)
    carries; everything else must be window-free."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from mister_spark.plans import count_unpartitioned_windows

    pins = {
        # (shuffle ceil, unpartitioned-window ceil, collected-rows ceil)
        "stat_wasserstein_1d": (3, 2, 1),
        "stat_energy_distance": (0, 0, 1),
        "ml_lasso_cd": (0, 0, 1),
        "ds_facility_location": (1, 0, 1),
        "ml_friedman_h": (2, 0, 19),
        "sketch_hll_error_curve": (1, 0, 1),
        "tx_ppmi_svd_embedding": (3, 0, 930),  # PPMI_VOCAB_CAP-bounded
        "stat_geometric_median": (1, 0, 30),
        "stat_zero_truncated_poisson": (1, 0, 1),
        "graph_trophic_levels": (1, 0, 240),  # nation-graph-bounded
        "ds_chinchilla_allocator": (0, 0, 1),
        "sketch_bloom_fpr_curve": (4, 0, 1),
        # wave 245: the day-spine join the driver DP collects
        "stat_dtw_daily": (1, 0, 30),
        # round-10 additions: the registry's heaviest collectors by the
        # full discovery sweep, each ceiling model-sized by construction
        "ml_ridge": (1, 0, 4290),  # fixed design grid
        "ml_kneedle_elbow": (2, 0, 780),  # grid-collapse-bounded
        "ev_token_bucket": (2, 0, 531),  # hour-spine (calendar-bounded)
        "sim_ivf": (0, 0, 500),  # fixed query sample
        "sim_ann_recall_curve": (0, 0, 500),  # fixed query sample
        "ds_semdedup": (2, 0, 500),  # cluster sample
        # 10 seeds x 64 candidates + induced edges (round-10 rewrite:
        # constant-bounded, never catalog-pair-sized)
        "graph_clique_heuristic": (5, 0, 340),
        "graph_von_neumann_entropy": (1, 0, 195),  # nation-graph
        "graph_sir_contagion": (1, 0, 195),  # nation-graph
        "ev_synthetic_control": (1, 0, 159),  # (segment, day) matrix
        "ev_forecastability": (1, 0, 150),  # day spine per type
        "sim_pq": (2, 0, 70),  # codebook + query sample
        "ml_embedding_whitening": (1, 0, 64),  # dim x dim covariance
        "ev_dtw_distance": (1, 0, 60),  # day spine
        "sim_mmr": (0, 0, 50),
        "ml_rbo_topk": (4, 1, 50),
        "ml_bradley_terry": (1, 0, 40),
        # round-10 rewrite: only the scalar L2 norm reaches the driver
        "ml_power_iteration_svd": (3, 0, 1),
        # wave 254/257/262 Newton/IRLS fits: one scalar row per step
        "ml_temperature_scaling": (0, 0, 1),
        "stat_gamma_glm": (1, 0, 1),
        "ml_cox_calibration": (0, 0, 1),
        # wave 260: the <= 25x24 weighted nation-pair frame
        "graph_effective_resistance": (3, 0, 600),
        # wave 261: the nation-bounded distinct edge list
        "graph_spanning_trees": (1, 0, 320),
        "tx_topic_nmf": (2, 0, 31),  # NMF_VOCAB_CAP TakeOrdered
        "ds_quality_classifier": (3, 0, 31),
    }
    records: list[tuple[str, int, int, int]] = []
    orig = {
        m: getattr(CDF, m)
        for m in ("collect", "count", "localCheckpoint", "toPandas")
    }

    def wrap(name):
        o = orig[name]

        def f(self, *a, **k):
            sh = count_shuffles(self)
            uw = count_unpartitioned_windows(self)
            res = o(self, *a, **k)
            rows = 0
            if name == "collect":
                rows = len(res)
            elif name == "toPandas":
                rows = len(res.index)
            records.append((name, sh, uw, rows))
            return res

        return f

    try:
        for m in orig:
            setattr(CDF, m, wrap(m))
        for name, (sh_ceil, uw_ceil, rows_ceil) in pins.items():
            records.clear()
            df = registry.QUERIES[name](spark, SF)
            records.append(
                (
                    "final",
                    count_shuffles(df),
                    count_unpartitioned_windows(df),
                    0,
                )
            )
            assert records, name  # the op materialized at least once
            sh = max(r[1] for r in records)
            uw = max(r[2] for r in records)
            rows = max(r[3] for r in records)
            assert sh <= sh_ceil, (name, "shuffles", sh, sh_ceil, records)
            assert uw <= uw_ceil, (
                name, "unpartitioned windows", uw, uw_ceil, records,
            )
            assert rows <= rows_ceil, (
                name, "collected rows", rows, rows_ceil, records,
            )
    finally:
        for m, o in orig.items():
            setattr(CDF, m, o)


def test_wave_241_242_plan_pins(spark):
    """Waves 241-242 pins, same contract as test_late_wave_plan_pins.
    The unpartitioned windows are bounded carries: the 10-cell digit
    argmax and the cumulative D_k windows on the calendar-bounded day
    frame. ds_chinchilla_allocator and sketch_bloom_fpr_curve are
    OMITTED (eagerly-computed driver frames, wave-186 precedent)."""
    from mister_spark.plans import count_unpartitioned_windows

    pins = {
        "stat_last_digit_uniformity": (0, 1),
        "stat_cusum_squares": (0, 2),
        # wave 244: the Kalman recursion executes through Spark's
        # recursive-CTE union loop (the daily rollup shuffle runs at
        # view registration); granger ends on the checkpointed 1-row
        # moment frame — both window-free
        "ev_kalman_level": (0, 0),
        "stat_granger_causality": (0, 0),
        # wave 245: circular stats are one grouped pass (DTW is eager
        # and pinned in the materialization-interception test instead)
        "stat_circular_hours": (1, 0),
        # wave 246: katz ends on the checkpointed final-round frame
        # (2 exchanges: in-sum groupBy + indeg groupBy); the sharpe
        # windows are the trading-day rank on the checkpointed
        # calendar-bounded frame, duplicated across the lag self-join
        "graph_katz": (2, 0),
        "fin_sharpe_sortino": (0, 2),
        # wave 247: ctfidf is grouped token passes + a source-
        # partitioned top-k window; friedman is day-partitioned ranks
        # on the checkpointed block frame
        "tx_ctfidf": (5, 0),
        "stat_friedman_test": (5, 0),
        # wave 248: dunn rides the kruskal midrank collapse (bucketed
        # cumsum); its 2 windows are the pair-rank + BH sweep on the
        # k^2-bounded pair frame. kelly's 2 windows are the trading-
        # day rank duplicated across the lag self-join
        "stat_dunn_test": (2, 2),
        "fin_kelly": (0, 2),
        # wave 249: distinct-value collapse + bucketed_cumsum (its one
        # window is the 64-row cross-bucket carry)
        "stat_lilliefors": (2, 1),
        # wave 250: final stage = ecc groupBy + extent agg on the
        # checkpointed doubled distance frame
        "graph_diameter": (2, 0),
    }
    for name, (sh_ceil, uw_ceil) in pins.items():
        df = registry.QUERIES[name](spark, SF)
        sh = count_shuffles(df)
        uw = count_unpartitioned_windows(df)
        assert sh <= sh_ceil, (name, "shuffles", sh, sh_ceil)
        assert uw <= uw_ceil, (name, "unpartitioned windows", uw, uw_ceil)
