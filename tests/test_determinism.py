"""Partitioning-independence: the repo's core reproducibility claim
is that every query returns BIT-IDENTICAL results on any
partitioning (that's what makes them hash-verifiable and resumable).
This runs the float-producing queries most exposed to
order-of-operation drift under different shuffle-partition counts
and asserts exact row-set equality."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

QUERIES = [
    "iqr_outliers",
    "supplier_cosine_topk",
    "event_transition_matrix",
    "basket_pairs_lift",
    "stats_moments",
    "corr_slope",
    "group_quantiles",
    "pagerank_parts",
    "tfidf_top_terms",
    # r4 float-producing additions: every emitted double must be the
    # same bits under any partitioning (fixed-point / exact-decimal
    # cores with one final IEEE op)
    "bm25_scores",
    "source_token_drift",
    "source_overlap_matrix",
    "snapshot_diff",
    "incremental_agg_maintenance",
    "tpch_q3_shipping_priority",
    "tpch_q17_small_qty_revenue",
    "rfm_segmentation",
    # r5 float-producing additions
    "tpch_q9_profit_shape",
    "merge_upsert_batch",
    "time_weighted_avg",
    "tokenizer_apply_bpe",
    "equidepth_bins",
    "kmeans_assign_iter",
    "hapax_ratio_per_source",
    "trimmed_mean_group",
    "embedding_norm_outliers",
    # r6 float-producing additions (exact-integer cores, one final
    # IEEE division)
    "tpch_q11_important_parts",
    "cusum_changepoint",
    # r6 batch 3
    "lorenz_decile_shares",
    "ewma_dyadic",
    "simpson_diversity",
    "theil_sen_slope",
    "share_of_parent",
    "kmv_distinct_estimate",
    "graph_degree_assortativity",
    "cohort_ltv_curve",
    "mann_whitney_u",
    "runs_test_randomness",
    "target_encoding",
    "weekday_seasonality",
    "discount_quantity_elasticity",
    "dau_mau_stickiness",
    "ab_test_ztest",
    "cart_root_split",
    "kaplan_meier_survival",
    "clustering_coefficient",
    "log_rank_test",
    "anova_oneway",
    "jackknife_group_means",
    "conformal_interval_width",
    "cart_tree_depth2",
    # r6 batch 9 (time-series shelf): acf1 is the only float output
    # (drawdown/bollinger/chebyshev are exact-integer end to end)
    "autocorr_lag1",
    # r6 batch 10 (inference shelf; ams_f2_sketch is exact-integer)
    "spearman_rho",
    "welch_ttest",
    "wilson_ci",
    # r6 batch 11 (graph/ML; kcore + naive_bayes are exact-integer)
    "jaccard_link_prediction",
    # r6 batch 13 (permutation p is exact-integer; d_obs/tau/betas
    # are mirrored expression trees)
    "permutation_test_means",
    "mann_kendall_trend",
    "ols_two_feature",
    # r6 batch 14 (sequential-state folds)
    "holt_linear_forecast",
    "kruskal_wallis",
    # r6 batches 17-20 float outputs (mirrored single divisions)
    "funnel_time_to_convert",
    "mcnemar_test",
    "cohen_kappa",
    # r7 session-2: integer outputs DERIVED from double comparisons
    # (cosine rankings / thresholds / centroid-sim tie-breaks) — the
    # derivation must not depend on row arrival order
    "dsir_importance_weights",
    "ivf_recall_curve",
    "semdedup_prune",
    # r10: the ANN twin's two-level routing and the recall curve are
    # double-comparison-derived integer outputs like the above; the
    # quantile sketch's stride/target snap is pure integer but its
    # kept set rides a (cents, o_orderkey) sort — all must be
    # arrival-order independent
    "semdedup_prune_ann",
    "semdedup_ann_assignment_recall",
    "quantile_sketch_ranks",
]


def _default_subset(names):
    """Suite-budget gate (r11): the full 75-query matrix runs two
    executions each and cost ~3 min of the default suite. Default =
    the entries inside the driver's CURRENT first-50 verification
    window (every plan-changed/new query — the class whose
    arrival-order independence is actually at risk this round);
    SPARK_GRAFT_FULL_SUITE=1 restores the full matrix."""
    import os

    if os.environ.get("SPARK_GRAFT_FULL_SUITE"):
        return names
    import importlib.util
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "__spark_entry___det", str(repo / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    window = set(list(mod.queries())[:50])
    return [n for n in names if n in window]


def _rows(spark, name):
    from distributed_mapreduce_p2p_spark import registry

    df = registry.QUERIES[name](spark, SF_SMALL)
    cols = sorted(df.columns)
    return sorted(
        tuple(repr(r[c]) for c in cols) for r in df.collect()
    )


@pytest.mark.parametrize("name", _default_subset(QUERIES))
def test_result_is_partitioning_independent(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{name}: results differ across partitionings"


TZ_QUERIES = [
    # event-time heavy: windows, funnels, cohorts, calendar buckets
    "range_frame_trailing",
    "funnel_conversion",
    "retention_cohorts",
    "resample_ffill",
    "date_buckets",
    "weekly_growth",
    "interval_overlap_join",
    "sliding_distinct_users",
]


@pytest.mark.parametrize("name", TZ_QUERIES)
def test_result_is_timezone_independent(spark, name):
    """Event-time math must not depend on the cluster's session
    timezone (the driver's session tz is out of our control): all
    epoch math rides TIMESTAMP_NTZ + timestampdiff, never
    unix_micros/LTZ casts, so a shifted tz cannot move window
    boundaries or calendar buckets."""
    from distributed_mapreduce_p2p_spark.sources.io import scoped_conf

    a = _rows(spark, name)
    with scoped_conf(
        spark, "spark.sql.session.timeZone", "America/New_York"
    ):
        b = _rows(spark, name)
    with scoped_conf(spark, "spark.sql.session.timeZone", "Asia/Katmandu"):
        c = _rows(spark, name)
    assert a == b == c, f"{name}: results differ across session timezones"
