"""Fleet-wide physical-plan audit: every declared query's executed plan
is checked for the anti-patterns that are invisible at sf0.01 and fatal
at 100 TB. Unlike the per-query pins in test_plan_shapes.py, this is a
REGRESSION NET over the whole registry — a new or edited query that
sneaks in a Cartesian product or an unpartitioned window fails here
unless it is explicitly whitelisted with a justification.
"""

from __future__ import annotations

import re

import pytest

from data_engineering_1_spark.plans import registry

# Queries allowed to contain a CartesianProduct/BroadcastNestedLoopJoin:
# every entry must be a bounded-side cross (a broadcast 1-row aggregate,
# a literal grid, or a k-row centroid/neighbor table), never fact x fact.
CROSS_OK = {
    # scalar-subquery shapes: 1-row global aggregate crossed back in
    "q11_important_stock",
    "q14_promo_effect",
    "q15_top_supplier",
    "q22_idle_rich_customers",
    "q8_market_share",
    "q9_product_profit",
    "tfidf_top_terms",
    "training_corpus_pipeline",
    "order_value_distribution",
    "heavy_hitter_tokens",
    "gapfill_daily_big_events",
    "recursive_month_spine_orders",
    "doc_length_percentiles",
    "exact_value_percentiles",
    "approx_value_quantiles",
    "order_price_histogram",
    # tiny-dim grids / broadcast centroid & query tables (k rows)
    "region_segment_grid",
    # funnel stage bounds / df-threshold 1-row aggregates crossed in
    "conversion_funnel_12h",
    "jaccard_neardup_pairs",
    # r8: 1-row corpus-total (n_docs) crossed into the hot-fingerprint
    # df-cutoff (df*100 <= n_docs*5) before the inverted-index self-join
    "winnowing_fingerprints",
    "lang_text_stats",
    "top_terms_per_lang",
    "embedding_centroids",
    "ivf_assignment",
    "ivf_topk_search_vec0",
    "ivf_topk_search_cached_vec0",
    "ivf_knn_join_mod100",
    "knn_join_mod100",
    "cosine_topk_vec0",
    "embedding_neardup_pairs",
    "kmeans_assignments",
    "embedding_covariance_8d",
    "vector_norms",
    "word_counts_top50",
    "bigram_counts_top30",
    "token_counts_bpe",
    "doc_quality_features",
    # X94: 5-type distinct x 10-bucket literal grid (<=50 rows)
    "psi_value_drift_events",
    # X96: broadcast 1-row total-token-count aggregate crossed in
    "doc_unigram_xentropy",
    # X105: broadcast 1-row bigram/unigram grand totals crossed in
    "pmi_collocations_top30",
    # X109: broadcast 1-row doc-count aggregate crossed into the DF table
    "boilerplate_shingles",
    # X111: broadcast anchor table (|emb|/200 rows) crossed into vectors
    "hard_negative_mining",
    # X112: broadcast 1-row query-vector/code table crossed into vectors
    "int8_rerank_topk",
    # X116: broadcast 1-row weight-total and leftover aggregates crossed
    # into the |sources|-row allocation table
    "mixture_temperature_alloc",
    # X117: broadcast 1-row (min,max)-day span crossed into the distinct
    # event-type table to build the bounded (types x days) grid
    "linear_interpolate_daily",
    # X120: broadcast 1-row quartile-boundary aggregate crossed into the
    # per-doc token counts (the no-global-window stage assignment)
    "curriculum_stages",
    # X122: broadcast 3-row (train/val/test) literal table crossed into
    # the |strata|-row counts
    "stratified_exact_split",
    # X123: broadcast 1-row vocab-size aggregate crossed into the
    # bigram-count join (the X96 shape, one order up)
    "bigram_xentropy_docs",
    # X125: broadcast 1-row query-vector/code table crossed into vectors
    "rrf_fusion_topk",
    # X136: broadcast 1-row decile-boundary aggregate crossed into
    # orders (the X120 no-global-sort bucket assignment)
    "equidepth_price_histogram",
    # X139: broadcast 1-row ref-date + quartile-boundary aggregates
    # crossed into the customer aggregate
    "rfm_segmentation",
    # X140: broadcast 1-row study-end aggregate crossed into the
    # per-user duration relation
    "kaplan_meier_signup_purchase",
    # X141: broadcast 1-row 101-point pooled percentile grid crossed
    # into the doc relation
    "quantile_normalize_doclen",
    # X142: vocab x 5-langs grid (vocab is Heaps-law bounded; the
    # langs side broadcasts)
    "js_divergence_lang_pairs",
    # X146: broadcast 1-row (min_id, max_id) aggregate crossed into
    # the first-occurrence/doc relations for integer bucketing
    "vocab_growth_heaps",
    # X147: broadcast 1-row grand-total aggregate crossed into the
    # 25-cell transition matrix
    "markov_entropy_rate",
    # X148: broadcast 15-row lag grid crossed into the daily series
    "lead_lag_xcorr",
    # X149: broadcast 1-row corpus-total aggregate crossed into the
    # per-(doc,term) tf relation and the |terms|-row idf table
    "bm25_topk_docs",
    # X157: two 1-row aggregates (point estimate, bootstrap CI) meet in
    # a broadcast cross
    "poisson_bootstrap_ci",
    # X158: broadcast 1-row totals crossed into the 50-row group
    # relation for the leave-one-out thetas
    "jackknife_ratio_variance",
    # X159: broadcast 1-row (theta, xbar) aggregate crossed into the
    # per-user relation for the CUPED adjustment
    "cuped_adjusted_lift",
    # X162: broadcast 1-row node-count aggregate crossed into the 1-row
    # power-sum aggregate
    "degree_assortativity_copurchase",
    # X164: |days|^2 pairwise-slope self-cross over the ALREADY-REDUCED
    # daily relation (calendar-bounded, never event volume) + 1-row
    # OLS/Sen aggregates crossed
    "theil_sen_daily_trend",
    # X165: broadcast 1-row (n, sum) stats and denominator aggregates
    # crossed into the |days|-row centered series
    "acf_ljung_box_daily",
    # X168: broadcast 1-row row-count aggregate crossed into the ranked
    # relation for the rn/n score and decile binning
    "calibration_bins_orders",
    # X175: broadcast 1-row newest-shipdate aggregate crossed into
    # lineitem for the age computation
    "decayed_part_leaderboard",
    # X178: two broadcast 1-row aggregates (member count, set-bit
    # count) crossed into the 1-row FP aggregate
    "bloom_filter_fp_audit",
    # X179: jaccard_pairs' 1-row df-threshold aggregate crossed in (the
    # jaccard_neardup_pairs shape, composed)
    "split_leakage_audit",
    # X182: broadcast 1-row population-total aggregate crossed into the
    # 1-row estimator aggregate
    "post_stratified_spend",
    # X183: per-round broadcast 1-row node-checksum aggregate crossed
    # into the 1-row round-stats aggregate
    "kcore_copurchase",
    # X188: broadcast 1-row stats/MAD aggregates crossed into the
    # cents scan for the three outlier votes
    "outlier_ensemble_events",
    # X192: broadcast 1-row query-vector + overlap@k aggregates crossed
    # in; the 100-row depth-spine <= inequality join is a bounded BNLJ
    "rbo_retrieval_agreement",
    # X193: per-join 1-row count/distinct/actual aggregates crossed
    "join_cardinality_audit",
    # X197: broadcast |anchors|-row query table non-equi-joined into
    # the vector table (the hard_negative_mining shape)
    "ndcg_label_relevance",
    # X198: broadcast 1-row plain-mean aggregate crossed in
    "median_of_means_spend",
    # X199: broadcast 1-row total-count aggregate crossed into the
    # 9-row digit relation
    "benford_first_digit_audit",
    # X200: broadcast 1-row revenue-total aggregate crossed into the
    # 3-row class aggregate
    "abc_classification_parts",
    # X201: broadcast 1-row part-count aggregate crossed into the
    # draw relation for the modulus
    "negative_sampling_pairs",
    # X203: broadcast 1-row residual-moment aggregate crossed into the
    # daily residual relation for the z flag
    "stl_residual_anomalies",
    # X204: calendar-bounded +/-3-day neighborhood self-joins over the
    # DAILY grid (7 rows per day, never event volume)
    "hampel_filter_daily",
    # X205: broadcast 1-row median-split aggregate crossed into orders
    "did_spend_estimate",
    # X206: broadcast 1-row total-count and class-entropy aggregates
    # crossed into the per-feature crosstabs
    "feature_information_gain",
    # X207: jaccard-family candidate machinery (broadcast 1-row
    # aggregates inside minhash signatures)
    "containment_pairs_docs",
    # X208: broadcast 1-row bounds/tie-count aggregates crossed into
    # the bounded crosstab
    "kendall_tau_qty_price",
    # X210: broadcast 1-row global-newest aggregate crossed into the
    # 3-row per-table relation
    "freshness_audit_tables",
    # X211: per-edge 1-row orphan/childless/parent aggregates crossed
    "referential_coverage_audit",
    # X214: broadcast 1-row snapshot-date aggregate crossed into events
    "churn_label_snapshot",
    # X216: |types| x |days| grid — both calendar/schema-bounded; the
    # spine derives from a broadcast 1-row bounds aggregate
    "coverage_gaps_daily",
    # X217: 1-row edge-total and degree-sum aggregates crossed
    "modularity_brand_partition",
    # X224: per-covariate 1-row treated/control moment aggregates
    # crossed
    "covariate_balance_smd",
    # X225: broadcast 1-row ref-date/total-forecast aggregates crossed
    # into orders and the |segments|-row allocation
    "forecast_reconcile_segments",
    # X229: broadcast 1-row (n, total positives) aggregate crossed
    # into the ranked relation for binning
    "gains_chart_deciles",
    # X235: broadcast 1-row distinct-order count crossed into the
    # bounded rule relation for support/lift
    "assoc_rules_2item",
    # X236: broadcast 1-row catalog count crossed into the
    # |parts|-bounded exposure relation
    "rec_exposure_coverage",
    # X238: broadcast 1-row calendar-cutoff aggregate crossed into
    # the incidence relation (the train/test boundary)
    "rec_holdout_hitrate",
    # X239/X240/X241: broadcast 1-row calendar-spine aggregate crossed
    # into the per-part demand relation
    "safety_stock_reorder",
    "eoq_parts",
    "newsvendor_stock",
    # X247: broadcast 1-row month-bounds aggregate crossed into the
    # part-month bridge relation
    "price_volume_mix",
    # X259: broadcast 1-row total + 5-row global priority histogram
    # crossed into the bounded QI-group grid for densification
    "t_closeness_audit",
    # X264: broadcast 1-row stratum-weight total crossed into the
    # |segments|-row allocation relation
    "neyman_allocation",
    # X265: broadcast 1-row total-pulls and 1-row best-UCB aggregates
    # crossed into the |arms|-row relation
    "ucb1_event_types",
    # X270: broadcast 1-row exact-count / sketch-stat aggregates
    # crossed together for the single-row report
    "kmv_union_intersect",
    # X274: broadcast 1-row token-total and unseen-mass aggregates
    # crossed into the smoothed vocab relation
    "good_turing_trigrams",
    # X275: broadcast 1-row study-end aggregate crossed into the
    # per-user duration relation (the kaplan_meier shape)
    "nelson_aalen_hazard",
    # X279: broadcast 1-row central-moment aggregate crossed into the
    # per-order scoring scan
    "mahalanobis_2d_outliers",
    # X281: 4-row constant k-grid crossed into the bounded pair-dim
    # relation for the truncation sweep
    "embedding_truncation_fidelity",
    # X282: broadcast 1-row customer-count aggregate crossed into the
    # 30-row rule relation for lift
    "sequential_rules_parts",
    # X287: two broadcast 1-row ring-array aggregates crossed into
    # the key scan (the sorted ring travels as one array per row)
    "consistent_hash_rebalance",
    # X288: broadcast 1-row grand-total aggregate crossed into the
    # 25-nation relation
    "simpsons_reversal_audit",
    # X289: broadcast 1-row as-of midpoint crossed into the SCD2
    # interval relation
    "scd2_asof_snapshot",
    # X290/X291: broadcast 1-row pooled-rate aggregate crossed into
    # the 25-test relation
    "holm_bonferroni_tests",
    "benjamini_hochberg_tests",
    # X292: broadcast 5-row segment-mix + 1-row total crossed into
    # the 25-nation grid for densification
    "standardized_rates_nations",
    # X293: the two 1-row per-side OLS fits crossed for the gap
    "rdd_price_threshold",
    # X295: broadcast 1-row month-bounds aggregate crossed into the
    # two-month scan; 1-row count aggregates crossed for the report
    "capture_recapture_customers",
    # X296: broadcast 1-row moment aggregate crossed into the 10-row
    # digit relation
    "last_digit_uniformity",
    # X298: broadcast 1-row first-day/cohort-size aggregates crossed
    # into the scan and the daily retention grid
    "activity_halflife_fit",
}

# Queries allowed an UNPARTITIONED window (all data through one task):
# every entry must run the global window over a provably tiny relation
# (a limited top-k, a k-row seed, a per-group aggregate of bounded
# cardinality), never over a fact table.
GLOBAL_WINDOW_OK = {
    "nulls_ordering_readings",  # global nulls-first rank feeds a LIMIT 500
    "kmeans_assignments",  # dense_rank over the k x dim seed rows
    "q2_best_supplier_per_part",  # rank over per-part argmax (bounded by |part|)
    "doc_length_percentiles",  # percentile grid is a handful of rows
    "exact_value_percentiles",  # same: interpolation over a tiny grid
    "watermark_late_events",  # prefix-max over the per-micro-batch
    # skeleton: one row per 10-minute batch_id, not per event (X16)
    "rolling_7d_distinct_users",  # trailing-set window over the daily
    # grid: collect_set pre-aggregates to ONE ROW PER DAY before the
    # window, so the global frame sees |days| rows, never event volume
    "priority_segment_chi2",  # grand-total window over the 25-row
    # priority x segment crosstab aggregate, never the fact table
    "vocab_coverage_95",  # rank/cumsum window over the VOCAB relation
    # (distinct words — Heaps-law sublinear in corpus size), never the
    # token stream; the stream reduces in the count aggregate below it
    "int8_rerank_topk",  # final rerank window over the CONSTANT
    # 100-row candidate set (coarse stage already TakeOrdered-pruned)
    "bpe_first_merges",  # merge_rank over the distinct 2-char-pair
    # relation (bounded by |alphabet|^2, a few thousand rows), never
    # the vocab or the token stream — both reduce in aggregates below
    "mixture_temperature_alloc",  # largest-remainder rank over the
    # |sources|-row allocation table
    "rrf_fusion_topk",  # rank windows over the two TakeOrdered-pruned
    # 100-row retrieval lists, never the vector table
    "ks_two_sample_values",  # cumulative/sup windows over the BOUNDED
    # cents-domain relation (value range is schema-fixed, so distinct
    # cents is O(domain)); event volume reduces in the per-cent
    # aggregate below the window
    "rolling_corr_click_view",  # trailing frame over the daily grid:
    # events reduce to ONE ROW PER DAY before the window, so the
    # global frame sees |days| rows, never event volume
    "kaplan_meier_signup_purchase",  # at-risk/survival-fold windows
    # over the bounded duration-DAY grid; users reduce in the
    # per-duration aggregate below
    "zipf_rank_frequency",  # rank window over the VOCAB relation
    # (Heaps-law sublinear); the token stream reduces below it
    "vocab_growth_heaps",  # cumulative window over the 100-row
    # corpus-prefix bucket grid
    "lead_lag_xcorr",  # best-lag max window over the 15-row lag
    # relation
    "seasonal_dow_forecast",  # grand-total window over the 7-row
    # day-of-week relation; events reduce to one row per day, then to
    # 7 rows, before the window
    "surrogate_keys_dense",  # the two-phase rank's offset cumsum runs
    # over the n/4096-row SHARD-COUNT relation (operators/ranks.py) —
    # deliberately tiny; data rows only ever see a partitioned window
    "stl_decompose_daily",  # centered 7-day frame over the daily grid:
    # events reduce to ONE ROW PER DAY before the window
    "acf_ljung_box_daily",  # Ljung-Box cumulative window over the
    # 10-row lag relation
    "roc_auc_order_status",  # cumulative window over the BOUNDED
    # cents-domain distinct-score relation (the ks_two_sample_values
    # argument); row volume reduces in the per-score aggregate below
    "calibration_bins_orders",  # the two-phase rank's offset cumsum
    # runs over the n/2^20-row SHARD-COUNT relation (operators/
    # ranks.py), never over data rows (the surrogate_keys_dense shape)
    "revenue_share_of_parent",  # grand-total window over the
    # (region, nation) aggregate — bounded by geography (25 rows),
    # never the fact table, which reduces in the join+aggregate below
    "rbo_retrieval_agreement",  # rank windows over the two
    # TakeOrdered-pruned 100-row retrieval lists (the
    # int8_rerank_topk shape)
    "leaderboard_churn_weekly",  # lag window over the distinct-weeks
    # relation (calendar-bounded); data rows reduce in the per-week
    # aggregate and rank window below
    "abc_classification_parts",  # cumulative/total windows over the
    # PART-dimension revenue aggregate (catalog-bounded), never the
    # fact table, which reduces in the per-part aggregate below
    "stl_residual_anomalies",  # centered 7-day frame over the daily
    # grid (the stl_decompose_daily shape): events reduce to ONE ROW
    # PER DAY before the window
    "skyline_orders_2d",  # the 2D-skyline running-max pass — a global
    # frontier is inherently a global scan; docstring documents the
    # local-skyline-then-union rewrite used at cluster scale
    "user_acquisition_curve",  # cumsum over the first-seen DAILY
    # relation: users reduce to first-seen dates, then to one row per
    # day, before the window
    "forecast_reconcile_segments",  # largest-remainder rank/total
    # windows over the |segments|-row allocation table (the
    # mixture_temperature_alloc shape)
    "gains_chart_deciles",  # cumulative window over the 10-row decile
    # relation (the calibration_bins shape); data rows only see the
    # two-phase rank's partitioned windows
    "cramers_v_pairs",  # grand-total/marginal windows over the
    # bounded crosstab cell grid (the priority_segment_chi2 shape)
    "rec_exposure_coverage",  # Gini rank window over the
    # <=|parts|-row exposure relation (the region_gini shape)
    "vwap_daily",  # trailing 7-day RANGE frame over the daily grid:
    # lineitems reduce to ONE ROW PER DAY before the window (the
    # rolling_corr_click_view shape)
    "brown_double_smoothing_daily",  # both 51-element fold frames run
    # over the daily grid: orders reduce to ONE ROW PER DAY before any
    # window (the ewma_halflife_daily shape)
    "neyman_allocation",  # largest-remainder rank/total windows over
    # the |segments|-row allocation table (the
    # mixture_temperature_alloc shape)
    "pps_systematic_sample",  # the two-phase cumsum's offset windows
    # run over the n/4096-row SHARD-TOTAL relation (the
    # surrogate_keys_dense shape); fact rows only see a partitioned
    # within-shard window
    "nelson_aalen_hazard",  # at-risk/hazard-cumulative windows over
    # the bounded duration-DAY grid (the kaplan_meier shape); users
    # reduce in the per-duration aggregate below
    "greedy_knapsack_parts",  # greedy rank/cumsum over the PART
    # DIMENSION (catalog-bounded, the abc_classification shape); the
    # docstring names the X155/X269 two-phase rewrite for fact-scale
    "wau_mau_stickiness",  # trailing-set windows over the daily grid:
    # events reduce to ONE ROW PER DAY (collect_set) before any window
    # (the rolling_7d_distinct_users shape, two frames)
    "holm_bonferroni_tests",  # rank + step-down windows over the
    # 25-test (nation) relation
    "benjamini_hochberg_tests",  # rank + step-up windows over the
    # same 25-test relation
}


@pytest.fixture(scope="module")
def all_plans(spark, sf_dir):
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    out = {}
    for name, fn in registry.get_queries().items():
        out[name] = (
            fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    return out


def _top_level_groups(line: str) -> list[str]:
    groups, depth, cur = [], 0, None
    for ch in line:
        if ch == "[":
            if depth == 0:
                cur = []
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and cur is not None:
                groups.append("".join(cur))
                cur = None
        elif depth > 0:
            cur.append(ch)
    return groups


def _global_window_lines(plan: str) -> list[str]:
    """Window/WindowGroupLimit nodes with NO partition spec.

    Plan text shapes: `Window [exprs], [partition], [order]` (the exprs
    group contains windowspecdefinition) and `WindowGroupLimit
    [partition], [order], fn, k`. Rule: among the top-level bracket
    groups that are NOT the exprs group, a partition spec is one
    without ASC/DESC sort markers — if every non-exprs group is a sort
    spec, the window is global."""
    bad = []
    for line in plan.splitlines():
        if not re.search(r"\bWindow(?:GroupLimit)? \[", line):
            continue
        groups = [
            g
            for g in _top_level_groups(line)
            if "windowspecdefinition" not in g
        ]
        has_partition = any(
            g and " ASC" not in g and " DESC" not in g for g in groups
        )
        if not has_partition:
            bad.append(line.strip()[:160])
    return bad


def test_no_unlisted_cartesian_products(all_plans):
    offenders = {
        name: plan
        for name, plan in all_plans.items()
        if name not in CROSS_OK
        and ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan)
    }
    assert not offenders, (
        f"unlisted cross joins in: {sorted(offenders)} — bounded-side "
        "crosses belong in CROSS_OK with a justification; anything else "
        "is a fact-x-fact blowup"
    )


def test_no_unlisted_global_windows(all_plans):
    offenders = {
        name: lines
        for name, plan in all_plans.items()
        if name not in GLOBAL_WINDOW_OK
        and (lines := _global_window_lines(plan))
    }
    assert not offenders, (
        "unpartitioned windows (single-task at scale) in: "
        f"{ {k: v[:1] for k, v in offenders.items()} } — tiny-relation "
        "globals belong in GLOBAL_WINDOW_OK with a justification"
    )


def test_every_query_reads_some_table(all_plans):
    # smoke net: a declared query that scans nothing is a stub.
    # dedup_clusters_lsh ends in Scan ExistingRDD: its convergence loop
    # localCheckpoints the edge table, which REPLACES the parquet scan
    # lineage in the final plan — the scan happened in earlier jobs.
    for name, plan in all_plans.items():
        assert (
            "FileScan" in plan
            or "LocalTableScan" in plan
            or "Scan ExistingRDD" in plan
        ), name
