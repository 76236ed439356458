"""Empirical scaling audit: warm-min timings of representative headline
queries at sf0.01 and sf0.1 (a 10x data step for every table except
embeddings, which steps 4x), and the effective scaling exponent

    eps = log(T_hi / T_lo) / log(step)

eps ~ 0   -> fixed-cost dominated at fixture scale (planning/JIT/shuffle
             setup, not data) — says nothing about the asymptote yet;
eps ~ 1   -> linear in data (scan/aggregate-bound) — the 100 TB shape;
eps ~ 1.5 -> the documented intrinsic superlinear ops (exact triangle
             counting, SemDeDup's sqrt(n)-cluster pair verify).

Usage: python tools/scaling_probe.py [out_md] [--only name1,name2,...]
Prints a markdown table; optionally appends to the given file.
"""
from __future__ import annotations

import math
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommendation_system_big_data_spark.registry import registry  # noqa: E402
from recommendation_system_big_data_spark.session import get_spark  # noqa: E402

#: (query, data step between sf0.01 and sf0.1 for its driving table)
PROBES = [
    ("q1_pricing_summary", 10.0),
    ("q18_large_volume_customers", 10.0),
    ("flagship_top_customers", 10.0),
    ("pipeline_training_mix", 10.0),
    ("dedup_ngram_jaccard", 10.0),
    ("dedup_minhash_lsh", 10.0),
    ("dedup_substring_span", 10.0),
    ("text_tfidf", 10.0),
    ("text_gopher_quality", 10.0),
    ("text_repetition_signals", 10.0),
    ("contamination_ngram_check", 10.0),
    ("agg_summary", 10.0),
    ("graph_triangle_count", 10.0),
    ("sim_topk_bruteforce", 4.0),
    ("sim_topk_lsh", 4.0),
    ("sim_topk_ivfpq", 4.0),
    ("dedup_semantic_semdedup", 4.0),
    # round-9 additions (documents/events step 10x, embeddings 4x)
    ("pipeline_dedup_cascade", 10.0),
    ("pipeline_quality_funnel", 10.0),
    ("text_dsir_importance", 10.0),
    ("text_tokenizer_fertility", 10.0),
    ("dedup_snapshot_novelty", 10.0),
    ("ml_backtest_forecast", 10.0),
    ("stat_trend_mann_kendall", 10.0),
    ("sim_topk_truncated_rerank", 4.0),
    ("embedding_matryoshka_eval", 4.0),
    # round-10 additions (events/documents step 10x, embeddings 4x)
    ("stat_anova_oneway", 10.0),
    ("ml_eval_pr_auc", 10.0),
    ("ts_holt_winters_seasonal", 10.0),
    ("pipeline_token_budget_select", 10.0),
    ("text_collapse_repeats", 10.0),
    ("join_null_skew_bypass", 10.0),
    ("window_percent_rank_cume", 10.0),
    ("embedding_hard_negative_mining", 4.0),
    # round-11 additions (documents/orders/events step 10x)
    ("dedup_prefix_filter_join", 10.0),
    ("text_ngram_novelty", 10.0),
    ("multimodal_dedup_hist_fingerprint", 10.0),
    ("ts_stl_classical_decompose", 10.0),
    ("stat_levene_variance", 10.0),
    ("ml_eval_ece", 10.0),
    ("ml_eval_cohen_kappa", 10.0),
    ("stat_permutation_test", 10.0),
    ("graph_assortativity", 10.0),
    # round-12 session additions (events/orders/lineitem step 10x)
    ("stat_kruskal_wallis", 10.0),
    ("ml_eval_qini_auuc", 10.0),
    ("ml_conformal_interval", 10.0),
    ("ml_eval_log_loss", 10.0),
    ("window_hampel_filter", 10.0),
    ("agg_theil_sen_slope", 10.0),
    ("olap_bridge_allocation", 10.0),
    ("ml_eval_fairness_gaps", 10.0),
    ("scd2_late_arriving", 10.0),
    ("geo_hotspot_gi_star", 10.0),
    ("dedup_lsh_quality_audit", 10.0),
    # round-13 session additions (events/orders step 10x)
    ("stat_ljung_box", 10.0),
    ("olap_cohort_ltv_triangle", 10.0),
    ("stat_runs_test", 10.0),
    ("stat_two_proportion_z", 10.0),
    ("stat_benjamini_hochberg", 10.0),
    ("stat_mcnemar", 10.0),
    ("stat_bayes_ab_beta", 10.0),
    ("ml_psm_att", 10.0),
    ("ts_hurst_exponent", 10.0),
    ("privacy_dp_quantile", 10.0),
    ("text_mattr_lexical_diversity", 10.0),
    ("graph_hits", 10.0),
    # round-14 additions (events/orders/documents/lineitem step 10x,
    # embeddings 4x)
    ("stat_kendall_tau", 10.0),
    ("stat_pettitt_changepoint", 10.0),
    ("stat_lilliefors_normality", 10.0),
    ("stat_g_test", 10.0),
    ("stat_friedman_test", 10.0),
    ("stat_bartlett_test", 10.0),
    ("stat_cronbach_alpha", 10.0),
    ("stat_poisson_rate_ratio", 10.0),
    ("stat_anderson_darling_normal", 10.0),
    ("ts_granger_causality", 10.0),
    ("ts_spectral_entropy", 10.0),
    ("ts_seasonal_naive_mase", 10.0),
    ("ts_forecast_croston", 10.0),
    ("ts_wavelet_haar_energy", 10.0),
    ("text_heaps_vocab_growth", 10.0),
    ("text_js_divergence_sources", 10.0),
    ("ml_eval_tweedie_deviances", 10.0),
    ("ml_eval_gauc", 10.0),
    ("ml_chi2_feature_selection", 10.0),
    ("olap_segment_migration", 10.0),
    ("graph_closeness_sampled", 10.0),
    ("graph_rich_club_coefficient", 10.0),
    ("quality_hash_uniformity", 10.0),
    ("join_asof_tolerance", 10.0),
    ("privacy_randomized_response", 10.0),
    ("ml_davies_bouldin_labels", 4.0),
    ("sim_intra_list_diversity", 4.0),
    # round-15 additions (events step 10x, embeddings 4x)
    ("stat_welch_anova", 10.0),
    ("stat_mood_median_test", 10.0),
    ("stat_icc_oneway", 10.0),
    ("stat_dunn_posthoc", 10.0),
    ("ml_eval_ks_separation", 10.0),
    ("ml_mutual_information", 10.0),
    ("ts_kpss_stationarity", 10.0),
    ("ts_theta_forecast", 10.0),
    ("olap_market_share_hhi", 10.0),
    ("embedding_isotropy_score", 4.0),
    ("stat_jonckheere_terpstra", 10.0),
    ("ml_eval_rank_biased_overlap", 10.0),
    ("geo_dbscan_grid", 10.0),
    ("attribution_markov_removal", 10.0),
    ("ml_adaboost_stumps", 10.0),
    ("text_textrank_keywords", 10.0),
    ("ts_arch_lm_test", 10.0),
    ("ml_gmm_em_1d", 10.0),
    ("graph_betweenness_sampled", 10.0),
    ("stat_cramer_von_mises_2samp", 10.0),
    # r15 session-B additions
    ("stat_cliffs_delta", 10.0),
    ("stat_dagostino_k2", 10.0),
    ("stat_ansari_bradley", 10.0),
    ("stat_logrank_test", 10.0),
    ("survival_nelson_aalen", 10.0),
    ("stat_mantel_haenszel", 10.0),
    ("stat_cochran_q", 10.0),
    ("ts_pacf_yule_walker", 10.0),
    ("ts_variance_ratio_test", 10.0),
    ("stat_tukey_hsd", 10.0),
    ("ts_durbin_watson", 10.0),
    ("stat_fligner_killeen", 10.0),
    ("text_lm_perplexity", 10.0),
    ("ml_logistic_irls", 10.0),
    ("stat_wilcoxon_signed_rank", 10.0),
    ("stat_sign_test", 10.0),
    ("stat_lilliefors_exponential", 10.0),
    ("stat_ratio_metric_delta_ci", 10.0),
    ("graph_ktruss", 10.0),
    ("ts_breusch_pagan", 10.0),
    ("ts_newey_west_slope", 10.0),
    ("stat_nemenyi_posthoc", 10.0),
    ("ml_feature_vif", 10.0),
    ("ml_eval_auc_delong_ci", 10.0),
    ("profile_fd_audit", 10.0),
    ("sequence_prefixspan", 10.0),
    ("basket_fpgrowth", 10.0),
    ("stat_partial_correlation", 10.0),
]

SF_LO = "/root/testdata/sf0.01"
SF_HI = "/root/testdata/sf0.1"


def warm_min(fn, spark, sf_dir, n=2):
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    only = None
    if "--only" in sys.argv:
        i = sys.argv.index("--only")
        only = set(sys.argv[i + 1].split(","))
        del sys.argv[i:i + 2]
    spark = get_spark(app_name="scaling-probe")
    spark.range(1000).selectExpr("sum(id)").collect()
    defs = registry()
    lines = [
        "| query | sf0.01 s | sf0.1 s | step | eps |",
        "|---|---|---|---|---|",
    ]
    for name, step in PROBES:
        if only is not None and name not in only:
            continue
        fn = defs[name].fn
        lo = warm_min(fn, spark, SF_LO)
        hi = warm_min(fn, spark, SF_HI)
        eps = math.log(hi / lo) / math.log(step)
        lines.append(
            f"| `{name}` | {lo:.2f} | {hi:.2f} | {step:g}x | {eps:.2f} |"
        )
        print(lines[-1], flush=True)
    spark.stop()
    if len(sys.argv) > 1:
        with open(sys.argv[1], "a") as fh:
            fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
