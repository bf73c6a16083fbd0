"""Generate PLANS.md: physical-plan evidence for the headline queries.

For each audited query this extracts the scale-critical plan properties:
scans' pushed filters and pruned read schemas, join strategies, window
group-limit pushdown, exchange (shuffle) count, and AQE. Regenerate with
``python scripts/explain_audit.py`` after plan-affecting changes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITED = (
    "denormalized_orders",
    "pricing_summary",
    "latest_event_per_key",
    "merge_upsert",
    "search_dsl_bool",
    "neardup_minhash_lsh",
    "search_knn_ivf",
    "geo_grid_counts",
    "percolate_orders",
    "geo_tile_counts",
    "geo_rings_balance",
    "geo_bounds_centroid",
    "geo_nearest_topk",
    "geo_distance_feature_rank",
    "geo_polygon_members",
    "embed_cosine_topk",
    "streaming_window_counts",
    "events_range_join_prior",
    "events_asof_order",
    "q4_order_priority",
    "q10_returned_revenue",
    "parts_above_type_avg",
    "search_bm25_scored",
    "doc_chunks",
    "pack_token_budget",
    "stratified_sample_langs",
    "q19_disjunctive_brand_revenue",
    "incremental_sync_events",
    "text_repetition",
    "embed_quantize_int8",
    "batch_sessionization",
    "funnel_conversion",
    "cohort_retention",
    "event_transition_matrix",
    "data_quality_audit",
    "corpus_prep_stats",
    "history_asof_read",
    "text_cosine_pairs",
    # round-3 rotation members with non-trivial plans
    "rfm_segmentation",
    "dedup_keep_canonical",
    "leakage_safe_split",
    "gdpr_delete_sync",
    "rag_context_assembly",
    "user_feature_table",
    "chunk_level_dedup",
    "wow_growth",
    "key_skew_report",
    "snapshot_diff",
    # r12: the relevance-boost ranked family (zero-shuffle pruned
    # scans — the plan gates pin these, the audit documents them)
    "search_boosted_multimatch",
    "search_boosted_bool_should",
    "search_query_string_boosted",
    "search_function_score_query_base",
    "search_function_score_random",
    # round-4 plan changes: graduated oracles + fixed-grid IVF
    "approx_sketches",
    "embed_ann_ivf",
    # round-5: DSL edge grammar end-to-end
    "search_dsl_msm_wildcard",
    "search_dsl_terms_set",
    "search_aggs_terms_stats",
    "search_aggs_date_histogram",
    "search_aggs_filter_metrics",
    "search_aggs_composite_page",
    # r6 additions: offset paging, query_string pair, nested agg
    # levels, _source projection
    "search_from_size_page",
    "search_dsl_query_string",
    "search_dsl_simple_qs",
    "search_aggs_nested_levels",
    "search_source_filtering",
    "search_collapse_field",
    "search_aggs_terms_order",
    "search_aggs_histogram_gaps",
    "search_aggs_significant_terms",
    # r7 additions: tz/offset bucket rounding, composite
    # missing_bucket, ranked offset paging, bracket ranges, sloppy
    # phrases, fuzzy match
    "search_aggs_timezone",
    "search_aggs_composite_missing",
    "search_ranked_offset_page",
    "search_dsl_qs_ranges",
    "search_dsl_phrase_slop",
    "search_dsl_match_fuzzy",
    # r7 late additions: compound leaves, sort options, relevance
    # floor, term suggester, SemDeDup
    "search_dsl_compound",
    "search_dsl_combined_fields",
    "search_sort_options",
    "search_sort_mode_array",
    "search_min_score",
    "search_suggest_terms",
    "semdedup_embeddings",
    # r9 additions: scored ranked pages, mlt, suggesters, runtime
    # fields, scroll drain boundary, quality classifier
    "search_dsl_function_score",
    "search_dsl_script_score",
    "search_dsl_more_like_this",
    "search_suggest_phrase",
    "search_suggest_completion",
    "search_runtime_mappings",
    "quality_classifier_scores",
    # r9 late additions: spans/intervals, script filter, feature
    # ranking, boilerplate removal, string_stats, script metrics
    "search_dsl_span_near",
    "search_dsl_span_first",
    "search_dsl_intervals",
    "search_dsl_script_query",
    "search_dsl_rank_feature",
    "search_dsl_distance_feature",
    "boilerplate_chunk_removal",
    "search_aggs_string_stats",
    "search_aggs_metric_script",
    # r10 additions: DSIR, significant_text, sampler wrapper, fuzzy
    # completion, nested span / intervals filter trees
    "dsir_importance_weights",
    "search_aggs_significant_text",
    "search_aggs_sampler_significant",
    "search_suggest_completion_fuzzy",
    "search_dsl_span_nested",
    "search_dsl_intervals_filter",
    "search_dsl_span_containing",
    "search_aggs_terms_partition",
    "search_aggs_significant_bgfilter",
    # r11 additions: variable-span dedup, bucketed near-dup pairs,
    # exact-BPE counting/packing, LM perplexity, regex completion,
    # interval filter scripts
    "exact_substring_dedup",
    "embed_neardup_pairs",
    "token_count_bpe_exact",
    "pack_token_budget_exact",
    "lm_perplexity_features",
    "search_suggest_completion_regex",
    "search_dsl_intervals_script",
    # late r11: the mixture materialization and hard-negative mining
    # distributed frames (the new aggs rebuild driver-side — their
    # plan bounds live in tests/test_vwh_categorize.py instead)
    "mixture_domain_resample",
    "embed_hard_negatives",
)

SF = "/root/testdata/sf0.01"


# extraction lives in the package so tests can gate on the same
# properties (tests/test_plan_gates.py)
from sql_database_to_elastic_datalake_spark.plans.audit import (  # noqa: E402
    plan_string,
    summarize,
)


def main() -> None:
    from sql_database_to_elastic_datalake_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark(master="local[8]", shuffle_partitions=16,
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    lines = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        "Generated by `python scripts/explain_audit.py` (sf0.01, initial",
        "plans before AQE runtime re-optimization). Properties shown are",
        "the scale-critical ones: what reaches the parquet scan, how joins",
        "are executed, and how many shuffles the plan needs.",
        "",
    ]
    for name in AUDITED:
        if name not in qs:
            continue
        df = qs[name](spark, SF)
        s = summarize(plan_string(df))
        lines.append(f"## {name}")
        lines.append("")
        lines.append(
            f"- joins: {s['broadcast_joins']} broadcast-hash, "
            f"{s['sortmerge_joins']} sort-merge; shuffles: {s['shuffles']}; "
            f"window-group-limit pushdown: {s['window_group_limit'] > 0}; "
            f"AQE: {s['aqe']}"
        )
        if s["scans"]:
            lines.append("- scans (columns read ≤ table width ⇒ pruning):")
            for sc in s["scans"]:
                lines.append(
                    f"  - `{sc['table']}`: {sc['n_cols']} cols, "
                    f"PushedFilters {sc['pushed']}"
                )
        lines.append("")
    out = "\n".join(lines) + "\n"
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
