"""Generate QUERIES.md: one line per registered query.

Usage: python scripts/gen_query_index.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


#: One-liners for queries whose functions carry no docstring (the oracle
#: and section comments in registry*.py tell the fuller story).
DESC = {
    "denormalized_orders": "Flagship wide-document pipeline: orders ⋈ latest lineitem ⋈ dims ⋈ label set",
    "pricing_summary": "TPC-H Q1 shape: returnflag/linestatus pricing aggregates",
    "salted_group_agg": "Skew-safe two-phase aggregation (salt → partial → final)",
    "streaming_window_counts": "Streaming tumbling-window counts (availableNow, watermark-bounded)",
    "search_bm25_scored": "BM25 doc-length-normalized relevance top-20 (rational IDF)",
    "neardup_minhash_lsh": "MinHash→LSH band candidates → exact Jaccard verification",
    "rollup_status_priority": "ROLLUP subtotal hierarchy over status/priority",
    "pivot_event_types": "Pivot event types to columns per user",
    "running_totals": "Moving and running window sums per user",
    "event_gaps": "lag()-based inter-event gap per user",
    "daily_event_stats": "Per-day event count/sum/distinct-user stats",
    "value_percentiles": "Exact percentile_cont per event type",
    "set_ops_customers": "INTERSECT/EXCEPT/UNION set operations",
    "cube_status_priority": "CUBE over status/priority",
    "generic_table_sync": "Any-table sync: namespacing + provenance + content ids",
    "window_rank_family": "rank/dense_rank/row_number/ntile/percent_rank family",
    "fuzzy_match": "Levenshtein fuzzy matching under a distance cap",
    "q3_shipping_priority": "TPC-H Q3 shape: unshipped-order revenue top-10",
    "q5_local_supplier_volume": "TPC-H Q5 shape: local supplier volume per nation",
    "dedup_clusters_jaccard": "Connected components over near-dup pairs (min-label propagation)",
    "doc_chunks": "Overlapping token-window chunking",
    "pack_token_budget": "Token-budget training-batch packing (prefix-sum floor)",
    "stratified_sample_langs": "Per-language deterministic hash sampling",
    "filter_project": "Pushed-down filter + projection/rename",
    "point_lookup": "Point lookup by key",
    "namespace_provenance": "Column namespacing + provenance stamping",
    "latest_event_per_key": "DISTINCT ON: latest event per key (window group-limit)",
    "top3_events_per_user": "Top-k per group via ranked window",
    "group_count": "Grouped counts",
    "group_to_array": "Group-to-array aggregation (sorted, serialization-stable)",
    "orderby_limit": "Global sort + limit (top-k)",
    "union_all_entities": "Union-all over heterogeneous entity tables",
    "content_hash_ids": "Content-hash document ids",
    "history_versioning": "Append-only history with {id}_{indexed_at} doc ids",
    "json_extract": "JSON field extraction from stringly props",
    "self_join_parent": "Self-join to parent entity",
    "nation_with_children": "Parent with grouped children attached (×3)",
    "semi_join_discounted": "LEFT SEMI join (EXISTS)",
    "anti_join_no_orders": "LEFT ANTI join (NOT EXISTS)",
    "paginate": "LIMIT/OFFSET keyset pagination",
    "merge_upsert": "Latest-wins MERGE of updates into base",
    "ingest_accounting": "Batch ingest validate-split accounting (HTTP 207)",
    "nested_labels_json": "Nested label arrays as JSON documents",
    "search_dsl_bool": "ES bool DSL compiled to a pushed predicate",
    "search_dsl_should_wildcard": "ES should/wildcard DSL compilation",
    "search_multimatch_scored": "multi_match with deterministic tf scoring",
    "search_all_tables": "Cross-table search over every lake table",
    "search_nested_labels": "ES nested-document query",
    "search_hits_envelope": "ES hits envelope (total + top hits)",
    "text_stats": "Token counts, punctuation/stopword ratios, quality score",
    "text_lang_id": "Character n-gram profile language ID (Cavnar-Trenkle)",
    "text_fingerprint": "Normalized content fingerprint (md5)",
    "dedup_exact": "Exact dedup by content hash (keep min id)",
    "neardup_jaccard": "Exact n-gram Jaccard near-dup pairs (verifier tier)",
    "simhash_hamming_pairs": "SimHash pairs within hamming distance (pigeonhole bands)",
    "embed_cosine_topk": "Exact cosine top-k (broadcast queries × one scan)",
    "embed_ann_bucketed": "Sign-LSH bucketed approximate nearest neighbors",
    "embed_neardup_pairs": "Embedding near-dup pairs above cosine threshold",
    "multimodal_binary_meta": "Binary media column + typed metadata plumbing",
    "multimodal_decode": "Arrow-batched media decode (real netpbm/WAVE codec; golden-join oracle)",
    "events_ewma": "Per-key EWMA recurrence via applyInPandas (exact fold oracle)",
    "embed_ann_ivf": "IVF-Flat ANN: fixed-grid quantizer + nprobe (full SQL oracle)",
    "data_quality_audit": "Cross-table integrity audit: null/dup/orphan-FK counts per table",
    "late_data_profile": "Event lateness distribution vs the high-water mark (watermark sizing)",
    "value_histogram": "Fixed-bin value histogram incl. out-of-range clamp bins",
    "value_outliers_mad": "Median/MAD robust z-score outlier flags per event type",
    "doc_keywords": "Per-doc top-k keywords by rational TF-IDF",
    "events_hourly_heatmap": "Day-of-week × hour event density grid",
    "events_anomaly_days": "Days whose volume deviates from the median by MAD multiples",
    "user_feature_table": "Per-user ML feature vector (counts, sums, recency, type mix)",
    "lang_id_confusion": "Lang-ID confusion matrix: predicted × labeled counts",
    "char_trigram_profile": "Corpus-wide character trigram frequency profile",
    "corpus_clean": "Quality gate ∘ exact dedup ∘ near-dup prune composition",
    "retrieval_filtered_topk": "Metadata-gated retrieval then exact cosine top-k",
    "embed_quantize_int8": "Symmetric int8 embedding quantization with per-row scale",
    "incremental_sync_events": "High-water-mark incremental sync (literal pushdown)",
    "leakage_safe_split": "Train/val/test split keyed by near-dup cluster",
    "text_repetition": "Gopher repetition signals + composite quality gate",
    "array_functions_docs": "Higher-order array functions (transform/filter/slice/sort)",
    "multimodal_frame_sample": "Frame-sampling plan (sequence-explode per media row)",
    "session_window_counts": "Streaming session windows (gap-based)",
    "json_parse_struct": "Typed JSON parsing (from_json to struct)",
    "table_counts": "Catalog discovery + per-table count probe",
    "iso_export": "ISO-8601 timestamp/key export formatting",
}


def main() -> int:
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    lines = [
        "# QUERIES — every registered query (generated by scripts/gen_query_index.py)",
        "",
        f"{len(qs)} queries; {len(oracles)} with DuckDB oracles. Order shown is",
        "the driver-check priority order (`registry.ordered_queries()`).",
        "",
        "| # | Query | Oracle | What it does |",
        "|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(qs.items(), 1):
        doc = (fn.__doc__ or "").strip().splitlines()
        desc = DESC.get(name) or (doc[0].rstrip(".") if doc else "—")
        mark = "yes" if name in oracles else "rows-only"
        lines.append(f"| {i} | `{name}` | {mark} | {desc} |")
    with open(os.path.join(os.path.dirname(__file__), "..", "QUERIES.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote QUERIES.md ({len(qs)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
