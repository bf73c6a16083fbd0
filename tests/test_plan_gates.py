"""Plan regression gates: the PLANS.md audit as pytest assertions.

PLANS.md is regenerated documentation; these tests are enforcement — a
plan regression (lost pushdown, a broadcast degrading to sort-merge, a
new shuffle, a scan widening past its projection) fails the suite
instead of silently drifting a doc (r4 verdict directive #2; precedent:
``test_flagship_sort_is_opt_in``, ``test_bucketed_join_has_no_exchange``).

The gated properties are semantic bounds, not full plan-string
snapshots: shuffle count is exact (structural), sort-merge joins are an
upper bound (more = a broadcast regressed), broadcast joins a lower
bound, window-group-limit pushdown a required boolean, and each scan is
bounded by its column budget with required PushedFilters fragments.
Numbers recorded from the initial (pre-AQE) physical plan at sf0.01 —
the same surface ``scripts/explain_audit.py`` documents.
"""

from __future__ import annotations

import pytest

from sql_database_to_elastic_datalake_spark.plans.audit import audit

SF = "/root/testdata/sf0.01"

# name -> dict(
#   shuffles=exact, smj_max=UPPER bound, bhj_min=LOWER bound,
#   wgl=window-group-limit required?,
#   scans={table: (max_cols, [required pushed fragments])})
GATES = {
    "denormalized_orders": dict(
        shuffles=4, smj_max=4, bhj_min=6, wgl=False,
        scans={
            "lineitem": (6, []),      # 6 of 16 cols: pruned
            "part": (2, []),
            "customer": (4, []),
            "nation": (3, []),
            "region": (2, []),
        },
    ),
    "pricing_summary": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False,
        scans={"lineitem": (6, ["LessThanOrEqual(l_shipdate"])},
    ),
    "latest_event_per_key": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=True,
        scans={"events": (6, [])},
    ),
    "merge_upsert": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=True,
        scans={"orders": (3, [])},
    ),
    "search_dsl_bool": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"orders": (4, [
            "GreaterThanOrEqual(o_totalprice,100000.0)",
            "LessThanOrEqual(o_totalprice,200000.0)",
            "EqualTo(o_orderstatus,F)",
        ])},
    ),
    # r13 re-record #2 (14 → 4 / 13 → 3): the signature / hash /
    # shingle-set relations the branch structure fans out over
    # (sparse all-pairs ∪ dense star, per-side verification joins)
    # are now localCheckpointed at their fan-out points, so the
    # audited plan sees checkpoint scans instead of one replanned
    # shingle→aggregate subtree per consumer (was 22 exchanges in
    # the initial plan, AQE-reuse-dependent at runtime; measured
    # sf1: simhash 13.6 → ~6 s steady, identical pair sets). The
    # checkpointed subtrees themselves carry the collapse groupBy +
    # semi-join + signature groupBy — linear, and now guaranteed to
    # run ONCE. bhj_min drops with the exchange count (the dim-side
    # broadcasts live inside the checkpointed subtrees now).
    # (scans: the parquet read lives INSIDE the checkpointed
    # subtrees, so the audited final plan has no scan to bound —
    # the 2-column projection is pinned by the dedup operator tests)
    "neardup_minhash_lsh": dict(
        shuffles=4, smj_max=0, bhj_min=2, wgl=False,
        scans={},
    ),
    "simhash_hamming_pairs": dict(
        shuffles=4, smj_max=0, bhj_min=0, wgl=False,
        scans={},
    ),
    # r13 (r12 verdict #3): the knn num_candidates tier — probe-cell
    # filter + cosine + TakeOrdered must stay ONE scan with zero
    # shuffles/joins (the probe pruning is the whole point; a join or
    # exchange here means the tier regressed to a distributed rank)
    "search_knn_ivf": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"embeddings": (3, [])},
    ),
    # r13: geohash cells are a pure-map grouping key — exactly one
    # groupBy shuffle; the stored-query sweep is one scan with zero
    # joins/shuffles (N queries = N codegen'd predicates, not data)
    "geo_grid_counts": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False,
        scans={"customer": (1, [])},
    ),
    "percolate_orders": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"orders": (4, [])},
    ),
    # r13 late: rest of the geo family. Tiles/rings are one groupBy
    # shuffle over a map-computed key/label; bounds+centroid is a
    # single two-phase agg; nearest-topk must stay TakeOrdered (a
    # global sort exchange here means the top-k cut regressed)
    "geo_tile_counts": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False,
        scans={"customer": (1, [])},
    ),
    "geo_rings_balance": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False,
        scans={"customer": (2, [])},
    ),
    "geo_bounds_centroid": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False,
        scans={"customer": (1, [])},
    ),
    "geo_nearest_topk": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"customer": (1, [])},
    ),
    "geo_distance_feature_rank": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"customer": (1, [])},
    ),
    "geo_polygon_members": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"customer": (1, [])},
    ),
    "embed_cosine_topk": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=True,
        scans={"embeddings": (2, ["In(vec_id, [0,1,2,3,4]"])},
    ),
    "events_range_join_prior": dict(
        shuffles=2, smj_max=2, bhj_min=2, wgl=False,
        scans={"events": (3, [])},
    ),
    "events_asof_order": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False,
        scans={"events": (3, ["LessThan(user_id,20)"])},
    ),
    "q4_order_priority": dict(
        shuffles=1, smj_max=0, bhj_min=2, wgl=False,
        scans={"orders": (3, []), "lineitem": (2, [])},
    ),
    "q10_returned_revenue": dict(
        shuffles=1, smj_max=0, bhj_min=6, wgl=False,
        scans={"lineitem": (4, ["EqualTo(l_returnflag,R)"]),
               "orders": (2, []), "customer": (3, []), "nation": (2, [])},
    ),
    "parts_above_type_avg": dict(
        shuffles=1, smj_max=0, bhj_min=2, wgl=False,
        scans={"part": (4, [])},
    ),
    "doc_chunks": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, [])},
    ),
    "pack_token_budget": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, [])},
    ),
    "q19_disjunctive_brand_revenue": dict(
        shuffles=1, smj_max=0, bhj_min=2, wgl=False,
        # the whole disjunction reaches BOTH scans as one Or(...) filter
        scans={"lineitem": (4, ["Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)"]),
               "part": (3, ["EqualTo(p_brand,Brand#1)"])},
    ),
    "approx_sketches": dict(
        shuffles=4, smj_max=0, bhj_min=4, wgl=False,
        scans={"events": (4, [])},
    ),
    "embed_ann_ivf": dict(
        shuffles=2, smj_max=0, bhj_min=2, wgl=True,
        scans={"embeddings": (2, [])},
    ),
    "search_dsl_msm_wildcard": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (4, [])},
    ),
    "incremental_sync_events": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"events": (4, ["GreaterThan(ts,"])},
    ),
    # --- r5 widening: the rest of the audited set ---------------------
    "search_bm25_scored": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, [])},
    ),
    "stratified_sample_langs": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, [])},
    ),
    "text_repetition": dict(
        shuffles=2, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, [])},
    ),
    "embed_quantize_int8": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"embeddings": (2, [])},
    ),
    "batch_sessionization": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False,
        scans={"events": (3, [])},
    ),
    "funnel_conversion": dict(
        shuffles=2, smj_max=0, bhj_min=0, wgl=False,
        scans={"events": (3, [])},
    ),
    "cohort_retention": dict(
        shuffles=3, smj_max=0, bhj_min=2, wgl=False,
        scans={"events": (2, [])},
    ),
    "event_transition_matrix": dict(
        shuffles=2, smj_max=0, bhj_min=0, wgl=False,
        scans={"events": (4, [])},
    ),
    "data_quality_audit": dict(
        shuffles=8, smj_max=0, bhj_min=6, wgl=False,
        scans={"customer": (1, []), "orders": (2, []), "lineitem": (1, [])},
    ),
    "history_asof_read": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=True,
        scans={"supplier": (2, [])},
    ),
    "rfm_segmentation": dict(
        shuffles=2, smj_max=0, bhj_min=0, wgl=False,
        scans={"orders": (3, [])},
    ),
    "dedup_keep_canonical": dict(
        shuffles=4, smj_max=4, bhj_min=0, wgl=False,
        scans={"documents": (3, [])},
    ),
    "leakage_safe_split": dict(
        shuffles=2, smj_max=2, bhj_min=2, wgl=False,
        scans={"documents": (1, [])},
    ),
    "gdpr_delete_sync": dict(
        shuffles=1, smj_max=0, bhj_min=2, wgl=False,
        scans={"events": (3, ["EqualTo(event_ty"])},
    ),
    "rag_context_assembly": dict(
        shuffles=1, smj_max=0, bhj_min=2, wgl=True,
        scans={"embeddings": (2, ["In(vec_id, [0,1,2]"]),
               "documents": (2, [])},
    ),
    "user_feature_table": dict(
        shuffles=2, smj_max=0, bhj_min=0, wgl=False,
        scans={"events": (4, [])},
    ),
    "chunk_level_dedup": dict(
        shuffles=2, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (1, [])},
    ),
    "wow_growth": dict(
        shuffles=2, smj_max=0, bhj_min=0, wgl=False,
        scans={"events": (1, [])},
    ),
    "key_skew_report": dict(
        shuffles=2, smj_max=0, bhj_min=0, wgl=False,
        scans={"lineitem": (1, [])},
    ),
    "snapshot_diff": dict(
        shuffles=3, smj_max=2, bhj_min=0, wgl=False,
        scans={"supplier": (2, [])},
    ),
    "search_dsl_terms_set": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (3, [])},
    ),
    # ES aggs compiler: terms = groupBy + TakeOrdered (1 shuffle, the
    # null-key exclusion pushed to the scan); date_histogram pays one
    # extra tiny post-agg range exchange for the key-asc envelope
    # order; filter = single conditional-agg job
    "search_aggs_terms_stats": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, ["IsNotNull(lang)"])},
    ),
    "search_aggs_date_histogram": dict(
        shuffles=2, smj_max=0, bhj_min=0, wgl=False,
        scans={"events": (2, [])},
    ),
    "search_aggs_filter_metrics": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, [])},
    ),
    # composite: the after-cursor predicate must reach the scan as a
    # pushed filter — that is what makes page N of a huge key domain
    # cheaper than page 1, the whole point of the cursor
    "search_aggs_composite_page": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, [
            "Or(GreaterThan(lang,de),And(EqualTo(lang,de),"
            "GreaterThan(source,src12)))",
        ])},
    ),
    # multi-level bucket chain (r6): BOTH levels + the metric
    # components ride ONE composite-key shuffle (the verdict's
    # everything-rides-one-shuffle property, enforced)
    "search_aggs_nested_levels": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False,
        scans={"events": (3, ["IsNotNull(event_type)"])},
    ),
    # offset pagination (r6): sort+offset+limit fuse into one
    # TakeOrderedAndProject — zero exchanges, filter pushed
    "search_from_size_page": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (4, ["IsNotNull(text)"])},
    ),
    # _source filtering (r6): the include/exclude projection must reach
    # parquet as a reduced ReadSchema — 2 of 5 columns
    "search_source_filtering": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, ["EqualTo(lang,en)"])},
    ),
    # query_string grammar (r6): the parsed tree compiles to the same
    # scan-level predicate shape as the structured leaves — no shuffle,
    # no join, pruned scan
    "search_dsl_query_string": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (4, [])},
    ),
    "search_dsl_simple_qs": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (3, [])},
    ),
    # field collapsing (r6): window top-1 per key must keep the
    # WindowGroupLimit pre-truncation — one shuffle, pruned scan
    "search_collapse_field": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=True,
        scans={"documents": (4, ["IsNotNull(text)"])},
    ),
    # terms order/missing/min_doc_count still ride ONE groupBy +
    # TakeOrdered — the parameters must not add a pass
    "search_aggs_terms_order": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, [])},
    ),
    # min_doc_count:0 gap filling: one agg shuffle per branch (counts +
    # bounds), the dense-sequence join stays BROADCAST (both sides are
    # bucket-count-sized) — a sort-merge here would mean the join keyed
    # on the fact table by mistake
    "search_aggs_histogram_gaps": dict(
        shuffles=2, smj_max=0, bhj_min=2, wgl=False,
        scans={"events": (2, ["IsNotNull(event_id)"])},
    ),
    # significant_terms: fg/bg aggs + term join + broadcast totals; the
    # foreground predicate must reach both fg-side scans
    "search_aggs_significant_terms": dict(
        shuffles=4, smj_max=0, bhj_min=2, wgl=False,
        scans={"documents": (2, [])},
    ),
    # r7: time_zone/offset bucket rounding is pure column arithmetic —
    # the same one-agg-one-sort shape as a plain date_histogram (a
    # third shuffle would mean the tz shifts broke the single groupBy)
    "search_aggs_timezone": dict(
        shuffles=2, smj_max=0, bhj_min=0, wgl=False,
        scans={"events": (2, [])},
    ),
    # r7: missing_bucket keeps the composite at ONE shuffle and the
    # null-aware cursor must not block the per-source not-null pushdown
    "search_aggs_composite_missing": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, ["IsNotNull(source)"])},
    ),
    # r7: the ranked offset page fuses into one TakeOrderedAndProject —
    # zero exchanges, 2-column scan
    "search_ranked_offset_page": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, [])},
    ),
    # r9: function_score / script_score rank with pure column algebra —
    # the plan stays one pruned scan + one TakeOrdered, zero
    # exchanges, and the inner query's filter still reaches parquet
    "search_dsl_function_score": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (3, ["In(lang, [de,en])"])},
    ),
    "search_dsl_script_score": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, ["GreaterThanOrEqual(n_chars,100)"])},
    ),
    # r9: more_like_this — the seed lookup is a separate point job;
    # the returned plan is ONE corpus scan with the msm count inline
    "search_dsl_more_like_this": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, [])},
    ),
    # r9: the quality classifier's inline tier is ONE projection —
    # zero shuffles, zero joins, 2-column scan, whole-stage codegen
    "quality_classifier_scores": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, [])},
    ),
    # r7: bracket ranges / sloppy phrases / fuzzy match all compile to
    # scan-level predicates — no shuffle, no join, pruned scans
    "search_dsl_qs_ranges": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (3, [])},
    ),
    "search_dsl_phrase_slop": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (3, [])},
    ),
    "search_dsl_match_fuzzy": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (3, [])},
    ),
    # r7 late additions: the compound leaves (dis_max/boosting/pinned/
    # wrapper, combined_fields) compile to scan-level predicates —
    # zero exchanges; sort options and min_score ride the TakeOrdered
    "search_dsl_compound": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (4, [])},
    ),
    "search_dsl_combined_fields": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (3, ["IsNotNull(text)"])},
    ),
    "search_sort_options": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, [])},
    ),
    "search_sort_mode_array": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"embeddings": (2, [])},
    ),
    "search_min_score": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, [])},
    ),
    # the term suggester: dictionary groupBy + per-token window top-k
    # (WindowGroupLimit required) + the broadcast self-freq gate
    "search_suggest_terms": dict(
        shuffles=3, smj_max=0, bhj_min=1, wgl=True,
        scans={"documents": (1, [])},
    ),
    # SemDeDup (matmul tier): ONE shuffle into the per-cell
    # applyInPandas, broadcast anti-join back; a sort-merge here would
    # mean the dropped set stopped broadcasting
    "semdedup_embeddings": dict(
        shuffles=1, smj_max=0, bhj_min=1, wgl=False,
        scans={"embeddings": (2, [])},
    ),
    # r9: boilerplate removal — exactly three key-partitioned
    # shuffles (chunk-freq groupBy, freq join back, per-doc regroup);
    # a fourth would mean the chunk explode started shuffling
    "boilerplate_chunk_removal": dict(
        shuffles=3, smj_max=2, bhj_min=0, wgl=False,
        scans={"documents": (2, [])},
    ),
    # r9: span queries compile to transform/filter positional algebra
    # over ONE token-array expression — zero exchanges, pruned scan
    "search_dsl_span_near": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (3, [])},
    ),
    "search_dsl_span_first": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (3, [])},
    ),
    # r10: span_containing — big-envelope producer + enclosure exists,
    # zero exchanges over one pruned scan
    "search_dsl_span_containing": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (3, [])},
    ),
    # r10: intervals filter relations — span producer + relation
    # filter stay zero-exchange column algebra over one pruned scan
    "search_dsl_intervals_filter": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (3, [])},
    ),
    # r10: the nested span_near tree (span-producer inner chain +
    # unordered outer exists-walk) stays zero-exchange column algebra
    # over one pruned scan — an exchange here would mean the span
    # enumeration stopped being per-row
    "search_dsl_span_nested": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (3, [])},
    ),
    # r9: the filter-context script query is one scan-level predicate
    "search_dsl_script_query": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"events": (3, [])},
    ),
    # r9: rank_feature / distance_feature ranked pages — one pruned
    # scan + one TakeOrdered, zero exchanges; the positive-feature /
    # not-null membership reaches parquet as a pushed filter
    "search_dsl_rank_feature": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, ["GreaterThan(n_chars,0)"])},
    ),
    "search_dsl_distance_feature": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False,
        scans={"orders": (2, ["IsNotNull(o_orderdate)"])},
    ),
    # r10: significant_text — BOTH scopes ride one tokenized scan
    # (the fg predicate is a flag column on the background tokenize);
    # the second scan is the count-only totals pass (1 col, no
    # tokenizer). A third scan would mean the foreground started
    # re-tokenizing.
    "search_aggs_significant_text": dict(
        shuffles=2, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (2, [])},
    ),
    # r10: fuzzy completion — dictionary groupBy (1 shuffle, 1-col
    # pruned scan, not-null pushed); the threshold levenshtein rides
    # the post-groupBy filter so it runs once per DISTINCT value
    "search_suggest_completion_fuzzy": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False,
        scans={"documents": (1, ["IsNotNull(text)"])},
    ),
    # r10: sampler > significant_terms — the sample is materialized
    # (one eager TakeOrdered of shard_size rows, not in this plan);
    # the returned plan touches the corpus only for the background
    # term counts (pruned 1-col scan, pushed not-null) and the bg
    # total (0-col count)
    # r14: the background branch groups WITHOUT the key-null filter
    # (one corpus pass — the total-docs scalar bt rides the grouped
    # frame as an unpartitioned-window sum; nulls filtered after the
    # agg), so IsNotNull(source) deliberately no longer pushes to the
    # scan: the scan is one column wide either way and the old shape
    # paid a SECOND full scan for the scalar
    "search_aggs_sampler_significant": dict(
        shuffles=4, smj_max=0, bhj_min=1, wgl=False,
        scans={"documents": (1, [])},
    ),
    # r10: DSIR importance weights — the bucket model is ONE corpus
    # scan (groupBy bounded by n_buckets + an unpartitioned window
    # over the B-row frame), broadcast-joined to the per-(doc, bucket)
    # counts; a sort-merge here would mean the B-row model stopped
    # broadcasting, and a 4th shuffle would mean the model lineage
    # started double-evaluating
    "dsir_importance_weights": dict(
        shuffles=3, smj_max=0, bhj_min=1, wgl=False,
        scans={"documents": (2, [])},
    ),
    # r11 (verdict #2): embed_neardup_pairs REGISTERS the
    # sign-bucketed tier, never a cartesian product (cartesian_max=0;
    # the exact all-pairs tier is pytest-only). r14: the bucket
    # self-join became a per-bucket grouped map (the SemDeDup
    # pattern) — ONE embeddings scan shipped once into ONE bucket
    # regroup shuffle, no join at all, bit-identical pair output
    # (operators/similarity.py _bucketed_neardup_pairs; sf1
    # 5.8 -> 1.0 s). A join reappearing here means the grouped-map
    # tier regressed to pair materialization. r15: the salt-split for
    # oversized buckets rides the SAME exchange (window count on the
    # bucket key + conditional block explode; hash(bucket) satisfies
    # the (bucket, lo, hi) clustering), so shuffles stays EXACTLY 1 —
    # a second exchange means the split started reshuffling vectors.
    "embed_neardup_pairs": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False, cartesian_max=0,
        scans={"embeddings": (2, [])},
    ),
    # r11 (verdict #1): ExactSubstr duplicate-span removal — ONE
    # k-gram explode (site counts via a window over the gram hash,
    # not a groupBy + self-join that would re-run the explode), one
    # per-doc regroup, one join back (broadcast at sf0.01). A third
    # shuffle means the explode started double-evaluating.
    "exact_substring_dedup": dict(
        shuffles=2, smj_max=0, bhj_min=1, wgl=False, cartesian_max=0,
        scans={"documents": (2, ["IsNotNull(text)"])},
    ),
    # r11: regex completion — one dictionary groupBy (pruned 1-col
    # scan, not-null pushed); the anchored RLIKE runs on the DISTINCT
    # values after the shuffle, never per corpus row
    "search_suggest_completion_regex": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False, cartesian_max=0,
        scans={"documents": (1, ["IsNotNull(text)"])},
    ),
    # r11: the interval script filter is per-row span algebra like the
    # rest of the positional family — zero exchanges
    "search_dsl_intervals_script": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False, cartesian_max=0,
        scans={"documents": (3, [])},
    ),
    # r11: the Arrow-batched exact-BPE count is a pure projection
    # (zero shuffles — a shuffle here means the pandas UDF stopped
    # riding the scan)
    "token_count_bpe_exact": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False, cartesian_max=0,
        scans={"documents": (2, [])},
    ),
    # r11: surgical decontamination — probe grams BROADCAST (the
    # probe set is benchmark-sized); the corpus pays one k-gram
    # explode + the per-doc regroup; never a cartesian
    "benchmark_decontamination_spans": dict(
        shuffles=2, smj_max=0, bhj_min=2, wgl=False, cartesian_max=0,
        scans={"documents": (2, ["IsNotNull(text)"])},
    ),
    # r11: CCNet-style LM perplexity — the pair model and its context
    # margin BROADCAST (saturation-bounded at B² rows whatever the
    # corpus); an SMJ here means a model stopped broadcasting
    "lm_perplexity_features": dict(
        shuffles=5, smj_max=0, bhj_min=2, wgl=False, cartesian_max=0,
        scans={"documents": (2, [])},
    ),
    # late r11: interpolated-KN scoring — the Laplace tier's shape
    # plus one broadcast margin; every model-side join must broadcast.
    # r14: 7 -> 8 shuffles — the type total T moved from a blocking
    # driver-side model.count() at build time (a whole EXTRA job
    # re-running the model lineage, invisible to this gate) into a
    # 1-row count aggregate broadcast-cross-joined in the same job;
    # the +1 is that count's single-row gather exchange, and the
    # model subtree is shared via ReuseExchange instead of re-executed.
    # cartesian_max=2 is ONE BroadcastNestedLoopJoin (formatted plans
    # print each node twice): the scalar T attach — its build side is
    # an empty-key 1-row aggregate BY CONSTRUCTION, so the nested loop
    # is a scalar broadcast, not an all-pairs hazard at any scale
    "lm_kneser_ney_features": dict(
        shuffles=8, smj_max=0, bhj_min=3, wgl=False, cartesian_max=2,
        scans={"documents": (2, [])},
    ),
    # late r11: mixture materialization — the domain-count/target
    # lookup BROADCASTS back (rows = |domains|); the corpus pays one
    # shuffle on the domain key for the rank window, never a global
    # sort, never a cartesian
    "mixture_domain_resample": dict(
        shuffles=3, smj_max=0, bhj_min=1, wgl=False, cartesian_max=0,
        scans={"documents": (2, [])},
    ),
    # r12: the relevance-boost ranked family — pure column algebra
    # over ONE pruned scan, zero shuffles (TakeOrdered pages), the
    # membership predicate pushed where a leaf allows it
    "search_boosted_multimatch": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False, cartesian_max=0,
        scans={"documents": (3, [])},
    ),
    "search_boosted_bool_should": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False, cartesian_max=0,
        scans={"documents": (4, [])},
    ),
    "search_query_string_boosted": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False, cartesian_max=0,
        scans={"documents": (2, [])},
    ),
    "search_function_score_query_base": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False, cartesian_max=0,
        scans={"documents": (3, ["IsNotNull(text)"])},
    ),
    "search_function_score_random": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False, cartesian_max=0,
        scans={"documents": (2, ["EqualTo(lang,en)"])},
    ),
    # r14: the join-field family — each leaf ONE distinct/count key
    # reduction + ONE pinned shuffle-hash flag join (broadcast stays
    # 0 BY CONSTRUCTION: letting AQE gamble a big key set into a
    # broadcast is the OOM mode the dedup pins guard against); inner
    # queries push to the sibling scan; never a cartesian.
    # has_child(min_children=3): keys groupBy exchange is REUSED as
    # the join-side exchange -> 2 total.
    "join_field_has_child": dict(
        shuffles=2, smj_max=0, bhj_min=0, wgl=False, cartesian_max=0,
        scans={
            "orders": (2, []),
            "lineitem": (2, ["GreaterThan(l_quantity,45.0)"]),
        },
    ),
    # two has_parent leaves on the same relation share ONE key pass
    # (r15, guide §2.4): one orders scan filtered by the OR of both
    # leaf predicates, one conditional-flag groupBy, one shuffle-hash
    # flag join — so 3 exchanges dropped to 2 (lineitem once + the
    # merged key set once). A third shuffle reappearing means the
    # leaves stopped sharing the pass. The orders scan loses the
    # single-leaf pushed EqualTo by design: the union filter is an OR
    # of both predicates (still pushable as an Or, but the audit
    # fragment pins the column budget instead).
    "join_field_has_parent": dict(
        shuffles=2, smj_max=0, bhj_min=0, wgl=False, cartesian_max=0,
        scans={
            "lineitem": (3, []),
            # one merged scan carries both leaves' columns (key +
            # priority + totalprice) instead of two 2-col scans
            "orders": (3, []),
        },
    ),
    # r14: knn DSL filter through the probed IVF tier — the filter
    # must PUSH to the scan (rows outside it never pay the nlist
    # assignment fold or the cosine), plan stays zero-shuffle like
    # the unfiltered tier
    "search_knn_ivf_filtered": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False, cartesian_max=0,
        scans={"embeddings": (3, ["In(label, [3,7])",
                                  "IsNotNull(embedding)"])},
    ),
    # r14: CIDR term — numeric block membership over the derived ip
    # string; one projection, zero shuffles (the derived column
    # can't push, a REAL ip column's comparisons would)
    "cidr_term_members": dict(
        shuffles=0, smj_max=0, bhj_min=0, wgl=False, cartesian_max=0,
        scans={"customer": (1, [])},
    ),
    # r14: scripted_metric rides the terms frame — same single
    # groupBy shuffle as any terms agg, reduce fused into the agg
    "scripted_metric_priority": dict(
        shuffles=1, smj_max=0, bhj_min=0, wgl=False, cartesian_max=0,
        scans={"orders": (2, [])},
    ),
}


@pytest.fixture(scope="module")
def summaries(spark):
    import __spark_entry__ as e

    qs = e.queries()
    return {name: audit(qs[name](spark, SF)) for name in GATES}


@pytest.mark.parametrize("name", sorted(GATES))
def test_plan_gate(summaries, name):
    want, got = GATES[name], summaries[name]
    assert got["shuffles"] == want["shuffles"], (
        f"{name}: shuffle count changed "
        f"({got['shuffles']} vs recorded {want['shuffles']}) — "
        f"re-audit with scripts/explain_audit.py and justify before "
        f"re-recording"
    )
    assert got["sortmerge_joins"] <= want["smj_max"], (
        f"{name}: {got['sortmerge_joins']} sort-merge joins (max "
        f"{want['smj_max']}) — a broadcast likely degraded to SMJ"
    )
    assert got["broadcast_joins"] >= want["bhj_min"], (
        f"{name}: {got['broadcast_joins']} broadcast joins (min "
        f"{want['bhj_min']}) — a dimension stopped broadcasting"
    )
    assert (got["window_group_limit"] > 0) == want["wgl"], (
        f"{name}: WindowGroupLimit pushdown flipped "
        f"(now {got['window_group_limit'] > 0}, recorded {want['wgl']})"
    )
    if "cartesian_max" in want:
        assert got["cartesian"] <= want["cartesian_max"], (
            f"{name}: {got['cartesian']} cartesian/nested-loop joins "
            f"(max {want['cartesian_max']}) — an equi-join degraded "
            f"to all-pairs"
        )
    seen_tables = {s["table"] for s in got["scans"]}
    for table, (max_cols, fragments) in want["scans"].items():
        table_scans = [s for s in got["scans"] if s["table"] == table]
        assert table_scans, (
            f"{name}: expected a parquet scan of {table}, saw {seen_tables}"
        )
        widest = max(s["n_cols"] for s in table_scans)
        assert widest <= max_cols, (
            f"{name}: {table} scan reads {widest} cols (budget {max_cols})"
            f" — column pruning regressed"
        )
        for frag in fragments:
            assert any(frag in s["pushed"] for s in table_scans), (
                f"{name}: filter fragment {frag!r} no longer reaches the "
                f"{table} scan; pushed: {[s['pushed'] for s in table_scans]}"
            )
