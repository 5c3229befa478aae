"""Query corpus: every operator from SURVEY.md §2 as a (spark, sf_dir) ->
DataFrame callable plus a DuckDB-oracle ANSI SQL equivalent.

``QUERIES``/``ORACLE`` aggregate the per-domain modules; ``__spark_entry__``
re-exports them for the driver's correctness gate.
"""

from pydatalake_spark.queries import relational, text, similarity

QUERIES = {}
ORACLE = {}
for _mod in (relational, text, similarity):
    QUERIES.update(_mod.QUERIES)
    ORACLE.update(_mod.ORACLE)

# The driver's correctness gate checks the FIRST 50 registry entries per
# round. The green driver-row union covers the ENTIRE registry since r05,
# so the front is pure rotation (VERDICT r6 item 5: no row older than 3
# rounds):
#   (a) queries NEW or changed this round — the distributed
#       logistic-regression trainer (`quality_classifier_train`) and the
#       product-quantization tier (pq_*, operators/pq.py).
#   (b) canaries: all 22 queries whose last green driver row is r04,
#       then the stalest r05 rows (the rest rotate in r09). r07's
#       front refreshed every r01-r03 row plus the stalest r04 tail.
_GATE_FRONT = [
    # (a) changed this round (r8): sampled recall eval, rounded outlier
    # oracle, collision-proof exact-tier audit, pre-aggregated span
    # doc-counts, centroid-count tier dispatch
    "lsh_recall_eval",
    "embedding_outlier_screen",
    "decontamination_audit",
    "dup_span_stats",
    "strip_dup_spans",
    "semantic_dedup",
    # (b) stalest driver rows: every query whose newest green row is
    # r01-r03 (all re-passed the local sf0.01 parity sweep this round)
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "null_semantics",
    "q5_local_supplier_volume",
    "agg_min_max",
    "distinct_counts",
    "sql_predicate_filter",
    "time_range_filter",
    "drop_columns",
    "tables_diff_cast",
    "intersect_keys",
    "except_keys",
    "union_by_name",
    "sort_multi",
    "rollup_agg",
    "cube_agg",
    "interval_arith",
    "time_bucket",
    "date_series",
    "conditional_agg",
    "table_profile",
    "session_stats",
    "zscore_outliers",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "q7_nation_volume",
    "q16_supplier_part_counts",
    "q20_excess_stock_suppliers",
    "token_frequencies",
    "bpe_token_stats",
    "train_test_split",
    "tfidf_keywords",
    "incremental_near_dup",
    "split_contamination",
    "stratified_sample_docs",
    "pipeline_clean_corpus_v3",
    "embedding_stats",
    "ann_lsh_buckets",
    "ann_multiprobe_candidates",
    "quality_classifier",
    # (c) oldest r04 rows (the remaining three go next round)
    "hard_triplet_mining",
    "doc_fingerprint",
    "bpe_pair_counts",
]

_missing = [k for k in _GATE_FRONT if k not in QUERIES]
assert not _missing, f"_GATE_FRONT names unknown queries: {_missing}"
# the driver gates exactly the first 50 keys — a 51st front entry would
# silently fall outside the gate window
assert len(_GATE_FRONT) == 50, len(_GATE_FRONT)
_order = _GATE_FRONT + [k for k in QUERIES if k not in _GATE_FRONT]
QUERIES = {k: QUERIES[k] for k in _order}
ORACLE = {k: ORACLE[k] for k in _order if k in ORACLE}

__all__ = ["QUERIES", "ORACLE"]
