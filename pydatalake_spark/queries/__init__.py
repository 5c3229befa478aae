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
    # (a) new this round
    "quality_classifier_train",
    "quality_classifier_distilled",
    "pq_codebooks",
    "pq_encode",
    "pq_adc_topk",
    "pq_recall_eval",
    "ivfadc_topk",
    # (b) last green r04
    "q9_product_type_revenue",
    "q10_returned_items",
    "q12_priority_shipping",
    "session_sequences",
    "k_anonymity_screen",
    "key_skew_profile",
    "event_transition_matrix",
    "text_token_stats",
    "simhash_fingerprints",
    "unigram_surprisal",
    "token_budget_sample",
    "pipeline_clean_corpus",
    "pipeline_clean_corpus_v2",
    "pii_redact",
    "doc_repetition_stats",
    "sequence_pack",
    "doc_chunks",
    "lsh_recall_eval",
    "embedding_normalize",
    "embedding_quantize",
    "edit_distance_near_dup",
    "dup_cluster_histogram",
    # stalest r05 rows
    "q1_pricing_summary",
    "q3_shipping_priority",
    "dedup_keep_first",
    "tables_diff_full",
    "topk_orders",
    "window_running_sum",
    "sessionize",
    "asof_join_events",
    "exact_dedup_docs",
    "near_dup_pairs",
    "simhash_near_dup",
    "cosine_topk",
    "dup_span_stats",
    "strip_dup_spans",
    "semantic_dedup",
    "dsir_importance",
    "ann_recall_eval",
    "ivf_topk",
    "zipf_fit",
    "approx_profile",
    "multires_rollup",
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
