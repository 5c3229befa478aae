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
# round (CORRECTNESS_r01/r02 are each exactly the first 50 keys in
# iteration order). With 120+ queries that cap forces a rotation: this
# front list pins 49 queries with no green driver row in ANY prior round
# — every round-3 addition plus the never-checked backlog, keeping at
# least one member of every operator family — plus one previously-green
# canary. The still-unchecked stragglers (15 deferred family siblings
# plus queries added after this rotation was fixed) go in round 4's
# front — count them with: keys not in CORRECTNESS_r01|r02|r03. Relative order within each
# group is the module definition order.
_GATE_FRONT = [
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "window_lag_lead",
    "exact_percentiles",
    "string_agg_per_group",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_type_revenue",
    "q10_returned_items",
    "q11_supplier_concentration",
    "q12_priority_shipping",
    "q16_supplier_part_counts",
    "q20_excess_stock_suppliers",
    "q21_sole_returned_supplier",
    "text_quality_score",
    "text_langid",
    "exact_dedup_docs",
    "token_frequencies",
    "bpe_token_stats",
    "winnow_fingerprints",
    "lsh_candidate_pairs",
    "near_dup_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_dup",
    "approx_profile",
    "train_test_split",
    "tfidf_keywords",
    "near_dup_clusters",
    "incremental_near_dup",
    "split_contamination",
    "stratified_sample_docs",
    "pipeline_clean_corpus_v3",
    "multimodal_features",
    "embedding_stats",
    "cosine_topk",
    "embedding_quantize",
    "ann_lsh_buckets",
    "ann_multiprobe_candidates",
    "embedding_near_dup",
    "ivf_topk",
    "dup_span_stats",
    "strip_dup_spans",
    "semantic_dedup",
    "dsir_importance",
    "hard_triplet_mining",
    "image_phash_near_dup",
    "source_mix_weights",
    "quality_classifier",
    "exact_ngram_decontamination",
    "q1_pricing_summary",  # canary: green in r01+r02, re-pinned each round
]

_missing = [k for k in _GATE_FRONT if k not in QUERIES]
assert not _missing, f"_GATE_FRONT names unknown queries: {_missing}"
_order = _GATE_FRONT + [k for k in QUERIES if k not in _GATE_FRONT]
QUERIES = {k: QUERIES[k] for k in _order}
ORACLE = {k: ORACLE[k] for k in _order if k in ORACLE}

__all__ = ["QUERIES", "ORACLE"]
