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
# round (CORRECTNESS_r01..r04 are each exactly the first 50 keys in
# iteration order). With 162 @q entries that cap forces a rotation; the
# union of green driver rows across r01–r04 covers 135 distinct keys.
# Round-5 front, two groups:
#   (a) the 27 queries with no green driver row in ANY prior round —
#       the 26 late-round-4 additions (multires rollup family, bigram
#       LM / PMI / prefix dup / containment / BM25, minhash estimator,
#       sampling + curation reports, k-means step, RP diagnostics) that
#       only have a local check_parity.py run, plus approx_profile,
#       whose new within-error-bound oracle flips it from the permanent
#       `no_oracle` row to a gateable one. After this round the green
#       union covers the ENTIRE registry.
#   (b) 23 canaries: queries whose implementation CHANGED this round
#       first (bloom auto-sizing, zipf_fit window-free rank, LPA
#       row_number tie-break feeds near_dup_communities — already in
#       (a)), then one stable previously-green member per major operator
#       family.
_GATE_FRONT = [
    # (a) never driver-confirmed
    "approx_profile",
    "multires_rollup",
    "rolling_median_value",
    "value_histogram",
    "bigram_perplexity",
    "token_pmi",
    "prefix_dup_docs",
    "minhash_jaccard_estimate",
    "cap_per_source",
    "near_dup_communities",
    "weighted_sample_docs",
    "ngram_containment_pairs",
    "bm25_search",
    "corpus_datacard",
    "curriculum_stages",
    "source_duplication_matrix",
    "dedup_rate_by_threshold",
    "langid_confusion",
    "source_novelty",
    "split_balance_report",
    "decontamination_audit",
    "kmeans_lloyd_step",
    "pipeline_embedding_curation",
    "pipeline_full_curation",
    "embedding_outlier_screen",
    "rp_distortion",
    "rp_ann_recall",
    # (b) canaries — changed-this-round implementations first
    "bloom_decontamination",
    "zipf_fit",
    "exact_ngram_decontamination",
    # stable previously-green family representatives
    "q1_pricing_summary",
    "q3_shipping_priority",
    "topk_orders",
    "window_running_sum",
    "tables_diff_full",
    "dedup_keep_first",
    "sessionize",
    "asof_join_events",
    "near_dup_pairs",
    "exact_dedup_docs",
    "semantic_dedup",
    "dup_span_stats",
    "strip_dup_spans",
    "ann_recall_eval",
    "ivf_topk",
    "dsir_importance",
    "multimodal_features",
    "cosine_topk",
    "simhash_near_dup",
    "image_phash_near_dup",
    "pipeline_clean_corpus_v3",
]

_missing = [k for k in _GATE_FRONT if k not in QUERIES]
assert not _missing, f"_GATE_FRONT names unknown queries: {_missing}"
_order = _GATE_FRONT + [k for k in QUERIES if k not in _GATE_FRONT]
QUERIES = {k: QUERIES[k] for k in _order}
ORACLE = {k: ORACLE[k] for k in _order if k in ORACLE}

__all__ = ["QUERIES", "ORACLE"]
