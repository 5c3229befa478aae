"""Query corpus: every operator from SURVEY.md §2 as a (spark, sf_dir) ->
DataFrame callable plus a DuckDB-oracle ANSI SQL equivalent.

``QUERIES``/``ORACLE`` aggregate the per-domain modules; ``__spark_entry__``
re-exports them for the driver's correctness gate.
"""

from pydatalake_spark.queries import lakehouse, relational, text, similarity

QUERIES = {}
ORACLE = {}
for _mod in (relational, text, similarity, lakehouse):
    QUERIES.update(_mod.QUERIES)
    ORACLE.update(_mod.ORACLE)

# The driver's correctness gate checks the FIRST 50 registry entries per
# round. The green driver-row union covers the ENTIRE registry since r05,
# so the front is rotation under the freshness invariant (enforced below
# against freshness.LAST_GREEN — r8 VERDICT item 6). This round (r13):
#   (a) ALL NINE native-Delta queries — r12 VERDICT item 1 orders them
#       kept in the r13 front: five were driver-red on hash (plain
#       double sums whose partial-sum order is machine-dependent at the
#       9-sig-digit canon); every price aggregate in
#       queries/lakehouse.py is now DECIMAL(18,4)-accumulated with the
#       identical cast in the oracle SQL, so the value is bit-exact
#       under ANY execution order. delta_append_diff sits in the forced
#       stratum (b) already.
#   (b) the 41 rows the freshness assert forces in — everything whose
#       newest green driver row is ≤ r09 (the r12 comment's promised
#       r13 set). This happens to cover many r13-touched paths
#       (near_dup_clusters, lsh_candidate_pairs, minhash_jaccard_estimate,
#       ngram_containment_pairs, source_novelty, bigram_perplexity,
#       token_pmi, pipeline_clean_corpus, kmeans_lloyd_step).
#   Slots: 9 + 41 = 50 exactly. corpus_datacard's r13 change (ADVICE
#   high: avg_quality excludes null-q docs from the denominator) is
#   invisible to the gate — the sf fixtures contain no empty/null-text
#   docs, so its gated result is bit-identical — and is pinned instead
#   by tests/test_pipeline_screens.py::
#   test_corpus_datacard_avg_quality_null_semantics, which runs BOTH
#   engines over a corpus that has exactly those docs. Other r13
#   plan-level changes whose queries are driver-fresh (r12-green) are
#   equivalence-preserving rewrites verified by the local full-registry
#   cold-fixture parity sweep; they re-front in later rotations.
_GATE_FRONT = [
    # (a) the native-Delta protocol queries, decimal-exact sums (r13)
    "delta_roundtrip_orders",
    "delta_stats_skip",
    "delta_partition_prune",
    "delta_deletion_vectors",
    "delta_column_mapping",
    "delta_update_dv",
    "delta_cdf_changes",
    "delta_time_travel_v0",
    "delta_merge_upsert_orders",
    # (b) freshness-forced: every remaining ≤r09-green row (41)
    "ann_bucket_candidates",
    "array_functions",
    "bigram_perplexity",
    "bm25_search",
    "cap_per_source",
    "cast_projection",
    "char_entropy",
    "cms_heavy_hitters",
    "cohort_retention",
    "curriculum_stages",
    "dedup_keep_first",
    "dedup_keep_last",
    "dedup_rate_by_threshold",
    "delta_append_diff",
    "distinct_full",
    "embedding_near_dup",
    "exact_percentiles",
    "filter_project",
    "funnel_view_click_purchase",
    "gopher_quality_flags",
    "grouping_sets_agg",
    "hopping_window_agg",
    "kmeans_lloyd_step",
    "langid_confusion",
    "lsh_candidate_pairs",
    "minhash_jaccard_estimate",
    "multimodal_features",
    "near_dup_clusters",
    "ngram_containment_pairs",
    "pipeline_clean_corpus",
    "pipeline_full_curation",
    "prefix_dup_docs",
    "quality_classifier_distilled",
    "quality_classifier_train",
    "rolling_median_value",
    "source_duplication_matrix",
    "source_novelty",
    "split_balance_report",
    "token_pmi",
    "value_histogram",
    "weighted_sample_docs",
]

_missing = [k for k in _GATE_FRONT if k not in QUERIES]
assert not _missing, f"_GATE_FRONT names unknown queries: {_missing}"
# the driver gates exactly the first 50 keys — a 51st front entry would
# silently fall outside the gate window
assert len(_GATE_FRONT) == 50, len(_GATE_FRONT)

# Freshness invariant (r8 VERDICT item 6): every registry query is either
# in this round's front (re-gated now) or has a committed green driver row
# no older than MAX_STALE_ROUNDS — rotation can never silently skip one.
from pydatalake_spark.queries.freshness import (  # noqa: E402
    CURRENT_ROUND,
    LAST_GREEN,
    MAX_STALE_ROUNDS,
)

_stale = [
    k
    for k in QUERIES
    if k not in _GATE_FRONT
    and LAST_GREEN.get(k, 0) < CURRENT_ROUND - MAX_STALE_ROUNDS
]
assert not _stale, (
    f"queries with no green driver row since round "
    f"{CURRENT_ROUND - MAX_STALE_ROUNDS} are missing from _GATE_FRONT: "
    f"{_stale} — front them or refresh freshness.LAST_GREEN"
)
_order = _GATE_FRONT + [k for k in QUERIES if k not in _GATE_FRONT]
QUERIES = {k: QUERIES[k] for k in _order}
ORACLE = {k: ORACLE[k] for k in _order if k in ORACLE}

__all__ = ["QUERIES", "ORACLE"]
