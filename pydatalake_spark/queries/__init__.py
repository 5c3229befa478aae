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
# so the front is rotation under the freshness invariant (enforced below
# against freshness.LAST_GREEN — r8 VERDICT item 6):
#   (a) queries whose IMPLEMENTATION changes this round (r9): auto
#       method dispatch + agg-tier hot-split in operators/dedup.py
#       (dedup_keep_first/last, distinct_full), the shared _minhash_pairs
#       session cache (near_dup_pairs serves it; pipeline_clean_corpus
#       restricts it to survivors — r8 VERDICT item 7), the hyperplane
#       hot-bucket cap touching embedding_near_dup's module
#       (pinned-planes gate path unchanged), and semantic_dedup's
#       column-blocked verify (dominated flags asserted byte-equal, but
#       the implementation changed — re-gate).
#   (b) every row whose newest green driver round is r04-r05 — 26 rows,
#       including the three whose DEFINITIONS changed in r7 without a
#       post-change driver row (bigram_perplexity, token_pmi,
#       rp_distortion — r8 VERDICT item 1).
#   (c) the stalest r06 rows (22 of 49; the remaining 27 front in r10).
_GATE_FRONT = [
    # (a) implementation changed this round (r9)
    "dedup_keep_first",
    "dedup_keep_last",
    "distinct_full",
    "pipeline_clean_corpus",
    "near_dup_pairs",
    "quality_classifier_train",
    "quality_classifier_distilled",
    "embedding_near_dup",
    "semantic_dedup",
    # (b) r04 rows
    "ann_bucket_candidates",
    "char_entropy",
    "cms_heavy_hitters",
    # (b) r05 rows — bigram_perplexity/token_pmi/rp_distortion changed
    # semantics in r7 and have never been driver-gated since
    "bigram_perplexity",
    "token_pmi",
    "rp_distortion",
    "bm25_search",
    "cap_per_source",
    "corpus_datacard",
    "curriculum_stages",
    "dedup_rate_by_threshold",
    "kmeans_lloyd_step",
    "langid_confusion",
    "minhash_jaccard_estimate",
    "near_dup_communities",
    "ngram_containment_pairs",
    "pipeline_embedding_curation",
    "pipeline_full_curation",
    "prefix_dup_docs",
    "rolling_median_value",
    "rp_ann_recall",
    "source_duplication_matrix",
    "source_novelty",
    "split_balance_report",
    "value_histogram",
    "weighted_sample_docs",
    # (c) stalest r06 rows (alphabetical prefix of the 49; rest in r10)
    "array_functions",
    "cast_projection",
    "cohort_retention",
    "delta_append_diff",
    "exact_ngram_decontamination",
    "exact_percentiles",
    "filter_project",
    "funnel_view_click_purchase",
    "gopher_quality_flags",
    "grouping_sets_agg",
    "hopping_window_agg",
    "image_phash_near_dup",
    # (json_extract rotates out to fit near_dup_pairs' r9 re-gate — it
    # is r06-green and the freshness assert forces it into r10's front)
    "lsh_candidate_pairs",
    # (merge_upsert_orders and minhash_signatures rotate out to fit the
    # quality_classifier fit-cache re-gate — both r06-green; the
    # freshness assert forces them into r10's front)
    "multimodal_features",
    "near_dup_clusters",
    # (ngram_jaccard_pairs rotates out to fit semantic_dedup's re-gate;
    # it is r06-green and the freshness assert forces it into r10's front)
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
