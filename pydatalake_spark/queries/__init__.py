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
#   (a) the 31 rows the freshness assert forces in (last green round ≤ r06
#       after the r10 ledger regen — the complete r06 stratum plus the
#       four rows r9 rotated out: json_extract, merge_upsert_orders,
#       minhash_signatures, ngram_jaccard_pairs). This completes the
#       first full ≤3-round rotation cycle of the whole registry.
#   (b) queries whose IMPLEMENTATION changes this round (r10):
#       decontamination_audit + exact_ngram_decontamination (shared
#       _decon_screen verdict pass with bloom_decontamination, VERDICT
#       item 3), semantic_dedup (_split_cells_once reap test hardening,
#       VERDICT item 2), and rp_distortion + rp_ann_recall (numpy
#       projection tier — interpreted HOF lambdas were the wall).
#       bloom_decontamination / q18 / q21 also change but already sit
#       in stratum (a).
#   (c) the stalest r07 rows (alphabetical prefix, 14 of 41; the
#       remaining 27 — key_skew_profile, k_anonymity_screen and
#       ivfadc_topk yield their slots to the (b) re-gates — front in
#       r11, fitting its 50-slot window).
_GATE_FRONT = [
    # (a) freshness-forced: r06-or-older green rows
    "bloom_decontamination",
    "json_extract",
    "merge_upsert_orders",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "partition_values",
    "pipeline_decontaminated_corpus",
    "pivot_linestatus",
    "q11_supplier_concentration",
    "q13_customer_distribution",
    "q18_large_volume_customer",
    "q21_sole_returned_supplier",
    "q2_min_price_part",
    "q4_order_priority",
    "q6_revenue_delta",
    "q8_market_share",
    "range_join_events",
    "resample_ffill",
    "scalar_functions",
    "semi_join",
    "source_mix_weights",
    "string_agg_per_group",
    "strip_contaminated_spans",
    "tables_diff_subset",
    "text_langid",
    "text_quality_score",
    "uniqueness_probe",
    "window_lag_lead",
    "window_rank",
    "window_time_range_avg",
    "winnow_fingerprints",
    # (b) implementation changed this round (r10)
    "decontamination_audit",
    "exact_ngram_decontamination",
    "semantic_dedup",
    "rp_distortion",
    "rp_ann_recall",
    # (c) stalest r07 rows (alphabetical prefix of the 41; rest in r11)
    "ann_recall_eval",
    "approx_profile",
    "asof_join_events",
    "cosine_topk",
    "doc_chunks",
    "doc_repetition_stats",
    "dsir_importance",
    "dup_cluster_histogram",
    "edit_distance_near_dup",
    "embedding_normalize",
    "embedding_quantize",
    "event_transition_matrix",
    "exact_dedup_docs",
    "ivf_topk",
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
