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
# against freshness.LAST_GREEN — r8 VERDICT item 6). This round (r11)
# opens the SECOND full rotation cycle:
#   (a) the 27 rows the freshness assert forces in — the entire remaining
#       r07 stratum (r10's front took the alphabetical prefix of the 41;
#       these are the other 27, exactly as the r10 comment promised).
#   (b) queries whose IMPLEMENTATION changes this round (r11):
#       q18_large_volume_customer (static F.broadcast(customer) hint
#       dropped — r10 ADVICE medium: customer scales with SF, AQE picks
#       the broadcast side at runtime) and rp_distortion + rp_ann_recall
#       (numpy-tier degenerate-input guards — zero-norm, ragged, empty —
#       so both method tiers agree; r10 ADVICE low).
#   (c) the stalest r08 rows (alphabetical prefix, 20 of 48) pulled
#       forward so r12's forced set shrinks to 28 and keeps fitting the
#       50-slot window.
_GATE_FRONT = [
    # (a) freshness-forced: the 27 remaining r07 rows
    "ivfadc_topk",
    "k_anonymity_screen",
    "key_skew_profile",
    "multires_rollup",
    "pii_redact",
    "pipeline_clean_corpus_v2",
    "pq_adc_topk",
    "pq_codebooks",
    "pq_encode",
    "pq_recall_eval",
    "q10_returned_items",
    "q12_priority_shipping",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_product_type_revenue",
    "sequence_pack",
    "session_sequences",
    "sessionize",
    "simhash_fingerprints",
    "simhash_near_dup",
    "tables_diff_full",
    "text_token_stats",
    "token_budget_sample",
    "topk_orders",
    "unigram_surprisal",
    "window_running_sum",
    "zipf_fit",
    # (b) implementation changed this round (r11)
    "q18_large_volume_customer",
    "rp_distortion",
    "rp_ann_recall",
    # (c) stalest r08 rows (alphabetical prefix, 15 of 48; rest in r12)
    "agg_min_max",
    "ann_lsh_buckets",
    "ann_multiprobe_candidates",
    "bpe_pair_counts",
    "bpe_token_stats",
    "conditional_agg",
    "cube_agg",
    "date_series",
    "distinct_counts",
    "doc_fingerprint",
    "drop_columns",
    "dup_span_stats",
    "embedding_outlier_screen",
    "embedding_stats",
    "except_keys",
    # (d) NEW this round (r11): the native Delta-protocol reader/writer
    # (sources/delta.py — VERDICT item 8, dependency-blocked no more:
    # implemented from the public PROTOCOL.md instead of delta-spark).
    # New queries have no green row yet, so they MUST front. Displaces
    # five (c) pulls (hard_triplet_mining, incremental_near_dup,
    # intersect_keys, interval_arith, lsh_recall_eval — r08-green, fresh
    # until r12's forced set, which stays ≤50).
    "delta_roundtrip_orders",
    "delta_time_travel_v0",
    "delta_merge_upsert_orders",
    "delta_stats_skip",
    "delta_partition_prune",
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
