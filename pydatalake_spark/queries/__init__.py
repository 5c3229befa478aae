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
# against freshness.LAST_GREEN — r8 VERDICT item 6). This round (r12):
#   (a) the 5 delta queries FIRST — three of them (delta_roundtrip_orders,
#       delta_stats_skip, delta_partition_prune) have never had a green
#       driver row (the r11 reds were a fixture-lifecycle race, fixed this
#       round: atomic+locked+code-hash-stamped builds in
#       queries/lakehouse.py — r11 VERDICT item 1) and the fixture path
#       changed, so all five re-gate.
#   (b) queries whose IMPLEMENTATION changed this round (r12):
#       q3_shipping_priority (static broadcast hints on SF-scaling
#       customer/orders dropped + decimal-exact revenue accumulation —
#       r11 VERDICT item 2); q5_local_supplier_volume is ALSO changed
#       (supplier hint dropped, r11 VERDICT item 3) and already sits in
#       the forced stratum below.
#   (c) the 33 rows the freshness assert forces in — everything whose
#       newest green row is r08 (the remainder the r11 comment promised,
#       plus the five r08 rows r11's delta queries displaced).
#   (d) fill: the stalest r09 rows, alphabetical prefix (11 of 46; the
#       rest are fresh until r13, whose forced set is those 35 + any
#       r12 changes).
_GATE_FRONT = [
    # (a) the native-Delta protocol queries (3 never driver-green; the
    # NEW deletion-vector and column-mapping queries have no green row
    # by definition)
    "delta_roundtrip_orders",
    "delta_stats_skip",
    "delta_partition_prune",
    "delta_deletion_vectors",
    "delta_column_mapping",
    "delta_update_dv",
    "delta_cdf_changes",
    "delta_time_travel_v0",
    "delta_merge_upsert_orders",
    # (b) implementation changed this round (r12)
    "q3_shipping_priority",
    # (c) freshness-forced: every remaining ≤r08-green row (33)
    "hard_triplet_mining",
    "incremental_near_dup",
    "intersect_keys",
    "interval_arith",
    "lsh_recall_eval",
    "null_semantics",
    "pipeline_clean_corpus_v3",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_excess_stock_suppliers",
    "q22_dormant_customers",
    "q5_local_supplier_volume",
    "q7_nation_volume",
    "quality_classifier",
    "rollup_agg",
    "session_stats",
    "sort_multi",
    "split_contamination",
    "sql_predicate_filter",
    "stratified_sample_docs",
    "strip_dup_spans",
    "table_profile",
    "tables_diff_cast",
    "tfidf_keywords",
    "time_bucket",
    "time_range_filter",
    "token_frequencies",
    "train_test_split",
    "union_by_name",
    "zscore_outliers",
    # (d) r12-OPTIMIZATION implementation changes (plans restructured,
    # results oracle-identical — re-gated per the (b) policy; they
    # displace the optional stalest-r09 fill, which rolls to r13's
    # forced set): q21 exchange sharing + supplier unhint; LPA argmax
    # (near_dup_communities); band self-join exchange reuse
    # (near_dup_pairs, image_phash_near_dup — simhash/ngram variants of
    # the same change are exercised via pipeline_clean_corpus_v3 and
    # strip_dup_spans in (c)); span-dedup exchange merge
    # (dup_span_stats); the cap-branch fusion
    # (pipeline_embedding_curation); the single-pass datacard rewrite
    # (corpus_datacard — argmax/countDistinct/avg equivalences). The CC
    # convergence fold is exercised by pipeline_clean_corpus_v3 in (c);
    # rp_ann_recall's query-side narrowing and unigram_surprisal's
    # Σc total are filter/identity-level equivalences verified by the
    # local full-registry sweep (0 failures, cold fixtures).
    "q21_sole_returned_supplier",
    "near_dup_communities",
    "near_dup_pairs",
    "image_phash_near_dup",
    "dup_span_stats",
    "pipeline_embedding_curation",
    "corpus_datacard",
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
