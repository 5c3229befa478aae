"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1,
     "oracle": {"q1": sec, ...}, "oracle_total_sec": N,
     "vs_oracle_ratio": spark_total / oracle_total,
     "ratios": {"q1": spark/oracle, ...}}

Each Spark query is executed to completion with the noop sink (full plan
runs, nothing materializes on the driver) and timed wall-clock. A warm-up
pass runs first so JVM/codegen startup isn't billed to the first query.
The same queries' DuckDB oracle SQL is then timed on the same parquet —
that is the single-node engine the reference delegates 100% of execution
to, so spark_sec/duckdb_sec is the measurable form of the BASELINE "within
2x of the reference" gate.

The scaling probe runs by DEFAULT (set SPARK_GRAFT_SCALING_PROBE=0 to
skip): probe queries are re-run on a REPLICAS x blow-up of the bench tables
(deterministically decorrelated so dedup/near-dup outputs stay ~linear)
and the per-query scaling exponent log(t_big/t_small)/log(REPLICAS) is
reported — an exponent near 1 is linear scaling; near 2 means a quadratic
blow-up the single-scale bench can't see.
"""

from __future__ import annotations

import json
import math
import os
import re
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALING_PROBE = os.environ.get("SPARK_GRAFT_SCALING_PROBE", "1") != "0"
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALING_REPLICAS", "10"))

# representative slice of SURVEY §2 + north-star ops: scans/aggs, joins,
# dedup, diffs, windows, time-series joins, text dedup, similarity
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q6_revenue_delta",
    "q4_order_priority",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q13_customer_distribution",
    "q18_large_volume_customer",
    "q8_market_share",
    "q10_returned_items",
    "q21_sole_returned_supplier",
    "filter_project",
    "dedup_keep_last",
    "distinct_full",
    "tables_diff_full",
    "delta_append_diff",
    "semi_join",
    "topk_orders",
    "window_running_sum",
    "rollup_agg",
    "time_bucket",
    "asof_join_events",
    "range_join_events",
    "funnel_view_click_purchase",
    "cohort_retention",
    "merge_upsert_orders",
    "window_time_range_avg",
    "exact_dedup_docs",
    "token_frequencies",
    "text_quality_score",
    "bpe_token_stats",
    "winnow_fingerprints",
    "minhash_signatures",
    "near_dup_pairs",
    "ngram_jaccard_pairs",
    "near_dup_clusters",
    "incremental_near_dup",
    "tfidf_keywords",
    "pipeline_clean_corpus",
    "pipeline_clean_corpus_v2",
    "pipeline_clean_corpus_v3",
    "simhash_fingerprints",
    "simhash_near_dup",
    "embedding_stats",
    "cosine_topk",
    "ann_lsh_buckets",
    "embedding_near_dup",
    "ivf_topk",
    "dup_span_stats",
    "strip_dup_spans",
    "semantic_dedup",
    "dsir_importance",
    "exact_ngram_decontamination",
    "quality_classifier",
    "quality_classifier_train",
    "bpe_pair_counts",
    "hard_triplet_mining",
    "image_phash_near_dup",
    "resample_ffill",
    "session_sequences",
    "hopping_window_agg",
    "event_transition_matrix",
    "key_skew_profile",
    "lsh_recall_eval",
    "char_entropy",
    "bloom_decontamination",
    "cms_heavy_hitters",
    "zipf_fit",
    "edit_distance_near_dup",
    "bigram_perplexity",
    "token_pmi",
    "prefix_dup_docs",
    "kmeans_lloyd_step",
    "minhash_jaccard_estimate",
    "cap_per_source",
    "pipeline_embedding_curation",
    "near_dup_communities",
    "weighted_sample_docs",
    "ngram_containment_pairs",
    "bm25_search",
    "corpus_datacard",
    "curriculum_stages",
    "pipeline_full_curation",
    "pipeline_decontaminated_corpus",
    "strip_contaminated_spans",
    "source_duplication_matrix",
    "embedding_outlier_screen",
    "multires_rollup",
    "rolling_median_value",
    "value_histogram",
    "rp_distortion",
    "rp_ann_recall",
    "pq_codebooks",
    "pq_encode",
    "pq_adc_topk",
    "pq_recall_eval",
    "ivfadc_topk",
    "dedup_rate_by_threshold",
    "langid_confusion",
    "source_novelty",
    "split_balance_report",
    "decontamination_audit",
    # Delta-log reads (r11, sources/delta.py): snapshot replay + scan,
    # version time travel, log-level partition pruning. The one-time
    # fixture table build (two commits from orders) lands in
    # cold_first_run, where one-time costs belong.
    "delta_roundtrip_orders",
    "delta_time_travel_v0",
    "delta_stats_skip",
    "delta_partition_prune",
    # r12: merged-table read (the upsert happens ONCE at fixture build;
    # the commit cost is its own artifact, BENCH_delta_merge.json), the
    # deletion-vector-filtered read (reader protocol v3), and the
    # column-mapping read (physical-schema scan + logical projection).
    "delta_merge_upsert_orders",
    "delta_deletion_vectors",
    "delta_column_mapping",
    "delta_update_dv",
    "delta_cdf_changes",
]

# scaling probe: one scan-agg, one heavy multi-join agg, one minhash
# near-dup, one embedding near-dup, and the auto-sized SemDeDup — the
# shapes where quadratic regressions would hide (semantic_dedup's
# within-cell pair work is linear ONLY if suggest_num_cells scales the
# cell count with the corpus; the probe proves it)
PROBE_QUERIES = [
    "q1_pricing_summary",
    "q18_large_volume_customer",
    "near_dup_pairs",
    "ngram_jaccard_pairs",
    "dup_span_stats",
    "embedding_near_dup",
    "semantic_dedup",
    "dsir_importance",
    "hard_triplet_mining",
    "bloom_decontamination",
    "bigram_perplexity",
    "token_pmi",
    "near_dup_clusters",
    "pipeline_decontaminated_corpus",
    "strip_contaminated_spans",
    # r11: the Delta-log read path — snapshot replay + log-pruned scan
    # over the replica-built fixture table (the one-time fixture build
    # lands in the probe's untimed warm run)
    "delta_roundtrip_orders",
]
PROBE_TABLES = ["lineitem", "orders", "customer", "documents", "embeddings"]


def _run_timed(fn, spark, sf_dir) -> float:
    # NOTE deliberately NO clearCache here: the oracle side is timed on
    # its SECOND execution (warm buffer pool), so Spark keeps its warm
    # table caches too — clearing them charges every query a cold parquet
    # re-read the DuckDB side never pays (measured +48% total, all of it
    # scan overhead). Operator-internal caches (minhash signatures) are
    # per-plan and tiny relative to executor memory at this SF. Round 6:
    # the engine also materializes per-corpus SHARED indexes (the Jaccard
    # pair table, the decontamination window table) that several queries
    # consume — those stay warm across timed queries BY DESIGN (that
    # sharing is the engine's execution strategy, stated in COVERAGE.md);
    # the scaling probe bypasses them (_probe_callable) so exponents
    # still measure the underlying operators.
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 4)


_COUNTER_FIELDS = {
    "shuffle_read_bytes": "shuffleReadBytes",
    "shuffle_read_records": "shuffleReadRecords",
    "shuffle_write_bytes": "shuffleWriteBytes",
    "shuffle_write_records": "shuffleWriteRecords",
    "input_bytes": "inputBytes",
    "input_records": "inputRecords",
    "disk_spill_bytes": "diskBytesSpilled",
    "mem_spill_bytes": "memoryBytesSpilled",
}


def _stage_counters(spark) -> dict:
    """Cumulative IO counters over all COMPLETED + FAILED stages of this
    app, via the UI REST API (r7 VERDICT item 1: turn the 'superlinearity
    is spill IO, not volume' attribution into measurement). Diff two
    snapshots around a run to get that run's totals — if shuffle
    records/bytes grow ~linearly across a probe decade while wall time
    grows faster, the plan carries no quadratic term and the excess is
    IO-contention.

    Snapshot hygiene (r8 ADVICE): the poll first waits (≤5s) for ACTIVE
    stages to drain so stages still finalizing when the action returns
    are not dropped from the delta, and failed stages count too — their
    IO happened. Caveat: stages the UI has not yet registered after the
    5s settle are still missed; deltas are a floor, not an audit."""
    import json as _json
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def _fetch(status: str):
        url = f"{base}/api/v1/applications/{app}/stages?status={status}"
        with urllib.request.urlopen(url, timeout=30) as r:
            return _json.load(r)

    for _ in range(50):  # ≤5s: let just-finished stages finalize
        if not _fetch("active"):
            break
        time.sleep(0.1)
    stages = _fetch("complete") + _fetch("failed")
    out = dict.fromkeys(_COUNTER_FIELDS, 0)
    for s in stages:
        for k, field in _COUNTER_FIELDS.items():
            out[k] += int(s.get(field, 0) or 0)
    return out


def _run_timed_counters(fn, spark, sf_dir) -> tuple[float, dict]:
    """_run_timed plus the run's completed-stage counter deltas."""
    before = _stage_counters(spark)
    sec = _run_timed(fn, spark, sf_dir)
    after = _stage_counters(spark)
    return sec, {k: after[k] - before[k] for k in _COUNTER_FIELDS}


def _replica_transform(df, t: str, i: int):
    """Deterministic per-replica decorrelation: key shift (join fan-in
    scales linearly), text token-prefixing (token/shingle counts match the
    base), embedding isometries (rotation x sign-flip — every replica pair
    near-orthogonal, within-replica geometry exact).  For i < 64 the
    sign-flip group is identity, so 10x/100x dirs are unchanged."""
    from pyspark.sql import functions as F

    shift = 1_000_000_000
    if t == "lineitem":
        df = df.withColumn("l_orderkey", F.col("l_orderkey") + i * shift)
    elif t == "orders":
        df = df.withColumn(
            "o_orderkey", F.col("o_orderkey") + i * shift
        ).withColumn("o_custkey", F.col("o_custkey") + i * shift)
    elif t == "customer":
        df = df.withColumn("c_custkey", F.col("c_custkey") + i * shift)
    elif t == "documents":
        df = df.withColumn("doc_id", F.col("doc_id") + i * shift)
        if i > 0:
            # decorrelate by PREFIXING every token with a replica
            # marker: token count (and so shingle/window counts)
            # stays identical to the base table — the old
            # insert-a-marker-token form doubled per-doc work and
            # inflated measured exponents by ~log10(2) ≈ 0.3
            df = df.withColumn(
                "text",
                F.regexp_replace("text", r"(^|\s)", f"$1r{i}"),
            )
    elif t == "embeddings":
        df = df.withColumn("vec_id", F.col("vec_id") + i * shift)
        if i > 0:
            # rotate the vector: near-orthogonal to the original,
            # same norm, fully deterministic
            k = (i * 7) % 64
            df = df.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", k + 1, 64 - k),
                    F.slice("embedding", 1, k),
                ),
            )
            # rotations alone give only 64 distinct transforms; past 64
            # replicas compose a +/-1 diagonal isometry chosen by the
            # replica's 64-block so every (rotation, sign) pair is
            # distinct up to 1024 replicas — without this, 1000x would
            # mint ~REPLICAS/64 exact twins per vector and the near-dup
            # probes would measure the builder, not the operator
            g = i // 64
            if g:
                signs = [
                    float(1 - 2 * ((g >> (d % 4)) & 1)) for d in range(64)
                ]
                df = df.withColumn(
                    "embedding",
                    F.zip_with(
                        "embedding",
                        F.array(*[F.lit(s) for s in signs]),
                        lambda x, s: (x * s).cast("float"),
                    ),
                )
    return df


def _build_scaled_dir(spark, out_dir: str) -> None:
    """Materialize a REPLICAS x blow-up of the probe tables.

    Replicas are written in chunks of 25 appended to the same parquet dir:
    a single REPLICAS-way unionByName plan is fine at 10x but analysis
    cost grows superlinearly with branch count and chokes at 1000x.
    """
    from pydatalake_spark.queries.tables import load_table

    chunk = 25
    for t in PROBE_TABLES:
        base = load_table(spark, SF_DIR, t)
        path = os.path.join(out_dir, f"{t}.parquet")
        for start in range(0, REPLICAS, chunk):
            reps = [
                _replica_transform(base, t, i)
                for i in range(start, min(start + chunk, REPLICAS))
            ]
            out = reps[0]
            for df in reps[1:]:
                out = out.unionByName(df)
            mode = "overwrite" if start == 0 else "append"
            out.write.mode(mode).parquet(path)


def _probe_callable(name, queries):
    """The callable the scaling probe times. For queries whose registry
    entry serves a PER-CORPUS MATERIALIZED result (the round-6
    _jaccard_pairs cache), probing the registry would time a cache read
    and report a fake ~0 exponent — probe the underlying operator
    instead, so the join's scaling is what gets measured."""
    if name == "ngram_jaccard_pairs":
        from pydatalake_spark.operators.ngram_jaccard import (
            ngram_jaccard_pairs,
        )
        from pydatalake_spark.queries.tables import load_table
        from pydatalake_spark.queries.text import _MH_K, _ngram_max_df_plan

        def fn(spark, sf_dir):
            d = load_table(spark, sf_dir, "documents")
            # threshold differs from the registry's 0.5 ON PURPOSE: a
            # plan-equal call would silently substitute the registry's
            # cached pair table on the base dir (and not on the replica
            # dir), skewing the exponent; a different final-filter
            # constant keeps the join identical but the plan distinct,
            # so both sides time the same work
            return ngram_jaccard_pairs(
                d, shingle_size=_MH_K, threshold=0.55,
                max_df=_ngram_max_df_plan(d),
            )

        return fn
    if name == "near_dup_pairs":
        # r9: the registry entry serves the per-corpus _minhash_pairs
        # session cache (shared with pipeline_clean_corpus) — probing it
        # would time a cache read. Probe the underlying operator; the
        # 0.55 verify threshold keeps the plan distinct from the cached
        # one (same trick as the ngram_jaccard_pairs bypass below) while
        # the band join + set verify do identical work. The operator's
        # internal signature cache_once stays (pre-r9 behavior): the
        # probe measures the band-join + verify scaling on top of a warm
        # signature table, the same contract as every round since r8.
        from pydatalake_spark.operators.minhash import near_dup_pairs
        from pydatalake_spark.queries.tables import load_table
        from pydatalake_spark.queries.text import _MH_BANDS, _MH_K, _MH_N

        return lambda spark, sf_dir: near_dup_pairs(
            load_table(spark, sf_dir, "documents"),
            num_hashes=_MH_N,
            num_bands=_MH_BANDS,
            shingle_size=_MH_K,
            jaccard_threshold=0.55,
        )
    if name == "bloom_decontamination":
        # r10: the registry entry reduces the shared _decon_screen
        # verdict cache — probing it would time a cache read and fake a
        # ~0 exponent. Probe the underlying fused screen pass instead
        # (the _decon_exl/_decon_train_w inputs stay warm per dir, the
        # same scope the probe measured before the verdict cache: the
        # bloom build + probe pass is what must scale).
        from pyspark.sql import functions as F

        from pydatalake_spark.operators.bloom import membership_screen
        from pydatalake_spark.queries.text import _decon_exl, _decon_train_w

        def bloom_fn(spark, sf_dir):
            exl = _decon_exl(spark, sf_dir)
            tw = _decon_train_w(spark, sf_dir)
            ev = exl.filter(~F.col("is_train")).select("doc_id", "wh")
            hits = membership_screen(
                ev, tw, key_col="wh", n_train_keys=tw.count()
            )
            return hits.groupBy("doc_id").agg(
                F.count(F.lit(1)).cast("long").alias("n_windows"),
                F.sum(F.col("bf_hit").cast("int")).cast("long").alias(
                    "n_bf_hits"
                ),
                F.max(F.col("bf_hit")).alias("flagged"),
            )

        return bloom_fn
    if name == "embedding_near_dup":
        # the registry entry pins num_planes=8 so the static oracle SQL
        # can replay the bucket hash — fine at gate SF, QUADRATIC at
        # probe scale (fixed 256 buckets ⇒ pair volume ~n²/256; the r7
        # 100× probe caught one task interpreting cosine for 19 min).
        # The operator's scale path auto-sizes the plane count; probe
        # that, like the other registry-vs-scale bypasses here.
        from pydatalake_spark.operators.similarity import embedding_near_dup
        from pydatalake_spark.queries.tables import load_table

        return lambda spark, sf_dir: embedding_near_dup(
            load_table(spark, sf_dir, "embeddings"),
            threshold=0.3,
            num_planes=None,
        )
    if name == "bigram_perplexity":
        # the registry entry persists the bigram model table
        # (cache_model=True) — probing it would time a cache READ on the
        # second run and fake a ~0 exponent; probe the stateless build
        from pydatalake_spark.operators.ngram_lm import bigram_surprisal
        from pydatalake_spark.queries.tables import load_table

        return lambda spark, sf_dir: bigram_surprisal(
            load_table(spark, sf_dir, "documents"), cache_model=False
        )
    if name == "token_pmi":
        # same cache_model bypass as bigram_perplexity
        from pydatalake_spark.operators.ngram_lm import token_pmi
        from pydatalake_spark.queries.tables import load_table

        return lambda spark, sf_dir: token_pmi(
            load_table(spark, sf_dir, "documents"), cache_model=False
        )
    if name == "near_dup_clusters":
        # the registry entry reads the materialized _jaccard_pairs cache;
        # probe the full pairs -> iterative-CC chain instead (threshold
        # 0.55 keeps the plan distinct from the cached one, same as the
        # ngram_jaccard_pairs bypass) — CC is the probe set's only
        # ITERATIVE operator, the classic superlinear risk
        from pydatalake_spark.operators.cluster import connected_components
        from pydatalake_spark.operators.ngram_jaccard import (
            ngram_jaccard_pairs,
        )
        from pydatalake_spark.queries.tables import load_table
        from pydatalake_spark.queries.text import _MH_K, _ngram_max_df_plan

        def cc_fn(spark, sf_dir):
            d = load_table(spark, sf_dir, "documents")
            pairs = ngram_jaccard_pairs(
                d, shingle_size=_MH_K, threshold=0.55,
                max_df=_ngram_max_df_plan(d),
            )
            return connected_components(pairs)

        return cc_fn
    return queries[name]


def _scaling_probe(spark, queries) -> dict:
    scaled_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"pydatalake_bench_x{REPLICAS}"
    )
    marker = os.path.join(scaled_dir, "_built_from")
    # v2: token-prefix decorrelation (marker version busts stale replicas)
    stamp = SF_DIR + "|gen-v2"
    if not (os.path.isfile(marker) and open(marker).read() == stamp):
        shutil.rmtree(scaled_dir, ignore_errors=True)
        _build_scaled_dir(spark, scaled_dir)
        with open(marker, "w") as f:
            f.write(stamp)
    result = {"replicas": REPLICAS, "queries": {}}
    for name in PROBE_QUERIES:
        fn = _probe_callable(name, queries)
        _run_timed(fn, spark, SF_DIR)  # warm
        t_small = _run_timed(fn, spark, SF_DIR)
        _run_timed(fn, spark, scaled_dir)  # warm
        t_big = _run_timed(fn, spark, scaled_dir)
        exponent = (
            math.log(t_big / t_small) / math.log(REPLICAS)
            if t_small > 0 and t_big > 0
            else None
        )
        result["queries"][name] = {
            "sec_small": t_small,
            "sec_big": t_big,
            "exponent": round(exponent, 3) if exponent is not None else None,
        }
    return result


def _time_oracles() -> dict[str, float]:
    """Time each bench query's DuckDB oracle on the same parquet files —
    the reference's actual execution engine, at the same data scale."""
    import duckdb

    import __spark_entry__ as entrymod
    from pydatalake_spark.queries.tables import TABLES

    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        sql = oracles.get(name)
        if sql is None:  # rows-only queries (ivf_topk, ...) have no oracle
            continue
        con.execute(sql).fetchall()  # warm the buffer pool / plan cache
        best = float("inf")
        for _ in range(2):  # min-of-2, mirroring the Spark loop
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    con.close()
    return timings


_TASK_BINARY_RE = re.compile(
    r"Broadcasting large task binary with size ([\d.]+) (KiB|MiB|GiB)"
)
# Spark fails jobs outright as serialized task closures approach the RPC
# message ceiling (~8 MiB default); warn-level today is ~1 MiB. A fused
# plan silently growing past 4 MiB is halfway to a cluster failure — the
# bench must catch it before a user does (VERDICT r6 item 7).
TASK_BINARY_MAX_KIB = 4096.0


def _loadavg1() -> float:
    """1-minute system loadavg (0.0 if unreadable) — recorded per minima
    run so burst-window contamination is auditable from the artifact."""
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except (OSError, ValueError, IndexError):
        return 0.0


def _task_binary_max_kib(stderr_path: str) -> float:
    """Largest 'Broadcasting large task binary' warning in the captured
    JVM stderr, in KiB (0.0 = every task closure stayed under Spark's
    ~1 MiB warn threshold)."""
    unit = {"KiB": 1.0, "MiB": 1024.0, "GiB": 1024.0 * 1024.0}
    worst = 0.0
    try:
        with open(stderr_path, errors="replace") as f:
            for line in f:
                m = _TASK_BINARY_RE.search(line)
                if m:
                    worst = max(worst, float(m.group(1)) * unit[m.group(2)])
    except OSError:
        pass
    return round(worst, 1)


def main() -> None:
    from pydatalake_spark.queries import QUERIES
    from pydatalake_spark.session import get_spark

    # capture the JVM's stderr (log4j console = System.err, inherited
    # from this process's fd 2 when the gateway launches) so the
    # task-binary guard can read the broadcast-size warnings afterwards
    stderr_capture = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "pydatalake_bench_stderr.log"
    )
    _saved_stderr = os.dup(2)
    _cap = os.open(stderr_capture, os.O_WRONLY | os.O_CREAT | os.O_TRUNC)
    os.dup2(_cap, 2)
    os.close(_cap)

    # no console progress bar: its \r frames would land in the driver's
    # 2000-char stdout tail after the JSON line and break the parse
    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )

    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else 0.0

    # Per-query warm-then-time, back to back — the SAME protocol the
    # oracle loop uses (_time_oracles: warm execute, then timed execute).
    # The untimed first run covers JVM JIT / whole-stage codegen for that
    # plan and builds any shared per-corpus caches; the timed second run
    # measures steady-state marginal cost. (The previous shape — one
    # untimed pass over ALL queries, then one timed pass over all — was
    # asymmetric: each Spark timed run landed ~95 queries after its warm
    # run, paying code-cache/GC/OS-page decay the oracle never pays, and
    # per-query numbers showed ±10x adjacency noise on queries whose
    # isolated warm runs sit at oracle parity.) Each side then takes the
    # MIN of two timed runs: a single run still catches stray GC pauses /
    # AQE replans worth ~1s on sub-second queries, which read as fake
    # ≥10x ratios; min-of-2 is the standard steady-state estimator and
    # is applied to the oracle loop identically.
    # r8 VERDICT item 5 hardening: when both timed runs land in the same
    # contended window (co-tenant load spanning all three executions),
    # min-of-2 can't absorb it and a 0.9s query reads 1.3-1.8s — the rp
    # pair regressed exactly this way in the r8 driver run while the
    # quiet-machine numbers were unchanged. A third run, taken ONLY when
    # the two timed runs disagree by >1.5x on a non-trivial query, costs
    # nothing in the steady state and absorbs one more transient.
    # r9 ADVICE: the warm-up run is also TIMED (cold_first_run in
    # BENCH_DETAIL) — for queries served by a per-corpus session cache
    # (pair tables, fingerprints, classifier fit, decon screen verdicts)
    # the warm ratio measures a cache read while the oracle re-executes,
    # so the cold number is the honest one-time build cost next to it.
    # cold - warm over ALL queries (JIT/codegen included, so a ceiling)
    # is surfaced as cold_minus_warm_sec in the compact line.
    # r11 (VERDICT item 3, finishing r9 ADVICE 1): a timed run that was
    # served by a _session_cached artifact measures a cache read while
    # the oracle re-executes — detect it MECHANICALLY via the hit
    # counter delta so those entries can be excluded from worst_ratios
    # and annotated with their honest cold cost instead.
    from pydatalake_spark.queries.text import SESSION_CACHE_HITS

    timings: dict[str, float] = {}
    cold_runs: dict[str, float] = {}
    cache_served: dict[str, bool] = {}
    for name in BENCH_QUERIES:
        cold_runs[name] = _run_timed(QUERIES[name], spark, SF_DIR)
        h0 = SESSION_CACHE_HITS["n"]
        t1 = _run_timed(QUERIES[name], spark, SF_DIR)
        t2 = _run_timed(QUERIES[name], spark, SF_DIR)
        t = min(t1, t2)
        if t > 0.3 and max(t1, t2) > 1.5 * t:
            t = min(t, _run_timed(QUERIES[name], spark, SF_DIR))
        timings[name] = t
        cache_served[name] = SESSION_CACHE_HITS["n"] > h0
    total = round(sum(timings.values()), 4)

    # minima protocol (r10 VERDICT item 4): --runs N re-times the whole
    # set N-1 more times and commits per-query min/median + per-run
    # loadavg to BENCH_MINIMA.json — the steady-state claim becomes a
    # file, not COVERAGE.md prose. Pass 1 is the full protocol above.
    extra_runs = 0
    if "--runs" in sys.argv:
        extra_runs = max(0, int(sys.argv[sys.argv.index("--runs") + 1]) - 1)
    run_timings: list[dict[str, float]] = [dict(timings)]
    run_loadavg = [_loadavg1()]
    for _ in range(extra_runs):
        run_loadavg.append(_loadavg1())
        pass_t = {
            name: _run_timed(QUERIES[name], spark, SF_DIR)
            for name in BENCH_QUERIES
        }
        run_timings.append(pass_t)
    if extra_runs:
        timings = {
            n: min(rt[n] for rt in run_timings) for n in BENCH_QUERIES
        }
        total = round(sum(timings.values()), 4)

    oracle_timings = _time_oracles()
    oracle_total = round(sum(oracle_timings.values()), 4)
    spark_on_oracled = round(
        sum(timings[n] for n in oracle_timings), 4
    )
    ratios = {
        n: round(timings[n] / oracle_timings[n], 2) if oracle_timings[n] > 0 else None
        for n in oracle_timings
    }

    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "oracle": oracle_timings,
        "oracle_total_sec": oracle_total,
        "vs_oracle_ratio": (
            round(spark_on_oracled / oracle_total, 3) if oracle_total > 0 else None
        ),
        "ratios": ratios,
        "cold_first_run": cold_runs,
        "cache_served": sorted(n for n, v in cache_served.items() if v),
    }
    if SCALING_PROBE:
        detail["scaling_probe"] = _scaling_probe(spark, QUERIES)

    # task-binary guard: restore stderr, then read the capture
    os.dup2(_saved_stderr, 2)
    os.close(_saved_stderr)
    binary_kib = _task_binary_max_kib(stderr_capture)
    detail["task_binary_max_kib"] = binary_kib
    if binary_kib > TASK_BINARY_MAX_KIB:
        raise RuntimeError(
            f"a query broadcast a {binary_kib} KiB task binary "
            f"(guard: {TASK_BINARY_MAX_KIB} KiB) — a fused plan is "
            "approaching Spark's RPC ceiling; unfuse or broadcast the "
            "payload as data, not closure"
        )

    # Full numbers go to a side file; stdout gets ONE COMPACT line. The
    # driver records only the last 2000 chars of stdout and parses the JSON
    # line out of that tail — round 2's full-detail line was ~4k chars and
    # came back "parsed: null", losing the whole perf signal for the round.
    # SPARK_GRAFT_DETAIL_OUT redirects the detail file so verification /
    # judge runs can't clobber the committed artifact (r10 VERDICT item 5).
    detail_out = os.environ.get("SPARK_GRAFT_DETAIL_OUT") or str(
        Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    )
    with open(detail_out, "w") as f:
        json.dump(detail, f, indent=1)

    if extra_runs:
        import statistics

        minima = {
            "metric": "headline_queries_minima",
            "runs": extra_runs + 1,
            "sf": sf,
            "loadavg_per_run": run_loadavg,
            "min_total_sec": total,
            "oracle_total_sec": oracle_total,
            "min_vs_oracle_ratio": detail["vs_oracle_ratio"],
            "per_query": {
                n: {
                    "min": round(min(rt[n] for rt in run_timings), 3),
                    "median": round(
                        statistics.median(rt[n] for rt in run_timings), 3
                    ),
                    "runs": [round(rt[n], 3) for rt in run_timings],
                }
                for n in BENCH_QUERIES
            },
        }
        with open(
            Path(__file__).resolve().parent / "BENCH_MINIMA.json", "w"
        ) as f:
            json.dump(minima, f, indent=1)

    out = {
        "metric": detail["metric"],
        "value": total,
        "unit": "sec",
        "sf": sf,
        "queries": {n: round(v, 2) for n, v in timings.items()},
        "oracle_total_sec": oracle_total,
        "vs_oracle_ratio": detail["vs_oracle_ratio"],
        # ceiling on one-time cache-build + JIT cost the warm timings
        # amortize away (r9 ADVICE: make cache-served ratios honest)
        "cold_minus_warm_sec": round(
            sum(max(0.0, cold_runs[n] - timings[n]) for n in timings), 2
        ),
        "task_binary_max_kib": binary_kib,
        # the 5 worst spark/duckdb ratios among queries where the oracle
        # does >= 50 ms of real work — below that the ratio only measures
        # Spark's fixed per-query overhead, not the plan. Cache-served
        # timings (detected via the _session_cached hit counter) are
        # EXCLUDED — their warm number times a cache read while the
        # oracle re-executes the full pass (r10 VERDICT item 3) — and
        # reported separately with warm AND cold ratios so the honest
        # one-time cost stays auditable from this line alone.
        "worst_ratios": dict(
            sorted(
                (
                    (n, r)
                    for n, r in ratios.items()
                    if r is not None
                    and oracle_timings.get(n, 0) >= 0.05
                    and not cache_served.get(n)
                ),
                key=lambda kv: -kv[1],
            )[:5]
        ),
        "cache_served_ratios": {
            n: {
                "warm": ratios[n],
                "cold": round(cold_runs[n] / oracle_timings[n], 2),
            }
            for n in sorted(ratios)
            if cache_served.get(n)
            and ratios[n] is not None
            and oracle_timings.get(n, 0) >= 0.05
        },
    }
    if "scaling_probe" in detail:
        out["probe_exponents"] = {
            n: q["exponent"]
            for n, q in detail["scaling_probe"]["queries"].items()
        }
    # The driver records the LAST 2000 chars of stdout and json-parses
    # the line out of that tail (measured: every BENCH_r*.json tail is
    # exactly 2000 chars when the output is longer; round 2's 4k line
    # came back parsed:null). r12 shed the whole per-query dict whenever
    # the line exceeded 1900 — which at ~110 bench queries was ALWAYS —
    # so PERF_r12 had per_query:{} and empty low-core scaling ratios
    # (r12 VERDICT item 2). r13 fix: compact JSON separators, then fill
    # the remaining budget with per-query entries in deterministic
    # BENCH_QUERIES order (same order every run, so the 32-core and
    # low-core lines carry ~the same names and per-query scaling ratios
    # are computable). The FULL per-query map is always in
    # BENCH_DETAIL.json; nothing else is removed from the line.
    LINE_BUDGET = 1900

    def _dump(o) -> str:
        return json.dumps(o, separators=(",", ":"))

    line = _dump(out)
    if len(line) > LINE_BUDGET:
        # cache_served_ratios is diagnostic-only and fully present in
        # BENCH_DETAIL.json (ratios + cold_first_run) — shed it first
        out.pop("cache_served_ratios", None)
        line = _dump(out)
    if len(line) > LINE_BUDGET:
        qfull = out.pop("queries", {})
        base_len = len(_dump(out)) + len(',"queries":{}')
        kept: dict = {}
        used = base_len
        for n in BENCH_QUERIES:
            if n not in qfull:
                continue
            entry = len(_dump({n: qfull[n]})) - 1  # minus one brace, plus comma
            if used + entry <= LINE_BUDGET:
                kept[n] = qfull[n]
                used += entry
        out["queries"] = kept
        line = _dump(out)
    # hard guard (should be unreachable): never exceed the tail window
    for drop in (
        "queries",
        "worst_ratios",
        "probe_exponents",
    ):
        if len(line) <= LINE_BUDGET:
            break
        out.pop(drop, None)
        line = _dump(out)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
