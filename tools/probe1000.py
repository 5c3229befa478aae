"""1000x scaling-probe runner — the escalation past tools/probe100.py.

The 100x probe (~1.7 GB, BENCH_probe100.json) left a few exponents in
the 0.6-0.85 band (semantic_dedup 0.847, bloom_decontamination 0.812,
embedding_near_dup 0.636) — sublinear, but close enough to linear that
another decade of data is the only way to tell "healthy linear-bounded
scan" from "slow quadratic onset".  This runner re-probes exactly that
risk set at REPLICAS=1000 (~17 GB of probe tables — still comfortably
in-memory at local[32]/128 GiB, big enough that a superlinear pair or
shuffle blow-up is unmistakable) and writes ``BENCH_probe1000.json``.

Exponents are measured against the 100x point (log10(t_1000/t_100)),
not the 1x point: at 17 GB the fixed JVM overhead that flattens small
probes is gone from BOTH sides of the ratio, so this is the cleanest
decade the sandbox can measure.

Usage:  python tools/probe1000.py     (~1h; run ALONE — any concurrent
                                       Spark work skews the timings)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time
from pathlib import Path

os.environ.setdefault("SPARK_GRAFT_SCALING_REPLICAS", "1000")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (reads SPARK_GRAFT_SCALING_REPLICAS at import)

# the 100x worst-exponent set — the only queries where "sublinear so far"
# still has room to hide a slow superlinearity.  Ordered cheap -> heavy:
# the two window/shingle-table queries shuffle data-sized intermediates
# (~30 GB spill per execution at 1000x) and run LAST so a disk blow-up
# there cannot take the rest of the probe down.
PROBE_1000 = [
    "dup_span_stats",
    "ngram_jaccard_pairs",
    "token_pmi",
    "near_dup_clusters",
    "embedding_near_dup",
    "semantic_dedup",
    "strip_contaminated_spans",
    "bloom_decontamination",
]


def _reclaim(spark) -> None:
    """Evict caches and nudge the JVM GC so ContextCleaner releases the
    previous run's shuffle files — back-to-back 1000x executions
    otherwise accumulate ~30 GB of dead spill each and fill the disk
    (the first probe attempt died exactly this way)."""
    spark.catalog.clearCache()
    spark._jvm.System.gc()


def _scaled_dir(spark, replicas: int) -> str:
    out = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"pydatalake_bench_x{replicas}"
    )
    marker = os.path.join(out, "_built_from")
    stamp = bench.SF_DIR + "|gen-v2"
    if not (os.path.isfile(marker) and open(marker).read() == stamp):
        shutil.rmtree(out, ignore_errors=True)
        saved = bench.REPLICAS
        bench.REPLICAS = replicas
        try:
            t0 = time.perf_counter()
            bench._build_scaled_dir(spark, out)
            print(
                f"built x{replicas} in {time.perf_counter() - t0:.0f}s",
                file=sys.stderr,
            )
        finally:
            bench.REPLICAS = saved
        with open(marker, "w") as f:
            f.write(stamp)
    return out


def main() -> None:
    from pydatalake_spark.queries import QUERIES
    from pydatalake_spark.session import get_spark

    spark = get_spark(
        "probe1000",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # _stage_counters reads the UI REST API (r7 VERDICT item 1)
            "spark.ui.enabled": "true",
            # r7 VERDICT item 4: the one JVM SIGSEGV on record
            # (hs_err_pid20129) crashed in the UnsafeSorterSpillReader
            # READ-AHEAD daemon thread (jbyte_disjoint_arraycopy) 57 min
            # into a heavy-spill probe — the known fragile mmap/read-ahead
            # path under disk pressure. The probe runs with read-ahead
            # off; sequential spill reads cost a few % and remove the
            # crash surface. Documented in SCALE.md §sigsegv.
            "spark.unsafe.sorter.spill.read.ahead.enabled": "false",
        },
    )
    dir100 = _scaled_dir(spark, 100)
    dir1000 = _scaled_dir(spark, 1000)

    out = Path(__file__).resolve().parent.parent / "BENCH_probe1000.json"
    result = {"replicas": 1000, "vs_replicas": 100, "queries": {}}
    only = os.environ.get("PROBE_1000_ONLY")
    names = PROBE_1000
    if only:
        # retry mode: re-probe a subset and merge over the existing
        # artifact (keeps the already-green rows)
        names = [n for n in only.split(",") if n]
        if out.is_file():
            result = json.load(open(out))
    # r8 VERDICT item 2: decade exponents carry ±0.15 run-to-run scatter
    # when the 100x side is only a few seconds — PROBE_1000_MIN_OF=N times
    # each scale N times (reclaim between runs) and takes the MIN, with
    # every run's wall published so the scatter is quantified, not argued
    min_of = max(1, int(os.environ.get("PROBE_1000_MIN_OF", "1")))

    def _timed_min(fn, d) -> tuple[float, dict, list[float]]:
        best_t, best_c, runs = None, None, []
        for _ in range(min_of):
            t, c = bench._run_timed_counters(fn, spark, d)
            runs.append(t)
            if best_t is None or t < best_t:
                best_t, best_c = t, c
            _reclaim(spark)
        return best_t, best_c, runs

    for name in names:
        fn = bench._probe_callable(name, QUERIES)
        try:
            # reclaim between warm and timed on BOTH scales: each timed
            # run pays its own (cold-cache) standalone cost, so the
            # exponent compares like with like — and the warm run's
            # ~data-sized spill is gone before the timed one starts
            bench._run_timed(fn, spark, dir100)  # warm
            _reclaim(spark)
            t_100, c_100, runs_100 = _timed_min(fn, dir100)
            bench._run_timed(fn, spark, dir1000)  # warm
            _reclaim(spark)
            t_1000, c_1000, runs_1000 = _timed_min(fn, dir1000)
            exponent = (
                math.log10(t_1000 / t_100)
                if t_100 > 0 and t_1000 > 0
                else None
            )
            # the volume-vs-IO proof (r7 VERDICT item 1): per-decade
            # growth of shuffle records — ~10x means the plan is linear
            # and any time exponent >1 is IO contention, not volume
            sw = "shuffle_write_records"
            vol_growth = (
                round(c_1000[sw] / c_100[sw], 2) if c_100.get(sw) else None
            )
            result["queries"][name] = {
                "sec_100x": t_100,
                "sec_1000x": t_1000,
                "exponent_100_to_1000": (
                    round(exponent, 3) if exponent is not None else None
                ),
                "counters_100x": c_100,
                "counters_1000x": c_1000,
                "shuffle_records_growth": vol_growth,
                "min_of": min_of,
                "runs_100x": runs_100,
                "runs_1000x": runs_1000,
            }
        except Exception as e:  # record and keep probing
            result["queries"][name] = {"error": str(e)[:500]}
        finally:
            _reclaim(spark)
        print(json.dumps({name: result["queries"][name]}), file=sys.stderr)
        # write incrementally: a crash on a later query keeps the evidence
        with open(out, "w") as f:
            json.dump(result, f, indent=1)

    # r7 ADVICE: an errored/timed-out query must NOT read as exponent 0 —
    # that is exactly the failure this probe exists to surface. Errors get
    # their own headline list and a null worst when nothing finished.
    errors = [
        n for n, q in result["queries"].items() if "error" in q
    ]
    finished = [
        q["exponent_100_to_1000"]
        for q in result["queries"].values()
        if q.get("exponent_100_to_1000") is not None
    ]
    worst = max(finished) if finished else None
    result["worst_exponent_100_to_1000"] = worst
    result["errors"] = errors
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(
        json.dumps(
            {
                "replicas": 1000,
                "worst_exponent_100_to_1000": worst,
                "errors": errors,
                "exponents": {
                    n: q.get("exponent_100_to_1000")
                    for n, q in result["queries"].items()
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
