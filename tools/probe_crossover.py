"""Spark-vs-DuckDB CROSSOVER probe for the standing-explanation queries
(r9 VERDICT item 6): queries whose sf0.1 ratio is Spark's per-job constant
cost against a sub-second embedded engine are re-timed on the 10x replica
dir on BOTH engines. The claim under test: the Spark side flattens
(amortizing its fixed cost) while the single-node oracle grows ~linearly,
so the ratio collapses toward / below 1 within one decade — i.e. the gate
ratio is a toy-scale artifact, not a plan defect.

Run ALONE (bench-window noise policy):

    python tools/probe_crossover.py                  # full set, rewrite
    python tools/probe_crossover.py q18_large_volume_customer  # subset:
        # re-times ONLY the named queries and MERGES them into the
        # committed BENCH_crossover.json (r10 VERDICT item 2 — re-pin a
        # burst-hit point without re-rolling the others)

Env: PROBE_XOVER_MIN_OF (default 3) — timed runs per (query, decade);
the published number is the min, the per-decade loadavg is recorded so a
burst-hit window is visible in the artifact itself.

Reuses bench.py's replica builder (key-shifted decorrelated replicas);
`supplier` is not in PROBE_TABLES (suppliers are shared across replicas —
l_suppkey is deliberately un-shifted), so the base table is copied in.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (sets SF_DIR / REPLICAS, owns the builder)

# the standing-explanation set: every ≥1s query whose quiet ratio sits
# >2x on a LINEAR plan (r10 weak-minima members with linear oracles;
# embedding_near_dup / dup_span_stats / source_novelty are excluded —
# their pinned-parameter ORACLES go superlinear at 100x, and their scale
# stories are carried by the 100x/1000x operator probes instead)
QUERIES_UNDER_TEST = [
    "q21_sole_returned_supplier",
    "q18_large_volume_customer",
    "dsir_importance",
    "bigram_perplexity",
    "rp_distortion",
    "dup_span_stats",
    # r12 (r11 VERDICT item 4): the two remaining weak-list members.
    # Both are sub-second warm standalone at sf0.1 (0.96s / 0.27s on a
    # quiet window — the r11 bench ratios were adjacency noise); the
    # probe pins whether the ratio collapses with scale.
    "minhash_signatures",
    "bpe_token_stats",
]
TABLES = [
    "lineitem", "orders", "customer", "supplier", "documents", "embeddings",
]


MIN_OF = max(1, int(os.environ.get("PROBE_XOVER_MIN_OF", "3")))


def _spark_time(fn, spark, sf_dir) -> float:
    bench._run_timed(fn, spark, sf_dir)  # warm
    return round(
        min(bench._run_timed(fn, spark, sf_dir) for _ in range(MIN_OF)),
        4,
    )


def _duck_time(con, sql) -> float:
    con.execute(sql).fetchall()  # warm
    best = float("inf")
    for _ in range(MIN_OF):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


REPLICA_FACTORS = [10, 100]


def _replica_dir(spark, replicas: int) -> str:
    scaled = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"pydatalake_bench_x{replicas}"
    )
    marker = os.path.join(scaled, "_built_from")
    stamp = bench.SF_DIR + "|gen-v2"
    if not (os.path.isfile(marker) and open(marker).read() == stamp):
        shutil.rmtree(scaled, ignore_errors=True)
        saved = bench.REPLICAS
        bench.REPLICAS = replicas
        try:
            bench._build_scaled_dir(spark, scaled)
        finally:
            bench.REPLICAS = saved
        with open(marker, "w") as f:
            f.write(stamp)
    # suppliers are shared across replicas (l_suppkey un-shifted) — the
    # base table IS the scaled supplier table
    sup = os.path.join(scaled, "supplier.parquet")
    if not os.path.exists(sup):
        shutil.copy(os.path.join(bench.SF_DIR, "supplier.parquet"), sup)
    return scaled


def _duck_con(d: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(d, f"{t}.parquet")
        src = (
            f"parquet_scan('{p}/*.parquet')" if os.path.isdir(p) else f"'{p}'"
        )
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    return con


def main() -> None:
    import __spark_entry__ as entrymod
    from pydatalake_spark.queries import QUERIES
    from pydatalake_spark.session import get_spark

    subset = sys.argv[1:]
    names = subset or QUERIES_UNDER_TEST
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(
        "crossover", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    dirs = {1: bench.SF_DIR}
    for r in REPLICA_FACTORS:
        dirs[r] = _replica_dir(spark, r)

    artifact = Path(__file__).resolve().parent.parent / "BENCH_crossover.json"
    out = {
        "replica_factors": REPLICA_FACTORS,
        "sf_dir": bench.SF_DIR,
        "queries": {},
    }
    if subset and artifact.is_file():
        # subset re-pin: keep the committed numbers for everything else
        with open(artifact) as f:
            prior = json.load(f)
        out["queries"] = prior.get("queries", {})

    out["min_of"] = MIN_OF
    oracles = entrymod.oracle_sql()
    for name in names:
        fn = QUERIES[name]
        rec = {}
        for r, d in dirs.items():
            load0 = os.getloadavg()[0]
            rec[f"spark_x{r}"] = _spark_time(fn, spark, d)
            con = _duck_con(d)
            rec[f"oracle_x{r}"] = _duck_time(con, oracles[name])
            con.close()
            rec[f"ratio_x{r}"] = round(
                rec[f"spark_x{r}"] / rec[f"oracle_x{r}"], 2
            )
            rec[f"loadavg_x{r}"] = round(load0, 2)
        out["queries"][name] = rec
        print(name, json.dumps(rec))

    with open(artifact, "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
