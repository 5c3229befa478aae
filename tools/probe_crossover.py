"""Spark-vs-DuckDB CROSSOVER probe for the standing-explanation queries
(r9 VERDICT item 6): queries whose sf0.1 ratio is Spark's per-job constant
cost against a sub-second embedded engine are re-timed on the 10x replica
dir on BOTH engines. The claim under test: the Spark side flattens
(amortizing its fixed cost) while the single-node oracle grows ~linearly,
so the ratio collapses toward / below 1 within one decade — i.e. the gate
ratio is a toy-scale artifact, not a plan defect.

Run ALONE (bench-window noise policy):

    python tools/probe_crossover.py            # writes BENCH_crossover.json

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
]
TABLES = [
    "lineitem", "orders", "customer", "supplier", "documents", "embeddings",
]


def _spark_time(fn, spark, sf_dir) -> float:
    bench._run_timed(fn, spark, sf_dir)  # warm
    return round(
        min(bench._run_timed(fn, spark, sf_dir),
            bench._run_timed(fn, spark, sf_dir)),
        4,
    )


def _duck_time(con, sql) -> float:
    con.execute(sql).fetchall()  # warm
    best = float("inf")
    for _ in range(2):
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

    spark = get_spark(
        "crossover", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    dirs = {1: bench.SF_DIR}
    for r in REPLICA_FACTORS:
        dirs[r] = _replica_dir(spark, r)

    oracles = entrymod.oracle_sql()
    out = {
        "replica_factors": REPLICA_FACTORS,
        "sf_dir": bench.SF_DIR,
        "queries": {},
    }
    for name in QUERIES_UNDER_TEST:
        fn = QUERIES[name]
        rec = {}
        for r, d in dirs.items():
            rec[f"spark_x{r}"] = _spark_time(fn, spark, d)
            con = _duck_con(d)
            rec[f"oracle_x{r}"] = _duck_time(con, oracles[name])
            con.close()
            rec[f"ratio_x{r}"] = round(
                rec[f"spark_x{r}"] / rec[f"oracle_x{r}"], 2
            )
        out["queries"][name] = rec
        print(name, json.dumps(rec))

    with open(
        Path(__file__).resolve().parent.parent / "BENCH_crossover.json", "w"
    ) as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
