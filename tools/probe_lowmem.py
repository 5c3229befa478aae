"""Memory-pressure probe: spill, don't OOM (round 8).

The scaling probes measure time growth with ample memory (128 GiB heap
for ≤1.7 GB of data — nothing ever spills). This runner answers the
other 100 TB question: what happens when the working set does NOT fit?
At cluster scale executors get a few GB each and the shingle/window/pair
intermediates of the heavy text operators exceed executor memory by
construction — the plans only survive if every wide operator degrades to
disk (UnsafeExternalSorter / spillable hash maps) instead of dying.

Method: a fresh JVM capped at ``HEAP`` (default 4g — 1/32nd of the dev
box), 30x replica tables (~540 MB raw parquet; the pair/window
intermediates are several GB), the same probe-query set the scaling
probes use, one warm + one timed pass each. Shuffle partitions are
raised 32 → 96, exercising the documented lever (size partitions so each
fits in memory — at 100 TB you size this, you don't default it).

Writes ``BENCH_lowmem.json``; any OOM/failed query is recorded with its
error instead of aborting the sweep. Run it ALONE (a second Spark JVM
skews walls AND steals the memory the cap is supposed to bound).

Usage:  python tools/probe_lowmem.py         (~10 min)
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback
from pathlib import Path

HEAP = os.environ.get("SPARK_GRAFT_LOWMEM_HEAP", "4g")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALING_REPLICAS", "30"))
os.environ["SPARK_GRAFT_SCALING_REPLICAS"] = str(REPLICAS)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (reads SPARK_GRAFT_SCALING_REPLICAS at import)


def main() -> None:
    from pydatalake_spark.queries import QUERIES
    from pydatalake_spark.session import get_spark

    spark = get_spark(
        "probe_lowmem",
        shuffle_partitions=96,
        extra_conf={
            "spark.driver.memory": HEAP,
            "spark.ui.showConsoleProgress": "false",
        },
    )
    jvm_max = spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
    scaled_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"pydatalake_bench_x{REPLICAS}"
    )
    marker = os.path.join(scaled_dir, "_built_from")
    stamp = bench.SF_DIR + "|gen-v2"
    if not (os.path.isfile(marker) and open(marker).read() == stamp):
        import shutil

        shutil.rmtree(scaled_dir, ignore_errors=True)
        bench._build_scaled_dir(spark, scaled_dir)
        with open(marker, "w") as f:
            f.write(stamp)

    result: dict = {
        "heap": HEAP,
        "jvm_max_heap_mib": round(jvm_max / 2**20),
        "replicas": REPLICAS,
        "shuffle_partitions": 96,
        "queries": {},
        "failed": {},
    }
    for name in bench.PROBE_QUERIES:
        fn = bench._probe_callable(name, QUERIES)
        try:
            fn(spark, scaled_dir).write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            fn(spark, scaled_dir).write.format("noop").mode("overwrite").save()
            result["queries"][name] = round(time.perf_counter() - t0, 3)
            print(f"OK   {name}: {result['queries'][name]}s", flush=True)
        except Exception as e:  # noqa: BLE001 - record and continue
            result["failed"][name] = f"{type(e).__name__}: {e}"[:400]
            print(f"FAIL {name}: {type(e).__name__}", flush=True)
            traceback.print_exc(limit=3)
    result["all_completed"] = not result["failed"]
    out = Path(__file__).resolve().parent.parent / "BENCH_lowmem.json"
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
