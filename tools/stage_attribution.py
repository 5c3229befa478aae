"""Per-stage wall attribution for one probe query at one scale dir.

The decade counters (tools/probe1000.py) say WHETHER a plan's volume is
linear; this says WHERE the wall goes — per-stage duration, executor
run/CPU time, input/shuffle volume from the UI REST API after a single
timed execution. Use it when an exponent and its counters disagree
(r8 VERDICT item 2: semantic_dedup walls 70-92s at 1000x on exactly
linear shuffle volume — which stage?).

Usage:
    python tools/stage_attribution.py <query> <sf_dir>
    python tools/stage_attribution.py semantic_dedup /tmp/pydatalake_bench_x1000
"""

from __future__ import annotations

import json
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import bench
    from pydatalake_spark.queries import QUERIES
    from pydatalake_spark.session import get_spark

    name, sf_dir = sys.argv[1], sys.argv[2]
    spark = get_spark(
        "stage_attribution",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.unsafe.sorter.spill.read.ahead.enabled": "false",
        },
    )
    fn = bench._probe_callable(name, QUERIES)
    bench._run_timed(fn, spark, sf_dir)  # warm
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stages(status: str):
        url = f"{base}/api/v1/applications/{app}/stages?status={status}"
        with urllib.request.urlopen(url, timeout=30) as r:
            return json.load(r)

    before = {s["stageId"] for s in stages("complete")}
    sec = bench._run_timed(fn, spark, sf_dir)
    rows = []
    for s in stages("complete") + stages("failed"):
        if s["stageId"] in before:
            continue
        rows.append(
            {
                "stage": s["stageId"],
                "name": s.get("name", "")[:70],
                "duration_s": round(
                    (s.get("executorRunTime", 0)) / 1000.0, 2
                ),
                "cpu_s": round(
                    s.get("executorCpuTime", 0) / 1e9, 2
                ),
                "tasks": s.get("numCompleteTasks", 0),
                "input_rec": s.get("inputRecords", 0),
                "sh_read_rec": s.get("shuffleReadRecords", 0),
                "sh_write_rec": s.get("shuffleWriteRecords", 0),
                "spill_mb": round(
                    s.get("diskBytesSpilled", 0) / 1e6, 1
                ),
            }
        )
    rows.sort(key=lambda r: -r["duration_s"])
    print(json.dumps({"query": name, "wall_s": sec}, indent=None))
    for r in rows:
        print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
