"""100x scaling-probe runner (VERDICT r6 item 1).

The per-round bench probes scaling at a 10x replica blow-up (~170 MB),
where Spark's fixed overhead flattens every exponent. This runner re-runs
the same 13-query probe set at REPLICAS=100 (~1.7 GB of probe tables) —
large enough that a hidden quadratic pair blow-up or a skew-collapsed
shuffle shows up as an exponent visibly above 1 — and writes
``BENCH_probe100.json`` at the repo root.

Usage:  python tools/probe100.py        (~tens of minutes; run alone —
                                         concurrent Spark work skews it)
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

os.environ.setdefault("SPARK_GRAFT_SCALING_REPLICAS", "100")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (reads SPARK_GRAFT_SCALING_REPLICAS at import)


def main() -> None:
    from pydatalake_spark.queries import QUERIES
    from pydatalake_spark.session import get_spark

    spark = get_spark(
        "probe100", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    result = bench._scaling_probe(spark, QUERIES)
    out = Path(__file__).resolve().parent.parent / "BENCH_probe100.json"
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    worst = max(
        (q["exponent"] or 0.0) for q in result["queries"].values()
    )
    print(json.dumps({
        "replicas": result["replicas"],
        "worst_exponent": worst,
        "exponents": {
            n: q["exponent"] for n, q in result["queries"].items()
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
