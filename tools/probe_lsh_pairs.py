"""Candidate-volume proof for the auto-sized hyperplane LSH path
(r8 VERDICT item 4).

``BENCH_probe1000.json`` showed ``embedding_near_dup``'s shuffle-record
delta growing 321x across the 100x->1000x decade while wall time stayed
sublinear (exponent 0.36). Shuffle counters cannot separate "more
candidate pairs" from "the same pairs now moving through a shuffle
instead of a broadcast": at 100x the (id, bucket) table and the vector
re-join sides sit under the session's broadcast threshold, so their
movement never registers as shuffle records; at 1000x they exchange and
every candidate row is counted. This tool measures the CANDIDATE STREAM
itself at both scales — the number a 100 TB network bill is actually
made of:

- ``pairs``: exact same-bucket candidate-pair count, computed in closed
  form from the bucket-size histogram (sum n_b*(n_b-1)/2 — no join run);
- ``pairs_per_vector``: the linearity readout (constant across the
  decade == candidate stream linear in corpus size);
- bucket-occupancy tail (max / p99 / mean) under the auto plane count;
- what the auto-engaged hot-bucket cap (LSH_AUTO_MAX_BUCKET_FACTOR x
  target occupancy, operators/similarity.py) would drop at each scale.

Writes ``BENCH_lsh_cap.json``. Usage:
    python tools/probe_lsh_pairs.py     (run alone; ~2 min)
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def _scale_stats(spark, sf_dir: str) -> dict:
    from pydatalake_spark.operators.similarity import (
        LSH_AUTO_MAX_BUCKET_FACTOR,
        LSH_TARGET_BUCKET_OCCUPANCY,
        hyperplane_buckets,
        suggest_num_planes,
    )
    from pydatalake_spark.queries.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    planes = suggest_num_planes(n)
    cap = LSH_AUTO_MAX_BUCKET_FACTOR * LSH_TARGET_BUCKET_OCCUPANCY
    sizes = hyperplane_buckets(emb, num_planes=planes).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    row = sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n").alias("max_occ"),
        F.expr("percentile_approx(n, 0.99)").alias("p99_occ"),
        F.avg("n").alias("mean_occ"),
        # exact candidate-pair count: sum over buckets of n*(n-1)/2
        F.sum(F.expr("n * (n - 1) / 2")).alias("pairs"),
        F.sum(
            F.when(F.col("n") <= cap, F.expr("n * (n - 1) / 2")).otherwise(0)
        ).alias("pairs_capped"),
        F.sum(F.when(F.col("n") > cap, 1).otherwise(0)).alias("hot_buckets"),
        F.sum(F.when(F.col("n") > cap, F.col("n")).otherwise(0)).alias(
            "hot_members"
        ),
    ).first()
    return {
        "n_vectors": n,
        "num_planes": planes,
        "cap": cap,
        "n_buckets": int(row["n_buckets"]),
        "max_occupancy": int(row["max_occ"]),
        "p99_occupancy": int(row["p99_occ"]),
        "mean_occupancy": round(float(row["mean_occ"]), 2),
        "pairs": int(row["pairs"]),
        "pairs_per_vector": round(float(row["pairs"]) / n, 3),
        "pairs_capped": int(row["pairs_capped"]),
        "hot_buckets_dropped": int(row["hot_buckets"]),
        "hot_members_dropped": int(row["hot_members"]),
    }


def main() -> None:
    import bench
    from pydatalake_spark.session import get_spark

    spark = get_spark(
        "probe_lsh_pairs",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    tmp = os.environ.get("TMPDIR", "/tmp")
    result: dict = {"sf_dir": bench.SF_DIR}
    for reps in (100, 1000):
        d = os.path.join(tmp, f"pydatalake_bench_x{reps}")
        marker = os.path.join(d, "_built_from")
        if not os.path.isfile(marker):
            print(f"skip x{reps}: {d} not built (run probe1000 first)",
                  file=sys.stderr)
            continue
        result[f"x{reps}"] = _scale_stats(spark, d)
    if "x100" in result and "x1000" in result:
        result["pairs_growth_100_to_1000"] = round(
            result["x1000"]["pairs"] / max(1, result["x100"]["pairs"]), 2
        )
        result["pairs_per_vector_ratio"] = round(
            result["x1000"]["pairs_per_vector"]
            / max(1e-9, result["x100"]["pairs_per_vector"]),
            3,
        )
    out = Path(__file__).resolve().parent.parent / "BENCH_lsh_cap.json"
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
