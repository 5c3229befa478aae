"""Split MERGE INTO cost into its two phases (r11 VERDICT item 5).

The gated/benched ``delta_merge_upsert_orders`` is a pure snapshot READ
since r12 (the upsert happens once in the fixture build), so the bench
ratio compares read vs read. This probe reports the other half — the
one-time MUTATION cost — as its own artifact: a fresh orders Delta
table, one ``merge_delta`` commit (same upsert the fixture applies),
and the read-back, timed separately.

    python tools/probe_merge_commit.py [sf_dir] [runs]

Writes BENCH_delta_merge.json: min-of-N commit and read seconds, the
touched-file counts that pin the only-hit-files contract, and loadavg.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from pydatalake_spark.queries.tables import load_table  # noqa: E402
from pydatalake_spark.session import get_spark  # noqa: E402
from pydatalake_spark.sources.delta import (  # noqa: E402
    merge_delta,
    read_delta,
    snapshot,
    write_delta,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    spark = get_spark("merge-probe")
    commit_times, read_times = [], []
    files_before = files_touched = total_rows = 0
    for _ in range(RUNS):
        root = tempfile.mkdtemp(prefix="merge_probe_")
        table = os.path.join(root, "orders")
        try:
            orders = load_table(spark, SF, "orders")
            write_delta(orders, table, partition_by=["o_orderstatus"])
            pre = snapshot(table)
            files_before = len(pre.files)
            matched = orders.filter(
                (F.col("o_orderkey") % 97 == 0)
                & (F.col("o_orderstatus") == "P")
            )
            updates = matched.withColumn(
                "o_totalprice", F.col("o_totalprice") * 2
            )
            inserts = updates.withColumn(
                "o_orderkey", -F.col("o_orderkey")
            ).withColumn("o_orderstatus", F.lit("N"))
            source = updates.unionByName(inserts)
            source.count()  # materialize the source plan outside the timer

            t0 = time.time()
            merge_delta(spark, table, source, on=["o_orderkey"])
            commit_times.append(time.time() - t0)

            post = snapshot(table)
            files_touched = len(
                set(pre.files) - set(post.files)
            )  # removed = rewritten

            df = read_delta(spark, table).groupBy("o_orderstatus").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_totalprice").alias("s"),
            )
            df.collect()  # warm
            t0 = time.time()
            rows = df.collect()
            read_times.append(time.time() - t0)
            total_rows = sum(r["n"] for r in rows)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    out = {
        "metric": "delta_merge_phase_split",
        "sf_dir": SF,
        "runs": RUNS,
        "commit_sec_min": round(min(commit_times), 3),
        "commit_sec_all": [round(t, 3) for t in commit_times],
        "read_sec_min": round(min(read_times), 3),
        "read_sec_all": [round(t, 3) for t in read_times],
        "files_before": files_before,
        "files_rewritten_by_merge": files_touched,
        "rows_after_merge": total_rows,
        "loadavg": os.getloadavg(),
    }
    path = Path(__file__).resolve().parent.parent / "BENCH_delta_merge.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
