"""Delta log-replay scaling probe (pure Python — no Spark session).

The 100-TB claim under test: snapshot resolution costs O(commits since
last checkpoint), not O(table history). A synthetic table accumulates
N append commits of F files each; we time `snapshot()` (a) replaying the
full JSON history and (b) after `write_checkpoint` + log truncation to
the K most recent commits. The checkpointed replay must stay flat as N
grows while the raw replay grows linearly.

    python tools/probe_delta_log.py        # writes BENCH_delta_log.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pydatalake_spark.sources import delta as dl  # noqa: E402

FILES_PER_COMMIT = 100
KEEP_AFTER_CHECKPOINT = 10


def _synthetic_table(root: str, n_commits: int) -> str:
    table = os.path.join(root, f"log_{n_commits}")
    os.makedirs(dl._log_dir(table), exist_ok=True)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        ],
    }
    for v in range(n_commits):
        actions = [
            {"commitInfo": {"timestamp": v, "operation": "WRITE"}}
        ]
        if v == 0:
            actions.append({"protocol": dict(dl.PROTOCOL)})
            actions.append(
                {
                    "metaData": {
                        "id": str(uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": json.dumps(schema),
                        "partitionColumns": [],
                        "configuration": {},
                        "createdTime": 0,
                    }
                }
            )
        for i in range(FILES_PER_COMMIT):
            actions.append(
                {
                    "add": {
                        "path": f"part-{v:06d}-{i:04d}.parquet",
                        "partitionValues": {},
                        "size": 1 << 20,
                        "modificationTime": v,
                        "dataChange": True,
                        "stats": json.dumps(
                            {
                                "numRecords": 1000,
                                "minValues": {"k": v * 1000},
                                "maxValues": {"k": v * 1000 + 999},
                                "nullCount": {"k": 0},
                            }
                        ),
                    }
                }
            )
        with open(dl._commit_path(table, v), "w") as f:
            for a in actions:
                f.write(json.dumps(a, separators=(",", ":")) + "\n")
    return table


def _time(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    root = tempfile.mkdtemp(prefix="delta_log_probe_")
    out = {
        "files_per_commit": FILES_PER_COMMIT,
        "keep_after_checkpoint": KEEP_AFTER_CHECKPOINT,
        "points": [],
    }
    try:
        for n in (10, 100, 1000):
            table = _synthetic_table(root, n)
            raw = _time(lambda: dl.snapshot(table))
            snap = dl.snapshot(table)
            assert len(snap.files) == n * FILES_PER_COMMIT

            cp_at = max(0, n - 1 - KEEP_AFTER_CHECKPOINT)
            dl.write_checkpoint(table, cp_at)
            for v in range(cp_at + 1):
                os.unlink(dl._commit_path(table, v))
            cp = _time(lambda: dl.snapshot(table))
            snap2 = dl.snapshot(table)
            assert len(snap2.files) == n * FILES_PER_COMMIT
            # data skipping over the full live set stays sub-replay
            skip = _time(
                lambda: dl._prune_data_files(
                    snap2, snap2.files, [("k", "=", 500)]
                )
            )
            out["points"].append(
                {
                    "commits": n,
                    "live_files": n * FILES_PER_COMMIT,
                    "replay_full_json_sec": raw,
                    "replay_checkpointed_sec": cp,
                    "stats_prune_sec": skip,
                }
            )
            print(out["points"][-1])
    finally:
        shutil.rmtree(root, ignore_errors=True)

    with open(
        Path(__file__).resolve().parent.parent / "BENCH_delta_log.json", "w"
    ) as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
