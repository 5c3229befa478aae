"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names, and an
order-insensitive canonical value hash (sorted rows, timestamps → UTC
microseconds, floats → 9 significant digits, NULLs first).

Usage: python tools/check_parity.py [--wipe-fixtures] [--dump-on-fail]
       [sf_dir] [query ...]

``--dump-on-fail`` writes BOTH engines' full canonical row sets for any
red query to ``PARITY_FAIL_<query>.json`` so a mismatch carries its own
evidence (which group, which value, which side) instead of just a hash.

``--wipe-fixtures`` cold-wipes every session-shared on-disk fixture cache
(the $TMPDIR Delta tables) before running, so a fixture-lifecycle bug —
the r11 gate's only red class — surfaces here instead of at the driver.
Run the gate front once with this flag in the round-end verification.
"""

from __future__ import annotations

import hashlib
import math
import sys
from datetime import date, datetime
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from pydatalake_spark.queries.tables import TABLES

WIPE_FIXTURES = "--wipe-fixtures" in sys.argv
if WIPE_FIXTURES:
    sys.argv.remove("--wipe-fixtures")

DUMP_ON_FAIL = "--dump-on-fail" in sys.argv
if DUMP_ON_FAIL:
    sys.argv.remove("--dump-on-fail")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def canon_value(v):
    # Type-tagged canonicalization: at least as strict as the driver's gate,
    # which distinguishes int from float representations ("1000" vs "1000.0").
    # A lax untagged version let two type-representation bugs ship in round 1
    # (VERDICT r1 "What's wrong" #4).
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "b:true" if v else "b:false"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == 0:
            return "f:0"
        return f"f:{v:.9g}"
    if isinstance(v, Decimal):
        return f"d:{v.normalize()}"
    if isinstance(v, datetime):
        return "t:" + v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, date):
        return "D:" + v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return "s:" + str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(canon_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, len(lines)


def main() -> int:
    import os

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[2:])

    if WIPE_FIXTURES:
        import shutil
        import tempfile

        for d in ("pydatalake_delta_fixture",):
            p = Path(tempfile.gettempdir()) / d
            if p.exists():
                shutil.rmtree(p)
                print(f"wiped fixture cache: {p}")

    if os.environ.get("SPARK_GRAFT_PLAIN_SESSION") == "1":
        # driver-sim: the driver's gate runs on a DEFAULT SparkSession, not
        # our tuned factory — any conf a query needs must be set inside the
        # query path itself (see .claude/skills/verify gotchas)
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[32]").getOrCreate()
    else:
        from pydatalake_spark.session import get_spark

        spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            continue
        sh, sn = canon_rows(scols, srows)
        oh, on = canon_rows(ocols, orows)
        if sn != on:
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={sn} oracle={on}")
        elif sh != oh:
            failures.append(name)
            print(f"FAIL {name}: value hash mismatch ({sn} rows)")
            sset = {"\x01".join(canon_value(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows}
            oset = {"\x01".join(canon_value(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows}
            for x in list(sset - oset)[:2]:
                print(f"   spark-only: {x[:200]!r}")
            for x in list(oset - sset)[:2]:
                print(f"   oracle-only: {x[:200]!r}")
            if DUMP_ON_FAIL:
                import json

                out = Path(__file__).resolve().parent.parent / (
                    f"PARITY_FAIL_{name}.json"
                )
                out.write_text(
                    json.dumps(
                        {
                            "query": name,
                            "sf_dir": SF_DIR,
                            "cols": sorted(scols),
                            "spark_only": sorted(sset - oset),
                            "oracle_only": sorted(oset - sset),
                            "spark_rows": sorted(sset),
                            "oracle_rows": sorted(oset),
                        },
                        indent=1,
                    )
                )
                print(f"   dumped: {out}")
        else:
            print(f"PASS {name} ({sn} rows)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
