"""Driver-canonicalizer compatibility audit.

The driver's correctness gate canonicalizes BOTH result sides through
pandas (``DataFrame.sort_values`` over every column, then a value hash).
That pipeline is stricter than ``tools/check_parity.py``'s tuple canon in
two ways that burned round 3 (VERDICT r3 "What's wrong" #1-#3):

- ``sort_values`` crashes on unhashable cells → ANY array/struct/map output
  column kills the row outright (``TypeError: unhashable type: 'list'``).
- pandas dtypes are part of the hash: Spark ``DecimalType`` → object dtype
  of ``decimal.Decimal`` while DuckDB fetches DECIMAL/HUGEINT as float64,
  so equal values hash differently.

This tool replays that exact failure surface for every registry query at a
small SF: Spark side via ``toPandas()``, oracle side via duckdb ``.df()``,
then (1) ``sort_values`` over all columns on both, (2) dtype-family
comparison (int-family vs float-family vs object), (3) an explicit scan of
object columns for Decimal / list / ndarray / dict cells.

Usage: python tools/audit_canon.py [sf_dir] [query ...]
Exit 1 if any query is canon-hostile.
"""

from __future__ import annotations

import sys
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np
import pandas as pd

from pydatalake_spark.queries.tables import TABLES

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def _family(dtype) -> str:
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    return "object"


def _object_cell_problems(df: pd.DataFrame) -> list[str]:
    problems = []
    for col in df.columns:
        if _family(df[col].dtype) != "object":
            continue
        for v in df[col].head(50):
            if isinstance(v, Decimal):
                problems.append(f"{col}: Decimal cells")
                break
            if isinstance(v, (list, tuple, dict, np.ndarray)):
                problems.append(f"{col}: {type(v).__name__} cells (unhashable)")
                break
    return problems


def audit_one(name, sdf_pd, odf_pd) -> list[str]:
    problems = []
    for side, df in (("spark", sdf_pd), ("oracle", odf_pd)):
        if df is None:
            continue
        try:
            df.sort_values(list(df.columns))
        except Exception as e:
            problems.append(f"{side}: sort_values crash: {type(e).__name__}: {e}")
        problems.extend(f"{side}: {p}" for p in _object_cell_problems(df))
    if odf_pd is not None:
        s_fams = {c: _family(sdf_pd[c].dtype) for c in sorted(sdf_pd.columns)}
        o_fams = {c: _family(odf_pd[c].dtype) for c in sorted(odf_pd.columns)}
        for c in s_fams:
            if c in o_fams and s_fams[c] != o_fams[c]:
                # empty frames degrade to object on the duckdb side; only a
                # real value mismatch matters
                if len(sdf_pd) and len(odf_pd):
                    problems.append(
                        f"dtype family mismatch on '{c}': "
                        f"spark={s_fams[c]} oracle={o_fams[c]}"
                    )
    return problems


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    bad = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf_pd = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            bad[name] = [f"spark: query crash: {type(e).__name__}: {e}"]
            print(f"FAIL {name}: {bad[name][0]}")
            continue
        odf_pd = None
        if name in oracles:
            try:
                odf_pd = con.execute(oracles[name]).df()
            except Exception as e:
                bad[name] = [f"oracle: query crash: {type(e).__name__}: {e}"]
                print(f"FAIL {name}: {bad[name][0]}")
                continue
        problems = audit_one(name, sdf_pd, odf_pd)
        if problems:
            bad[name] = problems
            print(f"HOSTILE {name}:")
            for p in problems:
                print(f"    {p}")
        else:
            tag = "" if odf_pd is not None else " (rows-only)"
            print(f"ok   {name}{tag}")

    print(f"\n{len(bad)} canon-hostile queries" + (f": {sorted(bad)}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
