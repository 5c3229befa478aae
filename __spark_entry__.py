"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator corpus from
``pydatalake_spark.queries`` for the DuckDB-oracle correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pydatalake_spark.queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the composed corpus-cleaning pipeline v3 (quality filter
    -> exact dedup -> cross-doc duplicated-span strip -> exact-Jaccard
    near-dup over cleaned text -> connected-component cluster resolution
    -> deterministic split) on /root/testdata/sf0.001 — the engine's
    distinctive value over a plain SQL engine. (TPC-H-shape relational
    coverage lives in the queries() corpus, q1-q22.)"""
    return QUERIES["pipeline_clean_corpus_v3"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
