"""Incremental insert: append only rows not already in the target (S9).

The reference's intent at ``reader.py:317,333-334`` is
``INSERT INTO t SELECT * FROM src EXCEPT SELECT * FROM t`` (it actually
emits the misspelled ``EXPECT`` — a latent bug; we implement the intended
semantics, SURVEY §7.3.6). Engine form: set-semantics anti-diff then union /
append — the same primitive the delta write mode uses.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from pydatalake_spark.operators.diff import tables_diff


def insert_only_new(
    target: DataFrame,
    source: DataFrame,
    subset: str | Sequence[str] | None = None,
) -> DataFrame:
    """target ∪ (source rows not already present) — one anti-join + union.

    With ``subset``, source rows are ALSO deduplicated on the keys
    (deterministic keep-first) before the union: EXCEPT is set-semantics,
    and inserting two source rows that share a key would leave the target
    holding duplicate keys after one call.
    """
    new_rows = tables_diff(source, target, subset=subset)
    if subset is not None:
        from pydatalake_spark.operators.dedup import distinct_table

        new_rows = distinct_table(new_rows, subset=subset, keep="first")
    return target.unionByName(new_rows.select(*target.columns))


def insert_into_table(
    spark: SparkSession, table_name: str, source: DataFrame
) -> None:
    """Catalog-table variant: registers the deduplicated union back as the
    temp view (≙ the reference's DuckDB table INSERT, reader.py:317)."""
    target = spark.table(table_name)
    insert_only_new(target, source).createOrReplaceTempView(table_name)
