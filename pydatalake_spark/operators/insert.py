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


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: str | Sequence[str],
) -> DataFrame:
    """MERGE semantics (upsert): source rows REPLACE key-matched target
    rows, unmatched source rows are inserted — ``WHEN MATCHED THEN UPDATE
    (full row) WHEN NOT MATCHED THEN INSERT``. The lakehouse staple the
    reference's insert-only-new delta mode (reader.py:317) stops short of.

    Engine shape: ONE left_anti join of target against the distinct source
    keys (survivors = untouched target rows), then union the source —
    never a row-at-a-time path, never a driver loop. At 100 TB both sides
    shuffle once on the merge keys; with a bucketed target the anti-join
    reuses the on-disk partitioning (see dataset/bucketing.py). Multiple
    source rows per key are resolved BEFORE the union with deterministic
    keep-first on the keys (same discipline as insert_only_new) so the
    merged table can't hold duplicate keys.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    from pydatalake_spark.operators.dedup import distinct_table

    src = distinct_table(source, subset=key_list, keep="first")
    unchanged = target.join(
        src.select(*key_list).distinct(), on=key_list, how="left_anti"
    )
    return unchanged.unionByName(src.select(*target.columns))
