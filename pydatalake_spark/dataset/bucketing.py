"""Bucketed tables: co-located, shuffle-free joins and aggregations.

The reference has no analog (single-node DuckDB needs no data placement);
this is the Spark-native layout decision that matters most at 100 TB: a
fact table bucketed on its join key joins another table bucketed the same
way with ZERO exchanges — the shuffle happened once, at write time, and
every subsequent join/aggregation on the bucket key reuses it.

    write_bucketed(orders, "orders_b", keys=["o_custkey"], num_buckets=64)
    write_bucketed(customer, "customer_b", keys=["c_custkey"], num_buckets=64)
    spark.table("orders_b").join(spark.table("customer_b"),
                                 on=[...])          # no Exchange in the plan

Sizing: pick ``num_buckets`` so a bucket of the LARGER table is a few
hundred MB (e.g. 10 TB fact → 32–64k buckets); both sides must use the
same count for co-located joins. Bucketed tables live in the session
catalog (``saveAsTable`` — bucket metadata needs a catalog; a bare path
write cannot carry it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: str | Sequence[str],
    num_buckets: int = 64,
    sort_by: str | Sequence[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally sort-bucketed) table.

    ``sort_by`` additionally sorts within buckets, which upgrades
    merge-joins on the key to zero-sort as well as zero-shuffle.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *keys)
    if sort_by:
        sb = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sb)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def is_bucketed(spark: SparkSession, table_name: str) -> bool:
    """True if the catalog table carries bucket metadata."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect()
    return any("Num Buckets" in (r.col_name or "") for r in rows)
