"""Structured Streaming ingestion — the idiomatic upgrade of the
reference's batch-incremental write path (SURVEY §2.10).

The reference has no streaming; its closest analogs are the ``delta``
insert-only-new write mode (``writer.py:219-249``) and time-interval
micro-batching (``writer.py:292-385``). Here both become one Structured
Streaming pipeline:

    readStream(file source) → watermark → dropDuplicates(keys)
        → writeStream.trigger(availableNow=True) → parquet sink

- ``availableNow`` drains everything present then stops — exactly the
  reference's "ingest what's new, idempotently" batch loop, but with
  checkpointed exactly-once file-sink semantics instead of an anti-join
  (the checkpoint log remembers processed source files across runs);
- watermark + ``dropDuplicates`` is the streaming twin of the delta
  subset diff: late duplicates inside the watermark are dropped with
  bounded state;
- the windowed variant is W7's time-interval batching as a real
  tumbling-window aggregation.

Scale: file-source listing is incremental; state is bounded by the
watermark horizon; the sink writes hive-partitioned parquet like the batch
writer, so downstream readers cannot tell which path produced the data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_ingest(
    spark: SparkSession,
    source_dir: str,
    dest_dir: str,
    schema: T.StructType,
    checkpoint_dir: str | None = None,
    dedup_keys: list[str] | None = None,
    watermark: tuple[str, str] | None = None,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Drain ``source_dir`` into ``dest_dir`` exactly-once; re-running after
    new files land ingests only the new files (checkpoint-tracked)."""
    checkpoint_dir = checkpoint_dir or os.path.join(dest_dir, "_checkpoint")
    stream = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", "64")
        .load(source_dir)
    )
    if watermark:
        stream = stream.withWatermark(*watermark)
    if dedup_keys:
        stream = stream.dropDuplicates(dedup_keys)
    writer = (
        stream.writeStream.format("parquet")
        .option("path", dest_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    q = writer.start()
    q.awaitTermination()


def stream_time_bucket(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
    value_col: str = "value",
    query_name: str = "bucketed",
) -> DataFrame:
    """W7's time-interval batching as a streaming tumbling-window agg,
    drained synchronously into an in-memory sink (smoke/test surface)."""
    stream = spark.readStream.format("parquet").schema(schema).load(source_dir)
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), *(group_cols or []))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"SELECT win.start AS bucket, * EXCEPT (win) FROM {query_name}"
    )
