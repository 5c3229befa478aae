"""Structured Streaming ingestion (SURVEY §2.10 idiomatic upgrade)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pydatalake_spark.streaming.ingest import stream_ingest, stream_time_bucket


@pytest.fixture()
def src(spark, events, tmpdir_path):
    d = os.path.join(tmpdir_path, "src")
    events.limit(200).write.parquet(d)
    schema = spark.read.parquet(d).schema
    return d, schema


def test_stream_ingest_exactly_once(spark, events, src, tmpdir_path):
    src_dir, schema = src
    dest = os.path.join(tmpdir_path, "dest")
    stream_ingest(spark, src_dir, dest, schema)
    n1 = spark.read.parquet(dest).count()
    assert n1 == 200

    # re-run with no new files: checkpoint prevents re-ingestion
    stream_ingest(spark, src_dir, dest, schema)
    assert spark.read.parquet(dest).count() == n1

    # land a new file -> only it is ingested
    events.limit(250).exceptAll(events.limit(200)).write.mode("append").parquet(src_dir)
    stream_ingest(spark, src_dir, dest, schema)
    assert spark.read.parquet(dest).count() == 250


def test_stream_dedup(spark, events, tmpdir_path):
    src_dir = os.path.join(tmpdir_path, "src2")
    dup = events.limit(50).unionByName(events.limit(50))
    dup.write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    dest = os.path.join(tmpdir_path, "dest2")
    stream_ingest(
        spark, src_dir, dest, schema,
        dedup_keys=["event_id"], watermark=("ts", "1 hour"),
    )
    assert spark.read.parquet(dest).count() == 50


def test_stream_time_bucket_matches_batch(spark, events, src):
    src_dir, schema = src
    out = stream_time_bucket(
        spark, src_dir, schema, window="1 hour", group_cols=["event_type"],
        query_name="tb_test",
    )
    batch = (
        spark.read.parquet(src_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )
    got = {(r["bucket"], r["event_type"]): (r["n_events"], round(r["total_value"], 6))
           for r in out.collect()}
    want = {(r["bucket"], r["event_type"]): (r["n_events"], round(r["total_value"], 6))
            for r in batch.collect()}
    assert got == want
