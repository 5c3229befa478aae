"""Repartition/compaction job (W10) and incremental insert (S9)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pydatalake_spark.dataset.repartition import compact_dataset, repartition_dataset
from pydatalake_spark.dataset.writer import write_dataset
from pydatalake_spark.operators.insert import insert_only_new
from pydatalake_spark.sources.read import read_dataset


def _data_files(path):
    out = []
    for root, _d, files in os.walk(path):
        out += [f for f in files if f.endswith(".parquet")]
    return out


def test_repartition_to_new_layout(spark, events, tmpdir_path):
    src = os.path.join(tmpdir_path, "src")
    write_dataset(events, src, mode="append")
    dest = os.path.join(tmpdir_path, "dest")
    repartition_dataset(spark, src, dest, partition_by="event_type")
    back = read_dataset(spark, dest)
    assert back.count() == events.count()
    assert any(d.startswith("event_type=") for d in os.listdir(dest))


def test_compaction_in_place(spark, events, tmpdir_path):
    src = os.path.join(tmpdir_path, "src")
    # fragment the dataset into many small files
    write_dataset(events.repartition(16), src, mode="append")
    n_before = len(_data_files(src))
    assert n_before >= 16
    compact_dataset(spark, src, max_records_per_file=10_000)
    n_after = len(_data_files(src))
    assert n_after < n_before
    assert read_dataset(spark, src).count() == events.count()
    assert not os.path.exists(src + ".__tmp__")
    assert not os.path.exists(src + ".__old__")


def test_repartition_with_transform_and_distinct(spark, events, tmpdir_path):
    src = os.path.join(tmpdir_path, "src")
    write_dataset(events.unionByName(events.limit(50)), src, mode="append")
    dest = os.path.join(tmpdir_path, "dest")
    repartition_dataset(
        spark, src, dest, distinct=True,
        transform_func=lambda df: df.drop("props"),
    )
    back = read_dataset(spark, dest)
    assert back.count() == events.count()
    assert "props" not in back.columns


def test_insert_only_new(spark, events):
    target = events.limit(100)
    source = events.limit(150)  # 100 overlap + 50 new
    merged = insert_only_new(target, source)
    assert merged.count() == 150
    # keyed variant: changed non-key values do NOT re-insert
    modified = events.limit(100).withColumn("value", F.col("value") + 1)
    merged2 = insert_only_new(target, modified, subset=["event_id"])
    assert merged2.count() == 100


def test_small_files_report_flags_fragmented_dataset(spark, tmpdir_path):
    import os

    from pydatalake_spark.dataset.repartition import (
        repartition_dataset,
        small_files_report,
    )

    src = os.path.join(str(tmpdir_path), "frag")
    # 40 tiny files in one directory
    spark.range(2000).repartition(40).write.mode("overwrite").parquet(src)
    rep = small_files_report(spark, src).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r.n_files == 40 and r.n_small == 40 and r.needs_compaction

    # compaction fixes it
    dst = os.path.join(str(tmpdir_path), "compact")
    repartition_dataset(spark, src, dst)
    rep2 = small_files_report(spark, dst).collect()
    assert sum(x.n_files for x in rep2) < 40


def test_repartition_to_directory_flavor(spark, events, tmpdir_path):
    """Flavor change as part of the compaction job (ref
    repartition.py:110-172): hive source -> bare-value-dir output."""
    import os

    from pydatalake_spark.dataset.repartition import repartition_dataset
    from pydatalake_spark.dataset.writer import write_dataset
    from pydatalake_spark.sources.read import read_directory_partitioned

    src = os.path.join(tmpdir_path, "hive_src")
    write_dataset(events, src, mode="append", partition_by="event_type")
    dst = os.path.join(tmpdir_path, "dir_dst")
    repartition_dataset(
        spark, src, dst, partition_by="event_type",
        partition_flavor="directory",
    )
    names = {n for n in os.listdir(dst) if not n.startswith(("_", "."))}
    assert names and all("=" not in n for n in names)
    back = read_directory_partitioned(spark, dst, [("event_type", "string")])
    assert back.count() == events.count()
