"""Reference-API compat shim: a PyDaLa user's workflow, import-swapped.

Mirrors the reference's documented usage (``reader.py``/``writer.py``/
``manager.py`` entry points) running unchanged on the Spark engine.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pydatalake_spark.compat import Manager, Reader, TimeFlyReader, Writer
from pydatalake_spark.dataset.timefly import TimeFly

SF_DIR = "/root/testdata/sf0.001"


def test_reader_workflow(spark):
    r = Reader(os.path.join(SF_DIR, "orders.parquet"), name="orders_c", spark=spark)
    r.load_dataset()
    # fluent chain + materialization
    out = (
        r.drop("o_comment")
        .sort("o_orderdate")
        .to_relation()
    )
    assert "o_comment" not in out.columns
    # SQL passthrough against the registered view
    n = r.query("SELECT count(*) AS n FROM orders_c").collect()[0]["n"]
    assert n == out.count() > 0
    # interchange edge: real polars when importable, pandas fallback
    pdf = Reader(
        os.path.join(SF_DIR, "region.parquet"), spark=spark
    ).to_polars()
    assert len(pdf) == 5
    try:
        import polars as pl
    except ImportError:
        import pandas as pd

        assert isinstance(pdf, pd.DataFrame)
    else:
        assert isinstance(pdf, pl.DataFrame)


def test_writer_modes_roundtrip(spark, tmpdir_path):
    src = Reader(os.path.join(SF_DIR, "nation.parquet"), spark=spark).to_relation()
    dest = os.path.join(tmpdir_path, "nation_out")
    w = Writer(dest, partitioning="n_regionkey", mode="overwrite", spark=spark)
    w.write_dataset(src)
    back = spark.read.parquet(dest)
    assert back.count() == 25
    # delta mode: same rows again -> nothing appended
    w.write_dataset(src, mode="delta")
    assert spark.read.parquet(dest).count() == 25
    # raise mode
    with pytest.raises(FileExistsError):
        w.write_dataset(src, mode="raise")


def test_timefly_reader_as_of(spark, tmpdir_path):
    base = os.path.join(tmpdir_path, "tf")
    tf = TimeFly(spark, base).init(name="tf")
    v1 = spark.range(5).withColumn("v", F.lit("one"))
    tf.write(v1, mode="overwrite")
    tf.add_snapshot(__import__("datetime").datetime(2026, 1, 1, 12, 0, 0))
    v2 = spark.range(7).withColumn("v", F.lit("two"))
    tf.write(v2, mode="overwrite")

    # as-of BEFORE the snapshot -> first snapshot strictly after = v1 state
    r = TimeFlyReader(base, timefly="2025-12-31T00:00:00", spark=spark)
    assert r.to_relation().count() == 5
    # as-of after all snapshots -> current
    r.set_snapshot("2026-06-01T00:00:00")
    assert r.to_relation().count() == 7


def test_manager_catalog(spark, tmpdir_path):
    m = Manager(os.path.join(tmpdir_path, "lake"), spark=spark)
    tf = m.create("sales", description="demo")
    tf.write(spark.range(10).withColumnRenamed("id", "sale_id"), mode="overwrite")
    assert "sales" in m.tables()
    t = m.table("sales")
    assert t.to_df().count() == 10
    m.remove("sales", delete_data=True)
    assert "sales" not in m.tables()


def test_writer_rejects_unknown_partitioning_flavor(spark, tmpdir_path):
    """ADVICE r6: a typo ('dir') or pyarrow-only flavor silently becoming
    hive hands the user the wrong layout — it must raise."""
    import pytest as _pytest

    from pydatalake_spark.compat import Writer

    with _pytest.raises(ValueError, match="partitioning_flavor"):
        Writer(tmpdir_path, spark=spark, partitioning_flavor="dir")
    # the documented values still construct
    for ok in (None, "hive", "directory"):
        Writer(tmpdir_path, spark=spark, partitioning_flavor=ok)


def test_reader_inspection_accessors(spark, tmpdir_path):
    """r9 VERDICT item 9: the reference Reader's introspection surface
    (reader.py:487-581) — buffer_size / disk_usage / get_* / has_* /
    tables — answers on the shim too, so the port-with-import-changes
    story has no asterisks."""
    import os

    from pydatalake_spark.compat import Reader

    path = os.path.join(tmpdir_path, "inspect_ds")
    src = spark.range(100).withColumn("v", F.col("id") * 2)
    src.write.parquet(path)

    r = Reader(path, name="insp", spark=spark)
    assert r.has_dataset is False and r.has_relation is False
    assert r.has_pa_table is False and r.tables == []

    r.load_dataset()
    assert r.has_dataset and r.has_relation
    assert r.tables == ["dataset", "relation"]

    du = r.disk_usage
    # Hadoop's ChecksumFileSystem hides its local .crc shadow files from
    # listings, so ContentSummary counts the data files (incl. _SUCCESS)
    # — the fs.du semantic the reference reports on real stores
    real = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if not f.startswith(".")
    )
    assert du == real > 0
    assert r.get_disk_usage("KB") == f"{du / 1024:.1f} KB"
    assert r.get_disk_usage("B").endswith(" B")

    assert r.has_pa_table is False  # disk_usage must not materialize
    bs = r.buffer_size
    assert bs > 0 and r.pa_table.num_rows == 100
    assert r.has_pa_table and "pa_table" in r.tables
    assert r.get_buffer_size("MB") == f"{bs / 1024**2:.1f} MB"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unit"):
        r.get_disk_usage("XB")


def test_timefly_writer_named_class(spark, tmpdir_path):
    """A reference ``TimeFlyWriter`` workflow (ref ``writer.py:574-687``)
    ports with import changes only: construct on a base path, write, see
    versioned metadata update; write again after a snapshot and read the
    old state back via TimeFlyReader."""
    from pydatalake_spark.compat import TimeFlyWriter

    base = os.path.join(tmpdir_path, "versioned")
    src = Reader(os.path.join(SF_DIR, "nation.parquet"), spark=spark).to_relation()
    w = TimeFlyWriter(base, spark=spark, mode="overwrite")
    w.write_dataset(src)
    tf = TimeFly(spark, base)
    assert tf.config.get("current", {}).get("last_mode") == "overwrite"
    snap_id = tf.add_snapshot()
    # second write lands in current/, snapshot keeps the old state
    w2 = TimeFlyWriter(base, spark=spark, mode="overwrite")
    w2.write_dataset(src.filter(F.col("n_regionkey") == 0))
    assert TimeFly(spark, base).read().count() == 5
    import datetime as dt

    old = TimeFlyReader(
        base, timefly=dt.datetime(2000, 1, 1), spark=spark
    ).to_relation()
    assert old.count() == 25
    assert snap_id in TimeFly(spark, base).snapshots()


def test_repartition_named_class(spark, tmpdir_path):
    """A reference ``Repartition`` workflow (ref ``repartition.py:7-195``):
    reader → writer rewrite with fluent sort/distinct/partitioning chain,
    out-of-place then in-place."""
    from pydatalake_spark.compat import Repartition

    src_dir = os.path.join(tmpdir_path, "src_ds")
    nation = Reader(os.path.join(SF_DIR, "nation.parquet"), spark=spark).to_relation()
    Writer(src_dir, mode="overwrite", spark=spark).write_dataset(
        nation.unionByName(nation)  # dupes for distinct() to drop
    )

    # out-of-place: distinct + partitioned + drop
    dest = os.path.join(tmpdir_path, "dest_ds")
    rp = Repartition(
        Reader(src_dir, spark=spark),
        Writer(dest, partitioning="n_regionkey", mode="overwrite", spark=spark),
    )
    rp.distinct(True).drop("n_comment").write()
    back = spark.read.parquet(dest)
    assert back.count() == 25
    assert "n_comment" not in back.columns
    assert any("n_regionkey=" in d for d in os.listdir(dest))

    # in-place: same path reader/writer delegates to the atomic-swap path
    rp2 = Repartition(
        Reader(src_dir, spark=spark),
        Writer(src_dir, partitioning="n_regionkey", mode="overwrite", spark=spark),
    )
    rp2.distinct(True).write()
    again = spark.read.parquet(src_dir)
    assert again.count() == 25
    assert any("n_regionkey=" in d for d in os.listdir(src_dir))
