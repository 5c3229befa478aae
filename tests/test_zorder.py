"""Z-order clustered writes (dataset/zorder.py): per-file min/max stays
narrow on EVERY clustered column, unlike a single-column sort."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pydatalake_spark.dataset.zorder import zorder_key, zorder_write
from tests.conftest import SF_DIR


def _file_spans(path, col):
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append(max(maxs) - min(mins))
    return spans


def test_zorder_narrows_both_columns(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n = 8
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    zorder_write(orders, zpath, ["o_custkey", "o_totalprice"], n_files=n)
    # baseline: classic single-column sort layout
    (
        orders.repartitionByRange(n, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    glob_span = lambda col: (
        orders.agg(
            (F.max(col) - F.min(col)).alias("s")
        ).collect()[0].s
    )
    for col in ("o_custkey", "o_totalprice"):
        g = float(glob_span(col))
        z_avg = sum(float(s) for s in _file_spans(zpath, col)) / n
        assert z_avg < 0.8 * g, f"{col}: z-order files span ~global range"
    # the sorted layout prunes o_custkey but NOT o_totalprice; z-order must
    # beat it decisively on the second column
    s_price = sum(float(s) for s in _file_spans(spath, "o_totalprice")) / n
    z_price = sum(float(s) for s in _file_spans(zpath, "o_totalprice")) / n
    assert z_price < 0.75 * s_price


def test_zorder_key_bounds_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 99.0)], "a long, b double"
    )
    z = df.select(zorder_key(df, ["a", "b"], bits=8).alias("z")).collect()
    vals = [r.z for r in z]
    assert all(0 <= v < (1 << 16) for v in vals)
    # null b -> lattice origin on that dimension: its key can't exceed the
    # pure-a contribution (odd bit positions)
    assert vals[1] <= sum(1 << (2 * i) for i in range(8))


def test_zorder_rejects_wide_keys(spark):
    df = spark.createDataFrame([(1, 2, 3, 4)], "a int, b int, c int, d int")
    import pytest

    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b", "c", "d"], bits=16)


def test_all_null_zorder_column_maps_to_origin(spark):
    """An all-null z-column aggregates to min=max=None; the key must map
    it to the lattice origin, not crash on float(None) (ADVICE r3)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "a long, b double"
    ).withColumn("c", F.lit(None).cast("double"))
    keyed = df.withColumn("zkey", zorder_key(df, ["b", "c"]))
    rows = keyed.orderBy("a").collect()
    assert [r.zkey for r in rows] == sorted(r.zkey for r in rows)
    # null column contributes constant-0 bits: key ordering == b ordering
    assert rows[0].zkey < rows[1].zkey < rows[2].zkey
